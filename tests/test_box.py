"""Per-op oracle tests for the box-aware transforms (VERDICT round-1 Weak #4).

Each op is checked against hand-computed boxes/masks/pixels encoding the
reference geometry co-transform semantics
(/root/reference/libs/pipelines/box.py:11-379).
"""

import numpy as np
import pytest

from bdvcil_tpu.data.box import (
    ActorCutOut,
    BuildHumanMask,
    DetectionLoad,
    FlipWithBox,
    RandomResizedCropWithBox,
    ResizeWithBox,
    SceneCutOut,
)


def _clip_results(h=40, w=60, t=3, boxes=None, seed=0):
    """A t-frame clip with per-frame ramp content + one box per frame."""
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8) for _ in range(t)]
    if boxes is None:
        boxes = [np.array([[10.0, 5.0, 30.0, 25.0]], np.float32) for _ in range(t)]
    return {
        "imgs": imgs,
        "img_shape": (h, w),
        "modality": "RGB",
        "detections": [b.copy() for b in boxes],
        "rng": np.random.default_rng(seed),
    }


# --- DetectionLoad (box.py:11-54) ------------------------------------------


def test_detection_load_threshold_and_offset():
    all_dets = {
        # frame 3 has two boxes straddling the 0.4 threshold, frame 5 none
        3: np.array([[1, 2, 3, 4, 0.9], [5, 6, 7, 8, 0.3]], np.float32),
        5: np.zeros((0, 5), np.float32),
        12: np.array([[0, 0, 9, 9, 0.41]], np.float32),
    }
    results = {
        "frame_inds": np.array([[3], [5]]),  # ndim 2 -> squeezed like box.py:38-39
        "all_detections": all_dets,
    }
    out = DetectionLoad(thres=0.4)(results)
    assert "all_detections" not in out  # deleted, box.py:52
    assert len(out["detections"]) == 2
    np.testing.assert_allclose(out["detections"][0], [[1, 2, 3, 4]])  # score col dropped
    assert out["detections"][1].shape == (0, 4)

    # `offset` shifts the lookup index (box.py:41-45)
    results = {"frame_inds": np.array([3]), "all_detections": dict(all_dets), "offset": 9}
    out = DetectionLoad(thres=0.4)(results)
    np.testing.assert_allclose(out["detections"][0], [[0, 0, 9, 9]])


def test_detection_load_exact_threshold_excluded():
    # strict '>' comparison (box.py:46): score == thres must NOT pass
    results = {
        "frame_inds": np.array([0]),
        "all_detections": {0: np.array([[1, 1, 2, 2, 0.4]], np.float32)},
    }
    out = DetectionLoad(thres=0.4)(results)
    assert out["detections"][0].shape == (0, 4)


# --- SceneCutOut (box.py:70-113) -------------------------------------------


def test_scene_cutout_keeps_box_fills_rest():
    results = _clip_results()
    orig = [img.copy() for img in results["imgs"]]
    out = SceneCutOut(fill_color=127)(results)
    for idx, img in enumerate(out["imgs"]):
        # inside the box: original pixels
        np.testing.assert_array_equal(img[5:25, 10:30], orig[idx][5:25, 10:30])
        # everywhere else: the fill color
        mask = np.zeros((40, 60), bool)
        mask[5:25, 10:30] = True
        assert (img[~mask] == 127).all()


def test_scene_cutout_noop_when_clip_has_no_detections():
    boxes = [np.zeros((0, 4), np.float32) for _ in range(3)]
    results = _clip_results(boxes=boxes)
    orig = [img.copy() for img in results["imgs"]]
    out = SceneCutOut(fill_color=127)(results)
    for idx, img in enumerate(out["imgs"]):
        np.testing.assert_array_equal(img, orig[idx])


def test_scene_cutout_multiple_boxes_union():
    boxes = [np.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 40.0, 30.0]], np.float32)]
    results = _clip_results(t=1, boxes=boxes)
    orig = results["imgs"][0].copy()
    out = SceneCutOut(fill_color=0)(results)
    img = out["imgs"][0]
    np.testing.assert_array_equal(img[0:10, 0:10], orig[0:10, 0:10])
    np.testing.assert_array_equal(img[20:30, 20:40], orig[20:30, 20:40])
    assert (img[15, 15] == 0).all()


# --- ActorCutOut (box.py:116-159) ------------------------------------------


def test_actor_cutout_erases_box():
    results = _clip_results()
    orig = [img.copy() for img in results["imgs"]]
    out = ActorCutOut(fill_color=127)(results)
    for idx, img in enumerate(out["imgs"]):
        assert (img[5:25, 10:30] == 127).all()
        mask = np.zeros((40, 60), bool)
        mask[5:25, 10:30] = True
        np.testing.assert_array_equal(img[~mask], orig[idx][~mask])


def test_actor_cutout_noop_when_no_detections():
    boxes = [np.zeros((0, 4), np.float32) for _ in range(2)]
    results = _clip_results(t=2, boxes=boxes)
    orig = [img.copy() for img in results["imgs"]]
    out = ActorCutOut(fill_color=0)(results)
    for idx, img in enumerate(out["imgs"]):
        np.testing.assert_array_equal(img, orig[idx])


# --- BuildHumanMask (box.py:162-207) ----------------------------------------


def test_build_human_mask_boxes():
    results = _clip_results(t=2)
    out = BuildHumanMask()(results)
    assert len(out["human_mask"]) == 2
    for m in out["human_mask"]:
        assert m.shape == (40, 60, 3) and m.dtype == np.uint8  # zeros_like(img)
        expected = np.zeros((40, 60, 3), np.uint8)
        expected[5:25, 10:30, :] = 1
        np.testing.assert_array_equal(m, expected)


def test_build_human_mask_whole_frame_when_no_detections():
    # no detections anywhere in the clip -> all-ones masks (box.py:183-187)
    boxes = [np.zeros((0, 4), np.float32) for _ in range(3)]
    results = _clip_results(boxes=boxes)
    out = BuildHumanMask()(results)
    for m in out["human_mask"]:
        assert (m == 1).all()


def test_build_human_mask_empty_frame_in_nonempty_clip_stays_zero():
    # one frame without boxes in a clip that HAS boxes elsewhere -> zero mask
    boxes = [
        np.array([[0.0, 0.0, 5.0, 5.0]], np.float32),
        np.zeros((0, 4), np.float32),
    ]
    results = _clip_results(t=2, boxes=boxes)
    out = BuildHumanMask()(results)
    assert (out["human_mask"][0][0:5, 0:5] == 1).all()
    assert (out["human_mask"][1] == 0).all()


# --- ResizeWithBox (box.py:209-268) ------------------------------------------


def test_resize_with_box_scales_and_clips_boxes():
    results = _clip_results()  # (40, 60), box (10, 5, 30, 25)
    out = ResizeWithBox(scale=(120, 80), keep_ratio=False)(results)
    assert out["img_shape"] == (80, 120)  # (h, w)
    assert out["imgs"][0].shape == (80, 120, 3)
    np.testing.assert_allclose(out["scale_factor"], [2.0, 2.0])
    np.testing.assert_allclose(out["detections"][0], [[20.0, 10.0, 60.0, 50.0]])


def test_resize_with_box_keep_ratio_short_side():
    # scale=(-1, 20): short side (h=40) -> 20, so w 60 -> 30; factor 0.5
    results = _clip_results()
    out = ResizeWithBox(scale=(-1, 20), keep_ratio=True)(results)
    assert out["img_shape"] == (20, 30)
    np.testing.assert_allclose(out["detections"][0], [[5.0, 2.5, 15.0, 12.5]])


def test_resize_with_box_accumulates_scale_factor():
    results = _clip_results()
    results["scale_factor"] = np.array([0.5, 0.5], np.float32)
    out = ResizeWithBox(scale=(120, 80), keep_ratio=False)(results)
    np.testing.assert_allclose(out["scale_factor"], [1.0, 1.0])


def test_resize_with_box_clip_to_new_extent():
    # box reaching past the frame clips to the new extent (box.py:263-265)
    boxes = [np.array([[50.0, 30.0, 70.0, 45.0]], np.float32)]
    results = _clip_results(t=1, boxes=boxes)
    out = ResizeWithBox(scale=(30, 20), keep_ratio=False)(results)
    # factors (0.5, 0.5): (25, 15, 35, 22.5) -> clip to w=30, h=20
    np.testing.assert_allclose(out["detections"][0], [[25.0, 15.0, 30.0, 20.0]])


# --- RandomResizedCropWithBox (box.py:272-320) --------------------------------


def test_random_resized_crop_with_box_translates_boxes():
    results = _clip_results()
    out = RandomResizedCropWithBox(area_range=(0.2, 0.6))(results)
    left, top, right, bottom = out["crop_bbox"]
    new_h, new_w = out["img_shape"]
    assert (bottom - top, right - left) == (new_h, new_w)
    assert out["imgs"][0].shape == (new_h, new_w, 3)
    # boxes translated by (-left, -top) and clipped to the crop extent
    expected = np.array([[10.0 - left, 5.0 - top, 30.0 - left, 25.0 - top]])
    expected[:, 0::2] = np.clip(expected[:, 0::2], 0, new_w)
    expected[:, 1::2] = np.clip(expected[:, 1::2], 0, new_h)
    np.testing.assert_allclose(out["detections"][0], expected)


def test_random_resized_crop_with_box_full_area_is_whole_image():
    results = _clip_results()
    orig = [img.copy() for img in results["imgs"]]
    out = RandomResizedCropWithBox(area_range=(1.0, 1.0), aspect_ratio_range=(1.0, 1.0))(
        results
    )
    # area=1, ar=1 on a 40x60 frame can never fit (sqrt(2400)=49 > 40) ->
    # mmaction2 fallback: center crop of the short edge (get_crop_bbox tail)
    assert out["img_shape"] == (40, 40)
    np.testing.assert_array_equal(out["crop_bbox"], [10, 0, 50, 40])
    np.testing.assert_array_equal(out["imgs"][0], orig[0][:, 10:50])


def test_random_resized_crop_with_box_is_clip_consistent():
    # one crop window for the whole clip (single get_crop_bbox call)
    results = _clip_results(t=4)
    out = RandomResizedCropWithBox()(results)
    shapes = {img.shape for img in out["imgs"]}
    assert len(shapes) == 1


# --- FlipWithBox (box.py:323-379) --------------------------------------------


def test_flip_with_box_horizontal_reflects_boxes():
    results = _clip_results()
    orig = [img.copy() for img in results["imgs"]]
    out = FlipWithBox(flip_ratio=1.0)(results)
    assert out["flip"] is True and out["flip_direction"] == "horizontal"
    for idx, img in enumerate(out["imgs"]):
        np.testing.assert_array_equal(img, orig[idx][:, ::-1])
    # (10, 5, 30, 25) on w=60 -> (60-30, 5, 60-10, 25)
    np.testing.assert_allclose(out["detections"][0], [[30.0, 5.0, 50.0, 25.0]])


def test_flip_with_box_vertical():
    results = _clip_results()
    out = FlipWithBox(flip_ratio=1.0, direction="vertical")(results)
    # (10, 5, 30, 25) on h=40 -> (10, 40-25, 30, 40-5)
    np.testing.assert_allclose(out["detections"][0], [[10.0, 15.0, 30.0, 35.0]])


def test_flip_with_box_no_flip_keeps_everything():
    results = _clip_results()
    orig_boxes = [b.copy() for b in results["detections"]]
    orig = [img.copy() for img in results["imgs"]]
    out = FlipWithBox(flip_ratio=0.0)(results)
    assert out["flip"] is False
    for idx in range(len(orig)):
        np.testing.assert_array_equal(out["imgs"][idx], orig[idx])
        np.testing.assert_allclose(out["detections"][idx], orig_boxes[idx])


def test_flip_with_box_requires_rgb():
    results = _clip_results()
    results["modality"] = "Flow"
    with pytest.raises(AssertionError):
        FlipWithBox(flip_ratio=1.0)(results)
