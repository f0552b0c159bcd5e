"""Fast ActorCutMix input path (data/device_pipeline.FastACMLoader +
ops/augment.acm_composite) against the host reference semantics
(bdvcil_tpu/data/box.py == reference libs/pipelines/box.py, and
datasets.ActorCutMixDataset == reference actor_cut_mix_loader.py)."""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from bdvcil_tpu.data.box import (
    ActorCutOut,
    BuildHumanMask,
    DetectionLoad,
    FlipWithBox,
    ResizeWithBox,
    SceneCutOut,
)
from bdvcil_tpu.data.device_pipeline import (
    FastACMLoader,
    _rasterized_union_area,
    make_fast_acm_input_fn,
    resized_dims,
    transform_acm_boxes,
)
from bdvcil_tpu.ops.augment import acm_composite, boxes_union_mask


def _rand_boxes(rng, n, h, w):
    x0 = rng.uniform(0, w - 2, n)
    y0 = rng.uniform(0, h - 2, n)
    x1 = x0 + rng.uniform(1, w / 2, n)
    y1 = y0 + rng.uniform(1, h / 2, n)
    return np.stack([x0, y0, np.minimum(x1, w), np.minimum(y1, h)], -1).astype(np.float32)


def test_boxes_union_mask_matches_numpy_slicing():
    """Device rasterization == the reference's numpy slice fill
    (box.py BuildHumanMask:97-99): int truncation, half-open."""
    rng = np.random.default_rng(0)
    h, w = 37, 45
    boxes = _rand_boxes(rng, 5, h, w)
    ref = np.zeros((h, w), bool)
    for x0, y0, x1, y1 in boxes.astype(int):
        ref[y0:y1, x0:x1] = True
    dev = np.asarray(boxes_union_mask(jnp.asarray(boxes), h, w))
    np.testing.assert_array_equal(dev, ref)
    assert _rasterized_union_area(boxes, h, w) == int(ref.sum())
    # padding boxes contribute nothing
    padded = np.concatenate([boxes, np.zeros((3, 4), np.float32)])
    np.testing.assert_array_equal(np.asarray(boxes_union_mask(jnp.asarray(padded), h, w)), ref)


def test_acm_composite_matches_host_ops():
    """Full composite vs the reference op chain run through our host
    transforms (BuildHumanMask -> SceneCutOut on actor / ActorCutOut on
    scene -> actor*mask + scene*(1-mask); actor_cut_mix_loader.py:117-133)."""
    rng = np.random.default_rng(1)
    b, t, h, w = 3, 2, 33, 41
    actor = rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8)
    scene = rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8)
    k = 4
    actor_boxes = np.zeros((b, t, k, 4), np.float32)
    scene_boxes = np.zeros((b, t, k, 4), np.float32)
    full_mask = np.zeros(b, bool)
    # row 0: boxes on both sides; row 1: actor has NO dets (full mask);
    # row 2: scene has no dets
    for fi in range(t):
        actor_boxes[0, fi, :2] = _rand_boxes(rng, 2, h, w)
        scene_boxes[0, fi, :1] = _rand_boxes(rng, 1, h, w)
        actor_boxes[2, fi, :1] = _rand_boxes(rng, 1, h, w)
    full_mask[1] = True

    out = np.asarray(
        acm_composite(
            jnp.asarray(actor), jnp.asarray(scene),
            jnp.asarray(actor_boxes), jnp.asarray(scene_boxes),
            jnp.asarray(full_mask),
        )
    )

    for row in range(b):
        for fi in range(t):
            a_dets = actor_boxes[row, fi][(actor_boxes[row, fi][:, 2] > 0)]
            s_dets = scene_boxes[row, fi][(scene_boxes[row, fi][:, 2] > 0)]
            mask = np.zeros((h, w, 3), np.uint8)
            if full_mask[row]:
                mask[:] = 1
            else:
                for x0, y0, x1, y1 in a_dets.astype(int):
                    mask[y0:y1, x0:x1] = 1
            sc = scene[row, fi].copy()
            for x0, y0, x1, y1 in s_dets.astype(int):
                sc[y0:y1, x0:x1] = 127
            ref = actor[row, fi] * mask + sc * (1 - mask)
            np.testing.assert_array_equal(out[row, fi], ref)


def test_transform_acm_boxes_matches_host_pipeline():
    """Box geometry chain == ResizeWithBox(-1,256) -> FlipWithBox ->
    ResizeWithBox((224,224)) run through the host transforms."""
    rng = np.random.default_rng(2)
    orig_w, orig_h = 320, 240
    for flip in (False, True):
        dets = _rand_boxes(rng, 4, orig_h, orig_w)
        # host chain: the transforms operate on a results dict
        imgs = [np.zeros((orig_h, orig_w, 3), np.uint8)]
        results = {
            "imgs": imgs,
            "img_shape": (orig_h, orig_w),
            "detections": [dets.copy()],
            "modality": "RGB",
            "rng": np.random.default_rng(5),
        }
        results = ResizeWithBox(scale=(-1, 256), keep_ratio=True)(results)
        # force the flip decision deterministically
        results = FlipWithBox(flip_ratio=1.0 if flip else 0.0)(results)
        results = ResizeWithBox(scale=(224, 224), keep_ratio=False)(results)
        host = results["detections"][0]

        fast = transform_acm_boxes(dets, orig_w, orig_h, 256, 224, flip)
        np.testing.assert_allclose(fast, host, rtol=0, atol=0)


def _make_acm_tree(root, num_videos=6, num_frames=6, size=(48, 64)):
    import cv2

    h, w = size
    rng = np.random.default_rng(0)
    infos = []
    for v in range(num_videos):
        vdir = root / f"v{v}"
        vdir.mkdir(parents=True, exist_ok=True)
        base = rng.integers(0, 200, 3)
        for t in range(1, num_frames + 1):
            img = np.clip(base + rng.integers(0, 55, (h, w, 3)), 0, 255).astype(np.uint8)
            cv2.imwrite(str(vdir / f"img_{t:05}.jpg"), img)
        # detections: frames indexed 1-based (start_index), each with 1-2 boxes
        dets = {
            fi: [
                [float(rng.uniform(0, w / 2)), float(rng.uniform(0, h / 2)),
                 float(rng.uniform(w / 2, w)), float(rng.uniform(h / 2, h)),
                 float(rng.uniform(0.5, 1.0))]
                for _ in range(int(rng.integers(1, 3)))
            ]
            for fi in range(1, num_frames + 1)
        }
        if v == 3:  # one video with no confident detections
            dets = {fi: [[1.0, 1.0, 5.0, 5.0, 0.1]] for fi in range(1, num_frames + 1)}
        infos.append(
            dict(frame_dir=str(vdir), total_frames=num_frames, label=v % 3,
                 all_detections=dets)
        )
    return infos


def test_fast_acm_loader_end_to_end(tmp_path):
    """Loader emits consistent batches: ACM rows carry scene labels +
    box-derived foreground ratios; composited pixels obey the mask algebra;
    non-ACM rows are randaug-marked with fg_ratio 1 / bg_label -1."""
    pytest.importorskip("cv2")
    from bdvcil_tpu.data import native

    if not native.available():
        pytest.skip("native decoder unavailable")

    infos = _make_acm_tree(tmp_path)
    loader = FastACMLoader(
        infos, batch_size=4, num_segments=4, crop_size=32, acm_prob=0.5,
        seed=0, drop_last=True, process_index=0, process_count=1,
    )
    n_acm = n_ra = 0
    for epoch in range(3):
        loader.set_epoch(epoch)
        for batch in loader:
            b = batch["imgs_u8"].shape[0]
            assert batch["imgs_u8"].shape == (4, 4, 32, 32, 3)
            assert batch["scene_u8"].shape == (4, 4, 32, 32, 3)
            # max_boxes auto-sizes to the corpus's densest frame (2 here)
            assert loader.max_boxes == 2
            assert batch["actor_boxes"].shape == (4, 4, loader.max_boxes, 4)
            np.testing.assert_array_equal(batch["apply_randaug"], ~batch["apply_acm"])
            for row in range(b):
                if batch["apply_acm"][row]:
                    n_acm += 1
                    assert batch["background_label"][row, 0] >= 0
                    assert 0.0 <= batch["foreground_ratio"][row] <= 1.0
                    if not batch["actor_full_mask"][row]:
                        # fg ratio equals the rasterized union of the emitted boxes
                        area = sum(
                            _rasterized_union_area(batch["actor_boxes"][row, fi], 32, 32)
                            for fi in range(4)
                        )
                        assert abs(batch["foreground_ratio"][row] - area / (4 * 32 * 32)) < 1e-6
                else:
                    n_ra += 1
                    assert batch["background_label"][row, 0] == -1
                    assert batch["foreground_ratio"][row] == 1.0
                    assert not batch["actor_flip"][row] and not batch["scene_flip"][row]
    assert n_acm > 0 and n_ra > 0

    # determinism: same (seed, epoch) -> identical batch
    loader.set_epoch(1)
    first = next(iter(loader))
    loader.set_epoch(1)
    again = next(iter(loader))
    for key in first:
        np.testing.assert_array_equal(first[key], again[key])


def test_fast_acm_input_fn_compositing(tmp_path):
    """Device input_fn output: ACM rows equal the composite of the flipped
    clips under the emitted masks (inverting the normalize)."""
    pytest.importorskip("cv2")
    from bdvcil_tpu.data import native

    if not native.available():
        pytest.skip("native decoder unavailable")

    infos = _make_acm_tree(tmp_path)
    loader = FastACMLoader(
        infos, batch_size=4, num_segments=4, crop_size=32, acm_prob=1.0,
        seed=1, drop_last=True, process_index=0, process_count=1,
    )
    batch = next(iter(loader))
    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)
    input_fn = make_fast_acm_input_fn(mean=mean, std=std)
    out = np.asarray(input_fn({k: jnp.asarray(v) for k, v in batch.items()
                               if k not in ("label", "foreground_ratio", "background_label")}))
    # invert normalize -> uint8
    u8 = np.clip(np.round(out * np.array(std) + np.array(mean)), 0, 255).astype(np.uint8)

    for row in range(4):
        actor = batch["imgs_u8"][row]
        scene = batch["scene_u8"][row]
        if batch["actor_flip"][row]:
            actor = actor[:, :, ::-1, :]
        if batch["scene_flip"][row]:
            scene = scene[:, :, ::-1, :]
        for fi in range(4):
            mask = np.zeros((32, 32), bool)
            if batch["actor_full_mask"][row]:
                mask[:] = True
            else:
                for x0, y0, x1, y1 in batch["actor_boxes"][row, fi].astype(int):
                    mask[y0:y1, x0:x1] = True
            sc = scene[fi].copy()
            for x0, y0, x1, y1 in batch["scene_boxes"][row, fi].astype(int):
                sc[y0:y1, x0:x1] = 127
            ref = np.where(mask[..., None], actor[fi], sc)
            np.testing.assert_array_equal(u8[row, fi], ref)


def test_fast_acm_yuv_wire_matches_rgb(tmp_path):
    """YUV420 wire for the ACM family: with acm_prob=1 every clip decodes at
    identity geometry (source size == crop), where the device reconstruction
    (ops/augment.yuv420_to_rgb) replays the exact libjpeg chain the RGB wire
    decodes with — so the jitted input_fn outputs must be bit-identical
    across wire formats, and all non-pixel metadata must match (the wire
    format never touches the rng draws)."""
    pytest.importorskip("cv2")
    from bdvcil_tpu.data import native

    if not (native.available() and native.has_yuv420()):
        pytest.skip("native decoder without yuv420 kernel")

    infos = _make_acm_tree(tmp_path, size=(32, 32))

    def make(wire, prob):
        loader = FastACMLoader(
            infos, batch_size=4, num_segments=4, crop_size=32, acm_prob=prob,
            seed=2, drop_last=True, process_index=0, process_count=1,
            wire_format=wire,
        )
        return loader, next(iter(loader))

    _, b_rgb = make("rgb", 1.0)
    _, b_yuv = make("yuv420", 1.0)
    assert "imgs_y" in b_yuv and "scene_y" in b_yuv
    for k in b_rgb:
        if k not in ("imgs_u8", "scene_u8"):
            np.testing.assert_array_equal(b_rgb[k], b_yuv[k])

    strip = ("label", "foreground_ratio", "background_label")
    out_rgb = np.asarray(
        make_fast_acm_input_fn(wire_format="rgb")(
            {k: jnp.asarray(v) for k, v in b_rgb.items() if k not in strip}
        )
    )
    out_yuv = np.asarray(
        make_fast_acm_input_fn(wire_format="yuv420")(
            {k: jnp.asarray(v) for k, v in b_yuv.items() if k not in strip}
        )
    )
    np.testing.assert_array_equal(out_rgb, out_yuv)

    # mixed acm/randaug batch (MSC-resized non-ACM rows are not identity
    # geometry): metadata still matches exactly across wires
    _, m_rgb = make("rgb", 0.5)
    _, m_yuv = make("yuv420", 0.5)
    for k in m_rgb:
        if k not in ("imgs_u8", "scene_u8"):
            np.testing.assert_array_equal(m_rgb[k], m_yuv[k])


def test_fast_acm_planes_wire_bit_identical_to_yuv420(tmp_path):
    """'planes' wire for the ACM family: BOTH streams ship stored-resolution
    planes + per-clip taps, the device resizes on the MXU
    (ops/augment.resize_plane_bilinear_taps is bit-identical to the host
    windowed resize), so the jitted input_fn output must equal the yuv420
    wire exactly — on a mixed batch exercising anisotropic ACM resizes
    ((64,48)->(32,32)), MSC-geometry non-ACM rows, scene rows, and
    scene-less rows (zero planes + identity taps)."""
    import jax

    pytest.importorskip("cv2")
    from bdvcil_tpu.data import native

    if not (native.available() and native.has_fetch_planes() and native.has_yuv420()):
        pytest.skip("native decoder without fetch_planes kernel")

    infos = _make_acm_tree(tmp_path, size=(48, 64))

    def make(wire, prob, epoch=0):
        loader = FastACMLoader(
            infos, batch_size=4, num_segments=4, crop_size=32, acm_prob=prob,
            seed=2, drop_last=True, process_index=0, process_count=1,
            wire_format=wire,
        )
        loader._prepare_iteration()
        loader.set_epoch(epoch)
        return loader, next(iter(loader))

    strip = ("label", "foreground_ratio", "background_label")
    for prob in (1.0, 0.5, 0.0):
        _, b_yuv = make("yuv420", prob)
        loader_pl, b_pl = make("planes", prob)
        assert "imgs_taps_y" in b_pl and "scene_taps_y" in b_pl
        # non-pixel metadata is wire-independent (same rng stream)
        for k in b_yuv:
            if k not in ("imgs_y", "imgs_c", "scene_y", "scene_c"):
                np.testing.assert_array_equal(b_yuv[k], b_pl[k])
        out_yuv = np.asarray(
            jax.jit(make_fast_acm_input_fn(wire_format="yuv420"))(
                {k: jnp.asarray(v) for k, v in b_yuv.items() if k not in strip}
            )
        )
        out_pl = np.asarray(
            jax.jit(make_fast_acm_input_fn(wire_format="planes"))(
                {k: jnp.asarray(v) for k, v in b_pl.items() if k not in strip}
            )
        )
        np.testing.assert_array_equal(out_yuv, out_pl)


@pytest.mark.slow
def test_cil_acm_fast_path_e2e(tmp_path_factory):
    """Full CILTrainer run over the ActorCutMix family with
    use_fast_input_pipeline=True: the trainer must select FastACMLoader
    (cil/trainer._fast_acm_loader) and train end to end with
    foreground_ratio/background_label flowing into acm_smooth_targets."""
    from bdvcil_tpu.cil import CILTrainer
    from bdvcil_tpu.config import Config
    from tests.synthetic import make_rawframe_tree
    from tests.test_cil_e2e import make_acm_cil_config

    root = tmp_path_factory.mktemp("acm_fast")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=3, videos_per_class=2, num_frames=10, size=(240, 320)
    )
    dets = {}
    for vdir in frames_root.iterdir():
        dets[vdir.name] = {
            t: np.array([[40.0, 30.0, 200.0, 170.0, 0.9]], dtype=np.float32)
            for t in range(0, 12)
        }
    det_file = root / "dets.npy"
    np.save(det_file, dets, allow_pickle=True)

    work_dir = tmp_path_factory.mktemp("work_acm_fast")
    cfg = Config.fromdict(
        make_acm_cil_config(frames_root, train_ann, val_ann, det_file, work_dir,
                            use_fast_input_pipeline=True)
    )
    trainer = CILTrainer(cfg)
    loader, input_fn = trainer._try_fast_loader()
    assert type(loader).__name__ == "FastACMLoader" and input_fn is not None
    trainer.train()
    assert (work_dir / "ckpt" / "ckpt_task_1.msgpack").exists()

    # the ACM dataset hardcodes num_clips=8 (reference
    # actor_cut_mix_loader.py:39-103); a model spec with a different
    # num_segments must DECLINE the fast path (the host path keeps the
    # dataset's own sampling), not drive the fast loader at spec segments
    cfg4 = Config.fromdict(
        make_acm_cil_config(frames_root, train_ann, val_ann, det_file,
                            tmp_path_factory.mktemp("work_acm_seg4"),
                            use_fast_input_pipeline=True)
    )
    cfg4.model.backbone.num_segments = 4
    cfg4.model.cls_head.num_segments = 4
    trainer4 = CILTrainer(cfg4, dump_config=False)
    loader4, input_fn4 = trainer4._try_fast_loader()
    assert loader4 is None and input_fn4 is None


def test_fast_acm_loader_zero_based_frames_and_dense_boxes(tmp_path):
    """Regression (round-3 review): the loader honors non-default
    filename_tmpl/start_index (0-based rawframe layouts must not probe a
    missing last frame or read off-by-one detections), and max_boxes
    auto-sizes past the old hard cap of 10 so no detection is silently
    dropped from masks or foreground_ratio."""
    pytest.importorskip("cv2")
    import cv2

    from bdvcil_tpu.data import native

    if not native.available():
        pytest.skip("native decoder unavailable")

    rng = np.random.default_rng(0)
    h, w, num_frames = 48, 64, 5
    vdir = tmp_path / "v0"
    vdir.mkdir(parents=True)
    for t in range(0, num_frames):  # 0-based, custom template
        img = np.clip(100 + rng.integers(0, 55, (h, w, 3)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(vdir / f"frame_{t:03}.jpg"), img)
    # frame 0 has 12 confident detections (old cap was 10)
    dets = {fi: [[1.0, 1.0, 6.0, 6.0, 0.9]] for fi in range(num_frames)}
    dets[0] = [
        [float(x), 1.0, float(x + 3), 6.0, 0.9] for x in range(1, 48, 4)
    ]
    infos = [dict(frame_dir=str(vdir), total_frames=num_frames, label=0,
                  all_detections=dets)]

    loader = FastACMLoader(
        infos, batch_size=1, num_segments=num_frames, crop_size=32,
        acm_prob=1.0, filename_tmpl="frame_{:03}.jpg", start_index=0,
        seed=0, drop_last=False, pad_to_batch=False,
        process_index=0, process_count=1,
    )
    assert loader.max_boxes == 12
    # num_segments == total_frames -> every frame (incl. 0 and last) decodes
    batch = next(iter(loader))
    assert batch["imgs_u8"].shape == (1, num_frames, 32, 32, 3)
    assert batch["actor_boxes"].shape == (1, num_frames, 12, 4)
    # all 12 boxes of frame 0 survive into the tensor (none truncated)
    n_emitted = (batch["actor_boxes"][0, 0].sum(axis=-1) > 0).sum()
    assert n_emitted == 12


def test_trainer_forwards_frame_layout_to_fast_loaders(tmp_path_factory):
    """cil/trainer must pass the dataset's filename_tmpl/start_index through
    to both fast loaders (round-3 review finding)."""
    from bdvcil_tpu.cil import CILTrainer
    from bdvcil_tpu.config import Config
    from bdvcil_tpu.data import native
    from tests.test_cil_e2e import make_acm_cil_config

    if not native.available():
        pytest.skip("native decoder unavailable")
    pytest.importorskip("cv2")
    import cv2

    root = tmp_path_factory.mktemp("acm_layout")
    frames_root = root / "rawframes"
    rng = np.random.default_rng(1)
    lines = []
    for v in range(6):
        vdir = frames_root / f"v{v}"
        vdir.mkdir(parents=True)
        for t in range(0, 6):
            img = np.clip(90 + rng.integers(0, 60, (48, 64, 3)), 0, 255).astype(np.uint8)
            cv2.imwrite(str(vdir / f"f_{t:04}.jpg"), img)
        lines.append(f"v{v} 6 {v % 3}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    (root / "val.txt").write_text("\n".join(lines) + "\n")
    dets = {f"v{v}": {t: np.array([[2.0, 2.0, 30.0, 30.0, 0.9]], np.float32)
                      for t in range(6)} for v in range(6)}
    det_file = root / "dets.npy"
    np.save(det_file, dets, allow_pickle=True)

    work_dir = tmp_path_factory.mktemp("work_acm_layout")
    cfg_dict = make_acm_cil_config(
        frames_root, root / "train.txt", root / "val.txt", det_file, work_dir,
        use_fast_input_pipeline=True,
    )
    for split in ("train", "val", "test", "features_extraction", "exemplar"):
        cfg_dict["data"][split]["filename_tmpl"] = "f_{:04}.jpg"
        cfg_dict["data"][split]["start_index"] = 0
    trainer = CILTrainer(Config.fromdict(cfg_dict))
    loader, input_fn = trainer._try_fast_loader()
    assert type(loader).__name__ == "FastACMLoader"
    assert loader.filename_tmpl == "f_{:04}.jpg" and loader.start_index == 0
    # a batch decodes without probing a nonexistent 1-based frame
    # (pixel key depends on the resolved wire format — the trainer defaults
    # to 'auto', i.e. yuv420 when the native kernel is present)
    batch = next(iter(loader))
    pixel_key = "imgs_y" if loader.wire_format == "yuv420" else "imgs_u8"
    assert batch[pixel_key].dtype == np.uint8
