import numpy as np

from bdvcil_tpu.data.sampling import SampleFrames


def test_test_mode_centers():
    # 8 segments of 1 frame over 80 frames: centers of each 10-frame segment
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=8, test_mode=True)
    inds = sf.sample(80)
    assert inds.tolist() == [5, 15, 25, 35, 45, 55, 65, 75]


def test_test_mode_short_video_loops():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=8, test_mode=True)
    inds = sf.sample(3)
    assert len(inds) == 8
    assert inds.max() < 3 and inds.min() >= 0


def test_train_mode_within_segments():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=8)
    rng = np.random.default_rng(0)
    for total in (80, 33, 9, 8):
        inds = sf.sample(total, rng)
        assert len(inds) == 8
        avg = (total - 1 + 1) // 8
        if avg > 0:
            base = np.arange(8) * avg
            assert np.all(inds >= base) and np.all(inds < base + avg)


def test_train_mode_tiny_video():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=8)
    rng = np.random.default_rng(0)
    inds = sf.sample(2, rng)  # fewer frames than clips
    assert len(inds) == 8
    assert inds.max() < 2


def test_pipeline_protocol_start_index():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=4, test_mode=True)
    results = {"total_frames": 40, "start_index": 1}
    out = sf(results)
    assert out["frame_inds"].tolist() == [6, 16, 26, 36]
    assert out["num_clips"] == 4 and out["clip_len"] == 1


def test_deterministic_with_same_rng():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=8)
    a = sf.sample(50, np.random.default_rng(7))
    b = sf.sample(50, np.random.default_rng(7))
    assert np.array_equal(a, b)


def test_twice_sample():
    sf = SampleFrames(clip_len=1, frame_interval=1, num_clips=4, test_mode=True, twice_sample=True)
    inds = sf.sample(40)
    assert len(inds) == 8
    assert inds[:4].tolist() == [5, 15, 25, 35]
    assert inds[4:].tolist() == [0, 10, 20, 30]
