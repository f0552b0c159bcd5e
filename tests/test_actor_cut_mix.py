import numpy as np
import pytest

from bdvcil_tpu.data import ActorCutMixDataset
from tests.synthetic import make_rawframe_tree


@pytest.fixture(scope="module")
def acm_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("acm")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=2, videos_per_class=2, num_frames=10, size=(80, 100)
    )
    # synthetic detections: one centered human box per frame, score 0.9;
    # frames are 1-indexed like start_index=1 sampling
    dets = {}
    for vdir in frames_root.iterdir():
        per_frame = {}
        for t in range(0, 12):
            per_frame[t] = np.array([[20.0, 15.0, 70.0, 65.0, 0.9]], dtype=np.float32)
        dets[vdir.name] = per_frame
    det_file = root / "dets.npy"
    np.save(det_file, dets, allow_pickle=True)
    return frames_root, train_ann, det_file


def test_acm_prob_one_composites(acm_tree):
    frames_root, train_ann, det_file = acm_tree
    ds = ActorCutMixDataset(
        str(train_ann), det_file=str(det_file), acm_prob=1.0, data_prefix=str(frames_root)
    )
    s = ds[0]
    assert s["imgs"].shape == (8, 3, 224, 224)  # NCHW out_pipeline
    assert 0.0 < float(s["foreground_ratio"]) <= 1.0
    assert s["background_label"].shape == (1,)
    assert s["label"].shape == (1,)


def test_acm_prob_zero_randaug_path(acm_tree):
    frames_root, train_ann, det_file = acm_tree
    ds = ActorCutMixDataset(
        str(train_ann), det_file=str(det_file), acm_prob=0.0, data_prefix=str(frames_root)
    )
    s = ds[0]
    assert float(s["foreground_ratio"]) == 1.0
    assert int(s["background_label"][0]) == -1


def test_acm_test_frames_raises(acm_tree):
    frames_root, train_ann, det_file = acm_tree
    ds = ActorCutMixDataset(
        str(train_ann), det_file=str(det_file), data_prefix=str(frames_root)
    )
    with pytest.raises(NotImplementedError):
        ds.prepare_test_frames(0)
