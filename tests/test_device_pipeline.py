import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.data import native
from bdvcil_tpu.data.datasets import RawframeDataset, bg_extraction_tmf
from bdvcil_tpu.data.device_pipeline import FastBGMixLoader
from bdvcil_tpu.ops.augment import fused_train_augment
from tests.synthetic import make_rawframe_tree

needs_native = pytest.mark.skipif(not native.available(), reason="native decoder not built")


def test_fused_train_augment_math():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(2, 3, 8, 8, 3)).astype(np.uint8)
    bg = rng.integers(0, 255, size=(2, 8, 8, 3)).astype(np.uint8)
    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)

    out = np.asarray(
        fused_train_augment(
            jnp.asarray(imgs),
            jnp.asarray(bg),
            apply_bgmix=jnp.array([True, False]),
            flip=jnp.array([False, True]),
            alpha=0.5,
        )
    )
    norm = (imgs.astype(np.float32) - np.array(mean, np.float32)) / np.array(std, np.float32)
    norm_bg = (bg.astype(np.float32) - np.array(mean, np.float32)) / np.array(std, np.float32)
    # sample 0: blended, no flip
    want0 = norm[0] * 0.5 + norm_bg[0][None] * 0.5
    np.testing.assert_allclose(out[0], want0, atol=1e-5)
    # sample 1: flipped, not blended
    want1 = norm[1][:, :, ::-1, :]
    np.testing.assert_allclose(out[1], want1, atol=1e-5)


@pytest.fixture(scope="module")
def fast_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("fast")
    frames_root, train_ann, _ = make_rawframe_tree(
        root, num_classes=2, videos_per_class=3, num_frames=8, size=(256, 340)
    )
    ds = RawframeDataset(str(train_ann), [], data_prefix=str(frames_root))
    bg_dir = root / "bg"
    bg_dir.mkdir()
    bg_files = []
    for info in ds.video_infos:
        import pathlib

        dest = bg_dir / (pathlib.Path(info["frame_dir"]).name + ".jpg")
        bg_extraction_tmf(info["frame_dir"], dest)
        bg_files.append(str(dest))
    return ds, bg_files


@needs_native
def test_fast_loader_batches(fast_env):
    ds, bg_files = fast_env
    loader = FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=224,
        randaug_prob=0.5, seed=0,
    )
    batches = list(loader)
    assert len(batches) == 1  # 6 videos, drop_last
    b = batches[0]
    assert b["imgs_u8"].shape == (4, 4, 224, 224, 3)
    assert b["imgs_u8"].dtype == np.uint8
    assert b["bg_u8"].shape == (4, 224, 224, 3)
    assert b["label"].shape == (4, 1)
    assert b["apply_bgmix"].dtype == bool


@needs_native
def test_fast_loader_reproducible(fast_env):
    ds, bg_files = fast_env
    mk = lambda: FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, seed=3, randaug_prob=0.5
    )
    b1 = next(iter(mk()))
    b2 = next(iter(mk()))
    np.testing.assert_array_equal(b1["imgs_u8"], b2["imgs_u8"])
    np.testing.assert_array_equal(b1["apply_bgmix"], b2["apply_bgmix"])


@needs_native
def test_fast_path_train_step(fast_env):
    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.runtime import TrainState, make_train_step
    from tests.test_runtime import _opt_cfg
    from tests.test_models import tiny_model_cfg

    ds, bg_files = fast_env
    loader = FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=64,
        randaug_prob=0.5, seed=0,
    )
    spec = build_model(tiny_model_cfg(num_classes=2))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, 4, 64, 64, 3))
    tx = build_optimizer(variables["params"], _opt_cfg())
    state = TrainState.create(variables, tx)

    input_fn = lambda d: fused_train_augment(
        d["imgs_u8"], d["bg_u8"], d["apply_bgmix"], d["flip"], alpha=0.5
    )
    step = make_train_step(spec, tx, num_classes=2, method="base", input_fn=input_fn)
    batch = next(iter(loader))
    imgs = {k: batch[k] for k in ("imgs_u8", "bg_u8", "apply_bgmix", "flip")}
    state, metrics = step(state, None, imgs, batch["label"], {}, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@needs_native
def test_fast_path_with_device_randaug(fast_env):
    from bdvcil_tpu.data.device_pipeline import make_fast_input_fn

    ds, bg_files = fast_env
    loader = FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=64,
        randaug_prob=0.75, seed=1,
    )
    batch = next(iter(loader))
    assert "randaug_key" in batch and batch["apply_randaug"].dtype == bool
    # mutex invariant: randaug XOR bgmix per sample
    assert np.all(batch["apply_randaug"] != batch["apply_bgmix"])

    input_fn = make_fast_input_fn(alpha=0.5, with_randaug=True)
    imgs = {k: jnp.asarray(v) for k, v in batch.items() if k != "label"}
    out = np.asarray(input_fn(imgs))
    assert out.shape == (4, 4, 64, 64, 3)
    assert np.isfinite(out).all()


@needs_native
def test_fast_eval_loader_matches_host_pipeline(fast_env):
    """FastEvalLoader (native decode, uint8) must reproduce the standard val
    pipeline (cv2, normalized) within decoder tolerance."""
    from bdvcil_tpu.data import DataLoader
    from bdvcil_tpu.data.datasets import RawframeDataset
    from bdvcil_tpu.data.device_pipeline import FastEvalLoader
    from bdvcil_tpu.ops.augment import normalize_batch

    ds, _ = fast_env
    MEAN = [123.675, 116.28, 103.53]
    STD = [58.395, 57.12, 57.375]
    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=4, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    host_ds = RawframeDataset(ds.ann_file, val_pipeline, data_prefix=None, test_mode=True)
    host_ds.video_infos = ds.video_infos
    host_batch = next(iter(DataLoader(host_ds, batch_size=4, shuffle=False)))

    fast = FastEvalLoader(ds.video_infos, batch_size=4, num_segments=4, crop_size=224, short_side=256)
    fast_batch = next(iter(fast))
    assert fast_batch["imgs"].dtype == np.uint8
    fast_norm = np.asarray(normalize_batch(jnp.asarray(fast_batch["imgs"])))

    np.testing.assert_array_equal(host_batch["label"].reshape(-1), fast_batch["label"].reshape(-1))
    diff = np.abs(fast_norm - host_batch["imgs"])
    # decoder/resize rounding: bounded in normalized units (1 LSB ~ 0.018)
    assert diff.mean() < 0.05
    assert (diff < 0.2).mean() > 0.99


def test_fast_eval_params_detection():
    from bdvcil_tpu.cil.data_module import CILDataModule

    good = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[0], std=[1]),
    ]
    assert CILDataModule._fast_eval_params(good) == (8, 256, 224, False)

    tencrop = list(good)
    tencrop[3] = dict(type="TenCrop", crop_size=256)
    assert CILDataModule._fast_eval_params(tencrop) == (8, 256, 256, True)

    threecrop = list(good)
    threecrop[3] = dict(type="ThreeCrop", crop_size=256)
    assert CILDataModule._fast_eval_params(threecrop) is None

    train_mode = list(good)
    train_mode[0] = dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8)
    assert CILDataModule._fast_eval_params(train_mode) is None


@needs_native
def test_tencrop_fast_eval_matches_host(fast_env):
    """Native tencrop decode + device flip expansion must reproduce the host
    TenCrop pipeline within decoder tolerance."""
    from bdvcil_tpu.data import DataLoader, native
    from bdvcil_tpu.data.datasets import RawframeDataset
    from bdvcil_tpu.data.device_pipeline import FastEvalLoader
    from bdvcil_tpu.ops.augment import normalize_batch, tencrop_expand

    ds, _ = fast_env
    MEAN = [123.675, 116.28, 103.53]
    STD = [58.395, 57.12, 57.375]
    test_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=2, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="TenCrop", crop_size=224),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    host_ds = RawframeDataset(ds.ann_file, test_pipeline, data_prefix=None, test_mode=True)
    host_ds.video_infos = ds.video_infos[:2]
    host_batch = next(iter(DataLoader(host_ds, batch_size=2, shuffle=False)))
    assert host_batch["imgs"].shape == (2, 20, 224, 224, 3)

    fast = FastEvalLoader(
        ds.video_infos[:2], batch_size=2, num_segments=2, crop_size=224,
        short_side=256, tencrop=True,
    )
    fb = next(iter(fast))
    assert fb["imgs"].shape == (2, 2, 5, 224, 224, 3)
    expanded = tencrop_expand(jnp.asarray(fb["imgs"]))
    assert expanded.shape == (2, 20, 224, 224, 3)
    fast_norm = np.asarray(normalize_batch(expanded))
    diff = np.abs(fast_norm - host_batch["imgs"])
    assert diff.mean() < 0.05
    assert (diff < 0.2).mean() > 0.99
