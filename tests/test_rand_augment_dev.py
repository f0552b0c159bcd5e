"""Device RandAugment ops vs the PIL host oracle (golden tests; geometric ops
allow a small boundary-pixel mismatch, color/LUT ops must be (near-)exact —
SURVEY.md §7 'hard parts': PIL-semantics parity)."""

import numpy as np
import PIL.ImageEnhance
import PIL.ImageOps
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from bdvcil_tpu.data import rand_augment as host_ra
from bdvcil_tpu.ops import rand_augment_dev as dev


def _img(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, size=3)
    img = np.clip(base[None, None] + rng.integers(0, 56, size=(h, w, 3)), 0, 255)
    return img.astype(np.uint8)


def _clip(n=2, seed=0):
    return np.stack([_img(seed + i) for i in range(n)], axis=0)


def _run(op_fn, clip, val=0.0, sign=False, loc=(0.0, 0.0)):
    out = op_fn(jnp.asarray(clip), jnp.float32(val), jnp.bool_(sign), tuple(map(jnp.float32, loc)))
    return np.asarray(out)


def _exact_fraction(a, b):
    return float((a == b).mean())


def test_solarize_exact():
    clip = _clip()
    got = _run(dev._op_solarize, clip, val=128)
    want = np.stack([np.array(PIL.ImageOps.solarize(Image.fromarray(f), 128)) for f in clip])
    np.testing.assert_array_equal(got, want)


def test_posterize_exact():
    clip = _clip()
    got = _run(dev._op_posterize, clip, val=4.0)
    want = np.stack([np.array(PIL.ImageOps.posterize(Image.fromarray(f), 4)) for f in clip])
    np.testing.assert_array_equal(got, want)


def test_autocontrast_exact():
    clip = _clip()
    got = _run(dev._op_autocontrast, clip)
    want = np.stack([np.array(PIL.ImageOps.autocontrast(Image.fromarray(f))) for f in clip])
    assert _exact_fraction(got, want) > 0.999


def test_equalize_exact():
    clip = _clip()
    got = _run(dev._op_equalize, clip)
    want = np.stack([np.array(PIL.ImageOps.equalize(Image.fromarray(f))) for f in clip])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("factor", [0.05, 0.5, 0.95])
def test_enhance_ops_close(factor):
    clip = _clip()
    for dev_op, pil_enh in [
        (dev._op_color, PIL.ImageEnhance.Color),
        (dev._op_contrast, PIL.ImageEnhance.Contrast),
        (dev._op_brightness, PIL.ImageEnhance.Brightness),
        (dev._op_sharpness, PIL.ImageEnhance.Sharpness),
    ]:
        got = _run(dev_op, clip, val=factor)
        want = np.stack(
            [np.array(pil_enh(Image.fromarray(f)).enhance(factor)) for f in clip]
        )
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 2, (dev_op.__name__, diff.max())
        assert (diff <= 1).mean() > 0.99, dev_op.__name__


@pytest.mark.parametrize(
    "dev_op,host_op,val",
    [
        (dev._shear_x, host_ra.shear_x, 0.3),
        (dev._shear_y, host_ra.shear_y, 0.3),
        (dev._translate_x, host_ra.translate_x, 0.3),
        (dev._translate_y, host_ra.translate_y, 0.3),
    ],
)
@pytest.mark.parametrize("sign", [False, True])
def test_geometric_ops_match(dev_op, host_op, val, sign):
    clip = _clip(n=1)
    got = _run(dev_op, clip, val=val, sign=sign)
    want = np.array(host_op(Image.fromarray(clip[0]), val, sign))
    assert _exact_fraction(got[0], want) > 0.97, dev_op.__name__


@pytest.mark.parametrize("sign", [False, True])
def test_rotate_close(sign):
    clip = _clip(n=1)
    got = _run(dev._op_rotate, clip, val=30.0, sign=sign)
    want = np.array(host_ra.rotate(Image.fromarray(clip[0]), 30.0, sign))
    assert _exact_fraction(got[0], want) > 0.95


def test_cutout_matches_host():
    clip = _clip(n=2)
    got = _run(dev._op_cutout, clip, val=20.0, loc=(30.0, 20.0))
    want = np.stack(
        [np.array(host_ra.cutout_abs(Image.fromarray(f), 20.0, (30.0, 20.0))) for f in clip]
    )
    np.testing.assert_array_equal(got, want)


def test_rand_augment_clip_consistency():
    """Identical frames must stay identical: all params shared per clip."""
    frame = _img(7)
    clip = np.stack([frame] * 4)
    out = np.asarray(dev.rand_augment_clip(jax.random.PRNGKey(0), jnp.asarray(clip), n=2, m=30))
    for i in range(1, 4):
        np.testing.assert_array_equal(out[0], out[i])


def test_rand_augment_batch_shapes_and_variety():
    clips = np.stack([_clip(2, seed=s) for s in range(4)])  # (4, 2, H, W, 3)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    out = np.asarray(dev.rand_augment_batch(keys, jnp.asarray(clips), n=2, m=10))
    assert out.shape == clips.shape and out.dtype == np.uint8
    # different keys -> (almost surely) different transforms
    changed = [not np.array_equal(out[i], clips[i]) for i in range(4)]
    assert any(changed)


def test_magnitude_table_matches_reference_formula():
    vals = dev.op_magnitudes(10)
    for (name, mn, mx), v in zip(dev.OP_TABLE, vals):
        assert abs(v - ((10 / 30) * (mx - mn) + mn)) < 1e-9


def test_rand_augment_batch_matches_per_clip_switch():
    """The TPU-restructured batch path (shared affine gather + photometric
    masked select) must be BIT-identical to the per-clip lax.switch oracle
    (rand_augment_clip) for the same keys."""
    rng = np.random.default_rng(7)
    clips = rng.integers(0, 256, (12, 3, 40, 48, 3), dtype=np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(123), 12)
    batch = np.asarray(dev.rand_augment_batch(keys, jnp.asarray(clips), n=2, m=10))
    per_clip = np.stack([
        np.asarray(dev.rand_augment_clip(keys[i], jnp.asarray(clips[i]), n=2, m=10))
        for i in range(12)
    ])
    np.testing.assert_array_equal(batch, per_clip)


def test_rand_augment_batch_equalize_bucket_overflow():
    """The equalize sub-batch bucket (_apply_selected_rows) must stay
    bit-identical to the per-clip oracle when MORE clips select equalize
    than the bucket capacity — exercising the lax.cond full-batch fallback.
    Keys are mined so that >capacity clips draw equalize in round 0."""
    b = 12
    cap = dev._bucket_capacity(b)
    keys = []
    k = jax.random.PRNGKey(0)
    while len(keys) <= cap:  # cap+1 equalize-selecting clips guarantee overflow
        k, cand = jax.random.split(k)
        k_ops, _, _, _ = jax.random.split(cand, 4)
        ops = jax.random.randint(k_ops, (2,), 0, dev.NUM_OPS)
        if int(ops[0]) == dev._EQUALIZE_ID:
            keys.append(cand)
    while len(keys) < b:  # fill the rest with arbitrary keys
        k, cand = jax.random.split(k)
        keys.append(cand)
    keys = jnp.stack(keys)

    rng = np.random.default_rng(3)
    clips = rng.integers(0, 256, (b, 2, 32, 36, 3), dtype=np.uint8)
    batch = np.asarray(dev.rand_augment_batch(keys, jnp.asarray(clips), n=2, m=10))
    per_clip = np.stack([
        np.asarray(dev.rand_augment_clip(keys[i], jnp.asarray(clips[i]), n=2, m=10))
        for i in range(b)
    ])
    np.testing.assert_array_equal(batch, per_clip)
