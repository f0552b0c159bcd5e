import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.ops.augment import (
    background_blend,
    normalize_batch,
    rand_bbox,
    temporal_median,
    tubemix,
)


def test_normalize_batch_dtype_and_values():
    imgs = np.full((1, 2, 4, 4, 3), 128, np.uint8)
    out = np.asarray(normalize_batch(jnp.asarray(imgs)))
    want = (128 - np.array([123.675, 116.28, 103.53])) / np.array([58.395, 57.12, 57.375])
    np.testing.assert_allclose(out[0, 0, 0, 0], want, rtol=1e-5)
    out_bf16 = normalize_batch(jnp.asarray(imgs), dtype=jnp.bfloat16)
    assert out_bf16.dtype == jnp.bfloat16


def test_background_blend_mask():
    imgs = jnp.ones((2, 3, 4, 4, 3))
    bg = jnp.zeros((2, 4, 4, 3))
    out = np.asarray(background_blend(imgs, bg, 0.5, apply_mask=jnp.array([True, False])))
    np.testing.assert_allclose(out[0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


def test_rand_bbox_area_and_bounds():
    for lam in (0.2, 0.5, 0.9):
        x1, y1, x2, y2 = rand_bbox(jax.random.PRNGKey(0), 64, 64, jnp.float32(lam))
        x1, y1, x2, y2 = map(int, (x1, y1, x2, y2))
        assert 0 <= x1 <= x2 <= 64 and 0 <= y1 <= y2 <= 64


def test_tubemix_applies_and_mixes_labels():
    key = jax.random.PRNGKey(3)
    imgs = jnp.stack([jnp.zeros((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3))])
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out_imgs, out_targets = tubemix(key, imgs, targets, alpha=1.0, prob=1.0)
    out_targets = np.asarray(out_targets)
    # soft targets sum to 1 and lambda consistent with box area
    np.testing.assert_allclose(out_targets.sum(-1), 1.0, rtol=1e-6)
    # same box swapped across all frames of a clip (tube): frames identical
    oi = np.asarray(out_imgs)
    np.testing.assert_array_equal(oi[0, 0], oi[0, 1])


def test_tubemix_prob_zero_identity():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (2, 2, 8, 8, 3))
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out_imgs, out_targets = tubemix(key, imgs, targets, alpha=1.0, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out_imgs), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out_targets), np.asarray(targets))


def test_temporal_median_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(7, 6, 5, 3)).astype(np.uint8)
    got = np.asarray(temporal_median(jnp.asarray(frames)))
    want = np.median(frames.astype(np.float32), axis=0)
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
