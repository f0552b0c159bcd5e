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


def test_tubemix_torch_mirrors_device_semantics():
    """tests/torch_cil_reference.tubemix_torch (the torch mini-reference's
    CPU tube-CutMix) must implement the same per-batch semantics as the
    device op: one box applied to every frame/channel, permutation mixing,
    lam recomputed from the clipped box area, identity when the prob draw
    fails."""
    import torch

    from tests.torch_cil_reference import tubemix_torch

    b, m, h, w = 4, 2, 16, 16
    x = torch.arange(b * m * 3 * h * w, dtype=torch.float32).reshape(b * m, 3, h, w)
    targets = torch.eye(b)

    # prob=0: identity, rng not consumed beyond the gate draw
    out_x, out_t = tubemix_torch(
        np.random.default_rng(0), x, targets, m, alpha=1.0, prob=0.0
    )
    assert torch.equal(out_x, x) and torch.equal(out_t, targets)

    out_x, out_t = tubemix_torch(
        np.random.default_rng(1), x.clone(), targets, m, alpha=1.0, prob=1.0
    )
    # soft targets stay a convex mix: rows sum to 1, exactly two source rows
    np.testing.assert_allclose(out_t.sum(-1).numpy(), 1.0, rtol=1e-6)
    # recover lam from the targets of a clip whose permuted partner differs
    diff = (out_x != x).reshape(b, m, 3, h, w)
    # the swapped region is the SAME box on every frame and channel (a tube)
    box_mask = diff.any(dim=(1, 2))  # (b, h, w)
    per_frame = diff.any(dim=2)  # (b, m, h, w)
    for fi in range(m):
        np.testing.assert_array_equal(per_frame[:, fi].numpy(), box_mask.numpy())
    # lam in the mixed targets equals 1 - box_area/(h*w) for mixed rows
    mixed_rows = [i for i in range(b) if not torch.equal(out_t[i], targets[i])]
    assert mixed_rows, "perm mixed at least one row for this seed"
    for i in mixed_rows:
        # read lam at the ORIGINAL class's coefficient — max() only equals
        # lam when lam >= 0.5, which is a property of this seed's box draw,
        # not of the op (a clipped box covering more than half the frame
        # gives lam < 0.5 and max() = 1 - lam)
        lam_t = out_t[i][targets[i].argmax()].item()
        area = box_mask[i].sum().item()
        np.testing.assert_allclose(lam_t, 1.0 - area / (h * w), rtol=1e-5)
