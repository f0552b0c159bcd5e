"""Exact-equivalence tests for the whole-block fused bottleneck probe
(ops/block_fused.py) against the plain-XLA reference schedule, in Pallas
interpret mode on CPU.

The fused schedule must compute the SAME function as the XLA block the
flax backbone runs (train-mode batch-stats BN, bf16 storage, f32
statistics): same conv geometry ('SAME' 3x3, 'VALID' 1x1), statistics on
the rounded bf16 conv outputs, normalize+relu in f32 before the bf16 cast
feeding the next conv. Reductions are tiled differently (per-row-tile f32
partials vs XLA's flat reduce), so stats match to f32-reassociation
tolerance rather than bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.ops.block_fused import (
    conv1x1_stats,
    fused_bottleneck_fwd,
    make_params,
    xla_bottleneck_fwd,
)


@pytest.fixture(scope="module")
def case():
    key = jax.random.PRNGKey(0)
    p = make_params(key, c=64, cm=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 14, 14, 64), jnp.bfloat16)
    return x, p


def test_conv1x1_stats_matches_xla(case):
    x, p = case
    w = p.w1.reshape(64, 16).astype(x.dtype)
    y, s1, s2 = conv1x1_stats(x, w, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, p.w1.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
    rf = np.asarray(ref, np.float32)
    np.testing.assert_allclose(np.asarray(s1), rf.sum((0, 1, 2)), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (rf * rf).sum((0, 1, 2)), rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("variant", ["taps", "im2col"])
def test_fused_block_matches_xla_block(case, variant):
    x, p = case
    out_f, stats_f = fused_bottleneck_fwd(x, p, interpret=True, conv3x3_variant=variant)
    out_x, stats_x = xla_bottleneck_fwd(x, p)
    # bf16 outputs: identical math modulo f32-reduction reassociation in the
    # BN statistics -> allow 1 ulp of bf16 on the activations
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    for (mf, vf), (mx, vx) in zip(stats_f, stats_x):
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mx), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-4, atol=1e-4)


def test_fused_block_odd_row_count():
    # row counts that don't divide the preferred tile still work (tile
    # search degrades to a divisor)
    key = jax.random.PRNGKey(2)
    p = make_params(key, c=32, cm=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 7, 7, 32), jnp.bfloat16)
    out_f, _ = fused_bottleneck_fwd(x, p, interpret=True)
    out_x, _ = xla_bottleneck_fwd(x, p)
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-2,
    )
