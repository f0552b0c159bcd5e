"""Pallas temporal-shift kernel vs the XLA reference (interpret mode on CPU;
the same kernel compiles on real TPU — exercised by tools/check_tpu_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.ops.tsm_shift import temporal_shift, temporal_shift_pallas


def test_pallas_matches_xla_forward():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2 * 4, 4, 4, 16), dtype=np.float32))
    ref = temporal_shift(x, num_segments=4, shift_div=8)
    got = temporal_shift_pallas(x, num_segments=4, shift_div=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)


def test_pallas_custom_vjp_matches_xla_grad():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 2, 2, 8), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((8, 2, 2, 8), dtype=np.float32))

    def f_ref(x):
        return jnp.sum(temporal_shift(x, 4, 8) * ct)

    def f_pal(x):
        return jnp.sum(temporal_shift_pallas(x, 4, 8, True) * ct)

    g_ref = jax.grad(f_ref)(x)
    g_pal = jax.grad(f_pal)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=0, atol=0)
