#!/usr/bin/env python
"""Compile-and-compare the Pallas kernels on the real TPU chip.

Run on TPU hardware (not under the CPU test conftest):
    python tools/check_tpu_kernels.py
Verifies temporal_shift_pallas (fwd + custom VJP) against the XLA reference
and times both variants at backbone-realistic shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.ops.tsm_shift import temporal_shift, temporal_shift_pallas


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # correctness at small shape
    x = jnp.asarray(rng.standard_normal((2 * 8, 16, 16, 64), dtype=np.float32))
    ref = temporal_shift(x, num_segments=8)
    got = temporal_shift_pallas(x, num_segments=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    g_ref = jax.grad(lambda v: jnp.sum(temporal_shift(v, 8) ** 2))(x)
    g_pal = jax.grad(lambda v: jnp.sum(temporal_shift_pallas(v, 8) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref))
    print("correctness: OK (fwd + vjp)")

    # timing at a layer2-realistic shape: (N*T, H, W, C) = (64, 28, 28, 512)
    big = jnp.asarray(rng.standard_normal((8 * 8, 28, 28, 512), dtype=np.float32))
    xla_fn = jax.jit(lambda v: temporal_shift(v, 8))
    pal_fn = jax.jit(lambda v: temporal_shift_pallas(v, 8))
    for name, fn in (("xla", xla_fn), ("pallas", pal_fn)):
        fn(big).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(100):
            out = fn(big)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 100
        gbps = big.size * 4 * 2 / dt / 1e9
        print(f"{name}: {dt*1e6:.1f} us/call ({gbps:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
