#!/usr/bin/env python
"""Microbenchmark: Pallas bf16 GEMM with BN-stats epilogue vs XLA dot + stats.

The R50 bottleneck's 1x1 convs are plain GEMMs whose outputs immediately
feed BatchNorm; XLA runs the conv and a separate convert_reduce_fusion pass
that re-reads the full output from HBM for the statistics (PERF_NOTES "Step
profile": ~35% of the train step). A Pallas GEMM that emits per-channel
partial sums while the output tile is still in registers/VMEM removes that
pass. This tool measures both on the real chip across the R50 1x1 shapes.

Timing methodology: dependency-chained iterations (the tunneled transport
pools independent dispatches; see bench.py caveats).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.ops.conv1x1_bn import gemm_with_stats

# (M, K, N): M = batch16 x 8seg x H x W rows at each stage resolution
SHAPES = [
    (128 * 56 * 56, 256, 64),    # stage1 conv1
    (128 * 56 * 56, 64, 256),    # stage1 conv3
    (128 * 28 * 28, 512, 128),   # stage2 conv1
    (128 * 28 * 28, 128, 512),   # stage2 conv3
    (128 * 14 * 14, 1024, 256),  # stage3 conv1
    (128 * 14 * 14, 256, 1024),  # stage3 conv3
    (128 * 7 * 7, 2048, 512),    # stage4 conv1
    (128 * 7 * 7, 512, 2048),    # stage4 conv3
]


def xla_ref(x, w):
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def bench(fn, x, w, iters=50):
    # loop ON DEVICE inside one jit: the tunneled transport adds ~tens of ms
    # per host dispatch, so host-side chaining measures latency, not compute
    @jax.jit
    def run(x, w):
        def body(_, carry):
            xc, acc = carry
            y, s1, s2 = fn(xc, w)
            # data-depend the next iteration on this one's outputs
            bump = (s1[0] * 1e-20 + y[0, 0].astype(jnp.float32) * 1e-20).astype(xc.dtype)
            return (xc + bump, acc + s2[0])
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))

    out = run(x, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x, w)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print(f"{'shape':>28} {'xla_ms':>8} {'pallas_ms':>9} {'speedup':>8} {'max_err':>9}")
    for m, k, n in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)

        y0, s1_0, s2_0 = jax.jit(xla_ref)(x, w)
        y1, s1_1, s2_1 = jax.jit(gemm_with_stats)(x, w)
        err_y = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
        # stats compare against f32 recompute of the bf16 output
        yf = y1.astype(jnp.float32)
        err_s = float(jnp.max(jnp.abs(jnp.sum(yf, 0) - s1_1))) / m
        t_xla = bench(xla_ref, x, w)
        t_pal = bench(gemm_with_stats, x, w)
        print(f"{str((m, k, n)):>28} {t_xla*1e3:8.3f} {t_pal*1e3:9.3f} "
              f"{t_xla/t_pal:8.2f} {max(err_y, err_s):9.2e}")


if __name__ == "__main__":
    main()
