#!/usr/bin/env python
"""Measure the whole-block fused bottleneck probe vs XLA, in-graph.

VERDICT round-2 item 9 (stretch): prototype a conv+BN+relu pipeline that
keeps tiles in VMEM across one bottleneck block (layer1 geometry) and
measure it in-graph before committing further. This times N chained
iterations of the block forward (output feeds the next input, donated) so
dispatch overhead and transport pooling cannot fake the number, for both
the 3-Pallas-pass fused schedule and the plain XLA schedule.

Usage: python tools/bench_block_fused.py [iters]
Env:   BLOCK_ROWS (default 128 = batch16 x 8 segments), BLOCK_HW (56),
       BLOCK_C (256), BLOCK_CM (64)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import jax
import jax.numpy as jnp

from bdvcil_tpu.ops.block_fused import (
    fused_bottleneck_fwd,
    make_params,
    xla_bottleneck_fwd,
)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rows = int(os.environ.get("BLOCK_ROWS", "128"))
    hw = int(os.environ.get("BLOCK_HW", "56"))
    c = int(os.environ.get("BLOCK_C", "256"))
    cm = int(os.environ.get("BLOCK_CM", "64"))

    key = jax.random.PRNGKey(0)
    p = make_params(key, c=c, cm=cm)
    x = jax.random.normal(jax.random.PRNGKey(1), (rows, hw, hw, c), jnp.bfloat16)

    def chain(fn):
        # out feeds the next x: a data dependency per iteration
        def run(x0):
            def body(xv, _):
                out, _stats = fn(xv, p)
                return out, ()

            y, _ = jax.lax.scan(body, x0, (), length=iters)
            return y

        return jax.jit(run)

    results = {}
    for name, fn in (("xla", xla_bottleneck_fwd), ("fused", fused_bottleneck_fwd)):
        run = chain(fn)
        y = run(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = run(x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        results[name + "_ms_per_block"] = round(dt / iters * 1000, 3)

    results["fused_vs_xla"] = round(
        results["xla_ms_per_block"] / results["fused_ms_per_block"], 3
    )
    results.update(rows=rows, hw=hw, c=c, cm=cm, iters=iters,
                   platform=jax.devices()[0].platform)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
