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

    vmem_kib = os.environ.get("BLOCK_SCOPED_VMEM_KIB")

    def chain(fn):
        # out feeds the next x: a data dependency per iteration
        def run(x0):
            def body(xv, _):
                out, _stats = fn(xv, p)
                return out, ()

            y, _ = jax.lax.scan(body, x0, (), length=iters)
            return y

        jitted = jax.jit(run)
        if vmem_kib:
            return jitted.lower(x).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": int(vmem_kib)}
            )
        return jitted

    import functools

    variants = [
        ("xla", xla_bottleneck_fwd),
        ("fused", fused_bottleneck_fwd),
    ]
    if os.environ.get("BLOCK_IM2COL"):
        # 2026-08: Mosaic rejects the 9-way channel concat of shifted views
        # ("result/input offset mismatch on non-concat dimension") — kept
        # behind a flag for future toolchains.
        variants.append(
            ("fused_im2col", functools.partial(fused_bottleneck_fwd, conv3x3_variant="im2col"))
        )

    if os.environ.get("BLOCK_PARTS"):
        return bench_parts(x, p, iters, vmem_kib)

    results = {}
    for name, fn in variants:
        run = chain(fn)
        y = run(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = run(x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        results[name + "_ms_per_block"] = round(dt / iters * 1000, 3)

    for name, _ in variants[1:]:
        results[name + "_vs_xla"] = round(
            results["xla_ms_per_block"] / results[name + "_ms_per_block"], 3
        )
    results.update(rows=rows, hw=hw, c=c, cm=cm, iters=iters,
                   platform=jax.devices()[0].platform)
    print(json.dumps(results))


def bench_parts(x, p, iters, vmem_kib):
    """Per-kernel attribution: time each of the three fused Pallas passes
    and its plain-XLA counterpart (conv + BN-stats reduce) separately,
    chained in-graph on same-shaped data."""
    from bdvcil_tpu.ops.block_fused import (
        conv1x1_affine_relu_stats,
        conv1x1_stats,
        conv3x3_affine_relu_stats,
    )

    rows, hw, _, c = x.shape
    cm = p.w2.shape[-1]
    w1 = p.w1.reshape(c, cm).astype(x.dtype)
    w3 = p.w3.reshape(cm, c).astype(x.dtype)
    ones = jnp.ones((cm,), jnp.float32)
    zeros = jnp.zeros((cm,), jnp.float32)
    y1 = jax.random.normal(jax.random.PRNGKey(2), (rows, hw, hw, cm), jnp.bfloat16)

    def xla_conv(xv, w, same):
        return jax.lax.conv_general_dilated(
            xv, w, (1, 1), "SAME" if same else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def stats(y):
        yf = y.astype(jnp.float32)
        return jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))

    parts = {
        "pl_conv1_1x1": (lambda v: conv1x1_stats(v, w1)[0], x),
        "xla_conv1_1x1": (
            lambda v: xla_conv(v, p.w1.reshape(1, 1, c, cm).astype(v.dtype), False),
            x,
        ),
        "pl_conv2_3x3": (
            lambda v: conv3x3_affine_relu_stats(v, ones, zeros, p.w2.astype(v.dtype))[0],
            y1,
        ),
        "xla_conv2_3x3": (
            lambda v: xla_conv(jnp.maximum(v, 0), p.w2.astype(v.dtype), True),
            y1,
        ),
        "pl_conv3_1x1": (lambda v: conv1x1_affine_relu_stats(v, ones, zeros, w3)[0], y1),
        "xla_conv3_1x1": (
            lambda v: xla_conv(
                jnp.maximum(v, 0), p.w3.reshape(1, 1, cm, c).astype(v.dtype), False
            ),
            y1,
        ),
        "xla_bn_stats_only": (lambda v: stats(v)[0], y1),
    }
    results = {}
    for name, (fn, x0) in parts.items():
        def run_chain(v, fn=fn):
            def body(carry, _):
                out = fn(carry)
                # keep shapes closed: feed a same-shaped projection back
                nxt = (carry + out.astype(jnp.float32).mean()).astype(carry.dtype)
                return nxt, ()

            y, _ = jax.lax.scan(body, v, (), length=iters)
            return y

        jitted = jax.jit(run_chain)
        if vmem_kib:
            jitted = jitted.lower(x0).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": int(vmem_kib)}
            )
        y = jitted(x0)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = jitted(x0)
        jax.block_until_ready(y)
        results[name + "_ms"] = round((time.perf_counter() - t0) / iters * 1000, 3)
    results.update(iters=iters, platform=jax.devices()[0].platform)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
