"""Whole-block fused bottleneck forward (Mosaic/Pallas feasibility probe).

PERF_NOTES "HBM roofline model": under XLA's pass structure the TSM-R50
train step moves ~51 GB and is bandwidth-bound at ~255 clips/s; a
"minimal traffic" schedule (every activation written once and read once
per consumer, 2-pass exact BatchNorm) would move ~23 GB — a ~2.5x ceiling.
Five incremental Pallas insertions (shift epilogue, conv1x1+stats, ghost
stats, ...) all LOST in-graph because one avoided pass saves ~2-4% while
the custom-call boundary breaks XLA fusions worth more. The judge's
round-2 verdict asked for the remaining candidate to be probed: a
whole-block kernel pipeline where the boundary cost amortizes over an
entire bottleneck block because there is no XLA elementwise work left
between the convs.

This module implements that probe for the layer1 bottleneck geometry
(NHWC, stride 1, 56x56, 256 -> 64 -> 64 -> 256; reference block:
torchvision Bottleneck used by /root/reference's mmaction2 TSM backbone):

  y1 = conv1x1(x)                      + BN1 stats epilogue
  y2 = conv3x3(relu(bn1(y1)))          + BN2 stats epilogue   [one kernel]
  y3 = conv1x1(relu(bn2(y2)))          + BN3 stats epilogue   [one kernel]
  out = relu(bn3(y3) + x)              [single XLA elementwise pass]

Each Pallas kernel reads its input activation exactly once (the
normalize+relu of the PREVIOUS conv's output runs as a VPU prologue on
the tile already in VMEM) and writes its output exactly once (per-channel
sum / sum-of-squares ride along in the epilogue). Exact batch-stats
BatchNorm keeps its sequential dependency — stats of y_k are finalized
into an affine (a, b) between kernel launches (tiny (C,) math) — so the
schedule is the roofline's "2-pass exact BN": one fused producer pass,
one fused consumer pass, nothing else.

Forward-only by design: the probe's question is whether the fused forward
beats XLA's forward at this geometry AT ALL (if it cannot, the 2.5x
fwd+bwd ceiling is unreachable through this door and the item closes).
tools/bench_block_fused.py measures both in-graph on the chip;
tests/test_block_fused.py pins exact equivalence to the XLA reference in
interpret mode on CPU.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


class BlockParams(NamedTuple):
    """Bottleneck parameters. Conv kernels HWIO-shaped like flax/nn.Conv."""

    w1: jax.Array  # (1, 1, C, Cm) or (C, Cm)
    g1: jax.Array  # (Cm,) BN scale
    b1: jax.Array  # (Cm,) BN bias
    w2: jax.Array  # (3, 3, Cm, Cm)
    g2: jax.Array
    b2: jax.Array
    w3: jax.Array  # (1, 1, Cm, C) or (Cm, C)
    g3: jax.Array  # (C,)
    b3: jax.Array


def _row_tile(nt: int, per_row_bytes: int, budget: int = 6 << 20) -> int:
    tile = max(1, min(nt, budget // max(per_row_bytes, 1)))
    while nt % tile:
        tile -= 1
    return tile


def _affine_stats_gemm_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, s1_ref, s2_ref):
    """y = relu(x * a + b) @ w, plus per-channel sum/sumsq of y.

    Prologue affine (a, b) is the finalized BatchNorm normalize of the
    PREVIOUS conv's output; relu rides with it. a_ref=(1,1,K): pass a=1,
    b=0 rows (and the wrapper skips relu) for the un-normalized first conv.
    """
    bn, h, w_, k = x_ref.shape
    n = w_ref.shape[-1]
    xf = x_ref[:].astype(jnp.float32)
    a = a_ref[0, 0, :].astype(jnp.float32)
    b = b_ref[0, 0, :].astype(jnp.float32)
    xh = jnp.maximum(xf * a + b, 0.0).astype(x_ref.dtype)
    acc = jnp.dot(
        xh.reshape(bn * h * w_, k), w_ref[:], preferred_element_type=jnp.float32
    )
    y = acc.astype(y_ref.dtype)
    y_ref[:] = y.reshape(bn, h, w_, n)
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _plain_stats_gemm_kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    """y = x @ w + stats epilogue (no prologue: the block's first conv)."""
    bn, h, w_, k = x_ref.shape
    n = w_ref.shape[-1]
    acc = jnp.dot(
        x_ref[:].reshape(bn * h * w_, k), w_ref[:], preferred_element_type=jnp.float32
    )
    y = acc.astype(y_ref.dtype)
    y_ref[:] = y.reshape(bn, h, w_, n)
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _conv3x3_affine_stats_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, s1_ref, s2_ref):
    """y = conv3x3(relu(x * a + b), w) 'SAME', plus per-channel sum/sumsq.

    The padded plane lives entirely in VMEM (the grid tiles over batch
    rows only, never space, so the 3x3 taps need no halo exchange): nine
    statically-sliced shifted views of the padded tile feed nine
    accumulating MXU dots.
    """
    bn, h, w_, k = x_ref.shape
    n = w_ref.shape[-1]
    xf = x_ref[:].astype(jnp.float32)
    a = a_ref[0, 0, :].astype(jnp.float32)
    b = b_ref[0, 0, :].astype(jnp.float32)
    xh = jnp.maximum(xf * a + b, 0.0).astype(x_ref.dtype)
    xp = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bn * h * w_, n), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy : dy + h, dx : dx + w_, :].reshape(bn * h * w_, k)
            acc = acc + jnp.dot(
                tap, w_ref[dy, dx, :, :], preferred_element_type=jnp.float32
            )
    y = acc.astype(y_ref.dtype)
    y_ref[:] = y.reshape(bn, h, w_, n)
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _conv3x3_im2col_affine_stats_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, s1_ref, s2_ref):
    """Same op as `_conv3x3_affine_stats_kernel`, but the nine shifted tap
    views are concatenated along channels into one (bn*h*w, 9k) im2col
    matrix feeding a SINGLE MXU dot with K=9k — trades one extra VMEM
    buffer for full-depth MXU utilization (K=64 runs the 128-lane array
    half empty; K=576 fills it).
    """
    bn, h, w_, k = x_ref.shape
    n = w_ref.shape[-1]
    xf = x_ref[:].astype(jnp.float32)
    a = a_ref[0, 0, :].astype(jnp.float32)
    b = b_ref[0, 0, :].astype(jnp.float32)
    xh = jnp.maximum(xf * a + b, 0.0).astype(x_ref.dtype)
    xp = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy : dy + h, dx : dx + w_, :]
        for dy in range(3)
        for dx in range(3)
    ]
    col = jnp.concatenate(taps, axis=-1).reshape(bn * h * w_, 9 * k)
    y = jnp.dot(
        col, w_ref[:].reshape(9 * k, n), preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)
    y_ref[:] = y.reshape(bn, h, w_, n)
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _call_stats(kernel, inputs, nt, h, w_, n, tile, interpret, extra_in_specs):
    grid = nt // tile
    y, s1p, s2p = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, h, w_, inputs[0].shape[-1]), lambda i: (i, 0, 0, 0))]
        + extra_in_specs,
        out_specs=[
            pl.BlockSpec((tile, h, w_, n), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, h, w_, n), inputs[0].dtype),
            jax.ShapeDtypeStruct((grid, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return y, jnp.sum(s1p, axis=(0, 1)), jnp.sum(s2p, axis=(0, 1))


def _gemm_row_tile(nt, h, w_, k, n):
    # same compiler-calibrated scoped-VMEM accounting as the 3x3 kernel
    per_row = 4 * (h * w_ * k + h * w_ * n) * 3
    budget = int(os.environ.get("BLOCK_VMEM_BUDGET_MB", "14")) << 20
    return _row_tile(nt, per_row, budget=budget)


def conv1x1_stats(x, w, interpret=False):
    nt, h, w_, k = x.shape
    n = w.shape[-1]
    tile = _gemm_row_tile(nt, h, w_, k, n)
    return _call_stats(
        _plain_stats_gemm_kernel,
        (x, w),
        nt, h, w_, n, tile, interpret,
        [pl.BlockSpec((k, n), lambda i: (0, 0))],
    )


def conv1x1_affine_relu_stats(x, a, b, w, interpret=False):
    nt, h, w_, k = x.shape
    n = w.shape[-1]
    tile = _gemm_row_tile(nt, h, w_, k, n)
    a3 = a.reshape(1, 1, k).astype(jnp.float32)
    b3 = b.reshape(1, 1, k).astype(jnp.float32)
    return _call_stats(
        _affine_stats_gemm_kernel,
        (x, a3, b3, w),
        nt, h, w_, n, tile, interpret,
        [
            pl.BlockSpec((1, 1, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
    )


def conv3x3_affine_relu_stats(x, a, b, w, interpret=False, variant="taps"):
    nt, h, w_, k = x.shape
    n = w.shape[-1]
    # Scoped-VMEM estimate, calibrated against the TPU compiler's stack
    # accounting (v5e reports ~9.1 MB/row at 56x56x64: f32 prologue plane,
    # padded plane, f32 accumulator, stats epilogue, double-buffered I/O) —
    # the analytic sum of live intermediates underestimates ~3.7x, so use
    # the compiler-observed figure. At the default 16 MB scoped limit this
    # yields tile=1 for layer1 geometry; raise the budget only together with
    # XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib.
    per_row = 4 * ((h + 2) * (w_ + 2) * k + h * w_ * k + 2 * h * w_ * n) * 3
    if variant == "im2col":
        # col matrix (h*w, 9k) bf16 + the nine materialized tap slices
        per_row += (9 * h * w_ * k) * 2 * 2
    budget = int(os.environ.get("BLOCK_VMEM_BUDGET_MB", "14")) << 20
    tile = _row_tile(nt, per_row, budget=budget)
    a3 = a.reshape(1, 1, k).astype(jnp.float32)
    b3 = b.reshape(1, 1, k).astype(jnp.float32)
    kernel = (
        _conv3x3_im2col_affine_stats_kernel
        if variant == "im2col"
        else _conv3x3_affine_stats_kernel
    )
    return _call_stats(
        kernel,
        (x, a3, b3, w),
        nt, h, w_, n, tile, interpret,
        [
            pl.BlockSpec((1, 1, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, 3, k, n), lambda i: (0, 0, 0, 0)),
        ],
    )


def _finalize(s1, s2, count, gamma, beta, eps):
    mean = s1 / count
    var = s2 / count - jnp.square(mean)
    inv = gamma / jnp.sqrt(var + eps)
    return inv, beta - mean * inv


def fused_bottleneck_fwd(
    x, p: BlockParams, eps: float = 1e-5, interpret: bool = False,
    conv3x3_variant: str = "taps",
):
    """Training-mode (batch-stats) bottleneck forward as 3 fused Pallas
    passes + 1 XLA elementwise pass. Returns (out, (mean, var) per BN) —
    the stats tuple is what a full integration would feed the running
    averages."""
    nt, h, w_, c = x.shape
    w1 = p.w1.reshape(c, -1).astype(x.dtype)
    w3 = p.w3.reshape(p.w3.shape[-2], p.w3.shape[-1]).astype(x.dtype)
    cnt1 = float(nt * h * w_)

    y1, s1, q1 = conv1x1_stats(x, w1, interpret)
    a1, b1 = _finalize(s1, q1, cnt1, p.g1, p.b1, eps)
    y2, s2, q2 = conv3x3_affine_relu_stats(
        y1, a1, b1, p.w2.astype(x.dtype), interpret, variant=conv3x3_variant
    )
    a2, b2 = _finalize(s2, q2, cnt1, p.g2, p.b2, eps)
    y3, s3, q3 = conv1x1_affine_relu_stats(y2, a2, b2, w3, interpret)
    a3, b3 = _finalize(s3, q3, cnt1, p.g3, p.b3, eps)
    out = jnp.maximum(
        y3.astype(jnp.float32) * a3 + b3 + x.astype(jnp.float32), 0.0
    ).astype(x.dtype)

    def mv(s, q):
        m = s / cnt1
        return m, q / cnt1 - jnp.square(m)

    return out, (mv(s1, q1), mv(s2, q2), mv(s3, q3))


def xla_bottleneck_fwd(x, p: BlockParams, eps: float = 1e-5):
    """The same math in plain XLA ops (what the flax block computes in
    train mode with norm_dtype=bf16: f32 statistics, bf16 normalize)."""

    def conv(xv, w):
        return jax.lax.conv_general_dilated(
            xv, w.astype(xv.dtype), (1, 1),
            "SAME" if w.shape[0] == 3 else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn(y, g, b):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 2))
        v = jnp.mean(yf * yf, axis=(0, 1, 2)) - jnp.square(m)
        inv = g / jnp.sqrt(v + eps)
        return (yf * inv + (b - m * inv)).astype(y.dtype), (m, v)

    w1 = p.w1.reshape(1, 1, x.shape[-1], -1)
    w3 = p.w3.reshape(1, 1, p.w3.shape[-2], p.w3.shape[-1])
    y1, mv1 = bn(conv(x, w1), p.g1, p.b1)
    y2, mv2 = bn(conv(jnp.maximum(y1, 0), p.w2), p.g2, p.b2)
    y3, mv3 = bn(conv(jnp.maximum(y2, 0), w3), p.g3, p.b3)
    out = jnp.maximum(y3.astype(jnp.float32) + x.astype(jnp.float32), 0.0).astype(x.dtype)
    return out, (mv1, mv2, mv3)


def make_params(key, c=256, cm=64, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 9)
    init = jax.nn.initializers.lecun_normal()
    return BlockParams(
        w1=init(ks[0], (1, 1, c, cm), jnp.float32).astype(dtype),
        g1=jnp.abs(jax.random.normal(ks[1], (cm,))) + 0.5,
        b1=jax.random.normal(ks[2], (cm,)) * 0.1,
        w2=init(ks[3], (3, 3, cm, cm), jnp.float32).astype(dtype),
        g2=jnp.abs(jax.random.normal(ks[4], (cm,))) + 0.5,
        b2=jax.random.normal(ks[5], (cm,)) * 0.1,
        w3=init(ks[6], (1, 1, cm, c), jnp.float32).astype(dtype),
        g3=jnp.abs(jax.random.normal(ks[7], (c,))) + 0.5,
        b3=jax.random.normal(ks[8], (c,)) * 0.1,
    )
