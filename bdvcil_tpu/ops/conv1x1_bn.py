"""Pallas 1x1-conv (GEMM) with a BatchNorm-statistics epilogue.

The R50 bottleneck's conv1/conv3 are stride-1 1x1 convolutions — plain
GEMMs over (M = N*T*H*W, K) x (K, N'). Their outputs feed BatchNorm, and
XLA computes the train-mode statistics in a separate convert_reduce_fusion
pass that re-reads the full conv output from HBM (PERF_NOTES "Step
profile": the BN stats/grad reductions are ~35% of the train step).

``gemm_with_stats`` emits per-channel sum / sum-of-squares from the same
kernel invocation that produces the output tile — the stats ride along
while the tile is still in VMEM, eliminating the separate full-tensor
read. Statistics are computed on the ROUNDED bf16 output so they equal
what XLA's reduce would have produced from the stored tensor (same data,
different summation order).

Custom VJP: the backward is expressed with plain XLA GEMMs (the cotangents
of s1/s2 are per-channel vectors folded into dY elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(m: int, preferred=(512, 448, 256, 128, 64, 32, 16)) -> int:
    for t in preferred:
        if m % t == 0:
            return t
    return 0  # caller pads


def _kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = acc.astype(y_ref.dtype)
    y_ref[:] = y
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _gemm_with_stats_impl(x: jax.Array, w: jax.Array, interpret: bool):
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)

    tm = _pick_tile(m)
    padded = 0
    if tm == 0:
        tm = 256
        padded = (-m) % tm
        x = jnp.pad(x, ((0, padded), (0, 0)))  # zero rows: no effect on stats
    grid_m = (m + padded) // tm

    y, s1p, s2p = pl.pallas_call(
        _kernel,
        grid=(grid_m,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
            # (grid_m, 1, n) so the trailing block dims satisfy the TPU
            # (8, 128)-or-full tiling rule for any n
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m + padded, n), x.dtype),
            jax.ShapeDtypeStruct((grid_m, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((grid_m, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(x, w)
    if padded:
        y = y[:m]
    return y, jnp.sum(s1p, axis=(0, 1)), jnp.sum(s2p, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gemm_with_stats(x: jax.Array, w: jax.Array, interpret: bool = False):
    """y = x @ w (bf16 in/out, f32 accumulate) plus per-column sum(y) and
    sum(y*y) in float32, in one pass over the output."""
    return _gemm_with_stats_impl(x, w, interpret)


def _fwd(x, w, interpret):
    y, s1, s2 = _gemm_with_stats_impl(x, w, interpret)
    return (y, s1, s2), (x, w, y)


def _bwd(interpret, res, cots):
    x, w, y = res
    gy, gs1, gs2 = cots
    # d/dy of (y, sum(y), sum(y^2)) contracted with the cotangents
    dy = gy.astype(jnp.float32)
    if gs1 is not None:
        dy = dy + gs1[None, :]
    if gs2 is not None:
        dy = dy + 2.0 * gs2[None, :] * y.astype(jnp.float32)
    dy = dy.astype(x.dtype)
    dx = jax.lax.dot_general(dy, w, (((1,), (1,)), ((), ())))  # dy @ w.T
    dw = jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())))  # x.T @ dy
    return dx.astype(x.dtype), dw.astype(w.dtype)


gemm_with_stats.defvjp(_fwd, _bwd)


# --- flax integration: conv1x1 + BatchNorm with kernel-fused statistics ----


import flax.linen as nn  # noqa: E402


class _Conv1x1Param(nn.Module):
    """Owns the (1, 1, K, N) conv kernel under the SAME scope/shape as the
    nn.Conv it replaces, so checkpoints and pretrained conversion are
    layout-identical."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )


class _BNStats(nn.Module):
    """Owns BatchNorm params/running-stats (flax-BatchNorm-compatible layout)
    and turns kernel-emitted (s1, s2, count) into the normalize affine."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    features: int = 0

    @nn.compact
    def __call__(self, s1, s2, count, use_running_average: bool):
        c = self.features
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if use_running_average:
            return scale, bias, ra_mean.value, ra_var.value
        mean = s1 / count
        var = s2 / count - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * jax.lax.stop_gradient(mean)
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * jax.lax.stop_gradient(var)
        return scale, bias, mean, var


def _kernel4(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    bn, h, w_, k = x_ref.shape
    n = w_ref.shape[-1]
    x2 = x_ref[:].reshape(bn * h * w_, k)
    acc = jnp.dot(x2, w_ref[:], preferred_element_type=jnp.float32)
    y = acc.astype(y_ref.dtype)
    y_ref[:] = y.reshape(bn, h, w_, n)
    yf = y.astype(jnp.float32)
    s1_ref[0, 0, :] = jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] = jnp.sum(yf * yf, axis=0)


def _conv1x1_with_stats_impl(x4: jax.Array, w: jax.Array, interpret: bool):
    """4D NHWC in/out so no host-level reshape/layout change surrounds the
    kernel (2D views forced XLA to materialize relayout copies on every
    call boundary — measured 40% step regression)."""
    nt, h, w_, k = x4.shape
    n = w.shape[-1]
    # NT tile: keep x-block + y-block under ~3 MB combined so the double-
    # buffered pipeline stays inside the 16 MB scoped-VMEM budget
    row_bytes = h * w_ * (k + n) * x4.dtype.itemsize
    tile = max(1, min(nt, (3 << 20) // max(row_bytes, 1)))
    while nt % tile:
        tile -= 1
    grid = nt // tile

    y, s1p, s2p = pl.pallas_call(
        _kernel4,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, h, w_, k), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, h, w_, n), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, h, w_, n), x4.dtype),
            jax.ShapeDtypeStruct((grid, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(x4, w)
    return y, jnp.sum(s1p, axis=(0, 1)), jnp.sum(s2p, axis=(0, 1))


def _ref_conv1x1(x4, w):
    """The XLA conv this kernel replaces; its vjp supplies the backward."""
    return jax.lax.conv_general_dilated(
        x4, w.reshape(1, 1, *w.shape), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1_with_stats(x4: jax.Array, w: jax.Array, interpret: bool = False):
    """y = 1x1-conv(x4, w) (NHWC, bf16, f32 accumulate) + per-channel
    sum(y)/sum(y^2) f32, one pass."""
    return _conv1x1_with_stats_impl(x4, w, interpret)


def _fwd4(x4, w, interpret):
    y, s1, s2 = _conv1x1_with_stats_impl(x4, w, interpret)
    return (y, s1, s2), (x4, w, y)


def _bwd4(interpret, res, cots):
    x4, w, y = res
    gy, gs1, gs2 = cots
    dy = gy.astype(jnp.float32)
    if gs1 is not None:
        dy = dy + gs1[None, None, None, :]
    if gs2 is not None:
        dy = dy + 2.0 * gs2[None, None, None, :] * y.astype(jnp.float32)
    dy = dy.astype(x4.dtype)
    # XLA's own conv backward (native NHWC layouts, no relayout copies)
    _, vjp = jax.vjp(_ref_conv1x1, x4, w)
    dx, dw = vjp(dy)
    return dx, dw


conv1x1_with_stats.defvjp(_fwd4, _bwd4)


def conv1x1_bn(
    x: jax.Array,
    features: int,
    conv_name: str,
    bn_name: str,
    train: bool,
    dtype,
    norm_dtype,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``nn.Conv(features, (1,1)) -> nn.BatchNorm``
    inside a block's @nn.compact body: the GEMM emits the BN statistics in
    its epilogue (train mode), removing XLA's separate full-tensor stats
    pass. Eval mode normalizes with running stats like flax BatchNorm.

    Gradients through mean/var flow via the custom-VJP stats outputs, which
    reproduces BatchNorm's backward exactly (autodiff of the composite).
    """
    nt, h, w_, k = x.shape
    kernel = _Conv1x1Param(features, k, name=conv_name)()
    m = nt * h * w_
    x4 = x.astype(dtype)
    wmat = kernel.reshape(k, features).astype(dtype)

    if train:
        y, s1, s2 = conv1x1_with_stats(x4, wmat, interpret)
        scale, bias, mean, var = _BNStats(features=features, name=bn_name)(
            s1, s2, float(m), False
        )
    else:
        y = _ref_conv1x1(x4, wmat).astype(dtype)
        scale, bias, mean, var = _BNStats(features=features, name=bn_name)(
            None, None, 1.0, True
        )

    inv = scale / jnp.sqrt(var + 1e-5)
    shift = bias - mean * inv
    return y.astype(norm_dtype) * inv.astype(norm_dtype) + shift.astype(norm_dtype)
