"""Temporal Shift Module (TSM) channel shift.

TPU-native replacement for mmaction2's ``TemporalShift`` wrapper (SURVEY.md
§2.4 "TSM backbone"): given features of ``num_segments`` frames, the first
C/shift_div channels are shifted one frame into the past, the next
C/shift_div one frame into the future, the rest pass through; boundary frames
are zero-filled.

Two implementations:
  * ``temporal_shift`` — pure XLA (slice + pad). XLA fuses this into adjacent
    ops; it is the default and is differentiable for free.
  * ``temporal_shift_pallas`` — a Pallas VMEM kernel with a custom VJP
    (the backward of a shift is the opposite shift). Useful as a fusion
    anchor when XLA's layout choices regress; validated against the XLA
    path in tests.

Layout: channels-last ``(N*T, H, W, C)`` with static ``num_segments=T``,
matching the backbone's activation layout so no transposes are introduced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def temporal_shift(x: jax.Array, num_segments: int, shift_div: int = 8) -> jax.Array:
    """Shift channels across time.

    Args:
      x: (N*T, H, W, C) activations, T == num_segments.
      num_segments: frames per video in the flattened batch.
      shift_div: fraction of channels to shift each direction (C // shift_div).

    Returns:
      (N*T, H, W, C) with the first fold shifted backward in time (frame t
      sees frame t+1), the second fold forward (frame t sees frame t-1).
    """
    nt, h, w, c = x.shape
    n = nt // num_segments
    fold = c // shift_div
    xt = x.reshape(n, num_segments, h, w, c)

    # left shift: out[:, t] = x[:, t + 1], zero at the last frame
    left = jnp.concatenate(
        [xt[:, 1:, :, :, :fold], jnp.zeros_like(xt[:, :1, :, :, :fold])], axis=1
    )
    # right shift: out[:, t] = x[:, t - 1], zero at the first frame
    right = jnp.concatenate(
        [jnp.zeros_like(xt[:, :1, :, :, fold : 2 * fold]), xt[:, :-1, :, :, fold : 2 * fold]],
        axis=1,
    )
    out = jnp.concatenate([left, right, xt[:, :, :, :, 2 * fold :]], axis=-1)
    return out.reshape(nt, h, w, c)


def shifted_conv(
    x: jax.Array,
    kernel: jax.Array,
    num_segments: int,
    shift_div: int = 8,
    strides=(1, 1),
    padding=((0, 0), (0, 0)),
) -> jax.Array:
    """conv(temporal_shift(x), W) without materializing the shifted tensor.

    Convolution is linear in input channels, so
        conv(shift(x), W) = conv(x[..., 2f:], W[..., 2f:, :])
                          + conv(shift_left(x[..., :f]), W[..., :f, :])
                          + conv(shift_right(x[..., f:2f]), W[..., f:2f, :])
    Only the two C/shift_div-channel fold slices are ever written to HBM
    (vs a full extra activation write+read for the pad-materialize shift) —
    measured ablation on v5e put the materialized shift at ~33% of the whole
    train step.

    Args:
      x: (N*T, H, W, C) activations; kernel: (kh, kw, C, O) HWIO.
    """
    nt, h, w, c = x.shape
    n = nt // num_segments
    fold = c // shift_div
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(inp, ker):
        # same-dtype operands keep the VJP well-typed under mixed precision;
        # the MXU accumulates in f32 for bf16 convolutions regardless
        return jax.lax.conv_general_dilated(
            inp, ker.astype(inp.dtype), window_strides=strides, padding=padding,
            dimension_numbers=dn,
        )

    # static channels pass through unshifted
    y = conv(x[..., 2 * fold :], kernel[:, :, 2 * fold :, :])

    xt = x.reshape(n, num_segments, h, w, c)
    left = jnp.concatenate(
        [xt[:, 1:, :, :, :fold], jnp.zeros_like(xt[:, :1, :, :, :fold])], axis=1
    ).reshape(nt, h, w, fold)
    right = jnp.concatenate(
        [jnp.zeros_like(xt[:, :1, :, :, fold : 2 * fold]), xt[:, :-1, :, :, fold : 2 * fold]],
        axis=1,
    ).reshape(nt, h, w, fold)
    y = y + conv(left, kernel[:, :, :fold, :])
    y = y + conv(right, kernel[:, :, fold : 2 * fold, :])
    return y


# ---------------------------------------------------------------------------
# Fused residual + relu + shift (Pallas, two outputs)
# ---------------------------------------------------------------------------
#
# The profile (PERF_NOTES.md) shows the materialized shift costs far more than
# its own copies: the concat breaks XLA's BN/add/relu fusion chains. This
# kernel computes a block's epilogue and the *next* block's shifted input in
# one VMEM pass:
#     out     = relu(h + identity)
#     shifted = temporal_shift(out)
# Backward: d(h) = d(identity) = relu'(out) * (g_out + unshift(g_shifted)).


def _tile_geometry(num_segments: int, hw: int, c: int, dtype_bytes: int, n_bufs: int):
    budget = (10 * 1024 * 1024) // n_bufs // 2  # /2 for double buffering
    hw_tile = max(8, min(hw, budget // max(1, num_segments * c * dtype_bytes)))
    return hw if hw_tile >= hw else max(8, (hw_tile // 8) * 8)


def _fused_fwd_kernel(h_ref, id_ref, out_ref, shifted_ref, *, fold: int):
    out = jnp.maximum(h_ref[...] + id_ref[...], 0)  # (T, hw_tile, C)
    out_ref[...] = out
    zeros_one = jnp.zeros((1,) + out.shape[1:-1] + (fold,), out.dtype)
    left = jnp.concatenate([out[1:, :, :fold], zeros_one], axis=0)
    right = jnp.concatenate([zeros_one, out[:-1, :, fold : 2 * fold]], axis=0)
    shifted_ref[...] = jnp.concatenate([left, right, out[:, :, 2 * fold :]], axis=-1)


def _fused_bwd_kernel(out_ref, g_out_ref, g_shift_ref, g_in_ref, *, fold: int):
    g_shift = g_shift_ref[...]
    zeros_one = jnp.zeros((1,) + g_shift.shape[1:-1] + (fold,), g_shift.dtype)
    # unshift: transpose of the shift
    left = jnp.concatenate([zeros_one, g_shift[:-1, :, :fold]], axis=0)
    right = jnp.concatenate([g_shift[1:, :, fold : 2 * fold], zeros_one], axis=0)
    g_total = g_out_ref[...] + jnp.concatenate(
        [left, right, g_shift[:, :, 2 * fold :]], axis=-1
    )
    g_in_ref[...] = jnp.where(out_ref[...] > 0, g_total, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_residual_relu_shift(
    h: jax.Array,
    identity: jax.Array,
    num_segments: int,
    shift_div: int = 8,
    interpret: bool = False,
):
    """(out, shifted) = (relu(h + identity), temporal_shift(out)) in one pass.

    h, identity: (N*T, H, W, C). Used by ResNetTSM shift_mode='fused_block'.
    """
    return _fused_fwd(h, identity, num_segments, shift_div, interpret)[:2]


def _fused_fwd(h, identity, num_segments, shift_div, interpret):
    nt, ht, w, c = h.shape
    n = nt // num_segments
    hw = ht * w
    fold = c // shift_div
    hw_tile = _tile_geometry(num_segments, hw, c, h.dtype.itemsize, n_bufs=4)

    h3 = h.reshape(n, num_segments, hw, c)
    id3 = identity.reshape(n, num_segments, hw, c)
    spec = lambda: pl.BlockSpec(  # noqa: E731
        (None, num_segments, hw_tile, c), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    out, shifted = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, fold=fold),
        grid=(n, pl.cdiv(hw, hw_tile)),
        in_specs=[spec(), spec()],
        out_specs=(spec(), spec()),
        out_shape=(
            jax.ShapeDtypeStruct((n, num_segments, hw, c), h.dtype),
            jax.ShapeDtypeStruct((n, num_segments, hw, c), h.dtype),
        ),
        interpret=interpret,
    )(h3, id3)
    out = out.reshape(nt, ht, w, c)
    shifted = shifted.reshape(nt, ht, w, c)
    return out, shifted, (out,)


def _fused_fwd_rule(h, identity, num_segments, shift_div, interpret):
    out, shifted, residuals = _fused_fwd(h, identity, num_segments, shift_div, interpret)
    return (out, shifted), residuals


def _fused_bwd_rule(num_segments, shift_div, interpret, residuals, cotangents):
    (out,) = residuals
    g_out, g_shifted = cotangents
    nt, ht, w, c = out.shape
    n = nt // num_segments
    hw = ht * w
    fold = c // shift_div
    hw_tile = _tile_geometry(num_segments, hw, c, out.dtype.itemsize, n_bufs=4)

    spec = lambda: pl.BlockSpec(  # noqa: E731
        (None, num_segments, hw_tile, c), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    g_in = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, fold=fold),
        grid=(n, pl.cdiv(hw, hw_tile)),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((n, num_segments, hw, c), out.dtype),
        interpret=interpret,
    )(
        out.reshape(n, num_segments, hw, c),
        g_out.reshape(n, num_segments, hw, c),
        g_shifted.reshape(n, num_segments, hw, c),
    ).reshape(nt, ht, w, c)
    return g_in, g_in


fused_residual_relu_shift.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# ---------------------------------------------------------------------------
# Pallas kernel variant
# ---------------------------------------------------------------------------


def _shift_kernel(x_ref, out_ref, *, num_segments: int, fold: int):
    """Grid dim 0 = video index; block = (T, H*W, C) of one video in VMEM."""
    x = x_ref[...]  # (T, HW, C)
    t = x.shape[0]
    c = x.shape[-1]

    zeros_one = jnp.zeros((1,) + x.shape[1:-1] + (fold,), x.dtype)
    left = jnp.concatenate([x[1:, :, :fold], zeros_one], axis=0)
    right = jnp.concatenate([zeros_one, x[:-1, :, fold : 2 * fold]], axis=0)
    out_ref[...] = jnp.concatenate([left, right, x[:, :, 2 * fold :]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def temporal_shift_pallas(
    x: jax.Array, num_segments: int, shift_div: int = 8, interpret: bool = False
) -> jax.Array:
    return _temporal_shift_pallas_impl(
        x, num_segments, shift_div, reverse=False, interpret=interpret
    )


def _temporal_shift_pallas_impl(
    x: jax.Array, num_segments: int, shift_div: int, reverse: bool, interpret: bool = False
) -> jax.Array:
    nt, h, w, c = x.shape
    n = nt // num_segments
    fold = c // shift_div
    hw = h * w
    x3 = x.reshape(n, num_segments, hw, c)

    # VMEM budget: block = (T, hw_tile, C); keep in+out blocks ~<= 8 MB so the
    # double-buffered pipeline fits the ~16 MB VMEM (pallas_guide: memory
    # hierarchy). The shift only mixes the T axis, so HW tiles are independent.
    dtype_bytes = x.dtype.itemsize
    # ~1 MB per block: x2 for in+out, x2 for double buffering, plus the
    # concat intermediates must all fit the ~16 MB VMEM
    budget = 1024 * 1024
    hw_tile = max(8, min(hw, budget // max(1, num_segments * c * dtype_bytes)))
    # sublane constraint: second-to-last block dim must be a multiple of 8
    # (or the full extent); edge blocks are masked by pallas
    hw_tile = hw if hw_tile >= hw else max(8, (hw_tile // 8) * 8)

    if reverse:
        # backward of the shift: gradients flow the opposite direction,
        # implemented by swapping which fold shifts which way
        def kernel(x_ref, out_ref):
            xv = x_ref[...]
            zeros_one = jnp.zeros((1,) + xv.shape[1:-1] + (fold,), xv.dtype)
            # reverse of left shift is right shift and vice versa
            left = jnp.concatenate([zeros_one, xv[:-1, :, :fold]], axis=0)
            right = jnp.concatenate([xv[1:, :, fold : 2 * fold], zeros_one], axis=0)
            out_ref[...] = jnp.concatenate([left, right, xv[:, :, 2 * fold :]], axis=-1)

    else:
        kernel = functools.partial(_shift_kernel, num_segments=num_segments, fold=fold)

    out = pl.pallas_call(
        kernel,
        grid=(n, pl.cdiv(hw, hw_tile)),
        in_specs=[
            pl.BlockSpec(
                (None, num_segments, hw_tile, c),  # None squeezes the video dim
                lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (None, num_segments, hw_tile, c), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, num_segments, hw, c), x.dtype),
        interpret=interpret,
    )(x3)
    return out.reshape(nt, h, w, c)


def _shift_fwd(x, num_segments, shift_div, interpret):
    return temporal_shift_pallas(x, num_segments, shift_div, interpret), None


def _shift_bwd(num_segments, shift_div, interpret, _, g):
    return (
        _temporal_shift_pallas_impl(g, num_segments, shift_div, reverse=True, interpret=interpret),
    )


temporal_shift_pallas.defvjp(_shift_fwd, _shift_bwd)
