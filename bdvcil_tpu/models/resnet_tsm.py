"""ResNet-TSM backbone in Flax (channels-last, MXU-friendly).

TPU-native rebuild of mmaction2's ``ResNetTSM`` (SURVEY.md §2.4): a torchvision
-style ResNet-18/34/50 where every residual block applies the temporal
channel shift to its input before conv1 (mmaction2 ``shift_place='blockres'``
with n_round=1). Instead of forward hooks, ``__call__`` returns a dict of
tagged stage outputs ('layer1'..'layer4') which the CIL runtime uses for the
feature-distillation taps (reference kd_modules_names, config :85).

Layout: activations are NHWC with the time axis flattened into the batch,
``(N*num_segments, H, W, C)`` — convolutions stay large and batched on the
MXU and the shift is a cheap slice/concat that XLA fuses.

Mixed precision: ``dtype`` controls the compute/activation dtype (bfloat16
recommended on TPU); parameters and batch-norm statistics stay float32.
"""

from __future__ import annotations

from .norm import GroupedBatchNorm
from ..ops.conv1x1_bn import conv1x1_bn
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.tsm_shift import fused_residual_relu_shift, shifted_conv, temporal_shift

# depth -> (block type, stage sizes, expansion)
ARCH = {
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
    101: ("bottleneck", (3, 4, 23, 3), 4),
}


class _ShiftedConv(nn.Module):
    """conv1 with the temporal shift folded in via conv linearity
    (ops/tsm_shift.shifted_conv) — avoids materializing the shifted tensor.
    Parameter layout matches nn.Conv ('kernel', HWIO) so checkpoints and
    optimizer labels are identical across shift modes."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    num_segments: int
    shift_div: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        return shifted_conv(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            self.num_segments,
            self.shift_div,
            strides=self.strides,
            padding=self.padding,
        )


class _S2DStem(nn.Module):
    """Space-to-depth stem: the 7x7/s2 conv on C=3 input is MXU-hostile
    (3 input channels waste systolic-array lanes). Transform the input with a
    2x2 space-to-depth (224^2x3 -> 112^2x12) and apply an exactly equivalent
    4x4/s1 convolution with rearranged weights (MLPerf-ResNet trick).

    The parameter keeps nn.Conv's layout ('kernel', (7, 7, 3, 64) HWIO) so
    checkpoints/optimizer labels are identical to the plain stem; the weight
    rearrangement is a jit-time constant fold. Equivalence:
      y[j] = sum_t w[t] x[2j + t - 3]  ==  sum_{u,p} w[2u + p + 3] xt[j+u, p]
    with u in [-2, 1], p in {0, 1}  =>  4 taps, padding (2, 1).
    """

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, self.features)
        )
        n, h, w, c = x.shape
        # space-to-depth, channel order (p, q, c)
        xt = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xt = xt.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)

        # rearranged weights: w_pad[t+1] = w[t]; wt[a, b, (p, q, c)] =
        # w[2a + p - 1, 2b + q - 1, c]
        w_pad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wt = w_pad.reshape(4, 2, 4, 2, c, self.features)
        wt = wt.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)

        dn = jax.lax.conv_dimension_numbers(xt.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xt.astype(self.dtype),
            wt.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=dn,
        )


def _make_bn(use_running_average: bool, norm_dtype, name: str, groups: int,
             stats_rows: int = 0):
    """flax BatchNorm (global-batch statistics, the SPMD default) or
    GroupedBatchNorm when bn_groups > 1 (reference per-GPU BN semantics) or
    bn_stats_rows > 0 (ghost statistics from a row prefix; models/norm.py)."""
    if groups > 1 or stats_rows > 0:
        return GroupedBatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=norm_dtype, groups=groups, stats_rows=stats_rows, name=name,
        )
    return nn.BatchNorm(
        use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
        dtype=norm_dtype, name=name,
    )


class _BasicBlock(nn.Module):
    planes: int
    stride: int
    num_segments: int
    shift_div: int
    is_shift: bool
    dtype: Any
    norm_dtype: Any = jnp.float32
    shift_mode: str = "pad"
    bn_groups: int = 1
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool, x_shifted=None):
        fused_block = self.is_shift and self.shift_mode == "fused_block"
        identity = x
        if fused_block:
            h = x_shifted  # producer block emitted shift(x) already
            h = nn.Conv(
                self.planes, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1",
            )(h)
        elif self.is_shift and self.shift_mode == "fused":
            h = _ShiftedConv(
                self.planes, (3, 3), (self.stride, self.stride), ((1, 1), (1, 1)),
                self.num_segments, self.shift_div, self.dtype, name="conv1",
            )(x)
        else:
            h = x
            if self.is_shift:
                h = temporal_shift(h, self.num_segments, self.shift_div)
            h = nn.Conv(
                self.planes, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1",
            )(h)
        h = _make_bn(not train, self.norm_dtype, "bn1", self.bn_groups, self.bn_stats_rows)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _make_bn(not train, self.norm_dtype, "bn2", self.bn_groups, self.bn_stats_rows)(h)

        if self.stride != 1 or identity.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(identity)
            identity = _make_bn(not train, self.norm_dtype, "downsample_bn", self.bn_groups, self.bn_stats_rows)(identity)
        if fused_block:
            return fused_residual_relu_shift(
                h, identity.astype(h.dtype), self.num_segments, self.shift_div,
                jax.default_backend() == "cpu",
            )
        return nn.relu(h + identity.astype(h.dtype))


class _Bottleneck(nn.Module):
    planes: int
    stride: int
    num_segments: int
    shift_div: int
    is_shift: bool
    dtype: Any
    norm_dtype: Any = jnp.float32
    shift_mode: str = "pad"
    bn_groups: int = 1
    bn_stats_rows: int = 0
    conv1x1_mode: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool, x_shifted=None):
        fused_block = self.is_shift and self.shift_mode == "fused_block"
        identity = x
        out_planes = self.planes * 4
        # 'pallas_stats': conv1/conv3 run as Pallas GEMMs whose epilogue
        # emits the BN statistics, removing XLA's separate full-tensor
        # stats pass (ops/conv1x1_bn.py). Exact-equivalence tested.
        use_pallas_1x1 = (
            self.conv1x1_mode in ("pallas_stats", "pallas_stats_interpret")
            and self.shift_mode == "pad"
            and self.bn_groups == 1
            and self.bn_stats_rows == 0
        )
        interp_1x1 = self.conv1x1_mode == "pallas_stats_interpret"
        if fused_block:
            h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x_shifted)
        elif self.is_shift and self.shift_mode == "fused":
            h = _ShiftedConv(
                self.planes, (1, 1), (1, 1), ((0, 0), (0, 0)),
                self.num_segments, self.shift_div, self.dtype, name="conv1",
            )(x)
        else:
            h = x
            if self.is_shift:
                h = temporal_shift(h, self.num_segments, self.shift_div)
            if use_pallas_1x1:
                h = conv1x1_bn(h, self.planes, "conv1", "bn1", train, self.dtype,
                               self.norm_dtype, interpret=interp_1x1)
            else:
                h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(h)
        if not use_pallas_1x1:  # conv1x1_bn already normalized
            h = _make_bn(not train, self.norm_dtype, "bn1", self.bn_groups, self.bn_stats_rows)(h)
        h = nn.relu(h)
        # stride on the 3x3 (torch / mmaction2 'pytorch' style)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = _make_bn(not train, self.norm_dtype, "bn2", self.bn_groups, self.bn_stats_rows)(h)
        h = nn.relu(h)
        if use_pallas_1x1:
            h = conv1x1_bn(h, out_planes, "conv3", "bn3", train, self.dtype,
                           self.norm_dtype, interpret=interp_1x1)
        else:
            h = nn.Conv(out_planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
            h = _make_bn(not train, self.norm_dtype, "bn3", self.bn_groups, self.bn_stats_rows)(h)

        if self.stride != 1 or identity.shape[-1] != out_planes:
            identity = nn.Conv(
                out_planes, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(identity)
            identity = _make_bn(not train, self.norm_dtype, "downsample_bn", self.bn_groups, self.bn_stats_rows)(identity)
        if fused_block:
            return fused_residual_relu_shift(
                h, identity.astype(h.dtype), self.num_segments, self.shift_div,
                jax.default_backend() == "cpu",
            )
        return nn.relu(h + identity.astype(h.dtype))


class ResNetTSM(nn.Module):
    depth: int = 50
    num_segments: int = 8
    shift_div: int = 8
    is_shift: bool = True
    norm_eval: bool = False
    dtype: Any = jnp.float32
    # batch-norm compute dtype: float32 by default for statistics accuracy;
    # bfloat16 removes the cast fences around every conv (bench knob)
    norm_dtype: Any = jnp.float32
    # 'pad' materializes the shifted tensor; 'fused' folds the shift into
    # conv1 via linearity (ops/tsm_shift.shifted_conv)
    shift_mode: str = "pad"
    # 'conv' = plain 7x7/s2 stem; 's2d' = exactly-equivalent space-to-depth
    # stem (same param layout; see _S2DStem)
    stem_mode: str = "conv"
    # >1: train-mode BN statistics over contiguous row groups instead of the
    # global batch — set to the data-mesh size for the reference's per-GPU
    # (no-SyncBN) semantics (models/norm.py; round-1 VERDICT Weak #5)
    bn_groups: int = 1
    # >0: ghost BN statistics from the first k rows of each stat group —
    # cuts the HBM-bound full-activation statistics pass proportionally
    # (models/norm.py; round-1 VERDICT "Next round" #3). Opt-in.
    bn_stats_rows: int = 0
    # 'xla' | 'pallas_stats': bottleneck 1x1 convs as Pallas GEMMs with a
    # BN-statistics epilogue (ops/conv1x1_bn.py); '..._interpret' for CPU tests
    conv1x1_mode: str = "xla"
    pretrained: Optional[str] = None  # recorded for config parity; loading is
    # done offline via models.pretrained.load_torch_resnet_backbone

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        """x: (N*T, H, W, C) normalized frames; returns tagged stage outputs."""
        block_kind, stage_sizes, expansion = ARCH[self.depth]
        block_cls = _BasicBlock if block_kind == "basic" else _Bottleneck
        bn_train = train and not self.norm_eval

        h = x.astype(self.dtype)
        if self.stem_mode == "s2d":
            h = _S2DStem(64, self.dtype, name="conv1")(h)
        else:
            h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = _make_bn(not bn_train, self.norm_dtype, "bn1", self.bn_groups, self.bn_stats_rows)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats: Dict[str, jax.Array] = {}
        planes = 64
        fused_block = self.is_shift and self.shift_mode == "fused_block"
        # fused_block threads shift(block output) alongside the output: each
        # block's epilogue kernel emits its successor's shifted input
        h_shifted = (
            temporal_shift(h, self.num_segments, self.shift_div) if fused_block else None
        )
        for stage_idx, num_blocks in enumerate(stage_sizes):
            for block_idx in range(num_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                block = block_cls(
                    planes=planes,
                    stride=stride,
                    num_segments=self.num_segments,
                    shift_div=self.shift_div,
                    is_shift=self.is_shift,
                    dtype=self.dtype,
                    norm_dtype=self.norm_dtype,
                    shift_mode=self.shift_mode,
                    bn_groups=self.bn_groups,
                    bn_stats_rows=self.bn_stats_rows,
                    **({"conv1x1_mode": self.conv1x1_mode} if block_kind == "bottleneck" else {}),
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )
                if fused_block:
                    h, h_shifted = block(h, bn_train, h_shifted)
                else:
                    h = block(h, bn_train)
            feats[f"layer{stage_idx + 1}"] = h
            planes *= 2

        feats["out"] = h
        return feats

    @property
    def out_channels(self) -> int:
        _, _, expansion = ARCH[self.depth]
        return 512 * expansion
