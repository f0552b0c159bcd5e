"""Grouped batch normalization: the reference's per-GPU BN semantics on SPMD.

The reference trains with torch DDP and NO SyncBN, so every GPU normalizes
with statistics of its own 12-sample shard (SURVEY.md §3.1; config
videos_per_gpu, reference config :8). The SPMD train step here computes
batch statistics over the GLOBAL batch by default — a semantic difference
flagged in round-1 VERDICT Weak #5. ``GroupedBatchNorm`` restores the
reference behavior: train-mode statistics are computed independently over
``groups`` contiguous row blocks of the (N*T) leading axis. Batches are
sharded contiguously over the 'data' mesh axis (parallel/mesh.py), so
``groups = mesh size`` makes each group exactly one device's shard and the
reductions stay shard-local (no cross-device traffic for the stats).

Variable layout is identical to ``flax.linen.BatchNorm`` (params
scale/bias, batch_stats mean/var) so checkpoints, pretrained-weight
conversion and update_fc are unaffected. Running statistics are the average
of the per-group statistics — matching what a torch DDP checkpoint
effectively carries (rank-0's running stats over its own shards).

``groups=1`` reproduces flax BatchNorm exactly (tested).

``stats_rows`` (ghost-batch statistics, round-1 VERDICT "Next round" #3):
when > 0, train-mode statistics are computed from only the first
``stats_rows`` rows of each group's leading axis instead of all rows, and
every row is normalized with those subset statistics. This cuts the
HBM-bound full-activation statistics pass (the profiled ~35% BN cost,
PERF_NOTES "Step profile") proportionally to the subset fraction, at the
price of noisier statistics — a deliberate numerics change, off by
default, measured in PERF_NOTES. The subset is a per-group row *prefix* so
that under a 'data'-sharded batch with ``groups = mesh size`` the subset
rows stay shard-local (each device reduces its own prefix; no gather onto
one device).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class GroupedBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    groups: int = 1
    stats_rows: int = 0  # 0 = all rows; >0 = ghost stats from a per-group row prefix

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        out_dtype = self.dtype or x.dtype
        if self.use_running_average:
            inv = scale / jnp.sqrt(ra_var.value + self.epsilon)
            y = (x.astype(out_dtype) - ra_mean.value.astype(out_dtype)) * inv.astype(
                out_dtype
            ) + bias.astype(out_dtype)
            return y

        g = self.groups
        n = x.shape[0]
        assert n % g == 0, f"leading dim {n} not divisible by bn groups {g}"
        # clamp to the group size: param-init and eval tracing use tiny dummy
        # batches whose row count can be below the configured subset
        k = min(self.stats_rows, n // g) if self.stats_rows else 0
        xg = x.reshape((g, n // g) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))  # rows + spatial, keep (G, C)
        if k:
            # ghost stats: reduce only the per-group row prefix, normalize in
            # the compute dtype (the fast flax-BatchNorm-style path)
            xs = xg[:, :k].astype(jnp.float32)
            group_mean = jnp.mean(xs, axis=axes)  # (G, C)
            group_mean2 = jnp.mean(jnp.square(xs), axis=axes)
            group_var = group_mean2 - jnp.square(group_mean)
            inv = (scale[None] / jnp.sqrt(group_var + self.epsilon)).astype(out_dtype)
            mu = group_mean.astype(out_dtype)
            shape = (g,) + (1,) * (xg.ndim - 2) + (c,)
            y = (xg.astype(out_dtype) - mu.reshape(shape)) * inv.reshape(shape)
            y = y.reshape(x.shape) + bias.astype(out_dtype)
        else:
            xf = xg.astype(jnp.float32)
            group_mean = jnp.mean(xf, axis=axes)  # (G, C)
            group_mean2 = jnp.mean(jnp.square(xf), axis=axes)
            group_var = group_mean2 - jnp.square(group_mean)

            # broadcast each group's stats over its own rows
            shape = (g,) + (1,) * (xf.ndim - 2) + (c,)
            y = (xf - group_mean.reshape(shape)) / jnp.sqrt(group_var.reshape(shape) + self.epsilon)
            y = y.reshape(x.shape).astype(out_dtype)
            y = y * scale.astype(out_dtype) + bias.astype(out_dtype)

        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * group_mean.mean(axis=0)
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * group_var.mean(axis=0)
            )
        return y
