"""Device mesh + sharding helpers.

The reference scales with NCCL data parallelism via Lightning ddp_spawn
(SURVEY.md §2.4 "Distributed / communication backend"); this framework's
TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over the 'data' axis:
batches are sharded on their leading dim, parameters/optimizer state are
replicated, and the SPMD partitioner inserts the gradient all-reduce over ICI
automatically inside the jitted train step. The model is a <25M-param CNN —
pure DP is the whole parallelism story (SURVEY.md §5 long-context note), so
there is deliberately no TP/PP machinery here.

Works identically on a real TPU slice and on the CPU test mesh created with
``--xla_force_host_platform_device_count=N``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "data",
    hybrid_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data mesh, or a hierarchical ('dcn', 'data') mesh for multi-slice.

    On a single slice/pod the 1-D mesh is right: the gradient all-reduce
    rides ICI. Across slices (TPU multislice: ICI inside a slice, DCN
    between), a hierarchical mesh tells XLA the topology so it emits
    reduce-scatter within slices over ICI and only the per-slice partial
    crosses DCN (the scaling-book hybrid-mesh recipe). Batches still shard
    over BOTH axes (batch_sharding shards the leading dim over every mesh
    axis), so the program is identical pure DP either way.

    Slice boundaries are auto-detected from ``device.slice_index`` when
    present; pass ``hybrid_shape=(num_slices, per_slice)`` to force (e.g. on
    the CPU test mesh, which has no slice topology).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if hybrid_shape is None:
        counts: dict = {}
        for d in devices:
            sid = getattr(d, "slice_index", 0) or 0
            counts[sid] = counts.get(sid, 0) + 1
        # only auto-enable for EQUAL slices: with unequal counts the (rows =
        # slices) reshape would mix slices within an ICI row and hand XLA a
        # wrong topology hint (DCN links treated as ICI)
        if len(counts) > 1 and len(set(counts.values())) == 1:
            hybrid_shape = (len(counts), len(devices) // len(counts))
    if hybrid_shape is not None:
        n_dcn, n_ici = int(hybrid_shape[0]), int(hybrid_shape[1])
        assert n_dcn * n_ici == len(devices), (hybrid_shape, len(devices))
        # order devices so each mesh row is one slice (contiguous ICI group)
        devices = sorted(
            devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id)
        )
        grid = np.asarray(devices).reshape(n_dcn, n_ici)
        return Mesh(grid, ("dcn", axis_name))
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-dim sharding for batches, over every mesh axis (so the same
    spec serves the 1-D data mesh and the hierarchical ('dcn','data') one)."""
    axes = tuple(mesh.axis_names)
    spec = axes if len(axes) > 1 else axis_name
    return NamedSharding(mesh, P(spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``axis`` up to a multiple; returns (padded, valid_count)."""
    n = array.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return array, n
    pad_widths = [(0, 0)] * array.ndim
    pad_widths[axis] = (0, target - n)
    return np.pad(array, pad_widths, mode="edge"), n


def shard_batch(
    batch: Dict[str, Any],
    mesh: Mesh,
    axis_name: str = "data",
    leading_pytree_axes: int = 0,
) -> Dict[str, Any]:
    """device_put numeric fields with batch-dim sharding.

    Batch sizes must be divisible by the mesh size; callers pad with
    ``pad_to_multiple`` and carry a valid mask. Non-array fields pass through.
    ``leading_pytree_axes`` is the index of the data-sharded batch axis —
    0 for plain batches, 1 for K-stacked super-batches (the lax.scan step
    axis of runtime/steps.make_multi_train_step leads, and must stay
    unsharded: every device runs all K scan iterations on its batch shard).

    Multi-process: each process passes its LOCAL rows of the global batch
    (the loaders shard batches per process, data/loader.py) and the global
    array is assembled over the full mesh via
    ``jax.make_array_from_process_local_data`` — the TPU-native replacement
    for the reference's per-rank DistributedSampler shards (SURVEY.md §2.4).
    """
    axes = tuple(mesh.axis_names)
    # multi-axis meshes shard the batch dim over EVERY axis (hierarchical
    # dcn x data meshes); on a 1-D mesh the caller's axis_name is honored —
    # and must actually name the mesh axis (ADVICE round 4: it was silently
    # ignored before, so a caller passing a custom name got whatever axis
    # happened to be first)
    if len(axes) == 1:
        assert axis_name in axes, (axis_name, axes)
        batch_spec = axis_name
    else:
        batch_spec = axes
    spec = [None] * leading_pytree_axes + [batch_spec]
    sharding = NamedSharding(mesh, P(*spec))
    b_ax = leading_pytree_axes
    nproc = jax.process_count()
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.dtype != object:
            if nproc > 1:
                global_shape = (
                    value.shape[:b_ax]
                    + (value.shape[b_ax] * nproc,)
                    + value.shape[b_ax + 1 :]
                )
                out[key] = jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(value), global_shape
                )
            else:
                out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))


def gather_to_host(x, mesh: Mesh) -> np.ndarray:
    """Bring a (possibly data-sharded) global array fully to this host.

    Single-process: plain device_get. Multi-process: an identity jit with
    replicated out_sharding performs the all-gather over ICI/DCN, after which
    every process can read the full value — replacing the reference's
    per-rank prediction files + host merge (cil.py:1092-1126).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    replicated = jax.jit(lambda a: a, out_shardings=replicated_sharding(mesh))(x)
    return np.asarray(jax.device_get(replicated.addressable_data(0)))
