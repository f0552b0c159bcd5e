"""Multi-host (multi-process) support.

Single-host multi-chip needs nothing: one process drives all local devices
and the SPMD partitioner handles ICI collectives. For multi-host slices
(v5e pods), the reference's NCCL/ddp_spawn + per-rank-file gather
(cil.py:1092-1126) maps to:

  * ``initialize()``            — jax.distributed.initialize (DCN rendezvous)
  * a global Mesh over all processes' devices (make_mesh already takes
    jax.devices(), which is global after initialize)
  * ``all_gather_host(x)``      — multihost_utils.process_allgather replacing
    the per-rank prediction files
  * ``is_primary()``            — rank-0 guard for file writes (ann files,
    checkpoints, result tables)

The per-process batch contract: each host feeds its local shard of the
global batch; ``shard_batch`` with a global mesh handles the device_put via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op if already
    initialized or single-process).

    Called from every CLI entry point (cil_tools/*, tools/train.py). On TPU
    pod slices jax auto-detects the topology; for manual launches (and the
    CPU multi-process tests) set BDVC_COORDINATOR_ADDRESS,
    BDVC_NUM_PROCESSES and BDVC_PROCESS_ID. Replaces the reference's
    init_dist/NCCL launchers (tools/train.py:74-78, :128-135).
    """
    import os

    # Honor an explicit JAX_PLATFORMS before ANY backend discovery: some
    # images force-register a TPU plugin at interpreter startup that wins
    # over the env var (the __graft_entry__ dryrun does the same dance).
    # Without this, every process of a multi-process CPU run still opens a
    # connection to the tunneled TPU during backend discovery, and two
    # concurrent clients contending for the one chip deadlock at startup.
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if plats:
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:  # backend already initialized; keep going
            pass

    # Do NOT touch jax.process_count()/jax.devices() here: querying devices
    # initializes the single-process backend and makes a later
    # jax.distributed.initialize a silent no-op.
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("BDVC_COORDINATOR_ADDRESS")
        if coordinator_address is not None:
            num_processes = int(os.environ["BDVC_NUM_PROCESSES"])
            process_id = int(os.environ["BDVC_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def all_gather_host(x: Any):
    """Gather host-local arrays from every process (replaces the reference's
    predictions_rank_i.pt files + host merge)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)


def sync_processes(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
