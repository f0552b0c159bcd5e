"""Per-task checkpoints.

Mirrors the reference's artifact contract (SURVEY.md §5 "Checkpoint/resume"):
``ckpt/ckpt_task_{t}.msgpack`` holding {'params', 'batch_stats'} plus a JSON
sidecar with the classifier width — the CIL resume path needs to know how far
``update_fc`` had grown before loading (cil.py:676-688).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | pathlib.Path, variables: Dict[str, Any], meta: Optional[Dict] = None) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": _to_host(variables["params"]),
        "batch_stats": _to_host(variables.get("batch_stats", {})),
    }
    path.write_bytes(serialization.msgpack_serialize(payload))
    if meta is not None:
        path.with_suffix(".json").write_text(json.dumps(meta, default=float))


def load_checkpoint(path: str | pathlib.Path) -> Tuple[Dict[str, Any], Optional[Dict]]:
    path = pathlib.Path(path)
    variables = serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else None
    return variables, meta


# -- mid-task train snapshots (preemption-safe resume) ----------------------
#
# The reference has no mid-task resume at all — Lightning checkpointing is
# disabled (cil.py:750) and recovery is per-task only (cil.py:655-695).
# TPU pods get preempted; a rolling epoch-boundary snapshot of the FULL
# train state (params, batch stats, optimizer state, step count, rng key)
# makes `--starting_task t` resume bit-exact from the last completed epoch
# instead of re-running the whole task.


_SNAP_MAGIC = b"BDVSNAP1"  # header: magic + u32le meta length + meta JSON


def save_train_snapshot(path: str | pathlib.Path, state, rng_key, meta: Dict) -> None:
    """Atomically write a rolling snapshot of a TrainState mid-phase.

    ``meta`` must identify the phase ({'task', 'phase', 'epoch',
    'num_classes', 'run_token'}) so a stale snapshot from a different
    task/phase/experiment is never restored. The meta rides in a
    length-prefixed header of the SAME file as the msgpack payload (and is
    duplicated inside the payload) — one tmp+rename is the whole commit
    point, so a preemption can never pair a new payload with an old meta,
    and ``peek_train_snapshot_meta`` reads only the small header instead of
    deserializing hundreds of MB of weights at every phase start. A JSON
    sidecar is also written for humans but is never the source of truth.
    """
    import os

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta_json = json.dumps(meta, default=float)
    payload = {
        "meta": meta_json,
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(serialization.to_state_dict(state.opt_state)),
        "rng_key": np.asarray(rng_key),
    }
    meta_bytes = meta_json.encode()
    header = _SNAP_MAGIC + len(meta_bytes).to_bytes(4, "little") + meta_bytes
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(header + serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    try:  # informational only
        path.with_suffix(".json").write_text(meta_json)
    except OSError:
        pass


def _split_snapshot_header(path: pathlib.Path):
    """(meta dict or None, payload byte offset) — header-only read."""
    with open(path, "rb") as f:
        magic = f.read(len(_SNAP_MAGIC))
        if magic != _SNAP_MAGIC:  # legacy snapshot: bare msgpack, meta inside
            return None, 0
        n = int.from_bytes(f.read(4), "little")
        meta = json.loads(f.read(n))
        return meta, len(_SNAP_MAGIC) + 4 + n


def peek_train_snapshot_meta(path: str | pathlib.Path) -> Optional[Dict]:
    """Meta of a snapshot, from the snapshot file itself (the sidecar is
    advisory). Reads only the header for current-format snapshots; falls
    back to a full payload parse for legacy ones."""
    path = pathlib.Path(path)
    if not path.exists():
        return None
    try:
        meta, _ = _split_snapshot_header(path)
        if meta is not None:
            return meta
        raw = serialization.msgpack_restore(path.read_bytes())
        return json.loads(raw["meta"])
    except Exception:  # truncated/corrupt snapshot: treat as absent
        return None


def load_train_snapshot(path: str | pathlib.Path, state_target):
    """Restore a snapshot into a freshly-created TrainState of matching
    shapes (build it with ``TrainState.create(variables, tx)`` first — the
    optimizer-state pytree structure comes from the target).

    Returns (state, rng_key, meta) with meta read from the same payload the
    state came from."""
    import jax.numpy as jnp

    path = pathlib.Path(path)
    _, offset = _split_snapshot_header(path)
    raw = serialization.msgpack_restore(path.read_bytes()[offset:])
    state = state_target.replace(
        step=jnp.asarray(raw["step"]),
        params=serialization.from_state_dict(state_target.params, raw["params"]),
        batch_stats=serialization.from_state_dict(state_target.batch_stats, raw["batch_stats"]),
        opt_state=serialization.from_state_dict(state_target.opt_state, raw["opt_state"]),
    )
    return state, jnp.asarray(raw["rng_key"]), json.loads(raw["meta"])


def clear_train_snapshot(path: str | pathlib.Path) -> None:
    path = pathlib.Path(path)
    path.unlink(missing_ok=True)
    path.with_suffix(".json").unlink(missing_ok=True)


# -- orbax backend (optional; SURVEY.md §5 "orbax per-task checkpoints") ----


def save_checkpoint_orbax(directory: str | pathlib.Path, variables: Dict[str, Any]) -> None:
    """Directory-format orbax checkpoint (async-capable, sharding-aware) —
    preferable for multi-host runs where every process writes its shards."""
    import orbax.checkpoint as ocp

    directory = pathlib.Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            directory,
            {"params": _to_host(variables["params"]),
             "batch_stats": _to_host(variables.get("batch_stats", {}))},
            force=True,
        )


def load_checkpoint_orbax(directory: str | pathlib.Path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    directory = pathlib.Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(directory)
