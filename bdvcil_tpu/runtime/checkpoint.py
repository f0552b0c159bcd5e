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
