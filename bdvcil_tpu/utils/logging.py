"""Scalar metric logging: stdout + JSONL sink, optional wandb/TensorBoard.

Replaces the reference's WandbLogger(project='CILVideo') usage
(libs/cil/cil.py:712, training-step scalar logs at cil.py:550-551). wandb is
optional: if importable and WANDB_API_KEY is configured, scalars are mirrored
there; otherwise everything lands in ``<work_dir>/metrics.jsonl`` + stdout.
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import sys
import time
from typing import Any, Dict, Optional

_LOGGERS: Dict[str, logging.Logger] = {}


def get_logger(name: str = "bdvcil") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


class MetricLogger:
    def __init__(self, work_dir: Optional[str] = None, project: str = "CILVideo", use_wandb: bool = False):
        self.work_dir = pathlib.Path(work_dir) if work_dir else None
        self._fh = None
        if self.work_dir is not None:
            self.work_dir.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.work_dir / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb  # noqa: deferred optional dep

                self._wandb = wandb.init(project=project, dir=str(self.work_dir or "."))
            except Exception:
                self._wandb = None
        self._step = 0

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        step = self._step if step is None else step
        self._step = step + 1
        record = {"step": step, "time": time.time(), **metrics}
        if self._fh is not None:
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
