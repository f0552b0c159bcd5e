"""Running meters (reference: libs/utils.py:8-26) plus a throughput meter
for the clips/sec/chip north-star metric (SURVEY.md §5 tracing note)."""

from __future__ import annotations

import time


class AverageMeter:
    """Stores per-update values/sizes and a running weighted average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.values = []
        self.sizes = []
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.values.append(val)
        self.sizes.append(n)
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Throughput:
    """Measures items/sec with warmup-step exclusion.

    Call ``tick(n_items)`` once per step; the first ``warmup`` steps are
    excluded from the rate (they typically include XLA compilation).
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._steps = 0
        self._items = 0
        self._t0 = None

    def tick(self, n_items: int):
        self._steps += 1
        if self._steps == self.warmup:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._steps > self.warmup:
            self._items += n_items

    @property
    def rate(self) -> float:
        if self._t0 is None or self._items == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0
