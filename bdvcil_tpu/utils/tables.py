"""The canonical CIL result table (reference: libs/utils.py:29-48).

Renders the per-task accuracy matrix: one row per evaluated checkpoint
(task_i), columns are the class ranges of each task, last column the
sample-weighted average, final row the mean of the per-task averages.
"""

from __future__ import annotations

from typing import List

import numpy as np
from tabulate import tabulate

from .meters import AverageMeter


def print_mean_accuracy(
    accuracies: List[AverageMeter], num_classes_per_task, floatfmt: str = ".2f"
) -> str:
    assert len(accuracies) == len(num_classes_per_task)
    num_tasks = len(num_classes_per_task)

    start = 0
    headers = ["range"]
    for num_classes in num_classes_per_task:
        headers.append("{}-{}".format(start, start + num_classes - 1))
        start += num_classes
    headers.append("Avg")

    table = []
    avg_acc = []
    for task_i in range(num_tasks):
        num_placeholders = num_tasks - task_i - 1
        table.append(
            ["task {}".format(task_i), *accuracies[task_i].values]
            + num_placeholders * [None]
            + [accuracies[task_i].avg]
        )
        avg_acc.append(accuracies[task_i].avg)

    table.append(["avg_acc"] + num_tasks * [None] + [float(np.mean(avg_acc))])
    return tabulate(table, headers=headers, floatfmt=[floatfmt] * (num_tasks + 2), missingval="")
