from .meters import AverageMeter, Throughput
from .tables import print_mean_accuracy
from .logging import MetricLogger, get_logger

__all__ = [
    "AverageMeter",
    "Throughput",
    "print_mean_accuracy",
    "MetricLogger",
    "get_logger",
]
