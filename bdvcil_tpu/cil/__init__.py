from .herding import Herding
from .data_module import CILDataModule
from .trainer import CILTrainer

__all__ = ["Herding", "CILDataModule", "CILTrainer"]
