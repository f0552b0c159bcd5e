from .resnet_tsm import ResNetTSM
from .heads import IncrementalTSMHead, update_fc
from .recognizer import CILRecognizer2D, average_clips
from .builder import build_model, init_model_params
from .pretrained import load_torch_resnet_backbone

__all__ = [
    "ResNetTSM",
    "IncrementalTSMHead",
    "update_fc",
    "CILRecognizer2D",
    "average_clips",
    "build_model",
    "init_model_params",
    "load_torch_resnet_backbone",
]
