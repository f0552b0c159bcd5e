"""bdvcil_tpu — TPU-native background-debiased video class-incremental learning.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the PyTorch
reference ``NinV/Background-Debiased-Video-CIL`` (see SURVEY.md): TSM video
recognizers, a multi-stage class-incremental training loop with herding-based
exemplar memory, feature-distillation / iCaRL methods, class-balanced
fine-tuning, CNN + NME evaluation, and the background-debiasing augmentation
suite (temporal-median background extraction, background alpha-mixing,
ActorCutMix, clip-consistent RandAugment, tube-mix).

Layout:
  config     python-file config loader (mmcv-Config-compatible shape)
  registry   tiny type-string registry used by dataset/pipeline factories
  data       annotations, frame sampling, host decode, transform pipelines,
             datasets (RawframeDataset / BackgroundMixDataset / ActorCutMixDataset)
  ops        device kernels: temporal shift (Pallas), fused augmentation
  models     ResNet-TSM backbones, incremental heads, recognizers
  losses     LSC/NCA, soft-target CE, ACMSmoothCE, feature-KD
  optim      optax optimizer with TSM param-group policy + schedulers
  parallel   device mesh + sharding helpers
  runtime    jit train/eval loops, checkpointing, metering
  cil        CIL orchestration: data module, herding, task-loop trainer
"""

__version__ = "0.1.0"

from .config import Config
from .registry import Registry
