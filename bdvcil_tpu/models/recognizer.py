"""2D recognizer: backbone + head with clip/crop handling.

Functional rebuild of mmaction2 ``Recognizer2D`` + the reference's
``CILRecognizer2D`` subclass (libs/models/base.py:8-42): the (N, M, H, W, C)
batch is flattened to (N*M, H, W, C) for the backbone, the head folds
segments via AvgConsensus, and test-time crop/clip scores are averaged by
``average_clips`` ('prob' softmax-then-mean | 'score' mean | None).

Forward hooks are replaced by returned tagged intermediates: the output dict
carries 'cls_score', 'repr', and 'feats' keyed with the reference's
kd_modules_names ('backbone.layerN', 'cls_head.avg_pool') so KD configs work
verbatim.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import IncrementalTSMHead
from .resnet_tsm import ResNetTSM


def average_clips(cls_score: jax.Array, mode: Optional[str] = "prob") -> jax.Array:
    """(B, G, num_classes) -> (B, num_classes); G = crops*clips per video."""
    if mode is None:
        return cls_score
    if mode == "prob":
        return jax.nn.softmax(cls_score, axis=-1).mean(axis=1)
    if mode == "score":
        return cls_score.mean(axis=1)
    raise ValueError(f"average_clips mode must be 'prob'|'score'|None, got {mode!r}")


class CILRecognizer2D(nn.Module):
    backbone: ResNetTSM
    head: IncrementalTSMHead

    @nn.compact
    def __call__(self, imgs: jax.Array, train: bool = False) -> Dict[str, Any]:
        """imgs: (B, M, H, W, C) normalized frames, M = crops * num_segments.

        Returns:
          cls_score: (B, G, num_classes) with G = M // num_segments
          repr:      (B, G, C) consensus representation (pre-normalize)
          feats:     KD taps {'backbone.layer1'.., 'cls_head.avg_pool'}
        """
        b, m = imgs.shape[0], imgs.shape[1]
        # accept either NHWC (TPU-native) or NCHW (reference FormatShape) —
        # shapes are static so this branch resolves at trace time
        if imgs.shape[-1] not in (1, 3) and imgs.shape[2] in (1, 3):
            imgs = jnp.transpose(imgs, (0, 1, 3, 4, 2))
        x = imgs.reshape((b * m,) + imgs.shape[2:])
        feats = self.backbone(x, train=train)
        head_out = self.head(feats["out"], train=train)

        num_groups = m // self.head.num_segments
        cls_score = head_out["cls_score"].reshape(b, num_groups, -1)
        repr_ = head_out["repr"].reshape(b, num_groups, -1)

        kd_feats = {
            "backbone.layer1": feats["layer1"],
            "backbone.layer2": feats["layer2"],
            "backbone.layer3": feats["layer3"],
            "backbone.layer4": feats["layer4"],
            "cls_head.avg_pool": head_out["avg_pool"],
        }
        return {"cls_score": cls_score, "repr": repr_, "feats": kd_feats}
