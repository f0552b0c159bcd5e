"""Model building from reference-shaped config dicts.

Accepts the mmaction2-style model config verbatim (e.g. configs/ucf101/...:57-83):

    model = dict(
        type='CILRecognizer2D',
        backbone=dict(type='ResNetTSM', depth=34, num_segments=8, shift_div=8, ...),
        cls_head=dict(type='IncrementalTSMHead', num_classes=N, in_channels=512,
                      inc_head_config=dict(type='LocalSimilarityClassifier',
                                           out_features=N, nb_proxies=1),
                      loss_cls=dict(type='LSCLoss'), dropout_ratio=0.5, ...),
        test_cfg=dict(average_clips='prob'))
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .heads import IncrementalTSMHead, update_fc
from .recognizer import CILRecognizer2D
from .resnet_tsm import ResNetTSM


@dataclasses.dataclass
class ModelSpec:
    """A recognizer config resolved into constructor kwargs; ``module(nc)``
    builds the flax module for any classifier width (one per task)."""

    backbone_kwargs: Dict[str, Any]
    head_kwargs: Dict[str, Any]
    loss_cls: Dict[str, Any]
    test_cfg: Dict[str, Any]
    num_classes: int
    dtype: Any = jnp.float32

    @property
    def classifier_type(self) -> str:
        return self.head_kwargs["classifier_type"]

    @property
    def num_segments(self) -> int:
        return self.head_kwargs["num_segments"]

    @property
    def average_clips(self) -> Optional[str]:
        return self.test_cfg.get("average_clips", "prob")

    def module(self, num_classes: Optional[int] = None) -> CILRecognizer2D:
        nc = self.num_classes if num_classes is None else num_classes
        backbone = ResNetTSM(dtype=self.dtype, **self.backbone_kwargs)
        head = IncrementalTSMHead(num_classes=nc, dtype=self.dtype, **self.head_kwargs)
        return CILRecognizer2D(backbone=backbone, head=head)

    def grow_params(self, variables: Dict, new_num_classes: int, key: jax.Array) -> Dict:
        """update_fc at the variables level (params + untouched batch_stats)."""
        out = dict(variables)
        out["params"] = update_fc(
            variables["params"], new_num_classes, key, self.classifier_type
        )
        return out


def build_model(cfg: Dict[str, Any], dtype: Any = jnp.float32) -> ModelSpec:
    cfg = dict(cfg)
    assert cfg.get("type", "CILRecognizer2D") in ("CILRecognizer2D", "Recognizer2D")
    b = dict(cfg["backbone"])
    assert b.pop("type") == "ResNetTSM"
    backbone_kwargs = dict(
        depth=b.get("depth", 50),
        num_segments=b.get("num_segments", 8),
        shift_div=b.get("shift_div", 8),
        is_shift=b.get("is_shift", True),
        norm_eval=b.get("norm_eval", False),
        # 'pad' (materialized shift) measured fastest on v5e: 212 clips/s vs
        # 205 'fused' (conv-linearity decomposition, ops/tsm_shift.shifted_conv)
        # vs 316 no-shift ablation — XLA already overlaps the shift copies well
        shift_mode=b.get("shift_mode", "pad"),
        stem_mode=b.get("stem_mode", "conv"),
        # bottleneck 1x1 convs: 'xla' or 'pallas_stats' (Pallas GEMM with a
        # BN-statistics epilogue, ops/conv1x1_bn.py)
        conv1x1_mode=b.get("conv1x1_mode", "xla"),
        pretrained=b.get("pretrained"),
        # bn_groups: 1 = global-batch stats (SPMD default); an int sets the
        # number of contiguous stat groups; 'per_device' resolves to the
        # device count = the reference's per-GPU no-SyncBN semantics
        bn_groups=(
            len(jax.devices())
            if b.get("bn_groups") == "per_device"
            else int(b.get("bn_groups", 1))
        ),
        # bn_stats_rows: 0 = exact BN; >0 = ghost statistics from the first
        # k rows of each stat group (models/norm.py) — cuts the HBM-bound
        # statistics pass; opt-in, measured in PERF_NOTES
        bn_stats_rows=int(b.get("bn_stats_rows", 0)),
    )
    if "norm_dtype" in b:
        backbone_kwargs["norm_dtype"] = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16
        }.get(b["norm_dtype"], b["norm_dtype"])
    else:
        # follow the compute dtype: flax BatchNorm computes statistics in
        # float32 internally either way, and keeping the normalize in
        # bfloat16 removes the cast fences around every conv
        # (+37% train throughput measured on v5e, see bench.py)
        backbone_kwargs["norm_dtype"] = dtype

    h = dict(cfg["cls_head"])
    assert h.pop("type") == "IncrementalTSMHead"
    inc = dict(h.get("inc_head_config", {"type": "LocalSimilarityClassifier"}))
    classifier_type = inc.get("type", "LocalSimilarityClassifier")
    loss_cls = dict(h.get("loss_cls", {"type": "CrossEntropyLoss"}))
    with_eta = loss_cls.get("type") == "LSCLoss"

    num_classes = h["num_classes"]
    head_kwargs = dict(
        in_channels=h["in_channels"],
        num_segments=h.get("num_segments", 8),
        classifier_type=classifier_type,
        nb_proxies=inc.get("nb_proxies", 3),
        dropout_ratio=h.get("dropout_ratio", 0.8),
        with_eta=with_eta,
        eta_init=loss_cls.get("eta", 1.0),
        init_std=h.get("init_std", 0.001),
    )

    test_cfg = dict(cfg.get("test_cfg") or {"average_clips": "prob"})
    return ModelSpec(
        backbone_kwargs=backbone_kwargs,
        head_kwargs=head_kwargs,
        loss_cls=loss_cls,
        test_cfg=test_cfg,
        num_classes=num_classes,
        dtype=dtype,
    )


def init_model_params(
    spec: ModelSpec,
    key: jax.Array,
    input_shape: Tuple[int, ...] = (1, 8, 224, 224, 3),
    num_classes: Optional[int] = None,
) -> Dict:
    """Initialize {'params', 'batch_stats'} for the recognizer."""
    module = spec.module(num_classes)
    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = module.init({"params": key, "dropout": key}, dummy, train=False)
    return dict(variables)
