"""Incremental TSM head with growable classifiers.

Functional rebuild of the reference head stack (libs/models/cil_heads/):
  * spatial average pool -> dropout -> growable classifier -> AvgConsensus
    over segments (mmaction2 TSMHead semantics, SURVEY.md §2.4 "TSM head")
  * ``SimpleLinear``-style classifier = ``IncrementalNet`` (inc_net.py:6-37)
  * ``LocalSimilarityClassifier`` = ``LSC`` cosine-proxy classifier
    (cosine_linear.py:6-55); with LSCLoss the learnable temperature eta lives
    here as a head parameter (the reference keeps it on the loss module,
    lsc_loss.py:28 — same optimizer treatment either way)
  * ``update_fc`` grows classifier parameters between tasks at the pytree
    level (kaiming-normal new rows, old rows copied — inc_net.py:23-34,
    cosine_linear.py:45-50). Shapes change per task => one re-jit per task.

Instead of forward hooks the head returns the pooled representation and the
consensus representation alongside logits (replaces OutputHook taps at
cil.py:501-506).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

LSC_TYPES = ("LocalSimilarityClassifier", "LSC")
LINEAR_TYPES = ("SimpleLinear", "IncrementalNet")


def kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(nonlinearity='linear'): U(-b, b), b = sqrt(3/fan_in)."""
    fan_in = shape[-1]
    bound = math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal_linear(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(nonlinearity='linear'): N(0, 1/fan_in)."""
    fan_in = shape[-1]
    std = 1.0 / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


class IncrementalTSMHead(nn.Module):
    num_classes: int
    in_channels: int
    num_segments: int = 8
    classifier_type: str = "LocalSimilarityClassifier"
    nb_proxies: int = 3
    dropout_ratio: float = 0.8
    with_eta: bool = False  # True when loss_cls is LSCLoss with learnable eta
    eta_init: float = 1.0
    init_std: float = 0.001  # kept for config parity; growable heads use kaiming
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        """x: (N*T, H, W, C) backbone features. Returns dict with
        'cls_score' (groups, num_classes), 'avg_pool' (N*T, C) KD tap, and
        'repr' (groups, C) consensus representation (L2-unnormalized)."""
        # spatial average pool == TSMHead avg_pool (spatial_type='avg')
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (N*T, C)

        h = pooled
        if self.dropout_ratio > 0:
            h = nn.Dropout(rate=self.dropout_ratio, deterministic=not train)(h)

        if self.classifier_type in LSC_TYPES:
            weights = self.param(
                "fc_weights",
                kaiming_normal_linear,
                (self.num_classes, self.nb_proxies * self.in_channels),
            )
            scores = self._lsc_forward(h, weights)
        elif self.classifier_type in LINEAR_TYPES:
            weight = self.param(
                "fc_weight", kaiming_uniform_linear, (self.num_classes, self.in_channels)
            )
            bias = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
            scores = h @ weight.T + bias
        else:
            raise ValueError(f"unknown classifier type {self.classifier_type!r}")

        if self.with_eta:
            # learnable NCA temperature (reference lsc_loss.py:28); exposed so
            # the loss can read it and the optimizer treats it as a classifier
            # parameter (tsm.py:255-262)
            self.param("eta", nn.initializers.constant(self.eta_init), (1,))

        # AvgConsensus over segments
        groups = scores.reshape(-1, self.num_segments, scores.shape[-1]).mean(axis=1)
        repr_consensus = pooled.reshape(-1, self.num_segments, pooled.shape[-1]).mean(axis=1)
        return {"cls_score": groups, "avg_pool": pooled, "repr": repr_consensus}

    def _lsc_forward(self, x: jax.Array, weights: jax.Array) -> jax.Array:
        """Cosine similarity against per-class proxies, softmax-reduced
        (cosine_linear.py:27-43)."""
        proxies = weights.reshape(self.num_classes * self.nb_proxies, self.in_channels)
        x_norm = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        p_norm = proxies / jnp.maximum(jnp.linalg.norm(proxies, axis=-1, keepdims=True), 1e-8)
        sims = x_norm @ p_norm.T  # (batch, num_classes * nb_proxies)
        sims = sims.reshape(-1, self.num_classes, self.nb_proxies)
        proxy_scores = jax.nn.softmax(sims, axis=2)
        return jnp.sum(proxy_scores * sims, axis=2)


def head_param_path(params: Dict) -> Dict:
    """Locate the head sub-dict inside a recognizer param tree."""
    for name in ("head", "cls_head"):
        if name in params:
            return params[name]
    return params


def update_fc(
    params: Dict,
    new_num_classes: int,
    key: jax.Array,
    classifier_type: str = "LocalSimilarityClassifier",
) -> Dict:
    """Grow the classifier to ``new_num_classes`` (reference update_fc).

    Copies old rows, kaiming-normal-inits new rows (both classifier types use
    kaiming_normal for growth — inc_net.py:26, cosine_linear.py:46-48). Works
    on a full recognizer param tree or a bare head tree; returns a new tree.
    """
    def _copy_tree(d):
        return {k: _copy_tree(v) if isinstance(v, dict) else v for k, v in d.items()}

    params = _copy_tree(dict(params))
    head = head_param_path(params)

    if classifier_type in LSC_TYPES:
        old = head["fc_weights"]
        old_nc = old.shape[0]
        if new_num_classes < old_nc:
            raise ValueError(f"cannot shrink classifier {old_nc} -> {new_num_classes}")
        new_w = kaiming_normal_linear(key, (new_num_classes, old.shape[1]), old.dtype)
        head["fc_weights"] = new_w.at[:old_nc].set(old)
    elif classifier_type in LINEAR_TYPES:
        old_w = head["fc_weight"]
        old_b = head["fc_bias"]
        old_nc = old_w.shape[0]
        if new_num_classes < old_nc:
            raise ValueError(f"cannot shrink classifier {old_nc} -> {new_num_classes}")
        new_w = kaiming_normal_linear(key, (new_num_classes, old_w.shape[1]), old_w.dtype)
        head["fc_weight"] = new_w.at[:old_nc].set(old_w)
        new_b = jnp.zeros((new_num_classes,), old_b.dtype)
        head["fc_bias"] = new_b.at[:old_nc].set(old_b)
    else:
        raise ValueError(f"unknown classifier type {classifier_type!r}")
    return params
