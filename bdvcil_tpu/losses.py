"""Loss functions (pure jnp).

Rebuilds the reference's loss surface:
  * ``cross_entropy``      — standard CE (mmaction2 CrossEntropyLoss)
  * ``lsc_nca_loss``       — PODNet NCA over cosine similarities with
                             learnable temperature eta, margin, positive-
                             excluded denominator, hinge clamp
                             (libs/losses/lsc_loss.py:30-58)
  * ``soft_target_ce``     — iCaRL CE on soft targets,
                             -mean(sum y * log_softmax) (libs/cil/icarl.py:124-125)
  * ``acm_smooth_ce``      — ActorCutMix label smoothing with
                             lambda = 1 - (1 - fg_ratio)^alpha
                             (libs/losses/acm_smooth_ce.py:7-30). NOTE: the
                             reference module returns +mean(sum y*log_softmax)
                             (a sign bug); the faithful semantics replicated
                             here are the correctly-negated iCaRL path
                             (icarl.py:103-125); pass buggy_sign=True for the
                             literal module behavior.
  * ``feature_kd_loss``    — MSE feature distillation over tagged
                             intermediates with per-module weights and
                             per-task adaptive scale, optional exemplar-only
                             masking (libs/cil/cil.py:517-542)
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp


def weighted_mean(values: jax.Array, weights: Optional[jax.Array]) -> jax.Array:
    """Mean over the batch, optionally masked by per-sample weights.

    Weights of {1, 0} implement padded batches: tail batches are padded to a
    static, mesh-divisible size and the pad rows carry weight 0 so the loss
    matches the reference's variable last batch exactly."""
    if weights is None:
        return jnp.mean(values)
    weights = weights.astype(values.dtype)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1e-8)


def cross_entropy(
    cls_score: jax.Array, labels: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """cls_score: (B, C) logits, labels: (B,) int."""
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    per_sample = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return weighted_mean(per_sample, weights)


def lsc_nca_loss(
    similarities: jax.Array,
    targets: jax.Array,
    eta: jax.Array,
    margin: float = 0.6,
    exclude_pos_denominator: bool = True,
    hinge_proxynca: bool = True,
    class_weights: Optional[jax.Array] = None,
    sample_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """NCA loss on cosine similarities (lsc_loss.py:30-58).

    similarities: (B, C); targets: (B,) int; eta: scalar/1-vec learnable.
    """
    if not exclude_pos_denominator:
        return cross_entropy(similarities, targets, sample_weights)

    sims = eta.reshape(()) * (similarities - margin)
    sims = sims - jax.lax.stop_gradient(jnp.max(sims, axis=1, keepdims=True))

    batch = sims.shape[0]
    pos = jnp.take_along_axis(sims, targets[:, None], axis=1)  # (B, 1)
    # zero out the positive column in the denominator
    disable_pos = jnp.zeros_like(sims).at[jnp.arange(batch), targets].set(pos[:, 0])
    denominator = sims - disable_pos

    losses = pos[:, 0] - jnp.log(jnp.sum(jnp.exp(denominator), axis=-1))
    if class_weights is not None:
        losses = class_weights[targets] * losses
    losses = -losses
    if hinge_proxynca:
        losses = jnp.clip(losses, min=0.0)
    return weighted_mean(losses, sample_weights)


def soft_target_ce(
    cls_score: jax.Array, soft_targets: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """-mean over batch of sum_c y_c log_softmax(s)_c (icarl.py:124-125)."""
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    return weighted_mean(-jnp.sum(soft_targets * logp, axis=-1), weights)


def acm_smooth_targets(
    labels: jax.Array,
    background_labels: jax.Array,
    foreground_ratio: jax.Array,
    num_classes: int,
    alpha: float = 4.0,
) -> jax.Array:
    """lambda-mixed one-hot targets (acm_smooth_ce.py:17-27 / icarl.py:103-111).

    labels/background_labels: (B,) int; background -1 is remapped to 0 (it has
    no effect because fg_ratio==1 there); foreground_ratio: (B,) in [0, 1].
    """
    action = jax.nn.one_hot(labels, num_classes)
    bg = jax.nn.one_hot(jnp.where(background_labels == -1, 0, background_labels), num_classes)
    lam = 1.0 - (1.0 - foreground_ratio) ** alpha
    lam = lam[:, None]
    return action * lam + (1.0 - lam) * bg


def acm_smooth_ce(
    cls_score: jax.Array,
    labels: jax.Array,
    background_labels: jax.Array,
    foreground_ratio: jax.Array,
    num_classes: int,
    alpha: float = 4.0,
    buggy_sign: bool = False,
) -> jax.Array:
    y = acm_smooth_targets(labels, background_labels, foreground_ratio, num_classes, alpha)
    loss = jnp.mean(jnp.sum(y * jax.nn.log_softmax(cls_score, axis=-1), axis=-1))
    return loss if buggy_sign else -loss


def feature_kd_loss(
    current_feats: Mapping[str, jax.Array],
    prev_feats: Mapping[str, jax.Array],
    module_names: Sequence[str],
    module_weights: Sequence[float],
    scale_factor: float,
    labels: Optional[jax.Array] = None,
    prev_num_classes: Optional[int] = None,
    exemplar_only: bool = False,
    num_segments: int = 8,
    sample_weights: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Per-module MSE KD with weights and adaptive scale (cil.py:524-542).

    When ``exemplar_only``, only samples whose label < prev_num_classes
    contribute — implemented branchlessly as a per-sample mask so the jitted
    step has a static shape (the reference indexes dynamically, cil.py:529-536).
    ``sample_weights`` additionally masks padded batch rows.

    Returns {'kd_loss': total, '<module>': per-module unscaled mse, ...}.
    """
    out: Dict[str, jax.Array] = {}
    total = jnp.asarray(0.0, jnp.float32)

    if exemplar_only:
        assert labels is not None and prev_num_classes is not None
        sample_mask = (labels < prev_num_classes).astype(jnp.float32)  # (B,)
    else:
        sample_mask = None
    if sample_weights is not None:
        w = sample_weights.astype(jnp.float32)
        sample_mask = w if sample_mask is None else sample_mask * w

    for name, weight in zip(module_names, module_weights):
        cur = current_feats[name].astype(jnp.float32)
        prev = jax.lax.stop_gradient(prev_feats[name]).astype(jnp.float32)
        sq = (cur - prev) ** 2
        if sample_mask is None:
            mse = jnp.mean(sq)
        else:
            # features are (B*T, ...) or (B*T, C); expand mask over segments
            per_elem = sq.reshape(sq.shape[0], -1).mean(axis=1)  # (B*T,)
            m = jnp.repeat(sample_mask, per_elem.shape[0] // sample_mask.shape[0])
            denom = jnp.maximum(jnp.sum(m), 1.0)
            mse = jnp.sum(per_elem * m) / denom
        out[name] = mse
        total = total + scale_factor * weight * mse
    out["kd_loss"] = total
    return out
