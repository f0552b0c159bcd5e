"""Optimizer + LR schedule construction (optax).

Rebuilds the reference optimizer policy as labeled optax transforms:
``CILTSMOptimizerConstructorImprovised`` (libs/models/cil_heads/tsm.py:189-303)
partitions parameters into groups

  first_conv_weight : base lr,            weight decay
  normal_weight     : base lr,            weight decay
  normal_bias       : 2x lr,              no decay
  bn                : base lr,            no decay
  classifier_weight : fc_scale x lr,      weight decay   (LSC weights,
                      IncrementalNet weight, LSCLoss eta — tsm.py:255-262)
  classifier_bias   : 2*fc_scale x lr,    no decay       (IncrementalNet bias)

SGD semantics match torch: grad += wd * w, buf = momentum * buf + grad,
update = -lr(t) * buf. Schedules follow torch.optim.lr_scheduler stepped once
per epoch (reference libs/utils.py:51-60; Lightning default interval='epoch').
Gradient clipping (Lightning gradient_clip_val=1.0 for tasks>0, cil.py:743)
and accumulation (accumulate_grad_batches) are applied in the same chain.
"""

from __future__ import annotations

import bisect
import math
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

CLASSIFIER_LEAVES = {"fc_weights", "fc_weight", "eta"}
CLASSIFIER_BIAS_LEAVES = {"fc_bias"}


def label_params(params: Mapping) -> Dict:
    """Assign an optimizer-group label to every parameter leaf by path."""

    def walk(tree, path):
        out = {}
        for key, value in tree.items():
            p = path + (key,)
            if isinstance(value, Mapping):
                out[key] = walk(value, p)
            else:
                out[key] = _label_leaf(p)
        return out

    return walk(params, ())


def _label_leaf(path: Tuple[str, ...]) -> str:
    leaf = path[-1]
    modules = path[:-1]
    joined = "/".join(path)

    if leaf in CLASSIFIER_LEAVES:
        return "classifier_weight"
    if leaf in CLASSIFIER_BIAS_LEAVES:
        return "classifier_bias"
    # batch norm: flax BatchNorm leaves are 'scale'/'bias' under bn modules
    if any(m.startswith("bn") or m.endswith("_bn") or m == "norm" for m in modules):
        return "bn"
    if leaf == "scale":
        return "bn"
    if leaf == "bias":
        return "normal_bias"
    # the stem conv ('backbone/conv1/kernel') gets the first-conv group
    if joined.endswith("backbone/conv1/kernel") or joined == "conv1/kernel":
        return "first_conv_weight"
    return "normal_weight"


GROUP_POLICY = {
    # label: (lr multiplier given fc_scale, use weight decay)
    "first_conv_weight": (lambda s: 1.0, True),
    "normal_weight": (lambda s: 1.0, True),
    "normal_bias": (lambda s: 2.0, False),
    "bn": (lambda s: 1.0, False),
    "classifier_weight": (lambda s: s, True),
    "classifier_bias": (lambda s: 2.0 * s, False),
}


# -- lr schedules (factor as a function of epoch) ---------------------------


def build_lr_factor_fn(
    cfg: Optional[Mapping], base_lr: Optional[float] = None
) -> Callable[[int], float]:
    """torch.optim.lr_scheduler factor semantics, keyed by epoch.

    cfg: {'type': name, 'params': {...}} or falsy for constant lr
    (reference libs/utils.py:50-59 name map, kwargs passed straight to the
    torch scheduler at :58). ``base_lr`` lets CosineAnnealingLR take torch's
    absolute ``eta_min`` kwarg; ``eta_min_factor`` (= eta_min / base_lr) is
    also accepted.
    """
    if not cfg:
        return lambda epoch: 1.0
    kind = cfg["type"]
    p = dict(cfg.get("params", {}))

    if kind == "StepLR":
        step_size, gamma = p["step_size"], p.get("gamma", 0.1)
        return lambda e: gamma ** (e // step_size)
    if kind == "MultiStepLR":
        milestones = sorted(p["milestones"])
        gamma = p.get("gamma", 0.1)
        return lambda e: gamma ** bisect.bisect_right(milestones, e)
    if kind == "LinearLR":
        start = p.get("start_factor", 1.0 / 3)
        end = p.get("end_factor", 1.0)
        total = p.get("total_iters", 5)
        return lambda e: start + (end - start) * min(e, total) / total
    if kind == "ExponentialLR":
        gamma = p["gamma"]
        return lambda e: gamma**e
    if kind == "CosineAnnealingLR":
        t_max = p["T_max"]
        if "eta_min" in p:  # torch's absolute-lr kwarg
            if not base_lr:
                raise ValueError("CosineAnnealingLR eta_min needs base_lr")
            eta_min_factor = p["eta_min"] / base_lr
        else:
            eta_min_factor = p.get("eta_min_factor", 0.0)  # eta_min / base_lr
        return lambda e: eta_min_factor + (1 - eta_min_factor) * (
            1 + math.cos(math.pi * e / t_max)
        ) / 2
    raise KeyError(f"unknown lr scheduler {kind!r}")


def _fused_labeled_sgd(
    labels,
    base_lr: float,
    momentum: float,
    weight_decay: float,
    fc_scale: float,
    factor_table,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """The whole 6-group SGD policy as ONE per-leaf fused update.

    optax.multi_transform + per-group chains emit ~10 separate elementwise
    passes over the parameter tree per step (wd, trace, schedule-scale per
    group); this computes torch-SGD semantics (grad += wd*w; buf = mu*buf +
    grad; update = -lr*buf) in a single tree_map so XLA fuses each leaf's
    update into one multiply_add pass. Same math, same state shape as
    optax.trace (momentum pytree).
    """
    label_leaves = labels
    spe = max(1, steps_per_epoch)

    def init(params):
        return {
            "momentum": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        assert params is not None
        factor = factor_table[jnp.clip(state["count"] // spe, 0, factor_table.shape[0] - 1)]

        def leaf(path_label, g, m, p):
            if path_label == "frozen":
                return jnp.zeros_like(p), m
            mult_fn, use_wd = GROUP_POLICY[path_label]
            g32 = g.astype(jnp.float32)
            if use_wd and weight_decay:
                g32 = g32 + weight_decay * p.astype(jnp.float32)
            m_new = momentum * m + g32 if momentum else g32
            upd = (-base_lr * mult_fn(fc_scale)) * factor * m_new
            return upd.astype(p.dtype), m_new

        flat_labels = jax.tree.leaves(label_leaves)
        flat_g = jax.tree.leaves(grads)
        flat_m = jax.tree.leaves(state["momentum"])
        flat_p = jax.tree.leaves(params)
        outs = [leaf(l, g, m, p) for l, g, m, p in zip(flat_labels, flat_g, flat_m, flat_p)]
        treedef = jax.tree.structure(grads)
        updates = jax.tree.unflatten(treedef, [o[0] for o in outs])
        new_m = jax.tree.unflatten(treedef, [o[1] for o in outs])
        return updates, {"momentum": new_m, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _zero_frozen_grads(labels) -> optax.GradientTransformation:
    """Drop 'frozen'-labeled gradients at the head of the chain, so global-
    norm clipping and any accumulation see only the trainable gradients —
    matching torch, where requires_grad=False params simply have none."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        zeroed = jax.tree.map(
            lambda g, lbl: jnp.zeros_like(g) if lbl == "frozen" else g,
            updates,
            labels,
        )
        return zeroed, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    params: Mapping,
    optimizer_cfg: Mapping,
    lr_scheduler_cfg: Optional[Mapping] = None,
    steps_per_epoch: int = 1,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
    freeze_backbone: bool = False,
    fused: bool = True,
) -> optax.GradientTransformation:
    """Build the labeled SGD chain from a reference-shaped optimizer config:

        optimizer = dict(type='SGD',
                         constructor='CILTSMOptimizerConstructorImprovised',
                         paramwise_cfg=dict(fc_lr_scale_factor=5.0),
                         lr=0.01, momentum=0.9, weight_decay=0.0001)
    """
    assert optimizer_cfg.get("type", "SGD") == "SGD"
    base_lr = optimizer_cfg["lr"]
    momentum = optimizer_cfg.get("momentum", 0.0)
    weight_decay = optimizer_cfg.get("weight_decay", 0.0)
    paramwise = optimizer_cfg.get("paramwise_cfg", {}) or {}
    fc_scale = paramwise.get("fc_lr_scale_factor", 1.0)
    if "fc_lr5" in paramwise:  # legacy CILTSMOptimizerConstructor flag
        fc_scale = 5.0 if paramwise["fc_lr5"] else 1.0

    factor_fn = build_lr_factor_fn(lr_scheduler_cfg, base_lr=base_lr)
    spe = max(1, steps_per_epoch)

    def _sched(mult: float):
        def schedule(step):
            epoch = step // spe
            # schedules are python-closured over ints; under jit `step` is
            # traced, so compute the factor with jnp-safe ops for the common
            # cases and fall back to a host-precomputed table otherwise
            return -base_lr * mult * _factor_traced(epoch)

        return schedule

    # precompute a generous factor table so the schedule stays jit-friendly
    MAX_EPOCHS = 4096
    table = jnp.asarray([factor_fn(e) for e in range(MAX_EPOCHS)], jnp.float32)

    def _factor_traced(epoch):
        return table[jnp.clip(epoch, 0, MAX_EPOCHS - 1)]

    labels = label_params(params)
    if freeze_backbone and "backbone" in labels:
        # CBF backbone freeze = zero updates for backbone leaves (the
        # TPU-native stand-in for requires_grad=False, reference base.py:36-42)
        labels = dict(labels)
        labels["backbone"] = jax.tree.map(lambda _: "frozen", labels["backbone"])

    if fused:
        # single fused per-leaf update (one multiply_add pass per leaf)
        tx = _fused_labeled_sgd(
            labels, base_lr, momentum, weight_decay, fc_scale, table, spe
        )
    else:
        transforms = {}
        for label, (mult_fn, use_wd) in GROUP_POLICY.items():
            chain = []
            if use_wd and weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            if momentum:
                chain.append(optax.trace(decay=momentum, nesterov=False))
            chain.append(optax.scale_by_schedule(_sched(mult_fn(fc_scale))))
            transforms[label] = optax.chain(*chain)
        transforms["frozen"] = optax.set_to_zero()
        tx = optax.multi_transform(transforms, labels)

    pre = []
    if freeze_backbone:
        # Zero frozen-leaf gradients BEFORE anything downstream sees them —
        # the exact torch semantics, where requires_grad=False params have
        # NO grads at all. Round-5 root cause of the 6-stage parity flag:
        # with the zeroing only inside the labeled transform, the global-
        # norm grad clip (cil.py:743 semantics) computed its norm over the
        # full tree INCLUDING the about-to-be-discarded backbone grads, so
        # during CBF (backbone frozen, clip 1.0 at task>0) every head
        # update was scaled down by the backbone's gradient norm instead
        # of the head's own — CBF barely moved the head, leaving the jax
        # side with a measurable new-task recency skew (old-task retention
        # -3.8 pts at 10 stages) that the torch reference does not have.
        # PyTorch Lightning clips only parameters that HAVE grads, i.e.
        # head-only when the backbone is frozen.
        pre.append(_zero_frozen_grads(labels))
    if grad_clip is not None:
        pre.append(optax.clip_by_global_norm(grad_clip))
    tx = optax.chain(*pre, tx) if pre else tx

    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
