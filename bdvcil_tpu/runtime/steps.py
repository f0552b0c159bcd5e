"""Jit-compiled train/eval steps.

Replaces the Lightning training_step / predict_step stack (SURVEY.md §3.1-3.2)
with pure functions compiled once per task (classifier width changes per task
=> one retrace per task, by design):

  * 'base'            — loss_cls (CE or LSC/NCA) + per-module feature-KD MSE
                        between current (train mode) and previous (eval mode)
                        model taps (reference BaseCIL.training_step,
                        cil.py:512-556)
  * 'icarl'           — CE on soft targets: one-hot for new classes, prev-model
                        softmax for old-class samples; ActorCutMix lambda
                        smoothing when the batch carries foreground_ratio
                        (reference ICARLModel.training_step, icarl.py:97-130)
  * 'icarl_video_mix' — tubemix batch augmentation then the iCaRL loss
                        (reference icarl_video_mix.py:19-64)

Data parallelism: batches arrive sharded over the mesh 'data' axis and state
replicated; under jit the SPMD partitioner turns the batch reductions into
ICI collectives (gradient all-reduce, cross-replica batch-norm statistics).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import (
    acm_smooth_targets,
    cross_entropy,
    feature_kd_loss,
    lsc_nca_loss,
    soft_target_ce,
)
from ..models.builder import ModelSpec
from ..ops.augment import tubemix
from .train_state import TrainState


def _squeeze_labels(labels: jax.Array) -> jax.Array:
    return labels.reshape(labels.shape[0]) if labels.ndim > 1 else labels


def _loss_cls(
    spec: ModelSpec, cls_score: jax.Array, labels: jax.Array, params, sample_weights=None
) -> jax.Array:
    loss_cfg = spec.loss_cls
    if loss_cfg.get("type") == "LSCLoss":
        from ..models.heads import head_param_path

        eta = head_param_path(params)["eta"]
        return lsc_nca_loss(
            cls_score,
            labels,
            eta,
            margin=loss_cfg.get("margin", 0.6),
            exclude_pos_denominator=loss_cfg.get("exclude_pos_denominator", True),
            hinge_proxynca=loss_cfg.get("hinge_proxynca", True),
            sample_weights=sample_weights,
        )
    return cross_entropy(cls_score, labels, sample_weights)


def _make_raw_train_step(
    spec: ModelSpec,
    tx,
    num_classes: int,
    method: str = "base",
    task_idx: int = 0,
    prev_num_classes: int = 0,
    kd_config: Optional[Dict[str, Any]] = None,
    video_mix: Optional[Dict[str, float]] = None,
    donate: bool = True,  # accepted for kwargs-compat; jitting happens outside
    input_fn: Optional[Callable] = None,
) -> Callable:
    """The PURE (unjitted) per-batch train step — the single definition both
    :func:`make_train_step` (jit) and :func:`make_multi_train_step`
    (lax.scan body) compile, so the K-step super-dispatch is bitwise the
    same math as the per-step loop. See :func:`make_train_step` for the
    argument/signature contract."""
    module = spec.module(num_classes)
    use_kd = method == "base" and kd_config is not None and task_idx > 0
    use_prev_targets = method in ("icarl", "icarl_video_mix") and task_idx > 0
    needs_prev = use_kd or use_prev_targets
    num_segments = spec.num_segments

    def loss_fn(params, batch_stats, prev_variables, imgs, labels, extra, rng):
        if input_fn is not None:
            # fast input path: imgs is a dict of raw uint8 fields; the fused
            # device augmentation (ops/augment.py fused_train_augment) turns
            # it into the normalized clip batch inside the same jit region
            imgs = input_fn(imgs)
        labels = _squeeze_labels(labels)
        # padded tail batches carry per-sample weights (0 on pad rows) so
        # every real sample contributes exactly like the reference's
        # variable-size last batch
        sample_weights = extra.get("sample_weight")
        metrics: Dict[str, jax.Array] = {}

        if method == "base":
            out, mutated = module.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            cls_score = out["cls_score"][:, 0, :]
            loss_cls = _loss_cls(spec, cls_score, labels, params, sample_weights)
            metrics["loss_cls"] = loss_cls
            total = loss_cls

            if use_kd:
                prev_out = module.apply(prev_variables, imgs, train=False)
                kd = feature_kd_loss(
                    out["feats"],
                    prev_out["feats"],
                    kd_config["module_names"],
                    kd_config["module_weights"],
                    kd_config["scale_factor"],
                    labels=labels,
                    prev_num_classes=prev_num_classes,
                    exemplar_only=kd_config.get("exemplar_only", False),
                    num_segments=num_segments,
                    sample_weights=sample_weights,
                )
                metrics.update(kd)
                total = total + kd["kd_loss"]
            else:
                metrics["kd_loss"] = jnp.zeros(())
            return total, (mutated["batch_stats"], metrics)

        # --- iCaRL family -------------------------------------------------
        targets = jax.nn.one_hot(labels, num_classes)

        if method == "icarl" and "foreground_ratio" in extra:
            targets = acm_smooth_targets(
                labels,
                _squeeze_labels(extra["background_label"]),
                extra["foreground_ratio"].astype(jnp.float32),
                num_classes,
                alpha=4.0,
            )

        if method == "icarl_video_mix":
            mix_key, rng = jax.random.split(rng)
            imgs, targets = tubemix(
                mix_key, imgs, targets, video_mix["alpha"], video_mix["prob"]
            )

        out, mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        # average_clips='score' in iCaRL (icarl.py:34): raw score mean
        cls_score = out["cls_score"].mean(axis=1)

        if use_prev_targets:
            prev_out = module.apply(prev_variables, imgs, train=False)
            prev_scores = jax.lax.stop_gradient(prev_out["cls_score"].mean(axis=1))
            prev_probs = jax.nn.softmax(prev_scores, axis=-1)
            is_old = (labels < prev_num_classes)[:, None]
            targets = jnp.where(is_old, prev_probs, targets)

        loss = soft_target_ce(cls_score, targets, sample_weights)
        metrics["loss_cls"] = loss
        metrics["kd_loss"] = jnp.zeros(())
        return loss, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, prev_variables, imgs, labels, extra, rng):
        (loss, (new_batch_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, prev_variables, imgs, labels, extra, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    train_step.needs_prev = needs_prev
    return train_step


def make_train_step(
    spec: ModelSpec,
    tx,
    num_classes: int,
    method: str = "base",
    task_idx: int = 0,
    prev_num_classes: int = 0,
    kd_config: Optional[Dict[str, Any]] = None,
    video_mix: Optional[Dict[str, float]] = None,
    donate: bool = True,
    input_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jitted step for one task.

    kd_config (method 'base', task>0): {'module_names', 'module_weights',
    'scale_factor', 'exemplar_only'} (reference config keys kd_modules_names,
    kd_weight_by_module, adaptive_scale_factors, kd_exemplar_only).

    Returned step signature:
        step(state, prev_variables, imgs, labels, extra, rng) -> (state, metrics)
    where extra is a dict of optional arrays (foreground_ratio,
    background_label) — pass {} when unused; prev_variables may be None
    (ignored at task 0 / when KD is off).

    Donation contract: ``state`` is donated to the XLA executable (halves
    param HBM traffic). ``prev_variables`` must therefore NOT alias state
    buffers — after the per-task ``prev <- current`` copy, materialize prev
    with ``jax.tree.map(jnp.copy, ...)`` (the CIL trainer does this).
    """
    train_step = _make_raw_train_step(
        spec, tx, num_classes, method=method, task_idx=task_idx,
        prev_num_classes=prev_num_classes, kd_config=kd_config,
        video_mix=video_mix, input_fn=input_fn,
    )
    donate_argnums = (0,) if donate else ()
    if not train_step.needs_prev:
        # avoid shipping an unused prev tree through jit
        jitted = jax.jit(
            lambda state, imgs, labels, extra, rng: train_step(
                state, None, imgs, labels, extra, rng
            ),
            donate_argnums=donate_argnums,
        )
        return lambda state, prev_variables, imgs, labels, extra, rng: jitted(
            state, imgs, labels, extra, rng
        )
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_multi_train_step(step_kwargs: Dict[str, Any], steps_per_dispatch: int) -> Callable:
    """K sequential train steps in ONE dispatch via ``lax.scan``.

    The same training math as K single steps — the scan body IS the
    single-step function, so results match to XLA fp-reassociation
    tolerance (~1e-7/step; tests/test_multi_dispatch.py) — but the host
    pays one device transfer and one dispatch per K batches instead of K
    of each. On a host whose CPU is the
    e2e bottleneck (this framework's production target couples a small host
    core count to a fast chip; the 1-core dev box is the extreme case) this
    multiplies the host's per-step budget by K: measured round 4, the
    per-step e2e loop left ~40% of the chip idle to GIL/transfer
    serialization while the K=4 super-step is device-bound.

    Args mirror :func:`make_train_step` (pass them in ``step_kwargs``);
    ``donate`` is forced on the outer jit. Returned signature:

        step(state, prev_variables, imgs, labels, extra, rngs) -> (state, metrics)

    where every array in ``imgs``/``labels``/``extra`` carries a leading
    ``steps_per_dispatch`` axis (one slot per inner step, stacked on host by
    runtime/loops.train_epochs) and ``rngs`` is ``(K, 2)`` uint32 keys.
    ``metrics`` are the LAST inner step's values — the same step a per-step
    loop would be reading when it logs.
    """
    assert steps_per_dispatch >= 1
    step_kwargs = {k: v for k, v in step_kwargs.items() if k != "donate"}
    inner = _make_raw_train_step(**step_kwargs)
    needs_prev = inner.needs_prev

    def multi(state, prev_variables, imgs, labels, extra, rngs):
        def body(st, xs):
            im, lb, ex, key = xs
            return inner(st, prev_variables, im, lb, ex, key)

        state, metrics = jax.lax.scan(body, state, (imgs, labels, extra, rngs))
        return state, {k: v[-1] for k, v in metrics.items()}

    if not needs_prev:
        jitted = jax.jit(
            lambda state, imgs, labels, extra, rngs: multi(
                state, None, imgs, labels, extra, rngs
            ),
            donate_argnums=(0,),
        )
        return lambda state, prev_variables, imgs, labels, extra, rngs: jitted(
            state, imgs, labels, extra, rngs
        )
    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(spec: ModelSpec, num_classes: int) -> Callable:
    """Forward pass returning per-group scores and L2-normalized repr.

    Matches predict_step (cil.py:558-578): cls_score (B, G, nc) raw scores;
    repr (B, G, C) L2-normalized along the feature dim.

    ``imgs`` may be a float batch, a uint8 crop batch (5-D center / 6-D
    tencrop), or the full-frame YUV420 eval wire dict
    {imgs_y, imgs_c, crop_yx_<px>} (data/device_pipeline.FastEvalLoader
    wire_format='yuv420_full'; the crop size rides in the jit-static key).
    """
    return jax.jit(_make_raw_eval_fn(spec, num_classes))


def _make_raw_eval_fn(spec: ModelSpec, num_classes: int) -> Callable:
    """The un-jitted eval forward shared by make_eval_step (one batch per
    dispatch) and make_multi_eval_step (K batches per dispatch)."""
    module = spec.module(num_classes)

    def eval_step(variables, imgs):
        if isinstance(imgs, dict):
            # full-frame YUV wire: slice eval crops + YCbCr->RGB on device
            from ..ops.augment import (
                eval_yuv_full_crops,
                normalize_batch,
                tencrop_expand,
            )

            rgb = eval_yuv_full_crops(imgs)
            if rgb.shape[2] == 1:  # CenterCrop: (B, T, h, w, C)
                rgb = rgb[:, :, 0]
            else:  # TenCrop: flips on device, (B, 10*T, h, w, C)
                rgb = tencrop_expand(rgb)
            imgs = normalize_batch(rgb, dtype=spec.dtype)
        elif imgs.dtype == jnp.uint8:
            # fast eval path ships raw uint8 crops (4x less PCIe traffic);
            # normalization (and TenCrop flip expansion for 6-D inputs)
            # fuses on-device
            from ..ops.augment import normalize_batch, tencrop_expand

            if imgs.ndim == 6:  # (B, T, 5, h, w, C) from the tencrop decoder
                imgs = tencrop_expand(imgs)
            imgs = normalize_batch(imgs, dtype=spec.dtype)
        out = module.apply(variables, imgs, train=False)
        repr_ = out["repr"]
        repr_ = repr_ / jnp.maximum(jnp.linalg.norm(repr_, axis=-1, keepdims=True), 1e-12)
        return {"cls_score": out["cls_score"], "repr": repr_}

    return eval_step


def make_multi_eval_step(
    spec: ModelSpec, num_classes: int, steps_per_dispatch: int
) -> Callable:
    """K eval forwards in ONE dispatch via ``lax.map`` — the inference twin
    of :func:`make_multi_train_step`.

    ``cil_testing`` re-tests every task 0..t at each stage
    (reference cil.py:985-1028), so its wall-clock on a CPU-starved host is
    dominated by per-batch dispatch/transfer serialization through the
    runtime, not by the TenCrop forward itself (round-4 PERF_NOTES: warm
    TenCrop 8.8 videos/s against a device doing hundreds). Stacking K
    batches into one dispatch multiplies the host's per-batch budget by K,
    same math per batch (the mapped body IS the single-step function).

    ``imgs`` leaves carry a leading ``steps_per_dispatch`` axis; returns
    the same output dict with every leaf stacked ``(K, B, ...)``.
    """
    assert steps_per_dispatch >= 1
    raw = _make_raw_eval_fn(spec, num_classes)

    @jax.jit
    def multi(variables, imgs):
        return jax.lax.map(lambda im: raw(variables, im), imgs)

    return multi
