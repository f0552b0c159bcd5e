"""K-step super-dispatch (runtime/steps.make_multi_train_step +
train_epochs(steps_per_dispatch=K)): one stacked transfer + one lax.scan
dispatch per K training steps.

Equivalence is tested at the two levels where it is exact:

  1. the jitted scan over K batches vs K eager single steps — same math,
     same rng keys; fp-reassociation tolerance at a short horizon (longer
     horizons amplify any 1e-7 difference chaotically, the same
     sensitivity documented for the torch-vs-jax parity tests);
  2. the train_epochs chunk plumbing — with stub step functions the multi
     path must deliver EXACTLY the same batches (stacked), the same rng-key
     chain, and the same epoch-boundary behavior as the per-step path.

This is what makes it safe as a production throughput knob
(cil/trainer.py `steps_per_dispatch`): PERF_NOTES round 4 measured the
per-step e2e loop leaving ~40% of the chip idle to host GIL/transfer
serialization on a CPU-starved host, which the K-dispatch recovers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

T, CROP, B = 2, 32, 4


def _model_and_tx():
    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer

    spec = build_model(
        dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8),
            cls_head=dict(
                type="IncrementalTSMHead", num_classes=3, in_channels=512,
                inc_head_config=dict(type="SimpleLinear", out_features=3),
                num_segments=T, loss_cls=dict(type="CrossEntropyLoss"),
                dropout_ratio=0.0,
            ),
            test_cfg=dict(average_clips="score"),
        ),
        dtype=jnp.float32,
    )
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, CROP, CROP, 3))
    tx = build_optimizer(
        variables["params"],
        dict(type="SGD", paramwise_cfg=dict(fc_lr_scale_factor=1.0), lr=0.01,
             momentum=0.9, weight_decay=1e-4),
        steps_per_epoch=4,
    )
    return spec, variables, tx


def test_scan_step_equals_k_single_steps():
    from bdvcil_tpu.runtime import TrainState, make_multi_train_step, make_train_step

    spec, variables, tx = _model_and_tx()
    K = 3
    kw = dict(spec=spec, tx=tx, num_classes=3, method="base")
    single = make_train_step(donate=False, **kw)
    multi = make_multi_train_step(kw, K)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((K, B, T, CROP, CROP, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(K, B, 1))
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    s1 = TrainState.create(variables, tx)
    for k in range(K):
        s1, m1 = single(s1, None, jnp.asarray(imgs[k]), jnp.asarray(labels[k]), {}, keys[k])

    s2 = TrainState.create(variables, tx)
    s2, m2 = multi(s2, None, jnp.asarray(imgs), jnp.asarray(labels), {}, keys)

    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
    assert max(jax.tree.leaves(deltas)) < 1e-5, deltas
    # metrics are the LAST inner step's values
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert int(s2.step) == K


class _ListLoader:
    """Deterministic loader stub: batches are a pure function of epoch."""

    def __init__(self, n_batches):
        self.n = n_batches
        self.epoch = 0

    def __len__(self):
        return self.n

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        for i in range(self.n):
            yield {
                "imgs": np.full((B, T, 4, 4, 3), self.epoch * 100 + i, np.float32),
                "label": np.full((B, 1), i, np.int64),
            }


def _collect(spd, n_batches=4, num_epochs=2):
    """Run train_epochs with capturing stub steps; return the call log."""
    from bdvcil_tpu.runtime.loops import train_epochs

    calls = []

    class _State:
        params = jnp.zeros(())

    def single(state, prev, imgs, labels, extra, rng):
        calls.append(("single", np.asarray(imgs), np.asarray(labels), np.asarray(rng)))
        return state, {"loss": jnp.zeros(())}

    def multi(state, prev, imgs, labels, extra, rngs):
        calls.append(("multi", np.asarray(imgs), np.asarray(labels), np.asarray(rngs)))
        return state, {"loss": jnp.zeros(())}

    train_epochs(
        single,
        _State(),
        None,
        _ListLoader(n_batches),
        num_epochs,
        jax.random.PRNGKey(11),
        multi_step_fn=multi if spd > 1 else None,
        steps_per_dispatch=spd,
        log_every_n_steps=1000,
    )
    return calls


def test_train_epochs_chunk_plumbing_exact():
    ref = _collect(1)  # 8 single calls
    got = _collect(2)  # 4 multi calls of 2
    assert [k for k, *_ in ref] == ["single"] * 8
    assert [k for k, *_ in got] == ["multi"] * 4
    ref_imgs = [c[1] for c in ref]
    ref_labels = [c[2] for c in ref]
    ref_keys = [c[3] for c in ref]
    for j, (_, imgs, labels, rngs) in enumerate(got):
        for k in range(2):
            i = 2 * j + k
            np.testing.assert_array_equal(imgs[k], ref_imgs[i])
            np.testing.assert_array_equal(labels[k], ref_labels[i])
            np.testing.assert_array_equal(rngs[k], ref_keys[i])


def test_train_epochs_chunk_respects_epoch_boundary():
    """5 batches/epoch at K=3: chunk [0,1,2], singles [3], [4] — the chunk
    never crosses into the next epoch, and the rng chain stays identical."""
    ref = _collect(1, n_batches=5, num_epochs=2)  # 10 singles
    got = _collect(3, n_batches=5, num_epochs=2)
    kinds = [k for k, *_ in got]
    assert kinds == ["multi", "single", "single"] * 2
    flat = []
    for kind, imgs, labels, rngs in got:
        if kind == "multi":
            for k in range(imgs.shape[0]):
                flat.append((imgs[k], labels[k], rngs[k]))
        else:
            flat.append((imgs, labels, rngs))
    assert len(flat) == len(ref) == 10
    for (imgs, labels, rng), (_, ri, rl, rk) in zip(flat, ref):
        np.testing.assert_array_equal(imgs, ri)
        np.testing.assert_array_equal(labels, rl)
        np.testing.assert_array_equal(rng, rk)


# -- eval K-dispatch (runtime/steps.make_multi_eval_step) --------------------


def test_multi_eval_step_equals_k_single_evals():
    """ONE lax.map dispatch over K stacked eval batches == K single-jit
    forwards, per batch, to fp-fusion tolerance (the mapped body IS the
    single-step function; no carried state, so no horizon amplification)."""
    from bdvcil_tpu.runtime import make_eval_step, make_multi_eval_step

    spec, variables, _ = _model_and_tx()
    eval_step = make_eval_step(spec, 3)
    multi = make_multi_eval_step(spec, 3, 3)
    rng = np.random.default_rng(0)
    stacked = rng.integers(0, 255, (3, B, T, CROP, CROP, 3)).astype(np.uint8)
    out = jax.tree.map(np.asarray, multi(variables, jnp.asarray(stacked)))
    for k in range(3):
        ref = jax.tree.map(np.asarray, eval_step(variables, jnp.asarray(stacked[k])))
        np.testing.assert_allclose(out["cls_score"][k], ref["cls_score"], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(out["repr"][k], ref["repr"], rtol=2e-5, atol=2e-5)


def test_run_inference_multi_dispatch_matches_per_batch():
    """run_inference(steps_per_dispatch=4) over 9 batches (one ragged) ==
    the per-batch path: same scores/labels/order. Groups: [4 full] -> ONE
    stacked dispatch; [3 full + 1 ragged] -> per-batch fallback (shape
    mismatch inside the group); [1 tail] -> per-batch fallback."""
    from bdvcil_tpu.runtime import make_eval_step, make_multi_eval_step
    from bdvcil_tpu.runtime.loops import run_inference

    spec, variables, _ = _model_and_tx()
    eval_step = make_eval_step(spec, 3)
    multi = make_multi_eval_step(spec, 3, 4)
    rng = np.random.default_rng(1)
    batches = []
    for i in range(9):
        b = 3 if i == 7 else B  # one ragged batch inside the second group
        batches.append(
            dict(
                imgs=rng.integers(0, 255, (b, T, CROP, CROP, 3)).astype(np.uint8),
                label=np.arange(b) % 3,
            )
        )
    ref = run_inference(eval_step, variables, list(batches), extract_repr=True)
    got = run_inference(
        eval_step,
        variables,
        list(batches),
        extract_repr=True,
        steps_per_dispatch=4,
        multi_eval_step=multi,
    )
    assert got["cls_score"].shape == ref["cls_score"].shape
    np.testing.assert_array_equal(got["labels"], ref["labels"])
    np.testing.assert_allclose(got["cls_score"], ref["cls_score"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got["repr"], ref["repr"], rtol=2e-5, atol=2e-5)
