"""Epoch loops: training and batched inference.

Replaces ``pl.Trainer.fit`` / ``trainer.predict`` (reference cil.py:744-757,
1092-1113). Inference keeps the dataset order (unshuffled) because the CIL
accuracy segmentation slices results by per-task dataset sizes
(cil.py:938-943); padded tail batches keep shapes static for jit and the
padding is dropped on host.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batch_sharding, shard_batch
from ..utils import Throughput, get_logger

logger = get_logger("bdvcil.runtime")


def _extra_fields(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {
        k: batch[k]
        for k in ("foreground_ratio", "background_label", "sample_weight")
        if k in batch
    }


def prefetch_to_device(iterable, size: int = 2, put_fn: Optional[Callable] = None):
    """Iterate ``iterable`` through a background thread that applies
    ``put_fn`` ahead of the consumer (bounded by ``size`` outstanding items).

    The point is overlap: a jitted step's host->device transfer otherwise
    happens implicitly at dispatch time, serializing ~20 MB/batch of uint8
    input behind the previous step on the critical path. Starting the
    ``jax.device_put`` one-to-two batches early moves the transfer (and the
    loader's own planning/decode wait) off the main thread so it runs while
    the device is still executing the previous step. This replaces the role
    of the reference's pin_memory+CUDA-stream prefetch in its torch loader
    stack with the JAX-native async-dispatch equivalent.

    ``put_fn`` defaults to a plain ``jax.device_put`` of every array leaf;
    train_epochs passes a closure that also does mesh sharding and n_valid
    accounting. Ordering is preserved; exceptions re-raise in the consumer.
    """
    import queue as _queue
    import threading

    if put_fn is None:
        def put_fn(item):
            return jax.tree.map(
                lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
                item,
            )

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, size))
    sentinel = object()
    stop = threading.Event()
    err: List[BaseException] = []

    def _offer(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _offer(put_fn(item)):
                    return
        except BaseException as e:  # re-raised in the consumer
            err.append(e)
        finally:
            _offer(sentinel)

    th = threading.Thread(target=worker, daemon=True, name="bdvc-device-prefetch")
    th.start()
    try:
        while True:
            # timed get: an untimed Queue.get blocks in a C-level lock wait
            # where CPython defers signal handlers, which breaks the
            # cooperative bench-quiesce protocol (tools/parity_study
            # SIGUSR1 parks the main thread; the handler can only run
            # between bytecodes)
            try:
                item = q.get(timeout=0.25)
            except _queue.Empty:
                continue
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def train_epochs(
    step_fn: Callable,
    state,
    prev_variables,
    loader,
    num_epochs: int,
    rng_key: jax.Array,
    mesh=None,
    metric_logger=None,
    log_every_n_steps: int = 10,
    phase: str = "inc_step",
    task_idx: int = 0,
    epoch_hook: Optional[Callable] = None,
    start_epoch: int = 0,
    snapshot_hook: Optional[Callable] = None,
    multi_step_fn: Optional[Callable] = None,
    steps_per_dispatch: int = 1,
):
    """Run the jitted step over epochs. Returns (state, last_metrics).

    ``epoch_hook(epoch, state)`` runs after every epoch (validation /
    save-best lives there). ``snapshot_hook(epoch, state, rng_key)`` runs
    after ``epoch_hook`` with the rng key as it stands at the epoch
    boundary — together with ``start_epoch`` this gives bit-exact
    mid-task resume after a preemption (runtime/checkpoint.py train
    snapshots). Throughput is metered in clips/sec.

    ``steps_per_dispatch`` > 1 (with ``multi_step_fn`` from
    runtime/steps.make_multi_train_step) groups K consecutive batches of an
    epoch into ONE stacked transfer + ONE lax.scan dispatch — the same
    training math and the same rng-key chain, but the host pays its
    per-dispatch costs once per K steps (the e2e bottleneck on CPU-starved
    hosts, PERF_NOTES round 4). Chunks never cross an epoch boundary; an
    epoch's remainder (< K batches) runs through the per-step ``step_fn``.
    """
    meter = Throughput(warmup=2)
    # on mid-task resume, keep logged step numbers aligned with the true
    # training step (state.step) instead of restarting from 0
    step = start_epoch * len(loader) if start_epoch else 0
    last_metrics: Dict[str, float] = {}
    pending_metrics = None  # device arrays from the previous log step: reading
    # them one interval later avoids stalling the dispatch pipeline on a sync

    def _split(batch):
        """Field split + valid-row count for one loader batch (host only)."""
        # fast uint8/yuv420 path (data/device_pipeline.py)
        if "imgs_u8" in batch or "imgs_y" in batch:
            imgs = {
                k: v
                for k, v in batch.items()
                if k not in ("label", "sample_weight", "foreground_ratio", "background_label")
            }
        else:
            imgs = batch["imgs"]
        labels = batch["label"]
        extra = _extra_fields(batch)
        # padded tail batches carry sample_weight==0 on pad rows; the
        # north-star clips/s meter must count valid rows only. Batches
        # are process-local: scale by process_count for the global rate
        # (exact except for pad-row skew on the final batch).
        if "sample_weight" in batch:
            n_valid = int(np.asarray(batch["sample_weight"]).sum())
        else:
            n_valid = int(np.shape(labels)[0])
        n_valid *= jax.process_count()
        return imgs, labels, extra, n_valid

    def _put(imgs, labels, extra, batch_axes=None):
        """Host->device transfer/sharding (runs in the prefetch thread, so
        it overlaps the previous step's device execution). ``batch_axes``
        shifts the data-sharded axis for K-stacked super-batches (the scan
        axis K leads, the per-device batch axis is second)."""
        imgs_d = imgs if isinstance(imgs, dict) else {"imgs": imgs}
        tree = {**imgs_d, "label": labels, **extra}
        if mesh is not None:
            put = shard_batch(tree, mesh, leading_pytree_axes=batch_axes or 0)
        else:
            put = {
                k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in tree.items()
            }
        labels = put["label"]
        extra = {k: put[k] for k in extra}
        imgs = {k: put[k] for k in imgs} if isinstance(imgs, dict) else put["imgs"]
        return imgs, labels, extra

    def _prepare(batch):
        """Host side of one step, run in the prefetch thread."""
        imgs, labels, extra, n_valid = _split(batch)
        imgs, labels, extra = _put(imgs, labels, extra)
        return "single", imgs, labels, extra, n_valid

    def _prepare_chunk(batches):
        """K batches -> one stacked super-batch, one transfer (the host cost
        the K-step dispatch amortizes). Chunks never cross epoch boundaries
        (_grouped), so a ragged batch can only land here from a loader that
        yields a short batch mid-epoch — np.stack would die in the prefetch
        thread with a shape soup, so fail with the actual contract instead
        (ADVICE round 4: steps_per_dispatch>1 requires uniform batches;
        use drop_last or pad_to_batch on the loader)."""
        parts = [_split(b) for b in batches]
        lead = {next(iter(p[0].values())).shape[0] if isinstance(p[0], dict)
                else p[0].shape[0] for p in parts}
        if len(lead) != 1:
            raise ValueError(
                f"steps_per_dispatch={steps_per_dispatch} got a chunk with "
                f"mixed batch sizes {sorted(lead)} — K-dispatch requires "
                "uniform batches (loader drop_last=True or pad_to_batch)"
            )
        imgs0 = parts[0][0]

        def stack(get):
            leaves = [get(p) for p in parts]
            if isinstance(leaves[0], dict):
                return {k: np.stack([l[k] for l in leaves]) for k in leaves[0]}
            return np.stack(leaves)

        imgs = stack(lambda p: p[0])
        labels = stack(lambda p: p[1])
        extra = (
            {k: np.stack([p[2][k] for p in parts]) for k in parts[0][2]}
            if parts[0][2]
            else {}
        )
        n_valid = sum(p[3] for p in parts)
        imgs, labels, extra = _put(imgs, labels, extra, batch_axes=1)
        return "multi", imgs, labels, extra, n_valid

    def _prepare_item(item):
        return _prepare_chunk(item) if isinstance(item, list) else _prepare(item)

    use_multi = steps_per_dispatch > 1 and multi_step_fn is not None
    batches_per_epoch = len(loader)

    def _grouped(src):
        """Group an epoch-ordered batch stream into K-chunks that never
        cross an epoch boundary; epoch remainders pass through as single
        batches (they take the per-step fn — no ragged-shape recompiles)."""
        chunk: List = []
        for pos, b in enumerate(src, 1):
            chunk.append(b)
            if len(chunk) == steps_per_dispatch:
                yield chunk
                chunk = []
            if pos % batches_per_epoch == 0 and chunk:
                yield from chunk
                chunk = []
        yield from chunk

    def _items_per_epoch():
        if not use_multi:
            return batches_per_epoch
        return batches_per_epoch // steps_per_dispatch + batches_per_epoch % steps_per_dispatch

    # Epoch-spanning producer stream: the fast loaders can chain all epochs'
    # batch lists through one worker pool (iter_epochs), so the decode
    # threads and prefetch depth stay hot across epoch boundaries instead of
    # paying a cold producer refill (~150-250 ms) per epoch. Batches are a
    # pure function of (seed, epoch, idx), so this is result-identical to
    # per-epoch iteration — including after a mid-task resume at start_epoch.
    span_stream = None
    if hasattr(loader, "iter_epochs") and num_epochs - start_epoch > 1:
        src = loader.iter_epochs(start_epoch, num_epochs - start_epoch)
        span_stream = iter(
            prefetch_to_device(
                _grouped(src) if use_multi else src, size=2, put_fn=_prepare_item
            )
        )

    for epoch in range(start_epoch, num_epochs):
        loader.set_epoch(epoch)
        epoch_iter = (
            itertools.islice(span_stream, _items_per_epoch())
            if span_stream is not None
            else prefetch_to_device(
                _grouped(iter(loader)) if use_multi else loader,
                size=2,
                put_fn=_prepare_item,
            )
        )
        for kind, imgs, labels, extra, n_valid in epoch_iter:
            if kind == "multi":
                # the SAME rng-key chain as K single steps, stacked
                step_keys = []
                for _ in range(steps_per_dispatch):
                    rng_key, sk = jax.random.split(rng_key)
                    step_keys.append(sk)
                state, metrics = multi_step_fn(
                    state, prev_variables, imgs, labels, extra,
                    jnp.stack(step_keys),
                )
                consumed = steps_per_dispatch
            else:
                rng_key, step_key = jax.random.split(rng_key)
                state, metrics = step_fn(
                    state, prev_variables, imgs, labels, extra, step_key
                )
                consumed = 1
            meter.tick(n_valid)
            prev_step, step = step, step + consumed
            if step // log_every_n_steps > prev_step // log_every_n_steps:
                if pending_metrics is not None:
                    last_metrics = {k: float(v) for k, v in pending_metrics.items()}
                    payload = {
                        f"[{phase}_Task_{task_idx}]{k}": v for k, v in last_metrics.items()
                    }
                    payload["clips_per_sec"] = meter.rate
                    if metric_logger is not None:
                        metric_logger.log(payload, step=step)
                    logger.info(
                        "task %d %s epoch %d step %d loss=%.4f kd=%.4f clips/s=%.1f",
                        task_idx,
                        phase,
                        epoch,
                        step,
                        last_metrics.get("loss", float("nan")),
                        last_metrics.get("kd_loss", 0.0),
                        meter.rate,
                    )
                pending_metrics = metrics
        if epoch_hook is not None:
            epoch_hook(epoch, state)
        if snapshot_hook is not None:
            snapshot_hook(epoch, state, rng_key)
    if pending_metrics is not None:
        last_metrics = {k: float(v) for k, v in pending_metrics.items()}
    return state, last_metrics


def run_inference(
    eval_step: Callable,
    variables,
    loader,
    mesh=None,
    extract_repr: bool = False,
    pad_batch_to: Optional[int] = None,
    steps_per_dispatch: int = 1,
    multi_eval_step: Optional[Callable] = None,
) -> Dict[str, np.ndarray]:
    """Unshuffled forward over a dataset.

    Returns host arrays in dataset order:
      cls_score (N, G, nc) raw scores, labels (N,), repr (N, G, C) when
      requested (already L2-normalized by the eval step).

    Multi-process: each process feeds its local slice of globally padded
    batches (loaders shard per process), the step runs over the global mesh,
    and outputs are all-gathered on device (parallel/mesh.gather_to_host) —
    replacing the reference's per-rank prediction files + host merge
    (cil.py:1092-1126). Trimmed to ``loader.num_valid`` rows.

    ``steps_per_dispatch`` > 1 (with a matching ``multi_eval_step`` from
    runtime/steps.make_multi_eval_step) stacks K batches into ONE device
    dispatch — the inference twin of train_epochs' K-super-dispatch, for
    hosts whose eval wall-clock is per-batch dispatch/transfer bound
    (cil_testing re-tests tasks 0..t every stage, cil.py:985-1028). Groups
    are stacked in the prefetch thread; a ragged tail group (or a group
    with mismatched batch shapes — pass ``pad_batch_to``) falls back to the
    per-batch step, so results are identical batch-for-batch. Multi-chip
    meshes keep the per-batch path: there the batch dim is sharded over
    devices and dispatch overhead amortizes across chips already.
    """
    if jax.process_count() > 1:
        return _run_inference_multiprocess(eval_step, variables, loader, mesh, extract_repr)

    spd = int(steps_per_dispatch)
    if multi_eval_step is None or (mesh is not None and mesh.devices.size > 1):
        spd = 1

    scores: List[np.ndarray] = []
    labels_out: List[np.ndarray] = []
    reprs: List[np.ndarray] = []
    sharding = batch_sharding(mesh) if mesh is not None else None

    def _prep_host(batch):
        """Pad on host (runs in the prefetch thread). ``imgs`` may be one
        array or the full-frame YUV eval wire dict (imgs_y/imgs_c/crop_yx)
        — every leaf is padded on the leading dim."""
        if "imgs" in batch:
            imgs = {"imgs": np.asarray(batch["imgs"])}
        else:
            imgs = {
                k: np.asarray(v) for k, v in batch.items() if k != "label"
            }
        labels = np.asarray(batch["label"]).reshape(-1)
        n_valid = next(iter(imgs.values())).shape[0]
        target = pad_batch_to or n_valid
        if mesh is not None:
            m = mesh.devices.size
            target = ((max(target, n_valid) + m - 1) // m) * m
        if target != n_valid:
            imgs = {
                k: np.pad(v, [(0, target - n_valid)] + [(0, 0)] * (v.ndim - 1), mode="edge")
                for k, v in imgs.items()
            }
        return imgs, labels, n_valid

    def _put(imgs):
        imgs = {k: jax.device_put(v, sharding) for k, v in imgs.items()}
        if tuple(imgs) == ("imgs",):
            imgs = imgs["imgs"]
        return imgs

    def _grouped(src):
        buf = []
        for b in src:
            buf.append(b)
            if len(buf) == spd:
                yield buf
                buf = []
        if buf:
            yield buf

    def _prep_group(group):
        """Prefetch-thread work for one K-group: pad each batch, stack the
        leaves to (K, B, ...) and start ONE transfer; fall back to per-batch
        entries for ragged/mismatched groups."""
        preps = [_prep_host(b) for b in group]
        if spd > 1 and len(preps) == spd:
            first = preps[0][0]
            same = all(
                p[0].keys() == first.keys()
                and all(p[0][k].shape == first[k].shape for k in first)
                for p in preps[1:]
            )
            if same:
                imgs = {k: np.stack([p[0][k] for p in preps]) for k in first}
                return ("multi", _put(imgs), [p[1] for p in preps], [p[2] for p in preps])
        return ("single", [(_put(p[0]), p[1], p[2]) for p in preps])

    def _drain(entry):
        kind = entry[0]
        if kind == "multi":
            _, out, labels_list, n_valids = entry
            cls = np.asarray(out["cls_score"])
            rep = np.asarray(out["repr"]) if extract_repr else None
            for k in range(len(labels_list)):
                scores.append(cls[k][: n_valids[k]])
                labels_out.append(labels_list[k])
                if extract_repr:
                    reprs.append(rep[k][: n_valids[k]])
        else:
            for out, labels, n_valid in entry[1]:
                scores.append(np.asarray(out["cls_score"])[:n_valid])
                labels_out.append(labels)
                if extract_repr:
                    reprs.append(np.asarray(out["repr"])[:n_valid])

    # keep one group's outputs pending so materializing its scores
    # (np.asarray blocks until the forward finishes) happens AFTER the next
    # group is already dispatched — the loader decode, the transfer and the
    # device forward all overlap instead of serializing per batch
    pending = None
    for entry in prefetch_to_device(_grouped(loader), size=2, put_fn=_prep_group):
        if entry[0] == "multi":
            dispatched = ("multi", multi_eval_step(variables, entry[1]), entry[2], entry[3])
        else:
            dispatched = (
                "single",
                [(eval_step(variables, im), lb, nv) for im, lb, nv in entry[1]],
            )
        if pending is not None:
            _drain(pending)
        pending = dispatched
    if pending is not None:
        _drain(pending)

    result = {
        "cls_score": np.concatenate(scores, axis=0),
        "labels": np.concatenate(labels_out, axis=0),
    }
    if extract_repr:
        result["repr"] = np.concatenate(reprs, axis=0)
    return result


def _run_inference_multiprocess(
    eval_step, variables, loader, mesh, extract_repr: bool
) -> Dict[str, np.ndarray]:
    from ..parallel.mesh import gather_to_host

    assert mesh is not None, "multi-process inference needs the global mesh"
    scores: List[np.ndarray] = []
    labels_out: List[np.ndarray] = []
    reprs: List[np.ndarray] = []

    def _prep(batch):
        """Assemble the global sharded batch (runs in the prefetch thread —
        the same overlap train_epochs uses; loaders pad globally and feed
        each process its local rows, so no extra padding here)."""
        put = {k: np.asarray(v) for k, v in batch.items() if k != "label"}
        put["label"] = np.asarray(batch["label"]).reshape(-1)
        return shard_batch(put, mesh)

    def _drain(entry):
        out, label = entry
        scores.append(gather_to_host(out["cls_score"], mesh))
        labels_out.append(gather_to_host(label, mesh))
        if extract_repr:
            reprs.append(gather_to_host(out["repr"], mesh))

    # same pipeline shape as the single-process path: materializing batch
    # i's gathered outputs happens after batch i+1's forward is dispatched.
    # Every process runs the identical loop, so the deferred all-gather
    # collectives stay in the same order on all processes.
    pending = None
    for put in prefetch_to_device(loader, size=2, put_fn=_prep):
        imgs = (
            put["imgs"]
            if "imgs" in put
            else {k: v for k, v in put.items() if k != "label"}
        )
        out = eval_step(variables, imgs)
        if pending is not None:
            _drain(pending)
        pending = (out, put["label"])
    if pending is not None:
        _drain(pending)

    n_valid = getattr(loader, "num_valid", None)
    if n_valid is None and hasattr(loader, "dataset"):
        n_valid = len(loader.dataset)
    result = {
        "cls_score": np.concatenate(scores, axis=0)[:n_valid],
        "labels": np.concatenate(labels_out, axis=0)[:n_valid],
    }
    if extract_repr:
        result["repr"] = np.concatenate(reprs, axis=0)[:n_valid]
    return result
