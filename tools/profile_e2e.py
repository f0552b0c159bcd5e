#!/usr/bin/env python
"""Wall-clock decomposition of the end-to-end training loop.

Round-2 measured: device step ~70 ms + device RandAugment ~90 ms, host
decode sustains ~900+ frames/s (~150 ms/batch of demand), yet e2e measures
21-32 clips/s (500-760 ms/batch). This tool attributes the missing time by
timing each stage of bench.py's bench_train_e2e loop separately:

  wait     — main thread blocking on the loader (producer not ready)
  put      — host->device transfer of the uint8 batch (explicitly timed;
             in the plain loop this cost hides inside dispatch)
  dispatch — step() call until it returns (async dispatch enqueue)
  device   — residual time blocking on the result (actual device work that
             did not overlap with the next batch's wait+put)

Modes (PROFILE_MODE): "baseline" = the exact bench_train_e2e loop with a
block every step (fully serialized; upper bound per-component truth);
"pipelined" = the plain async loop as bench.py runs it, timing only wait +
dispatch + final block (what production sees); "prefetch" = pipelined plus
the device-prefetch iterator (background thread device_puts ahead).

Usage: python tools/profile_e2e.py [steps]
Env:   BENCH_BATCH, BENCH_VIDEOS, PROFILE_MODE=baseline|pipelined|prefetch|all
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
# min_* cache thresholds have no env plumbing in jax 0.9 — set via config
# (see bench.py for the axon compile-time-reporting rationale)
import jax as _jax  # noqa: E402

_jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def build(batch, num_videos):
    """Same corpus + model + step as bench.bench_train_e2e (imported from
    bench.py so the profiled loop can never drift from the benched one)."""
    import jax.numpy as jnp

    from bench import _bench_train_state, _ensure_bench_corpus
    from bdvcil_tpu.data.device_pipeline import FastBGMixLoader, make_fast_input_fn
    from bdvcil_tpu.runtime import TrainState, make_train_step

    num_segments = 8
    frames_per_video = 16
    root = _ensure_bench_corpus(num_videos, frames_per_video)
    video_infos = [
        dict(frame_dir=str(root / "rawframes" / f"v{v:04d}"), total_frames=frames_per_video,
             label=v % 51)
        for v in range(num_videos)
    ]
    bg_files = sorted(str(p) for p in (root / "bg").glob("*.jpg"))

    spec, variables, tx = _bench_train_state(num_segments)
    wire = os.environ.get("BDVC_WIRE", "auto")
    from bdvcil_tpu.data.device_pipeline import resolve_wire_format

    wire = resolve_wire_format(wire, 224)
    input_fn = make_fast_input_fn(
        alpha=0.5, with_randaug=True, dtype=jnp.bfloat16, wire_format=wire
    )
    step = make_train_step(spec, tx, num_classes=51, method="base", input_fn=input_fn)
    state = TrainState.create(variables, tx)

    def make_loader(**kw):
        args = dict(randaug_prob=0.75, seed=0, drop_last=True, prefetch=2, wire_format=wire)
        args.update(kw)
        return FastBGMixLoader(video_infos, bg_files, batch_size=batch,
                               num_segments=num_segments, **args)

    return step, state, make_loader


def run_mode(mode, step, state, make_loader, steps, batch):
    import jax

    key = jax.random.PRNGKey(0)
    stats = {"wait": 0.0, "put": 0.0, "dispatch": 0.0, "device": 0.0}
    n = 0
    loader = make_loader(num_workers=int(os.environ.get("PROFILE_WORKERS", "1")))

    # enough chained epochs to cover `steps` in ONE producer stream (the
    # epoch-spanning fast path production uses); epoch boundaries no longer
    # tear down the worker pool
    epochs_needed = -(-steps // max(1, len(loader))) + 1
    if mode == "prefetch":
        from bdvcil_tpu.runtime.loops import prefetch_to_device

        src = prefetch_to_device(loader.iter_epochs(0, epochs_needed), size=2)
    else:
        src = loader.iter_epochs(0, epochs_needed)

    t_start = time.perf_counter()
    it = iter(src)
    while n < steps:
        t0 = time.perf_counter()
        b = next(it)
        t1 = time.perf_counter()
        stats["wait"] += t1 - t0

        if mode == "baseline":
            b = {k: jax.device_put(v) for k, v in b.items()}
            jax.block_until_ready(list(b.values()))
            t2 = time.perf_counter()
            stats["put"] += t2 - t1
        else:
            t2 = t1

        imgs = {k: v for k, v in b.items() if k != "label"}
        key, sk = jax.random.split(key)
        state, metrics = step(state, None, imgs, b["label"], {}, sk)
        t3 = time.perf_counter()
        stats["dispatch"] += t3 - t2

        if mode == "baseline":
            jax.block_until_ready(state.params)
            stats["device"] += time.perf_counter() - t3
        n += 1
    jax.block_until_ready(state.params)
    wall = time.perf_counter() - t_start
    rate = n * batch / wall
    out = {"mode": mode, "steps": n, "wall_s": round(wall, 2),
           "clips_per_sec": round(rate, 2),
           **{k: round(v / n * 1000, 1) for k, v in stats.items()}}
    if os.environ.get("BDVC_PROFILE_PRODUCER"):
        from bdvcil_tpu.data.device_pipeline import PRODUCER_STATS, _PRODUCER_STATS_LOCK

        with _PRODUCER_STATS_LOCK:
            nb = PRODUCER_STATS.pop("batches", 0.0) or 1.0
            out["producer_ms"] = {k: round(v / nb * 1000, 1) for k, v in PRODUCER_STATS.items()}
            PRODUCER_STATS.clear()
        from bdvcil_tpu.data import native

        cache = native.decode_cache_stats()
        if cache:
            total = cache["hits"] + cache["misses"]
            out["decode_cache"] = {**cache,
                                   "hit_rate": round(cache["hits"] / total, 3) if total else 0.0}
    print(json.dumps(out))
    return state


def main():
    import jax

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    num_videos = int(os.environ.get("BENCH_VIDEOS", "64"))
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mode = os.environ.get("PROFILE_MODE", "all")

    step, state, make_loader = build(batch, num_videos)

    # warm/compile with one epoch-equivalent
    key = jax.random.PRNGKey(1)
    loader = make_loader()
    for i, b in enumerate(loader):
        imgs = {k: v for k, v in b.items() if k != "label"}
        key, sk = jax.random.split(key)
        state, _ = step(state, None, imgs, b["label"], {}, sk)
        if i >= 1:
            break
    jax.block_until_ready(state.params)
    print(json.dumps({"note": "compiled", "platform": jax.devices()[0].platform}))

    # quiesce background studies for the measured section (same protocol as
    # the bench; compile/warm above ran unpaused)
    from bench import _pause_for_measurement, _resume_background

    _pause_for_measurement()
    try:
        modes = ["baseline", "pipelined", "prefetch"] if mode == "all" else [mode]
        for m in modes:
            state = run_mode(m, step, state, make_loader, steps, batch)
    finally:
        _resume_background()


if __name__ == "__main__":
    main()
