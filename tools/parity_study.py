"""Multi-seed torch-vs-jax full-protocol CIL parity study.

The slow-tier parity tests (tests/test_protocol_parity.py) pin single-seed
agreement within a tolerance sized for one chaotic realization. This study
addresses the BASELINE.md accuracy north star (UCF101 10-stage final average
within 0.5 pts of the reference, cil.py:800-860 tables) at the level that
statement is actually about: the SYSTEMATIC cross-framework bias, not the
per-realization spread. N paired runs — same synthetic tree, same per-seed
init (torch init converted to jax), same data order — give per-stage
mean(jax - torch) with a standard error that shrinks ~1/sqrt(N); a
systematic bias near zero with a tight SE is the strongest accuracy-parity
evidence this no-real-data environment permits.

Usage:
    python tools/parity_study.py --seeds 5 --method base --out parity_study.json

Imports the EXACT test harness (build_parity_tree / method_overrides /
run_protocol_pair from tests/test_protocol_parity.py) so the studied
protocol cannot drift from the tested one.
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# --platform must be applied BEFORE jax initializes its backends, so peek at
# argv here instead of waiting for argparse. 'cpu' (default) runs the study
# on the virtual 8-device CPU mesh (same as the test suite); 'tpu' runs the
# jax side on the real chip with a 1-device mesh and videos_per_gpu scaled
# so the GLOBAL batch (and therefore the data order, batch composition and
# BN statistics) is identical — on this 1-core dev box the XLA-CPU step is
# ~4.7 s vs ~25 ms on the chip, which is what makes multi-seed studies
# affordable at all (VERDICT round 3, Weak #2).
_PLATFORM = "cpu"
if "--platform" in sys.argv[1:]:
    _PLATFORM = sys.argv[sys.argv.index("--platform") + 1]
elif any(a.startswith("--platform=") for a in sys.argv[1:]):
    _PLATFORM = next(a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--platform="))

if _PLATFORM == "cpu":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
else:
    # tunneled-TPU remote compiles are the startup cost of the tpu mode;
    # the persistent cache only populates under axon with these thresholds
    # set explicitly (see bench.py), and makes every later study process
    # start hot (the study shapes repeat across methods and seeds)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import jax

if _PLATFORM != "cpu":
    # min_* thresholds have no env plumbing (jax 0.9 float_state) and the
    # axon relay under-reports compile walls, so set them via config or the
    # expensive entries never get written (see bench.py)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

if _PLATFORM == "cpu":  # force CPU even when a TPU plugin is registered
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np

# the CPU study ran videos_per_gpu=1 over 8 virtual devices; on the real
# 1-device chip the same global batch of 8 (train) / 64 (test) comes from
# per-device sizes alone. Results stay draw-equivalent: batches are a pure
# function of (seed, epoch, idx, global_batch) and BN stats are synced over
# the global batch either way; only fp reduction order differs, which is
# below the chaotic-divergence floor both studies already carry.
PLATFORM_OVERRIDES = {
    "cpu": {},
    "tpu": dict(videos_per_gpu=8, testing_videos_per_gpu=64),
}


def run_pair(tree, work_root: pathlib.Path, method: str, seed: int,
             extra_overrides=None, jax_overrides=None):
    """One paired run via the tests' shared runner (seed overrides the config
    seed — TorchMiniCIL seeds torch from it, so init differs per seed and is
    converted so both sides share it). Returns per-stage average CNN/NME
    accuracies for both sides."""
    from tests.test_protocol_parity import run_protocol_pair

    timings = {}
    mini, trainer = run_protocol_pair(
        tree,
        _mkdir(work_root, f"torch_s{seed}"),
        _mkdir(work_root, f"jax_s{seed}"),
        method=method,
        timings=timings,
        seed=seed,
        jax_overrides=jax_overrides,
        **(extra_overrides or {}),
    )
    return dict(
        seed=seed,
        jax_platform=jax.devices()[0].platform,
        cnn_torch=[float(np.mean(r)) for r in mini.cnn_matrix],
        cnn_jax=[float(np.mean(r)) for r in trainer.cnn_matrix],
        nme_torch=[float(np.mean(r)) for r in mini.nme_matrix],
        nme_jax=[float(np.mean(r)) for r in trainer.nme_matrix],
        cnn_matrix_torch=_tolist(mini.cnn_matrix),
        cnn_matrix_jax=_tolist(trainer.cnn_matrix),
        nme_matrix_torch=_tolist(mini.nme_matrix),
        nme_matrix_jax=_tolist(trainer.nme_matrix),
        **timings,
    )


def _tolist(matrix):
    return [[float(v) for v in row] for row in matrix]


def _mkdir(root: pathlib.Path, name: str) -> pathlib.Path:
    p = root / name
    p.mkdir(parents=True, exist_ok=True)
    return p


# A paired run only evidences cross-framework bias when BOTH sides actually
# trained: runs where a side's final-stage accuracy lands at chance/floor
# fell off the from-scratch convergence cliff (an SGD-stability artifact of
# the synthetic protocol's difficulty tuning, documented in
# tests/test_protocol_parity.py method_overrides) and carry no parity
# information — the delta is "trained vs untrained", not "jax vs torch".
# Collapses are EXCLUDED from the bias statistics but COUNTED PER SIDE:
# an asymmetric collapse rate would itself be a framework difference, so
# the counts are first-class study output, not a filter hidden in a test.
COLLAPSE_FLOOR_PTS = 20.0


def _converged(r, metric):
    return (
        r[f"{metric}_torch"][-1] >= COLLAPSE_FLOOR_PTS
        and r[f"{metric}_jax"][-1] >= COLLAPSE_FLOOR_PTS
    )


def summarize(results):
    """Per-stage mean/SE of the paired deltas (jax - torch) over CONVERGED
    pairs, plus the final stage in isolation (the north star is the FINAL
    average accuracy) and per-side collapse counts."""
    n_stages = len(results[0]["cnn_torch"])
    out = {}
    for metric in ("cnn", "nme"):
        conv = [r for r in results if _converged(r, metric)]
        n_torch_coll = sum(r[f"{metric}_torch"][-1] < COLLAPSE_FLOOR_PTS for r in results)
        n_jax_coll = sum(r[f"{metric}_jax"][-1] < COLLAPSE_FLOOR_PTS for r in results)
        if not conv:
            # bias statistics over zero converged pairs would silently
            # measure trained-vs-untrained noise — emit explicit nulls
            # instead (ADVICE round 4)
            out[metric] = dict(
                n_converged=0,
                n_collapsed_torch=int(n_torch_coll),
                n_collapsed_jax=int(n_jax_coll),
                converged_seeds=[],
                no_converged_pairs=True,
                per_stage_mean_delta=None,
                per_stage_se=None,
                final_stage_mean_delta=None,
                final_stage_se=None,
                per_seed_final_delta=[],
            )
            continue
        deltas = np.array(
            [[r[f"{metric}_jax"][s] - r[f"{metric}_torch"][s] for s in range(n_stages)]
             for r in conv]
        )  # (n_converged, n_stages)
        out[metric] = dict(
            n_converged=len(conv),
            n_collapsed_torch=int(n_torch_coll),
            n_collapsed_jax=int(n_jax_coll),
            converged_seeds=[r["seed"] for r in conv],
            per_stage_mean_delta=[round(float(m), 2) for m in deltas.mean(axis=0)],
            per_stage_se=[round(float(s), 2)
                          for s in deltas.std(axis=0, ddof=1) / np.sqrt(len(deltas))]
            if len(deltas) > 1 else None,
            final_stage_mean_delta=round(float(deltas[:, -1].mean()), 2),
            final_stage_se=round(float(deltas[:, -1].std(ddof=1) / np.sqrt(len(deltas))), 2)
            if len(deltas) > 1 else None,
            per_seed_final_delta=[round(float(d), 2) for d in deltas[:, -1]],
        )
    return out


_PAUSE_FLAG = {"paused": False}


def _install_coop_pause_handlers():
    """Cooperative quiesce protocol (bench.py _pause_registered_background_work):

    SIGSTOP is NOT safe for a study whose jax side runs on the tunneled
    chip — freezing every thread mid-RPC wedges the relay, and with it the
    bench that sent the SIGSTOP (measured round 4: a bench deadlocked for
    16+ min until the study was SIGCONTed by hand). Instead the bench sends
    SIGUSR1: the handler parks the MAIN thread in a sleep loop (no new
    steps are dispatched; in-flight async work drains) while the jax/axon
    IO threads keep serving the tunnel, and touches an ack file the bench
    can wait on. SIGUSR2 releases the loop."""
    import signal
    import time as _time

    ack = f"/tmp/bdvc_pause_ack_{os.getpid()}"

    def _on_pause(signum, frame):
        if _PAUSE_FLAG["paused"]:
            return
        _PAUSE_FLAG["paused"] = True
        try:
            with open(ack, "w"):
                pass
        except OSError:
            pass
        try:
            while _PAUSE_FLAG["paused"]:
                _time.sleep(0.2)  # SIGUSR2's handler flips the flag
        finally:
            try:
                os.unlink(ack)
            except OSError:
                pass

    def _on_resume(signum, frame):
        _PAUSE_FLAG["paused"] = False

    signal.signal(signal.SIGUSR1, _on_pause)
    signal.signal(signal.SIGUSR2, _on_resume)


def _register_for_bench_pause():
    """Append this PID to the bench pause file (bench.py PAUSE_PIDS_FILE) so
    a concurrent driver bench can quiesce us instead of measuring e2e
    throughput against our CPU load; the 'coop' flag selects the SIGUSR1
    protocol above (SIGSTOP would wedge the TPU tunnel). The entry is
    tag-validated against the live cmdline, so no cleanup is needed on
    exit."""
    _install_coop_pause_handlers()
    path = os.environ.get("BDVC_BENCH_PAUSE_PIDS", "/tmp/bdvc_bench_pause.pids")
    try:
        with open(path, "a") as f:
            f.write(f"{os.getpid()} parity_study coop\n")
    except OSError:
        pass


def main():
    _register_for_bench_pause()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5, help="number of paired runs")
    ap.add_argument("--first_seed", type=int, default=0)
    ap.add_argument("--method", default="base",
                    choices=["base", "icarl", "icarl_video_mix"])
    ap.add_argument("--out", default="parity_study.json")
    ap.add_argument("--data_root", default=None,
                    help="reuse an existing study tree (default: fresh tmpdir)")
    ap.add_argument("--resume", action="store_true",
                    help="load existing --out runs (same method) and only run "
                         "seeds not already present")
    ap.add_argument("--stages", type=int, default=3,
                    help="protocol depth: 3 = the tuned base tree; other "
                         "values build the 2-classes-per-task DEPTH tree "
                         "(stage-deep error-accumulation evidence)")
    ap.add_argument("--platform", default="cpu", choices=sorted(PLATFORM_OVERRIDES),
                    help="jax backend for the trainer side: 'cpu' = virtual "
                         "8-device mesh (test-suite setup), 'tpu' = the real "
                         "chip (1-device mesh, same global batch)")
    ap.add_argument("--extra_val", type=int, default=None,
                    help="override extra_val_videos_per_class (finer accuracy "
                         "quantum; changes the val set => a DIFFERENT study, "
                         "do not mix with runs at the default in one --out)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="config override applied to BOTH sides (ablation "
                         "arms, e.g. --set use_cbf=False to isolate which "
                         "subsystem carries a flagged bias); python-literal "
                         "values, repeatable. Changes the protocol => a "
                         "DIFFERENT study; recorded in the output and "
                         "checked on --resume.")
    args = ap.parse_args()
    import ast

    cli_overrides = {}
    for item in args.set:
        key, _, val = item.partition("=")
        if not _:
            ap.error(f"--set needs KEY=VALUE, got {item!r}")
        try:
            cli_overrides[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            cli_overrides[key] = val
    assert args.platform == _PLATFORM, "--platform must match the pre-parse"
    if args.seeds < 1:
        ap.error("--seeds must be >= 1")
    if not (2 <= args.stages <= 13):
        # 2 classes/task over the synthetic 27-color palette caps depth at 13
        ap.error("--stages must be in [2, 13] (palette has 27 class colors)")

    from tests.test_protocol_parity import (
        DEPTH_TREE_PARAMS, TREE_PARAMS, build_parity_tree, depth_overrides)

    if args.data_root:
        data_root = pathlib.Path(args.data_root)
        data_root.mkdir(parents=True, exist_ok=True)
    else:
        data_root = pathlib.Path(tempfile.mkdtemp(prefix="parity_study_"))
    # platform overrides touch per-device batch sizes and must stay
    # jax-side-only (the torch harness mirrors a fixed 8-wide world)
    jax_overrides = dict(PLATFORM_OVERRIDES[args.platform])
    extra_overrides = {}
    if args.stages != 3:
        tree_params = dict(DEPTH_TREE_PARAMS, num_classes=2 * args.stages)
        extra_overrides.update(depth_overrides(args.stages))
    else:
        tree_params = dict(TREE_PARAMS)
    if args.extra_val is not None:
        tree_params["extra_val_videos_per_class"] = args.extra_val
    extra_overrides.update(cli_overrides)
    tree = build_parity_tree(data_root, tree_params)
    work_root = data_root / "work"

    results = []
    if args.resume and os.path.exists(args.out):
        prior = json.load(open(args.out))
        if (prior.get("method"), prior.get("stages", 3),
                prior.get("extra_val"), prior.get("overrides") or {}) != (
                args.method, args.stages, args.extra_val, cli_overrides):
            ap.error(f"--resume: {args.out} holds method "
                     f"{prior.get('method')!r} at {prior.get('stages', 3)} "
                     f"stages / extra_val {prior.get('extra_val')} / "
                     f"overrides {prior.get('overrides')}, not "
                     f"{args.method!r} at {args.stages} / {args.extra_val} "
                     f"/ {cli_overrides}")
        results = list(prior["runs"])
        print(f"[parity_study] resumed {len(results)} runs "
              f"(seeds {[r['seed'] for r in results]})", flush=True)

    def dump():
        payload = dict(method=args.method, stages=args.stages,
                       extra_val=args.extra_val,
                       n_seeds=len(results), runs=results,
                       summary=summarize(results))
        if cli_overrides:
            payload["overrides"] = cli_overrides
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        return payload

    done = {r["seed"] for r in results}
    for i in range(args.seeds):
        seed = args.first_seed + i
        if seed in done:
            continue
        print(f"[parity_study] seed {seed} ({i + 1}/{args.seeds}) ...", flush=True)
        r = run_pair(tree, work_root, args.method, seed, extra_overrides,
                     jax_overrides)
        results.append(r)
        print(f"[parity_study] seed {seed}: "
              f"CNN torch={r['cnn_torch']} jax={r['cnn_jax']} | "
              f"NME torch={r['nme_torch']} jax={r['nme_jax']} "
              f"({r['wall_torch_s']}s torch, {r['wall_jax_s']}s jax)", flush=True)
        dump()  # incremental, so a killed run still leaves evidence

    payload = dump()
    print(json.dumps(payload["summary"], indent=1))
    print(f"[parity_study] wrote {args.out}")


if __name__ == "__main__":
    main()
