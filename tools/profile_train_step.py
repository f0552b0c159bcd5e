#!/usr/bin/env python
"""Capture a jax.profiler trace of the TSM-R50 train step and print the top
device ops by self time (SURVEY.md §5: the TPU build adds tracing the
reference lacks). Parses the xplane dump directly (no TensorBoard needed).

    python tools/profile_train_step.py [--steps 3] [--batch 16]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, steps: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.runtime import TrainState, make_train_step

    num_segments = 8
    model_cfg = dict(
        type="CILRecognizer2D",
        backbone=dict(
            type="ResNetTSM", depth=50, num_segments=num_segments, shift_div=8,
            conv1x1_mode=os.environ.get("BENCH_CONV1X1", "xla"),
        ),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=51,
            in_channels=2048,
            inc_head_config=dict(type="LocalSimilarityClassifier", out_features=51, nb_proxies=1),
            num_segments=num_segments,
            loss_cls=dict(type="LSCLoss"),
            dropout_ratio=0.5,
        ),
        test_cfg=dict(average_clips="prob"),
    )
    spec = build_model(model_cfg, dtype=jnp.bfloat16)
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, num_segments, 224, 224, 3))
    tx = build_optimizer(
        variables["params"],
        dict(type="SGD", paramwise_cfg=dict(fc_lr_scale_factor=5.0), lr=0.01,
             momentum=0.9, weight_decay=1e-4),
    )
    step = make_train_step(spec, tx, num_classes=51, method="base")
    state = TrainState.create(variables, tx)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((batch, num_segments, 224, 224, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 51, size=(batch, 1)))
    keys = jax.random.split(jax.random.PRNGKey(0), steps + 3)

    for i in range(3):  # warm/compile
        state, _ = step(state, None, imgs, labels, {}, keys[i])
    jax.block_until_ready(state.params)

    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        state, _ = step(state, None, imgs, labels, {}, keys[3 + i])
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()


def summarize(trace_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane dump found under", trace_dir)
        return
    def _shorten(name: str) -> str:
        # collapse "%fusion.123 = bf16[...] fusion(...), kind=kLoop ..." to a
        # category + shape hint
        if name.startswith("%"):
            head = name.split(" = ", 1)
            op = head[0][1:].rstrip("0123456789.")
            shape = head[1].split("{", 1)[0][:36] if len(head) > 1 else ""
            return f"{op} {shape}"
        return name[:64]

    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name and "device" not in plane.name.lower():
                continue
            metadata = {k: v.name for k, v in plane.event_metadata.items()}
            print(f"\n==== plane: {plane.name} ({path}) ====")
            for line in plane.lines:
                totals = collections.Counter()
                counts = collections.Counter()
                line_span = 0.0
                for event in line.events:
                    name = _shorten(metadata.get(event.metadata_id, str(event.metadata_id)))
                    totals[name] += event.duration_ps / 1e9  # ms
                    counts[name] += 1
                    line_span += event.duration_ps / 1e9
                if not totals:
                    continue
                print(f"\n-- line: {line.name!r} (total {line_span:.1f} ms, {sum(counts.values())} events) --")
                for name, ms in totals.most_common(top):
                    print(f"{name[:70]:70s} {ms:9.3f} {100 * ms / line_span:6.2f}% {counts[name]:6d}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--trace_dir", default="/tmp/bdvc_profile")
    parser.add_argument("--parse_only", action="store_true")
    args = parser.parse_args()

    if not args.parse_only:
        capture(args.trace_dir, args.steps, args.batch)
    summarize(args.trace_dir)


if __name__ == "__main__":
    main()
