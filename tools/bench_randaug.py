#!/usr/bin/env python
"""Per-op cost attribution for the device RandAugment batch kernel.

Times `rand_augment_batch` (ops/rand_augment_dev.py) and ablated variants on
the attached device with dependency-chained dispatches (transport-safe), to
decide where the 90 ms/batch residual lives before restructuring
(round-2 VERDICT item #2).

Usage: python tools/bench_randaug.py
Env: BENCH_BATCH (16), RA_STEPS (20)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, keys, imgs, steps):
    """Chained timing: each call consumes the previous output."""
    out = fn(keys, imgs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(keys, out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1000


def main():
    from bdvcil_tpu.ops import rand_augment_dev as rad

    b = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("RA_STEPS", "20"))
    t, h, w = 8, 224, 224
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(b, t, h, w, 3), dtype=np.uint8))
    keys = jnp.asarray(rng.integers(0, 2**32, size=(b, 2), dtype=np.uint32))

    results = {}

    full = functools.partial(rad.rand_augment_batch, n=2, m=10)
    results["full_n2"] = timed(full, keys, imgs, steps)

    if os.environ.get("RA_FULL_ONLY"):
        print(json.dumps(results, indent=1))
        return

    # ablations: skip one op family at a time by monkey-patching its batch
    # contribution (identity) — the delta attributes that family's cost
    def ablate(skip_ids):
        @functools.partial(jax.jit, static_argnames=())
        def fn(keys, imgs):
            hh, ww = imgs.shape[2], imgs.shape[3]

            def clip_params(key):
                k_ops, k_sign, k_x, k_y = jax.random.split(key, 4)
                op_indices = jax.random.randint(k_ops, (2,), 0, rad.NUM_OPS)
                flip_sign = jax.random.uniform(k_sign) > 0.5
                x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=float(ww))
                y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=float(hh))
                return op_indices, flip_sign, x0, y0

            op_indices, flip_sign, x0, y0 = jax.vmap(clip_params)(keys)
            vals = rad.op_magnitudes(10)
            out_imgs = imgs
            for r in range(2):
                idx = op_indices[:, r]
                is_geo = jnp.isin(idx, jnp.asarray(rad._GEO_IDS))
                if "geo" not in skip_ids:
                    mats = jax.vmap(
                        lambda i, s: rad._affine_matrix_for_op(i, s, vals, hh, ww)
                    )(idx, flip_sign)
                    geo_out = jax.vmap(rad._affine_nearest_clip)(out_imgs, mats)
                    out = jnp.where(is_geo[:, None, None, None, None], geo_out, out_imgs)
                else:
                    out = out_imgs
                for i, op in enumerate(rad._OPS):
                    if i == 0 or i in rad._GEO_IDS or i in skip_ids:
                        continue
                    applied = jax.vmap(
                        lambda im, s, x, y, op=op, v=jnp.float32(vals[i]): op(im, v, s, (x, y))
                    )(out_imgs, flip_sign, x0, y0)
                    out = jnp.where((idx == i)[:, None, None, None, None], applied, out)
                out_imgs = out
            return out_imgs

        return fn

    families = {
        "no_equalize": {2},
        "no_autocontrast": {1},
        "no_solarize_posterize": {4, 12},
        "no_color": {5},
        "no_contrast": {6},
        "no_brightness": {7},
        "no_sharpness": {8},
        "no_cutout": {14},
        "no_geo": {"geo"},
        "photometric_none": {1, 2, 4, 5, 6, 7, 8, 12, 14},
    }
    base = timed(ablate(set()), keys, imgs, steps)
    results["rebuilt_full"] = base
    for name, skip in families.items():
        dt = timed(ablate(skip), keys, imgs, steps)
        results[name] = dt
        results[f"cost:{name[3:] if name.startswith('no_') else name}"] = round(base - dt, 2)

    for k, v in results.items():
        results[k] = round(v, 2) if isinstance(v, float) else v
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
