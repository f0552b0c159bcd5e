#!/usr/bin/env python
"""Micro-bench: LUT application + histogram strategies for device RandAugment.

The round-2 residual budget (PERF_NOTES "Device RandAugment") is ~45 ms/batch
of LUT selects (autocontrast/equalize compare-select over 256 levels) and
~20 ms of compare-reduce histograms. Both are one-hot contractions, so they
can ride the MXU as matmuls instead of 256-iteration VPU loops:

  lut[x]   = (x == levels) @ lut          (N,256)@(256,1), f32 accumulate
  hist(x)  = ones(1,N) @ (x == levels)    (1,N)@(N,256)

Integers <= 256 are exact in bf16 (8 significand bits) and counts < 2^24 are
exact in f32, so the matmul forms are bit-identical to the loop forms.
Whether they WIN depends on XLA fusing the one-hot into the dot operand
instead of materializing (N,256); this bench answers that on the real chip.

Usage: python tools/bench_lut.py
Env: LUT_STEPS (30)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(fn, x, steps):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1000


def main():
    steps = int(os.environ.get("LUT_STEPS", "30"))
    b, t, h, w = 16, 8, 224, 224
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(b, t, h, w, 3), dtype=np.uint8))
    # a fixed monotone LUT per channel (equalize-shaped); the strategies don't
    # depend on LUT content
    lut_np = np.clip(np.cumsum(rng.integers(0, 3, size=(3, 256)), axis=1), 0, 255)
    lut = jnp.asarray(lut_np.astype(np.uint8))
    levels_u8 = jnp.arange(256, dtype=jnp.uint8)

    results = {}

    # -- LUT application over the whole batch (per-channel LUTs) ------------
    @jax.jit
    def lut_select(x):
        def one(ch, l1):
            onehot = ch[..., None] == levels_u8
            return jnp.max(jnp.where(onehot, l1.astype(jnp.uint8)[None, :], 0), axis=-1)

        return jnp.stack([one(x[..., c], lut[c]) for c in range(3)], axis=-1)

    @jax.jit
    def lut_mxu(x):
        def one(ch, l1):
            flat = ch.reshape(-1)
            onehot = (flat[:, None] == levels_u8).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                onehot, l1.astype(jnp.bfloat16)[:, None],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            return out[:, 0].astype(jnp.uint8).reshape(ch.shape)

        return jnp.stack([one(x[..., c], lut[c]) for c in range(3)], axis=-1)

    a = lut_select(imgs)
    m = lut_mxu(imgs)
    assert bool(jnp.all(a == m)), "MXU LUT apply mismatch"
    results["lut_select_ms"] = round(chained_ms(lut_select, imgs, steps), 2)
    results["lut_mxu_ms"] = round(chained_ms(lut_mxu, imgs, steps), 2)

    # -- 256-bin histogram per frame-channel --------------------------------
    @jax.jit
    def hist_reduce(x):
        flat = x.reshape(b * t, h * w, 3)

        def one(fr):  # (HW, 3)
            return jnp.sum(
                (fr[:, :, None] == levels_u8[None, None, :]).astype(jnp.int32), axis=0
            )  # (3, 256)

        hists = jax.vmap(one)(flat)
        # consume into an image-shaped output so calls can chain
        return (x + (hists.sum() % 2).astype(jnp.uint8)).astype(jnp.uint8)

    @jax.jit
    def hist_mxu(x):
        flat = x.reshape(b * t, h * w, 3)

        def one(fr):
            onehot = (fr[:, :, None] == levels_u8[None, None, :]).astype(jnp.bfloat16)
            ones = jnp.ones((1, fr.shape[0]), jnp.bfloat16)
            hs = [
                jax.lax.dot_general(
                    ones, onehot[:, c], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
                for c in range(3)
            ]
            return jnp.stack(hs).astype(jnp.int32)

        hists = jax.vmap(one)(flat)
        return (x + (hists.sum() % 2).astype(jnp.uint8)).astype(jnp.uint8)

    ha = hist_reduce(imgs)
    hm = hist_mxu(imgs)
    assert bool(jnp.all(ha == hm)), "MXU histogram mismatch"
    results["hist_reduce_ms"] = round(chained_ms(hist_reduce, imgs, steps), 2)
    results["hist_mxu_ms"] = round(chained_ms(hist_mxu, imgs, steps), 2)

    # -- autocontrast: LUT construction+apply vs direct per-pixel formula ---
    @jax.jit
    def autoc_lut(x):
        def one(img):  # (H, W, 3)
            flat = img.reshape(-1, 3)
            lo = flat.min(axis=0).astype(jnp.float32)
            hi = flat.max(axis=0).astype(jnp.float32)
            scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
            ix = jnp.arange(256, dtype=jnp.float32)
            lut_ = jnp.clip((ix[None, :] - lo[:, None]) * scale[:, None], 0, 255).astype(jnp.int32)
            lut_ = jnp.where((hi > lo)[:, None], lut_, jnp.arange(256)[None, :]).astype(jnp.uint8)

            def app(ch, l1):
                onehot = ch[..., None] == levels_u8
                return jnp.max(jnp.where(onehot, l1[None, :], 0), axis=-1)

            return jnp.stack([app(img[..., c], lut_[c]) for c in range(3)], axis=-1)

        return jax.vmap(jax.vmap(one))(x)

    @jax.jit
    def autoc_direct(x):
        def one(img):
            flat = img.reshape(-1, 3)
            lo = flat.min(axis=0).astype(jnp.float32)
            hi = flat.max(axis=0).astype(jnp.float32)
            scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
            val = jnp.clip((img.astype(jnp.float32) - lo) * scale, 0, 255).astype(jnp.int32)
            return jnp.where(hi > lo, val, img.astype(jnp.int32)).astype(jnp.uint8)

        return jax.vmap(jax.vmap(one))(x)

    aa = autoc_lut(imgs)
    ad = autoc_direct(imgs)
    assert bool(jnp.all(aa == ad)), "autocontrast direct mismatch"
    results["autocontrast_lut_ms"] = round(chained_ms(autoc_lut, imgs, steps), 2)
    results["autocontrast_direct_ms"] = round(chained_ms(autoc_direct, imgs, steps), 2)

    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
