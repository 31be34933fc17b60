"""Chained-dependency timing: each iteration consumes the previous output.

The axon stack shows implausibly fast repeat-input timings (0.04 ms for a
4K resize — below the HBM write time of the output), so steady-state
numbers here are measured on a serial dependency chain: iteration k's input
is a slice of iteration k-1's output.  No caching or overlap can hide work.

Validates: (1) the bench.py LUT-pipeline headline, (2) XLA vs Pallas
steerable resize at 1440p/4K.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step, x0, iters=20, warmup=3):
    import jax
    x = x0
    for _ in range(warmup):
        x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

    from bench import load_luts, LR_H, LR_W, SCALE, MODES
    from lerf_tpu.ops import (
        ResizeGeometry, lut_stage1, lut_stage2, split_gaussian_hyper,
        steering_gaussian_resize,
    )
    from lerf_tpu.ops.pallas.resize_kernel import \
        steering_gaussian_resize_pallas

    results = {}
    rng = np.random.RandomState(0)

    # 1. full LUT pipeline, chained: out -> crop -> int image -> next iter
    s1, s2 = load_luts()
    geom = ResizeGeometry.create((LR_H, LR_W), scale_factors=[SCALE, SCALE],
                                 support=2)

    @jax.jit
    def lut_step(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        rho, sx, sy = split_gaussian_hyper(hyper)
        out = steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)
        nxt = jnp.clip(jnp.round(out[:, :LR_H, :LR_W]), 0, 255) \
            .astype(jnp.int32)
        return nxt

    img0 = jnp.asarray(rng.randint(0, 256, (3, LR_H, LR_W), dtype=np.int32))
    dt = chain_time(lut_step, img0)
    results["lut_pipeline_360_chained_ms"] = round(dt * 1e3, 2)
    results["lut_pipeline_mps"] = round(
        (LR_H * SCALE) * (LR_W * SCALE) / 1e6 / dt, 2)
    print(results, flush=True)

    # 2. resize only, XLA vs Pallas, chained via crop + renormalize
    for (h, w) in [(360, 640), (720, 1280)]:
        g = ResizeGeometry.create((h, w), scale_factors=[4, 4], support=2)
        hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
               for _ in range(3)]

        def make_step(fn):
            @jax.jit
            def step(img):
                out = fn(img, *hyp, g)
                return out[:, :h, :w] * 0.5 + 64.0
            return step

        xla = make_step(lambda i, r, x, y, gg: steering_gaussian_resize(
            i, r, x, y, gg, max_sigma=10.0))
        pl = make_step(lambda i, r, x, y, gg: steering_gaussian_resize_pallas(
            i, r, x, y, gg, max_sigma=10.0))
        img0 = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
        results[f"resize_xla_{h}_ms"] = round(chain_time(xla, img0) * 1e3, 3)
        results[f"resize_pallas_{h}_ms"] = round(chain_time(pl, img0) * 1e3,
                                                 3)
        print(results, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
