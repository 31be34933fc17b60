"""Row-packed warp: chained steady-state timing on the real chip."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step, x0, iters=10, warmup=2):
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

    from bench import load_luts, MODES
    from lerf_tpu.ops import (WarpGeometry, lut_stage1, lut_stage2,
                              split_gaussian_hyper, steering_gaussian_warp)

    h, w, s = 360, 640, 4
    rng = np.random.RandomState(0)
    mat = np.linalg.inv(np.diag([1.0 / s, 1.0 / s, 1.0]))
    geom = WarpGeometry.create((h, w), mat, (h * s, w * s), support=2)

    # warp op alone, chained
    hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
           for _ in range(3)]

    @jax.jit
    def warp_step(img):
        out = steering_gaussian_warp(img, *hyp, geom, max_sigma=10.0)
        out = jnp.nan_to_num(out, nan=0.0)
        return out[:, :h, :w] * 0.5 + 32.0

    img0 = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
    t = chain_time(warp_step, img0)
    res = {"warp_rowpack_ms": round(t * 1e3, 1)}
    print(res, flush=True)

    # full LUT warp pipeline (the bench --all workload), chained
    s1, s2 = load_luts()

    @jax.jit
    def pipe_step(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        rho, sx, sy = split_gaussian_hyper(hyper)
        out = steering_gaussian_warp(feat.astype(jnp.float32), rho, sx, sy,
                                     geom, max_sigma=10.0)
        out = jnp.nan_to_num(out, nan=0.0)
        return jnp.clip(jnp.round(out[:, :h, :w]), 0, 255).astype(jnp.int32)

    i0 = jnp.asarray(rng.randint(0, 256, (3, h, w), dtype=np.int32))
    t2 = chain_time(pipe_step, i0)
    res["lut_warp_pipeline_ms"] = round(t2 * 1e3, 1)
    res["lut_warp_mps"] = round((h * s) * (w * s) / 1e6 / t2, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
