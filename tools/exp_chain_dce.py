"""Is the chain-crop inside the jitted bench step DCE-safe?

`bench.py` keeps the serial dependency chain shape-stable by cropping the
HR output back to LR size INSIDE the jitted step (`out[:, :h, :w]`).  In
principle XLA may propagate that slice backwards and skip computing the
uncropped output rows (and transitively parts of the stage gathers) —
which would inflate the headline MP/s.

This experiment times the same LUT pipeline two ways on the real chip:

  A. crop-inside-jit (the bench formulation);
  B. full-output-jit: the pipeline RETURNS the full HR frame (jit outputs
     are always materialized into HBM, so nothing can be elided), and a
     separate tiny jitted crop produces the next chain input.

If A == B (within noise) the bench formulation is sound; if A < B the
bench must switch to formulation B.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

    from bench import LR_H, LR_W, MODES, SCALE, load_luts, rand_img
    from lerf_tpu.ops import (
        ResizeGeometry, lut_stage1, lut_stage2, split_gaussian_hyper,
        steering_gaussian_resize,
    )
    from lerf_tpu.utils.timing import chain_time

    h, w, scale = LR_H, LR_W, SCALE
    s1, s2 = load_luts()
    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)

    def stages_and_resize(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        rho, sx, sy = split_gaussian_hyper(hyper)
        return steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)

    @jax.jit
    def step_crop_inside(img_i32):
        out = stages_and_resize(img_i32)
        return jnp.clip(jnp.round(out[:, :h, :w]), 0, 255).astype(jnp.int32)

    @jax.jit
    def step_full(img_i32):
        return stages_and_resize(img_i32)

    @jax.jit
    def crop(out):
        return jnp.clip(jnp.round(out[:, :h, :w]), 0, 255).astype(jnp.int32)

    def step_b(img_i32):
        return crop(step_full(img_i32))

    x0 = rand_img(h, w)
    results = {}
    # interleave A/B to share any machine drift
    for rep in range(3):
        ta = chain_time(step_crop_inside, x0, warmup=3, iters=15)
        tb = chain_time(step_b, x0, warmup=3, iters=15)
        results.setdefault("crop_inside_ms", []).append(round(ta * 1e3, 2))
        results.setdefault("full_output_ms", []).append(round(tb * 1e3, 2))
    out_mp = geom.out_sz[0] * geom.out_sz[1] / 1e6
    results["mps_crop_inside"] = round(
        out_mp / (min(results["crop_inside_ms"]) / 1e3), 1)
    results["mps_full_output"] = round(
        out_mp / (min(results["full_output_ms"]) / 1e3), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
