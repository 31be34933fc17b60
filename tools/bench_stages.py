"""Stage-split timing of the LUT deploy pipeline on the real chip.

Times stage-1 LUT ensemble, stage-2 hyper ensemble, and the steerable
resize separately (each jitted alone, steady state) plus the fused
end-to-end pipeline, at the headline 360x640 -> x4 workload.  Feeds the
experiment matrix VERDICT.md item 1 asks for.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) \
            else fn(*args).block_until_ready()
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

    from lerf_tpu.ops import (
        ResizeGeometry, lut_stage1, lut_stage2, split_gaussian_hyper,
        steering_gaussian_resize,
    )
    from bench import load_luts, LR_H, LR_W, SCALE

    s1, s2 = load_luts()        # packed-int8 rotation-group tables
    geom = ResizeGeometry.create((LR_H, LR_W), scale_factors=[SCALE, SCALE],
                                 support=2)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, LR_H, LR_W), dtype=np.int32))

    f_s1 = jax.jit(lambda x: lut_stage1(x, s1, ("s", "c", "t")))
    f_s2 = jax.jit(lambda f: lut_stage2(f, s2, ("s", "c", "t")))

    @jax.jit
    def f_resize(feat, hyper):
        rho, sx, sy = split_gaussian_hyper(hyper)
        return steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)

    @jax.jit
    def f_all(x):
        feat = lut_stage1(x, s1, ("s", "c", "t"))
        hyper = lut_stage2(feat, s2, ("s", "c", "t"))
        rho, sx, sy = split_gaussian_hyper(hyper)
        return steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)

    feat = f_s1(img)
    hyper = f_s2(feat)

    res = {
        "stage1_ms": round(timeit(f_s1, img) * 1e3, 2),
        "stage2_ms": round(timeit(f_s2, feat) * 1e3, 2),
        "resize_ms": round(timeit(f_resize, feat, hyper) * 1e3, 2),
        "fused_ms": round(timeit(f_all, img) * 1e3, 2),
    }
    out_mp = (LR_H * SCALE) * (LR_W * SCALE) / 1e6
    res["fused_mps"] = round(out_mp / (res["fused_ms"] / 1e3), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
