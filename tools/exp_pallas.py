"""Pallas fused steerable-resize kernel vs the XLA path on the real chip.

VERDICT item 2: compile steering_gaussian_resize_pallas on hardware,
benchmark both paths at the deploy configs, and decide dispatch-or-retire.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=3, iters=20):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

    from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
    from lerf_tpu.ops.pallas.resize_kernel import \
        steering_gaussian_resize_pallas

    results = {}
    for (h, w, s) in [(360, 640, 4), (720, 1280, 4)]:
        geom = ResizeGeometry.create((h, w), scale_factors=[s, s], support=2)
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
        hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
               for _ in range(3)]

        f_xla = jax.jit(lambda i, r, x, y: steering_gaussian_resize(
            i, r, x, y, geom, max_sigma=10.0))
        t_xla = timeit(f_xla, img, *hyp)
        key = f"{h}x{w}_x{s}"
        results[key] = {"xla_ms": round(t_xla * 1e3, 2)}

        try:
            f_pl = jax.jit(lambda i, r, x, y: steering_gaussian_resize_pallas(
                i, r, x, y, geom, max_sigma=10.0))
            want = np.asarray(f_xla(img, *hyp))
            got = np.asarray(f_pl(img, *hyp))
            err = float(np.max(np.abs(got - want)))
            t_pl = timeit(f_pl, img, *hyp)
            results[key].update({"pallas_ms": round(t_pl * 1e3, 2),
                                 "max_abs_err": err})
        except Exception as e:
            results[key]["pallas_error"] = f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc()
        print(key, results[key], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
