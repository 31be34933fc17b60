"""Pallas vs XLA resize, cycling distinct inputs to defeat any caching."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_multi(fn, argsets, iters=20):
    import jax
    for a in argsets:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = []
    for k in range(iters):
        outs.append(fn(*argsets[k % len(argsets)]))
    jax.block_until_ready(outs)
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
        argsets = []
        for _ in range(4):
            img = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
            hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
                   for _ in range(3)]
            argsets.append((img, *hyp))

        f_xla = jax.jit(lambda i, r, x, y: steering_gaussian_resize(
            i, r, x, y, geom, max_sigma=10.0))
        f_pl = jax.jit(lambda i, r, x, y: steering_gaussian_resize_pallas(
            i, r, x, y, geom, max_sigma=10.0))
        key = f"{h}x{w}_x{s}"
        results[key] = {
            "xla_ms": round(timeit_multi(f_xla, argsets) * 1e3, 2),
            "pallas_ms": round(timeit_multi(f_pl, argsets) * 1e3, 2),
        }
        print(key, results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
