"""LUT-table layout experiment matrix on the real chip (VERDICT item 1).

Times stage-1 + stage-2 LUT ensembles for each table layout at the headline
360x640 workload, plus the fused end-to-end pipeline for the winner.
Results are recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LR_H, LR_W = 360, 640
SCALE = 4


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

    from lerf_tpu.ops import lut_stage1, lut_stage2
    from lerf_tpu.ops.lut_pipeline import build_packed_tables
    from lerf_tpu.ops.simplex import build_cell_table
    from lerf_tpu.lut.io import load_lut_bank

    bank = load_lut_bank("/root/reference/models/lerf-g", out_c=3)
    s1_flat, s2_flat = bank.as_int32()
    modes = ("s", "c", "t")

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, LR_H, LR_W), dtype=np.int32))

    results = {}

    def run(name, s1, s2):
        f1 = jax.jit(lambda x: lut_stage1(x, s1, modes))
        f2 = jax.jit(lambda f: lut_stage2(f, s2, modes))
        feat = f1(img)
        t1 = timeit(f1, img)
        t2 = timeit(f2, feat)
        results[name] = {"stage1_ms": round(t1 * 1e3, 2),
                         "stage2_ms": round(t2 * 1e3, 2),
                         "sum_ms": round((t1 + t2) * 1e3, 2)}
        print(name, results[name], flush=True)

    which = sys.argv[1:] or ["cells", "packed32", "packed8"]

    if "cells" in which:
        s1c = {k: jnp.asarray(build_cell_table(v)) for k, v in s1_flat.items()}
        s2c = {k: jnp.asarray(build_cell_table(v)) for k, v in s2_flat.items()}
        run("cells_i32", s1c, s2c)
        del s1c, s2c

    if "packed32" in which:
        run("packed_i32",
            build_packed_tables(s1_flat, modes),
            build_packed_tables(s2_flat, modes, split_r=True))

    if "packed8" in which:
        s1_8 = {k: v.astype(np.int8) for k, v in s1_flat.items()}
        s2_8 = {k: v.astype(np.int8) for k, v in s2_flat.items()}
        run("packed_i8",
            build_packed_tables(s1_8, modes),
            build_packed_tables(s2_8, modes, split_r=True))

    if "flat" in which:
        s1j = {k: jnp.asarray(v) for k, v in s1_flat.items()}
        s2j = {k: jnp.asarray(v) for k, v in s2_flat.items()}
        run("flat_i32", s1j, s2j)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
