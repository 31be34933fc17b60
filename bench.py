"""Headline benchmark: LeRF-G LUT-pipeline arbitrary-scale SR throughput.

Measures end-to-end device throughput (output megapixels/sec) of the full
deploy pipeline — stage-1 LUT ensemble → stage-2 hyper LUT ensemble →
steerable-Gaussian ×4 resize — on one chip, steady state.

Baseline: the reference implementation's deploy path (numpy
``eval_lut_sr.py``) measured on this machine's host CPU — see BASELINE.md.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Reference numpy deploy path (FourSimplexInterpFaster ensemble + numpy
# steering resize), measured on this host via tools/bench_reference.py:
# 52.86 s/frame at 360×640→×4 = 0.0697 output MP/s.
REF_NUMPY_MPS = float(os.environ.get("LERF_REF_NUMPY_MPS", "0.0697"))

LR_H, LR_W = 360, 640           # 1440×2560 (QHD) output at ×4
SCALE = 4
WARMUP = 3
ITERS = 20


def load_luts():
    """Shipped LeRF-G LUTs when available; random otherwise (same shapes).
    Returned in the cell-major fast-path layout."""
    from lerf_tpu.ops.simplex import build_cell_table

    ref = "/root/reference/models/lerf-g"
    try:
        from lerf_tpu.lut.io import load_lut_bank
        bank = load_lut_bank(ref, out_c=3)
        s1, s2 = bank.as_int32()
    except Exception:
        rng = np.random.RandomState(0)
        L4 = 17 ** 4
        s1 = {m: rng.randint(-127, 128, (L4, 1)).astype(np.int32)
              for m in "sct"}
        s2 = {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int32)
              for m in "sct" for r in (0, 1)}
    s1 = {k: build_cell_table(np.asarray(v, np.int32)) for k, v in s1.items()}
    s2 = {k: build_cell_table(np.asarray(v, np.int32)) for k, v in s2.items()}
    return s1, s2


def main():
    import jax
    import jax.numpy as jnp

    # XLA:TPU gather compiles are minutes-long on this stack; the persistent
    # cache makes them one-time per machine.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lerf_tpu.ops import (
        ResizeGeometry, lut_stage1, lut_stage2, split_gaussian_hyper,
        steering_gaussian_resize,
    )

    s1, s2 = load_luts()
    s1 = {k: jnp.asarray(v) for k, v in s1.items()}
    s2 = {k: jnp.asarray(v) for k, v in s2.items()}
    geom = ResizeGeometry.create((LR_H, LR_W), scale_factors=[SCALE, SCALE],
                                 support=2)

    @jax.jit
    def pipeline(img_i32):
        feat = lut_stage1(img_i32, s1, ("s", "c", "t"))
        hyper = lut_stage2(feat, s2, ("s", "c", "t"))
        rho, sx, sy = split_gaussian_hyper(hyper)
        return steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, LR_H, LR_W), dtype=np.int32))

    for _ in range(WARMUP):
        pipeline(img).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(img)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    out_mp = (LR_H * SCALE) * (LR_W * SCALE) / 1e6
    mps = out_mp / dt
    print(json.dumps({
        "metric": "lerf_g_lut_sr_x4_throughput",
        "value": round(mps, 3),
        "unit": "output_megapixels_per_sec",
        "vs_baseline": round(mps / REF_NUMPY_MPS, 2) if REF_NUMPY_MPS else None,
    }))


if __name__ == "__main__":
    main()
