"""Packed patch-gather warp vs the element-gather warp (VERDICT perf work).

The warp resample is element-gather bound: 4 tensors x C channels x S^2
neighbors of single-element random reads (~177M transactions per 4K frame
-> 2.35 MP/s in bench --all).  This experiment packs (img, rho, sx, sy) x C
pixel-major into one operand [Hp2*Wp2, 4C] so ONE gather index fetches a
(2, 4C) patch: both column-neighbors of all variables at once.  Two gathers
(source row s=0/1) replace 48 element reads per output pixel.

Border clipping (geometry.py:161 clips FOV into [0, in-1]) is reproduced
exactly by a +-1 edge-replicated ring plus clip-remapped rows/cols, with
unclipped corners reconstructed from the stored clipped pairs (S=2).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def packed_warp(img, rho, sigma_x, sigma_y, geom, *, max_sigma=10.0,
                pad_mode="constant"):
    import jax
    import jax.numpy as jnp
    from lerf_tpu.ops.resample import (decode_gaussian_hyper, pad2d,
                                       steering_gaussian_weight)

    assert geom.support == 2 and img.ndim == 3
    C = img.shape[0]
    oh, ow = geom.out_sz
    rho, sigma_x, sigma_y = decode_gaussian_hyper(rho, sigma_x, sigma_y,
                                                  max_sigma)
    planes = [pad2d(img, geom.pad_x, geom.pad_y, pad_mode)] + [
        pad2d(p, geom.pad_x, geom.pad_y, "edge")
        for p in (rho, sigma_x, sigma_y)]
    hp, wp = planes[0].shape[-2:]
    # the stored FOV is clipped into [0, in_sz-1] (geometry.py:161) with
    # in_sz the original (unpadded) size; the remap must clip the same way.
    in_h = img.shape[-2]
    in_w = img.shape[-1]

    row_map = np.clip(np.arange(-1, hp + 1), 0, in_h - 1)
    col_map = np.clip(np.arange(-1, wp + 1), 0, in_w - 1)
    hp2, wp2 = hp + 2, wp + 2
    remapped = [p[..., row_map, :][..., :, col_map] for p in planes]
    # [4, C, hp2, wp2] -> [hp2*wp2, 4C]
    P = jnp.stack(remapped, 0).transpose(2, 3, 0, 1).reshape(hp2 * wp2,
                                                             4 * C)

    # unclipped corners from the clipped stored pairs (S=2: a pair is
    # clipped iff equal; (0,0) means left=-1, (in-1,in-1) means left=in-1)
    def corner(fov):
        f0, f1 = fov[..., 0].astype(np.int64), fov[..., 1].astype(np.int64)
        return np.where(f1 == 0, -1, f0)

    f0x = corner(geom.fov_x) + 1                # ring offset
    f0y = corner(geom.fov_y) + 1
    flat = (f0x * wp2 + f0y).reshape(-1).astype(np.int32)
    starts0 = jnp.asarray(np.stack([flat, np.zeros_like(flat)], 1))
    starts1 = jnp.asarray(np.stack([flat + wp2, np.zeros_like(flat)], 1))

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def fetch(starts):
        return jax.lax.gather(P, starts, dnums, slice_sizes=(2, 4 * C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    g_s = (fetch(starts0), fetch(starts1))      # each [2, 4C, N]
    n = oh * ow
    dx = [jnp.asarray(geom.dis_x[..., s].reshape(1, n), img.dtype)
          for s in range(2)]
    dy = [jnp.asarray(geom.dis_y[..., t].reshape(1, n), img.dtype)
          for t in range(2)]
    wn = None
    ws = None
    for s in range(2):
        for t in range(2):
            vals = g_s[s][t]                     # [4C, N]
            x = vals[0:C]
            r_, sx_, sy_ = vals[C:2 * C], vals[2 * C:3 * C], vals[3 * C:]
            w = steering_gaussian_weight(r_, sx_, sy_, dx[s], dy[t])
            wn = w * x if wn is None else wn + w * x
            ws = w if ws is None else ws + w
    return (wn / ws).reshape(C, oh, ow)


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

    from lerf_tpu.ops import WarpGeometry, steering_gaussian_warp

    results = {}
    # correctness on a small warp first
    rng = np.random.RandomState(0)
    mat = np.linalg.inv(np.asarray(
        [[0.45, 0.02, -0.1], [-0.03, 0.55, 0.2], [1e-4, -2e-5, 1.0]],
        np.float64))
    h, w, oh, ow = 40, 50, 90, 100
    geom = WarpGeometry.create((h, w), mat, (oh, ow), support=2)
    img = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
    hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
           for _ in range(3)]
    want = np.asarray(steering_gaussian_warp(img, *hyp, geom))
    got = np.asarray(packed_warp(img, *hyp, geom))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    assert (nan_w == nan_g).all()
    err = float(np.nanmax(np.abs(got - want))) if (~nan_w).any() else 0.0
    results["small_max_abs_err"] = err
    print("correctness:", err, flush=True)

    # deploy-scale timing, chained
    h, w, s = 360, 640, 4
    mat = np.linalg.inv(np.diag([1.0 / s, 1.0 / s, 1.0]))
    geom = WarpGeometry.create((h, w), mat, (h * s, w * s), support=2)
    hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
           for _ in range(3)]

    def make_step(fn):
        @jax.jit
        def step(img):
            out = fn(img, *hyp, geom)
            out = jnp.nan_to_num(out, nan=0.0)
            return out[:, :h, :w] * 0.5 + 32.0
        return step

    img0 = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
    t_old = chain_time(make_step(
        lambda i, r, x, y, g: steering_gaussian_warp(i, r, x, y, g)), img0)
    t_new = chain_time(make_step(
        lambda i, r, x, y, g: packed_warp(i, r, x, y, g)), img0)
    results["warp_element_ms"] = round(t_old * 1e3, 1)
    results["warp_packed_ms"] = round(t_new * 1e3, 1)
    results["speedup"] = round(t_old / t_new, 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
