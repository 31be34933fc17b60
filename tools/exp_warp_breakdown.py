"""Where does the row-packed warp's 48 ms/frame go?

Pieces, each timed chained at 360×640 → 1440×2560:
  pack-only    — build the corner-indexed packed operand, no gather
  gather-only  — packed construction + row gather, trivial reduce
  weights-only — Gaussian weight math on fake gathered rows (no gather)
  full         — the production steering_gaussian_warp
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

from lerf_tpu.ops import WarpGeometry, steering_gaussian_warp
from lerf_tpu.ops.resample import (_rowpack_warp_gather, _warp_dis_flat,
                                   decode_gaussian_hyper, pad2d,
                                   steering_gaussian_weight)

H, W, SCALE = 360, 640, 4


from _timing import chain_time  # noqa: E402  (shared timer)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32))
    u = [jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32) / 255)
         for _ in range(3)]
    matrix = np.linalg.inv(np.diag([1.0 / SCALE, 1.0 / SCALE, 1.0]))
    geom = WarpGeometry.create((H, W), matrix, (H * SCALE, W * SCALE),
                               support=2)
    n = H * SCALE * W * SCALE

    def make_planes(x):
        rho, sx, sy = decode_gaussian_hyper(*u, 10.0)
        return [pad2d(x, geom.pad_x, geom.pad_y, "constant")] + [
            pad2d(p, geom.pad_x, geom.pad_y, "edge")
            for p in (rho, sx, sy)]

    @jax.jit
    def full(x):
        out = steering_gaussian_warp(x, *u, geom, max_sigma=10.0)
        out = jnp.nan_to_num(out, nan=0.0)
        return (x + out[:, :H, :W]) % 256

    @jax.jit
    def gather_only(x):
        g = _rowpack_warp_gather(make_planes(x), geom)
        acc = sum(v.sum(axis=1) for b in g for v in b)    # [N]
        return (x + acc.reshape(H * SCALE, W * SCALE)[:H, :W]) % 256

    @jax.jit
    def weights_only(x):
        dx, dy = _warp_dis_flat(geom, x.dtype)
        base = (x.reshape(-1)[:1] + jnp.arange(n, dtype=x.dtype)[:, None]
                % 7) / 7.0                                # fake [N,1]
        wn = None
        ws = None
        for s in (0, 1):
            for t in (0, 1):
                w = steering_gaussian_weight(base, base + 1, base + 2,
                                             dx[s], dy[t])
                wn = w * base if wn is None else wn + w * base
                ws = w if ws is None else ws + w
        out = (wn / ws)[:, 0].reshape(H * SCALE, W * SCALE)
        return (x + out[:H, :W]) % 256

    for name, f in (("full", full), ("gather-only", gather_only),
                    ("weights-only", weights_only)):
        t = chain_time(f, img, iters=10)
        print(f"warp {name:13s}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
