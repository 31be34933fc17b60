"""Incremental variants of the row-packed warp to find the 48 ms split.

A: pack+gather only (lane-0 consumer — full row write+read, no blend)
B: pack+gather+blend, output left [N, C] (no final transpose)
C: full production path (blend + out.T reshape)
All chained at 360×640 → ×4.
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
OH, OW = H * SCALE, W * SCALE


from _timing import chain_time  # noqa: E402  (shared timer)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32))
    u = [jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32) / 255)
         for _ in range(3)]
    matrix = np.linalg.inv(np.diag([1.0 / SCALE, 1.0 / SCALE, 1.0]))
    geom = WarpGeometry.create((H, W), matrix, (OH, OW), support=2)

    def planes_of(x):
        rho, sx, sy = decode_gaussian_hyper(*u, 10.0)
        return [pad2d(x, geom.pad_x, geom.pad_y, "constant")] + [
            pad2d(p, geom.pad_x, geom.pad_y, "edge")
            for p in (rho, sx, sy)]

    def blend(gathered, dtype):
        dx, dy = _warp_dis_flat(geom, dtype)
        wn = ws = None
        for b, (s, t) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            x, r_, sx_, sy_ = gathered[b]
            w = steering_gaussian_weight(r_, sx_, sy_, dx[s], dy[t])
            wn = w * x if wn is None else wn + w * x
            ws = w if ws is None else ws + w
        return wn / ws                                   # [N, C]

    @jax.jit
    def var_a(x):
        g = _rowpack_warp_gather(planes_of(x), geom)
        lane0 = g[0][0][:, 0]                            # single lane
        return (x + lane0.reshape(OH, OW)[:H, :W]) % 256

    @jax.jit
    def var_b(x):
        g = _rowpack_warp_gather(planes_of(x), geom)
        out = blend(g, x.dtype)                          # [N, C]
        return (x + out[:, 0].reshape(OH, OW)[:H, :W]) % 256

    @jax.jit
    def var_c(x):
        out = steering_gaussian_warp(x, *u, geom, max_sigma=10.0)
        out = jnp.nan_to_num(out, nan=0.0)
        return (x + out[:, :H, :W]) % 256

    for name, f in (("A pack+gather", var_a), ("B +blend", var_b),
                    ("C full(+T)", var_c)):
        t = chain_time(f, img, iters=10)
        print(f"{name:15s}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
