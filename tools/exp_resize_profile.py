"""Where does the steerable-resize time go?  (per-block periodic path)

Times on a serial chain, on the real chip:
  (a) full steering_gaussian_resize,
  (b) neighbor-expansion only (Σ over blocks of expanded neighbors),
  (c) weights only (hyper expansion + gaussian weight, Σ over blocks),
  (d) a fused-estimate floor: one expansion + one multiply.

Interpretation: if (a) ≈ (b)+(c), the per-block intermediates all
materialize in HBM and a hand-fused (Pallas) kernel has room; if
(a) << (b)+(c), XLA already fuses the blocks and the op is near its
compute/write floor.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
from lerf_tpu.ops import resample as R

from _timing import chain_time  # noqa: E402


def run(h, w, scale):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.float32))
    hyper = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
             for _ in range(3)]
    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)
    pp = R._periodic_pair(geom)
    assert pp is not None

    @jax.jit
    def full(x):
        out = steering_gaussian_resize(x, *hyper, geom)
        return out[..., :h, :w] % 256.0          # chain: crop back to input

    @jax.jit
    def neighbors_only(x):
        xp = R.pad2d(x, geom.pad_x, geom.pad_y, "constant")
        acc = None
        for s in range(geom.support):
            for t in range(geom.support):
                n = R._expand_block(xp, s, t, *pp, geom.out_sz)
                acc = n if acc is None else acc + n
        return acc[..., :h, :w] % 256.0

    @jax.jit
    def weights_only(x):
        rho, sx, sy = R.decode_gaussian_hyper(
            hyper[0] + 0 * x[..., :1, :1], hyper[1], hyper[2], 10.0)
        hyp = [R.pad2d(v, geom.pad_x, geom.pad_y, "edge")
               for v in (rho, sx, sy)]
        acc = None
        for s in range(geom.support):
            for t in range(geom.support):
                hy = [R._expand_block(v, s, t, *pp, geom.out_sz)
                      for v in hyp]
                dx64, dy64 = R._dis_block(geom, s, t)
                wt = R.steering_gaussian_weight(
                    hy[0], hy[1], hy[2],
                    jnp.asarray(dx64, x.dtype), jnp.asarray(dy64, x.dtype))
                acc = wt if acc is None else acc + wt
        return acc[..., :h, :w] % 256.0

    @jax.jit
    def floor(x):
        xp = R.pad2d(x, geom.pad_x, geom.pad_y, "constant")
        n = R._expand_block(xp, 0, 0, *pp, geom.out_sz)
        return (n * 0.5)[..., :h, :w] % 256.0

    oh, ow = geom.out_sz
    print(f"{h}x{w} -> {oh}x{ow} (x{scale})", flush=True)
    for name, fn in (("full resize", full), ("neighbors only", neighbors_only),
                     ("weights only", weights_only), ("1-block floor", floor)):
        t = chain_time(fn, img)
        print(f"  {name:16s} {t*1e3:7.2f} ms", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    run(360, 640, 4)
    run(720, 1280, 4)


if __name__ == "__main__":
    main()
