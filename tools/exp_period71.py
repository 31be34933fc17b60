"""Does the periodic-slab path beat the index-gather path at period 71?

×3.55 = 71/20: the FOV is periodic with p=71, q=20, but MAX_FOV_PERIOD=32
keeps it on the two-axis index-gather fallback (~18 ms of the ×3.55
pipeline's 58 ms at 1440p — BASELINE "Dynamic-serving device tax").  The
slab path at p=71 trades the gathers for 71 stride-20 minor-axis slices
per tensor-axis — strided lane reads whose cost on this stack is unknown
(the shipped p≤32 slabs all have small q; ×4 is q=1, fully contiguous).

Times the RESIZE op alone (chained, output fed back through a crop) and
the full LUT pipeline, with MAX_FOV_PERIOD as shipped vs raised to 128.

Run on an IDLE chip: python tools/exp_period71.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def time_resize(h, w, scale, label):
    import jax
    import jax.numpy as jnp

    from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
    from lerf_tpu.ops import resample as R
    from lerf_tpu.utils.timing import chain_time

    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)
    px = R._periodic_fov(geom.fov_x, geom.out_sz[0], geom.scale[0])
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
    hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
           for _ in range(3)]

    @jax.jit
    def step(x):
        out = steering_gaussian_resize(x, *hyp, geom, max_sigma=10.0)
        # derive next input from the output (DCE safety), input-shaped
        return out[:, :h, :w]

    t0 = time.time()
    dt = chain_time(step, img)
    print(f"{label}: periodic={'yes p=%d q=%d' % (px[0], px[1]) if px else 'no'} "
          f"resize {dt * 1e3:.2f} ms/frame "
          f"({geom.out_sz[0] * geom.out_sz[1] / 1e6 / dt:.1f} MP/s) "
          f"[first-call+compile {time.time() - t0:.0f}s]", flush=True)
    return dt


def main():
    bench._wait_for_tpu()
    from lerf_tpu.config import enable_jit_cache
    enable_jit_cache()
    from lerf_tpu.ops import resample as R

    h, w, scale = 360, 640, 3.55          # out 1278×2272 (p=71 divides)
    time_resize(h, w, scale, "gather (MAX_FOV_PERIOD=32)")
    R.MAX_FOV_PERIOD = 128
    time_resize(h, w, scale, "slab p=71 (MAX_FOV_PERIOD=128)")
    # reference point: the shipped ×4 slab at the same output scale class
    R.MAX_FOV_PERIOD = 32
    time_resize(h, w, 4.0, "slab p=4 q=1 (shipped ×4)")

    # full pipeline comparison
    s1, s2 = bench.load_luts()
    mps_gather = bench.bench_lut_sr(s1, s2, h, w, scale=scale)
    print(f"pipeline gather: {mps_gather:.2f} MP/s", flush=True)
    R.MAX_FOV_PERIOD = 128
    mps_slab = bench.bench_lut_sr(s1, s2, h, w, scale=scale)
    print(f"pipeline slab71: {mps_slab:.2f} MP/s", flush=True)


if __name__ == "__main__":
    main()
