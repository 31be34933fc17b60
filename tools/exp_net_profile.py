"""Where does the micro-net (SRNetsSWF2 serving form) frame time go?

Times each pipeline piece separately on a serial dependency chain:
stage-1 ensemble, stage-2 ensemble, steerable resize, and the full
pipeline, in f32 and bf16.  Run on the real chip.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

from lerf_tpu.models import srnet
from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize

H, W, SCALE = 360, 640, 4


from _timing import chain_time  # noqa: E402  (shared timer)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32))

    for dtype in ("float32", "bfloat16"):
        dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        params = srnet.init_lerf_nets(jax.random.PRNGKey(1), out_c=3)
        params = jax.tree.map(lambda x: jnp.asarray(x, dt_), params)

        @jax.jit
        def s1(x):
            # re-derive the input from the output so the chain is serial
            return srnet.predict_stage1(params, (x % 256.0) / 255.0)

        @jax.jit
        def s2(x):
            return srnet.predict_stage2(params, (x % 256.0) / 255.0)[..., 0] * 255.0

        geom = ResizeGeometry.create((H, W), scale_factors=[SCALE, SCALE],
                                     support=2)

        @jax.jit
        def rs(x):
            u = (x % 256.0) / 255.0
            out = steering_gaussian_resize(x, u, u, u, geom, max_sigma=10.0)
            return out[:, :H, :W]

        t1 = chain_time(s1, img)
        t2 = chain_time(s2, img)
        t3 = chain_time(rs, img)
        print(f"{dtype}: stage1 {t1*1e3:7.2f} ms  stage2 {t2*1e3:7.2f} ms  "
              f"resize {t3*1e3:7.2f} ms  sum {(t1+t2+t3)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
