"""IMDN (LeRF-Net) towers: stock NHWC vs space-to-depth execution.

The stock towers run nf=12-channel 3x3 convs — the minor dim pads to 128
lanes on TPU, so every conv moves ~10x the necessary HBM bytes and the MXU
runs at ~1/10 density (BASELINE.md "IMDN form cost note").  The s2d path
(models/imdn_s2d.py) re-embeds the weights once so the same arithmetic runs
at C*b^2 lanes.  This measures both towers (stage1 + stage2, the serving
stage chain) per variant on a serial dependency chain, plus the end-to-end
IMDN serving form.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

from lerf_tpu.models.imdn import IMDN2
from lerf_tpu.models import imdn_s2d as s2d

from _timing import chain_time  # noqa: E402

H, W = int(os.environ.get("H", 360)), int(os.environ.get("W", 640))


def main():
    print(f"backend={jax.default_backend()}  {H}x{W}", flush=True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (1, H, W, 3)).astype(np.float32))

    for dtype in ("float32", "bfloat16"):
        dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        model = IMDN2(in_c=3, out_c=3, nf=12, dtype=dt_)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), dt_), 0)
        variables = jax.tree.map(lambda x: jnp.asarray(x, dt_), variables)

        @jax.jit
        def base(x):
            feat = model.apply(variables, (x % 256.0) / 255.0, 1)
            hyper = model.apply(variables, feat.astype(jnp.float32) / 255.0, 2)
            return hyper[..., :3].astype(jnp.float32) * 255.0

        t = chain_time(base, img)
        print(f"  {dtype} base towers: {t*1e3:7.2f} ms", flush=True)

        for b in (2, 4):
            p2 = s2d.convert_imdn2(variables, b)

            @jax.jit
            def fast(x, p2=p2, b=b):
                feat = s2d.predict_imdn2_s2d(p2, (x % 256.0) / 255.0, 1,
                                             block=b, nf=12, dtype=dt_)
                hyper = s2d.predict_imdn2_s2d(
                    p2, feat.astype(jnp.float32) / 255.0, 2, block=b, nf=12,
                    dtype=dt_)
                return hyper[..., :3].astype(jnp.float32) * 255.0

            t = chain_time(fast, img)
            print(f"  {dtype} s2d-{b} towers: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
