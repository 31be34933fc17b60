"""On-chip timing for the int8-MXU fused ensemble kernel vs the float one.

Times the two stage ensembles (the net form's dominant cost) through
predict_stage1/predict_stage2 at the headline workload (360×640 RGB),
chained steady state, with the shipped LeRF-G weights; also sweeps
block_n for the int8 kernel.  Quality deltas: tools/exp_int8_quality.py
(CPU, deterministic).  Results recorded in BASELINE.md "int8 serving
form".
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

H, W = 360, 640


from _timing import chain_time  # noqa: E402  (shared timer)


def load_params():
    try:
        from lerf_tpu.models.convert import load_reference_checkpoint
        return load_reference_checkpoint(
            "/root/reference/models/lerf-g/Model_050000.pth")
    except Exception:
        return srnet.init_lerf_nets(jax.random.PRNGKey(1), out_c=3)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32))
    params = load_params()
    qparams = srnet.quantize_lerf_params(params)

    def stages_fn(p, backend):
        @jax.jit
        def s12(x):
            u = (x % 256.0) / 255.0
            feat = srnet.predict_stage1(p, u, backend=backend)
            hyper = srnet.predict_stage2(p, feat / 255.0, backend=backend)
            return feat + hyper[..., 0]    # serial-chain carrier
        return s12

    f32 = stages_fn(params, "pallas")
    i8 = stages_fn(qparams, "pallas_int8")

    a = f32(img)
    b = i8(img)
    err = float(jnp.max(jnp.abs(a - b)))

    t_f = chain_time(f32, img)
    t_i = chain_time(i8, img)
    print(f"stages f32-pallas {t_f*1e3:7.2f} ms   int8 {t_i*1e3:7.2f} ms  "
          f"speedup {t_f/t_i:5.2f}x  max|d(feat+h0)| {err:g}", flush=True)

    # block_n sweep (whole two-stage chain)
    from lerf_tpu.ops.pallas import srnet_kernel_int8 as K
    members = [(m, r) for m in ("s", "c", "t") for r in range(4)]
    heads2 = [qparams["s2"][f"{m}r{r % 2}"] for m, r in members]
    feat = jnp.round(jnp.asarray(
        rng.randint(0, 256, (3, H, W)).astype(np.float32)))
    for bn in (1024, 2048, 4096, 8192):
        try:
            @jax.jit
            def one(x, bn=bn):
                s = K.ensemble_sum_on_image_int8(heads2, x / 255.0, members,
                                                 half=127, block_n=bn)
                return jnp.clip(jnp.round(s[..., 0] / 12.0 + 127), 0, 255)
            t = chain_time(one, feat)
            print(f"  stage-2 ensemble block_n={bn}: {t*1e3:6.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"  block_n={bn}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
