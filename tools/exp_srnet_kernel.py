"""On-chip parity + timing for the fused SRUnit-ensemble Pallas kernel.

Compares the XLA ensemble path against ops/pallas/srnet_kernel at the
headline workload (360×640 RGB), f32 and bf16, chained steady state.
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


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.float32))

    for dtype in ("float32", "bfloat16"):
        dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        params = srnet.init_lerf_nets(jax.random.PRNGKey(1), out_c=3)
        params = jax.tree.map(lambda x: jnp.asarray(x, dt_), params)

        fns = {}
        for backend in ("xla", "pallas"):
            @jax.jit
            def s12(x, backend=backend):
                u = (x % 256.0) / 255.0
                feat = srnet.predict_stage1(params, u, backend=backend)
                hyper = srnet.predict_stage2(params, feat / 255.0,
                                             backend=backend)
                return feat + hyper[..., 0]    # serial-chain carrier

            fns[backend] = s12

        # parity at identical inputs
        a = fns["xla"](img)
        b = fns["pallas"](img)
        err = float(jnp.max(jnp.abs(a - b)))

        t_x = chain_time(fns["xla"], img)
        t_p = chain_time(fns["pallas"], img)
        print(f"{dtype}: XLA {t_x*1e3:7.2f} ms  pallas {t_p*1e3:7.2f} ms  "
              f"speedup {t_x/t_p:5.2f}x  max_abs_err(feat+h0) {err:g}")


if __name__ == "__main__":
    main()
