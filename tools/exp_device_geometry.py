"""Measure the DEVICE-GEOMETRY warp's quality tax on Set5 isc/osc.

Round-4 verdict item #3: the host-rings dynamic warp ships ~20 B of
corner+distance operand per output pixel (~74 MB at 2560×1440), making
dynamic/batched warp transfer-bound on sub-GB/s host links.
``LutPredictor.warp_device`` computes the rings and validity mask
IN-PROGRAM from the traced 3×3 inverse (ops.resample.warp_rings_on_device)
— per-frame matrix operand: 9 floats; host geometry precompute: none — but
the f32 projective divide can flip ceil/box boundaries vs the float64 host
path.  This experiment quantifies that tax on the golden benchmark:

  per scale_p (isc/osc): mPSNR through the host-f64 path (must match the
  golden 33.81 / 27.89), mPSNR through the device-geometry path, per-image
  deltas, mask-mismatch rate, and the operand-size ledger.

Run on CPU (~10 min warm): ``python tools/exp_device_geometry.py``.
Result recorded in BASELINE.md "Device-geometry warp".
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lerf_tpu.config import enable_jit_cache  # noqa: E402

enable_jit_cache()

from lerf_tpu.data.benchmarks import WarpBenchmark  # noqa: E402
from lerf_tpu.lut.io import load_lut_bank  # noqa: E402
from lerf_tpu.pipeline import LutPredictor  # noqa: E402
from lerf_tpu.utils.metrics import mpsnr  # noqa: E402

REF = "/root/reference"
WARP = os.path.join(REF, "data", "WarpBenchmark")
RR = os.path.join(REF, "data", "rrBenchmark")


def main():
    bank = load_lut_bank(os.path.join(REF, "models", "lerf-g"), out_c=3)
    pred = LutPredictor(bank)
    bench = WarpBenchmark(WARP, "Set5", hr_root=RR)
    for scale_p in ("isc", "osc"):
        host_vals, dev_vals, mask_mismatch = [], [], []
        for i in range(len(bench)):
            lr, hr, matrix, name = bench.sample(i, scale_p)
            h_out, h_mask = pred.warp_dynamic(lr, matrix, hr.shape[:2])
            d_out, d_mask = pred.warp_device(lr, matrix, hr.shape[:2])
            hv = mpsnr(h_out.astype(np.float64), hr, h_mask[:, :, None])
            dv = mpsnr(d_out.astype(np.float64), hr, d_mask[:, :, None])
            host_vals.append(hv)
            dev_vals.append(dv)
            mask_mismatch.append(float((h_mask != d_mask).mean()))
            print(f"{scale_p} {name:16s} host {hv:7.4f}  dev {dv:7.4f}  "
                  f"d={dv - hv:+.4f} dB  mask-mism {mask_mismatch[-1]:.2e}",
                  flush=True)
        print(f"== {scale_p}: host mPSNR {np.mean(host_vals):.4f}  "
              f"device {np.mean(dev_vals):.4f}  "
              f"delta {np.mean(dev_vals) - np.mean(host_vals):+.4f} dB  "
              f"max|per-image| "
              f"{np.max(np.abs(np.subtract(dev_vals, host_vals))):.4f}  "
              f"mask-mism max {max(mask_mismatch):.2e}", flush=True)

    # operand ledger at 2560×1440 output (support 2)
    n = 2560 * 1440
    host_bytes = n * 4 + 2 * n * 2 * 4          # corner i32 + 2×[N,2] f32
    print(f"== operand/frame @2560x1440: host rings {host_bytes / 1e6:.1f} "
          f"MB -> device geometry 36 B (3x3 f32 inverse); host precompute "
          f"-> none", flush=True)


if __name__ == "__main__":
    main()
