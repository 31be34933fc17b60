"""Quality of the int8 serving form vs the float network form.

Runs the shipped LeRF-G checkpoint through NetPredictor on Set5 ×2/×3/×4
with backend="xla" (float) and backend="pallas_int8" (quantized — the
plain-XLA reference path computes the identical arithmetic to the TPU
kernel, tests/test_srnet_kernel_int8.py), and prints the PSNR/SSIM deltas.
Results recorded in BASELINE.md "int8 serving form".

Run on CPU (deterministic f32): python tools/exp_int8_quality.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lerf_tpu.evaluate import run_sr_benchmark              # noqa: E402
from lerf_tpu.models.convert import load_reference_checkpoint  # noqa: E402
from lerf_tpu.pipeline import NetPredictor                  # noqa: E402

REF = "/root/reference"
RR = os.path.join(REF, "data", "rrBenchmark")
CKPT = os.path.join(REF, "models", "lerf-g", "Model_050000.pth")
SCALES = [(2, 2), (3, 3), (4, 4)]


def main():
    params = load_reference_checkpoint(CKPT)
    rows = {}
    for backend in ("xla", "pallas_int8"):
        pred = NetPredictor.from_srnets(params, backend=backend)
        rows[backend] = run_sr_benchmark(pred, RR, "Set5", SCALES)
        for s in SCALES:
            p, ss = rows[backend][s]
            print(f"{backend:12s} x{s[0]}: {p:.3f} dB / {ss:.4f}",
                  flush=True)
    print("\ndeltas (int8 - float):")
    for s in SCALES:
        dp = rows["pallas_int8"][s][0] - rows["xla"][s][0]
        ds = rows["pallas_int8"][s][1] - rows["xla"][s][1]
        print(f"  x{s[0]}: {dp:+.3f} dB / {ds:+.4f} SSIM", flush=True)


if __name__ == "__main__":
    main()
