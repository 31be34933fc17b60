"""Measure the reference numpy WARP deploy path's throughput on this host.

Times one full LeRF-G homographic-warp inference — the per-image stage code
of ``/root/reference/resample/eval_lut_warp.py`` (stage-1/2 LUT ensembles +
SteeringGaussianWarp2dNumpy) — at the same 360×640 → 1440×2560 workload
bench.py uses, and prints output megapixels/sec.  Run once; recorded in
BASELINE.md and baked into bench.py as REF_NUMPY_WARP_MPS.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from resize_right.resize_right2d_numpy import (  # noqa: E402
    SteeringGaussianWarp2dNumpy,
)

from bench_reference import LR_H, LR_W, SCALE, load_luts, MODES, MODE_PAD, \
    NORM, INTERVAL  # noqa: E402
from resample.eval_lut_sr import FourSimplexInterpFaster  # noqa: E402


def stages(img_lr, lut_dict):
    pred = 0
    for mode in MODES:
        key = f"s1_{mode}r0"
        pad = MODE_PAD[mode]
        for r in [0, 1, 2, 3]:
            img_rot = np.rot90(img_lr, r)
            h, w, _ = img_rot.shape
            img_in = np.pad(img_rot, ((0, pad), (0, pad), (0, 0)),
                            mode="edge").transpose((2, 0, 1))
            pred += FourSimplexInterpFaster(
                lut_dict[key], img_in, h, w, INTERVAL, 4 - r,
                upscale=1, mode=mode, oC=1)
    feat = np.round(np.clip(pred / len(MODES), 0, NORM)) \
        .astype(np.float32).transpose((1, 2, 0))

    pred = 0
    for mode in MODES:
        pad = MODE_PAD[mode]
        for r in [0, 1, 2, 3]:
            key = f"s2_{mode}r{r % 2}"
            img_rot = np.rot90(feat, r)
            h, w, _ = img_rot.shape
            img_in = np.pad(img_rot, ((0, pad), (0, pad), (0, 0)),
                            mode="edge").transpose((2, 0, 1))
            pred += FourSimplexInterpFaster(
                lut_dict[key], img_in, h, w, INTERVAL, 4 - r,
                upscale=1, mode=mode, oC=3)
    hyper = (np.round(np.clip(pred / (len(MODES) * 4) + NORM // 2, 0, NORM))
             .astype(np.float32) / NORM)
    return feat.transpose((2, 0, 1)), hyper


def main():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (LR_H, LR_W, 3)).astype(np.float32)
    lut_dict = load_luts()
    matrix = np.linalg.inv(np.diag([1.0 / SCALE, 1.0 / SCALE, 1.0]))
    out_hw = (LR_H * SCALE, LR_W * SCALE)
    warper = SteeringGaussianWarp2dNumpy(support_sz=2, max_sigma=10)
    warper.set_shape([3, LR_H, LR_W], matrix, out_hw)

    def run_once():
        feat, hyper = stages(img, lut_dict)
        C = hyper.shape[0]
        return warper.warp(
            feat,
            hyper[list(range(0, C, 3))],
            hyper[list(range(1, C + 1, 3))],
            hyper[list(range(2, C + 2, 3))])

    run_once()
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        run_once()
    dt = (time.perf_counter() - t0) / n
    mps = out_hw[0] * out_hw[1] / 1e6 / dt
    print(f"reference numpy warp: {dt:.2f}s/frame, {mps:.4f} MP/s")


if __name__ == "__main__":
    main()
