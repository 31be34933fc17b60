"""Measure the reference numpy deploy path's throughput on this host CPU.

Times one full LeRF-G inference — the exact per-image stage code of
``/root/reference/resample/eval_lut_sr.py:541-661`` (stage-1/2 LUT ensembles
via FourSimplexInterpFaster + SteeringGaussianResize2dNumpy ×4) — on the
same input size bench.py uses, and prints output megapixels/sec.  Run once;
the number is recorded in BASELINE.md and baked into bench.py as
REF_NUMPY_MPS.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

from resample.eval_lut_sr import FourSimplexInterpFaster  # noqa: E402
from resize_right.resize_right2d_numpy import (  # noqa: E402
    SteeringGaussianResize2dNumpy,
)

LR_H, LR_W = 360, 640
SCALE = 4
MODES = ["s", "c", "t"]
MODE_PAD = {"s": 1, "d": 2, "y": 2, "c": 3, "t": 3}
NORM, INTERVAL = 255, 4


def load_luts():
    lut_dict = {}
    for mode in MODES:
        for key in ([f"s1_{mode}r0", f"s2_{mode}r0", f"s2_{mode}r1"]):
            arr = np.load(f"/root/reference/models/lerf-g/LUTft_{key}.npy")
            oc = 1 if key.startswith("s1") else 3
            lut_dict[key] = arr.astype(np.float32).reshape(-1, oc)
    return lut_dict


def run_once(img_lr, lut_dict, resizer):
    """Mirror of eval_lut_sr._worker (eval_lut_sr.py:541-661), HWC input."""
    # stage 1 (feature)
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

    # stage 2 (hyper)
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
             .astype(np.float32) / NORM)                     # [9, H, W]

    # steerable resize (eval_lut_sr.py:644-661)
    feat_chw = feat.transpose((2, 0, 1))
    C = hyper.shape[0]
    return resizer.resize(
        feat_chw,
        hyper[list(range(0, C, 3))],
        hyper[list(range(1, C + 1, 3))],
        hyper[list(range(2, C + 2, 3))])


def main():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (LR_H, LR_W, 3)).astype(np.float32)
    lut_dict = load_luts()
    resizer = SteeringGaussianResize2dNumpy(support_sz=2, max_sigma=10)
    resizer.set_shape([3, LR_H, LR_W], scale_factors=[SCALE, SCALE])

    run_once(img, lut_dict, resizer)  # warm caches
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        run_once(img, lut_dict, resizer)
    dt = (time.perf_counter() - t0) / n
    mps = (LR_H * SCALE * LR_W * SCALE) / 1e6 / dt
    print(f"reference numpy: {dt:.2f}s/frame, {mps:.4f} MP/s")


if __name__ == "__main__":
    main()
