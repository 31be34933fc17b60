"""End-user upscaling command: one image in, one image out.

The reference has no single-image CLI (its drivers run benchmark trees);
this is the serving entry point a framework user reaches for first:

    # LUT form (bit-parity deploy) — -e points at a LUT bank directory
    python -m lerf_tpu.cli.upscale -e models/lerf-g --input in.png \
        --output out.png --scale 4

    # network form (fused Pallas ensemble on TPU)
    python -m lerf_tpu.cli.upscale -e models/lerf-g --form net --twoStage \
        --outC 3 --input in.png --output out.png --scale 2.5

Non-integer and anisotropic scales work (``--scale 1.5x2.0``); ``--matrix
a,b,c,...,i --outSize HxW`` switches to homographic warping with the same
hyper maps (out-of-view pixels written black).
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from ..config import TestConfig, parse_config


@dataclasses.dataclass
class UpscaleConfig(TestConfig):
    input: str = ""
    output: str = ""
    form: str = "lut"            # lut | net
    matrix: str = ""             # 9 comma floats → homography warp mode
    out_size: str = ""           # HxW for warp mode
    # (``bucket`` inherited from TestConfig: >0 enables bucketed serving —
    # LUT and SRNet net forms, pipeline.upscale_bucketed)


def build_predictor(cfg: UpscaleConfig):
    if cfg.form == "net":
        from .eval_model import build_predictor as build_net
        return build_net(cfg)
    from ..pipeline import LutPredictor

    return LutPredictor.from_config(cfg)


def main(argv=None):
    from PIL import Image

    cfg = parse_config(UpscaleConfig, argv)
    if not cfg.input or not cfg.output:
        raise SystemExit("--input and --output are required")
    pred = build_predictor(cfg)
    img = np.array(Image.open(cfg.input).convert("RGB"))

    if cfg.matrix:
        vals = [float(v) for v in cfg.matrix.split(",")]
        if len(vals) != 9:
            raise SystemExit("--matrix needs 9 comma-separated floats")
        mat = np.asarray(vals, np.float64).reshape(3, 3)
        try:
            oh, ow = (int(v) for v in cfg.out_size.split("x"))
        except ValueError:
            raise SystemExit("--matrix warp mode needs --outSize HxW "
                             "(e.g. --outSize 512x512)")
        warp = pred.warp_dynamic if cfg.dynamic_warp else pred.warp
        out, mask = warp(img, mat, (oh, ow))
        out = out * np.asarray(mask, out.dtype)[..., None]
    else:
        s = cfg.scale                      # "4", "2.5", or "1.5x2.0"
        if "x" in s:
            sh, sw = (float(v) for v in s.split("x"))
        else:
            sh = sw = float(s)
        if cfg.dynamic_sr and hasattr(pred, "upscale_dynamic"):
            out = pred.upscale_dynamic(img, sh, sw, granularity=cfg.bucket)
        elif cfg.bucket > 0 and hasattr(pred, "upscale_bucketed"):
            out = pred.upscale_bucketed(img, sh, sw, granularity=cfg.bucket)
        else:
            out = pred.upscale(img, sh, sw)

    os.makedirs(os.path.dirname(os.path.abspath(cfg.output)), exist_ok=True)
    Image.fromarray(out).save(cfg.output)
    print(f"{cfg.input} {img.shape[1]}x{img.shape[0]} -> "
          f"{cfg.output} {out.shape[1]}x{out.shape[0]}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
