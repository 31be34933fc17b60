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

``--input`` also takes a directory or a glob; with several inputs
``--output`` names a directory and — under ``--dynamicSR`` /
``--dynamicWarp`` — the frames run through the pipelined streaming engine
(``lerf_tpu.serve``): frame k+1's host geometry precompute and image decode
overlap frame k's device execution.
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
    form: str = "lut"            # lut | net | auto
    matrix: str = ""             # 9 comma floats → homography warp mode
    out_size: str = ""           # HxW for warp mode
    # (``bucket`` inherited from TestConfig: >0 enables bucketed serving —
    # LUT and SRNet net forms, pipeline.upscale_bucketed)


def build_predictor(cfg: UpscaleConfig):
    auto = cfg.form == "auto"
    if auto:
        # fastest form whose artifacts exist (README "Choosing a serving
        # form"): a network checkpoint serves ~2.4-4x the LUT form's
        # MP/s; the int8 LUT bank is the bit-parity deploy and the
        # fallback
        has_ckpt = (os.path.isdir(os.path.join(cfg.exp_dir, "ckpt"))
                    or os.path.exists(os.path.join(
                        cfg.exp_dir, f"Model_{cfg.load_iter:06d}.pth")))
        cfg.form = "net" if has_ckpt else "lut"
    if cfg.form == "net":
        from .eval_model import build_predictor as build_net

        try:
            return build_net(cfg)
        except Exception as e:
            # "artifacts exist" is a path check; the BUILD can still fail
            # (torch absent for a .pth — it's an optional extra — or an
            # orbax step mismatch).  Under --form auto a present LUT bank
            # serves fine, so fall back instead of crashing; an explicit
            # --form net keeps the error.
            if not auto:
                raise
            print(f"upscale: net form unavailable ({e!r}); "
                  f"falling back to the LUT bank", flush=True)
            cfg.form = "lut"
    from ..pipeline import LutPredictor

    return LutPredictor.from_config(cfg)


def _expand_inputs(path):
    import glob

    if os.path.isdir(path):
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.lower().endswith(exts))
    elif any(ch in path for ch in "*?["):
        files = sorted(glob.glob(path))
    else:
        files = [path]
    if not files:
        raise SystemExit(f"no inputs match {path}")
    return files


def _parse_scale(s):
    if "x" in s:
        sh, sw = (float(v) for v in s.split("x"))
        return sh, sw
    return float(s), float(s)


def _parse_matrix(cfg):
    vals = [float(v) for v in cfg.matrix.split(",")]
    if len(vals) != 9:
        raise SystemExit("--matrix needs 9 comma-separated floats")
    mat = np.asarray(vals, np.float64).reshape(3, 3)
    try:
        oh, ow = (int(v) for v in cfg.out_size.split("x"))
    except ValueError:
        raise SystemExit("--matrix warp mode needs --outSize HxW "
                         "(e.g. --outSize 512x512)")
    return mat, (oh, ow)


def _run_stream(cfg, pred, files):
    """Several inputs: pipeline decode + host precompute against device
    execution through lerf_tpu.serve (in-order, bit-identical to the
    sequential path — tests/test_serving_engine.py)."""
    from PIL import Image

    from ..serve import stream_upscale, stream_warp

    if os.path.splitext(cfg.output)[1]:
        raise SystemExit("--output must be a directory for several inputs")
    os.makedirs(cfg.output, exist_ok=True)

    def load(f):
        return np.array(Image.open(f).convert("RGB"))

    if cfg.matrix:
        mat, out_hw = _parse_matrix(cfg)
        results = stream_warp(pred, ((load(f), mat) for f in files), out_hw,
                              granularity=cfg.bucket)
        results = (o * np.asarray(m, o.dtype)[..., None]
                   for o, m in results)
    else:
        sh, sw = _parse_scale(cfg.scale)
        results = stream_upscale(pred, ((load(f), sh, sw) for f in files),
                                 granularity=cfg.bucket)
    for f, out in zip(files, results):
        dst = os.path.join(cfg.output, os.path.basename(f))
        Image.fromarray(out).save(dst)
        print(f"{f} -> {dst} {out.shape[1]}x{out.shape[0]}", flush=True)


def main(argv=None):
    from PIL import Image

    cfg = parse_config(UpscaleConfig, argv)
    if not cfg.input or not cfg.output:
        raise SystemExit("--input and --output are required")
    pred = build_predictor(cfg)
    files = _expand_inputs(cfg.input)
    if len(files) > 1:
        if not (cfg.dynamic_sr or (cfg.matrix and cfg.dynamic_warp)):
            raise SystemExit(
                "several inputs need the recompile-free serving forms: "
                "add --dynamicSR (or --dynamicWarp for --matrix mode)")
        return _run_stream(cfg, pred, files)
    img = np.array(Image.open(cfg.input).convert("RGB"))

    if cfg.matrix:
        mat, out_hw = _parse_matrix(cfg)
        warp = pred.warp_dynamic if cfg.dynamic_warp else pred.warp
        out, mask = warp(img, mat, out_hw)
        out = out * np.asarray(mask, out.dtype)[..., None]
    else:
        sh, sw = _parse_scale(cfg.scale)   # "4", "2.5", or "1.5x2.0"
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
