"""Generate rrBenchmark LR data from HR images (arbitrary scale pairs).

Reference workflow: LR inputs for the arbitrary-scale benchmark are produced
with ResizeRight bicubic downscaling (+anti-aliasing) into
``LR_bicubic/rrLR_X{h:.2f}_{w:.2f}/`` (reference README.md:63-71).  This is
the TPU-framework equivalent using :func:`lerf_tpu.ops.fixed_kernel_resize`
with the numpy-path anti-aliased geometry.

    python -m lerf_tpu.cli.make_benchmark --hrDir data/rrBenchmark/Set5/HR \
        --scales 2,3,4,1.5,2.5 --platform cpu
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..data.benchmarks import list_pngs, load_image, save_image
from ..ops import resize
from ..ops.resample import _KERNEL_SUPPORT as KERNEL_SUPPORT


def modcrop_rational(hr: np.ndarray, scale_h: float, scale_w: float):
    """Crop HR so LR·scale round-trips to an integer-aligned grid.

    Without this, fractional scales produce ceil-sized LR whose coordinate
    frame is sub-pixel shifted vs the HR — costs several dB at evaluation
    (the reference's benchmark data is aligned the same way).
    """
    from fractions import Fraction

    out = []
    for dim, s in ((hr.shape[0], scale_h), (hr.shape[1], scale_w)):
        f = Fraction(s).limit_denominator(1000)
        p = f.numerator
        out.append((dim // p) * p)
    return hr[:out[0], :out[1]]


def downscale(hr: np.ndarray, scale_h: float, scale_w: float,
              kernel: str = "cubic") -> np.ndarray:
    import jax.numpy as jnp
    hr = modcrop_rational(hr, scale_h, scale_w)
    chw = hr.transpose(2, 0, 1)
    out = np.asarray(resize(jnp.asarray(chw),
                            scale_factors=[1.0 / scale_h, 1.0 / scale_w],
                            interp_method=kernel))
    return np.clip(np.round(out), 0, 255).astype(np.uint8).transpose(1, 2, 0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hrDir", required=True)
    p.add_argument("--outDir", default="",
                   help="default: <hrDir>/../LR_bicubic")
    p.add_argument("--scales", default="2,3,4",
                   help="comma list; 'HxW' pairs allowed (e.g. 1.5x2.0)")
    p.add_argument("--kernel", default="cubic",
                   choices=sorted(KERNEL_SUPPORT))
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    out_root = args.outDir or os.path.join(
        os.path.dirname(args.hrDir.rstrip("/")), "LR_bicubic")
    scales = []
    for s in args.scales.split(","):
        if "x" in s:
            h, w = s.split("x")
            scales.append((float(h), float(w)))
        else:
            scales.append((float(s), float(s)))

    files = list_pngs(args.hrDir)
    for (sh, sw) in scales:
        out_dir = os.path.join(out_root, f"rrLR_X{sh:.2f}_{sw:.2f}")
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            hr = load_image(os.path.join(args.hrDir, f))
            save_image(os.path.join(out_dir, f), downscale(hr, sh, sw,
                                                           args.kernel))
        print(f"wrote {len(files)} images to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
