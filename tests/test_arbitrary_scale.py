"""Arbitrary (non-integer, anisotropic) scale SR end to end: generate the
rrLR benchmark data with make_benchmark, evaluate with the shipped LeRF-G
LUTs — the full MultiCustomSRBenchmark workflow (reference README.md:63-71,
eval_lut_sr with fractional rrLR_X{h}_{w} dirs)."""
import os
import shutil

import numpy as np
import pytest

from conftest import REFERENCE_ROOT
from lerf_tpu.cli.make_benchmark import main as make_benchmark
from lerf_tpu.evaluate import run_sr_benchmark
from lerf_tpu.lut import load_lut_bank
from lerf_tpu.pipeline import LutPredictor

RR = os.path.join(REFERENCE_ROOT, "data", "rrBenchmark")
MODELS = os.path.join(REFERENCE_ROOT, "models")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RR), reason="reference fixtures not available")


@pytest.mark.slow
def test_fractional_anisotropic_scale_sr(tmp_path):
    # build a benchmark at scale 1.5×2.0 from the Set5 HR images
    hr_src = os.path.join(RR, "Set5", "HR")
    hr_dst = tmp_path / "Set5" / "HR"
    shutil.copytree(hr_src, hr_dst)
    make_benchmark(["--hrDir", str(hr_dst), "--scales", "1.5x2.0"])

    bank = load_lut_bank(os.path.join(MODELS, "lerf-g"), out_c=3)
    pred = LutPredictor(bank)
    res = run_sr_benchmark(pred, str(tmp_path), "Set5", [(1.5, 2.0)])
    psnr, ssim = res[(1.5, 2.0)]
    # measured 36.03/0.9523 with grid-aligned data — consistent with the
    # published integer-scale sequence (×2: 35.71, ×3: 32.02)
    assert 35.5 < psnr < 36.6, psnr
    assert 0.945 < ssim < 0.96, ssim
