"""Golden network-form eval: the converted reference checkpoint through the
NetPredictor must score in the expected PSNR band on Set5.

The reference publishes LUT-form numbers only; the trainable network form
(which the LUTs are transferred from) scores slightly above the int8 LUTs.
This guards the whole network eval path (convert → batched-MLP ensemble →
steerable resize → metrics) end to end.
"""
import os

import pytest

from conftest import REFERENCE_ROOT
from lerf_tpu.evaluate import run_sr_benchmark
from lerf_tpu.models.convert import load_reference_checkpoint
from lerf_tpu.pipeline import NetPredictor

RR = os.path.join(REFERENCE_ROOT, "data", "rrBenchmark")
CKPT = os.path.join(REFERENCE_ROOT, "models", "lerf-g", "Model_050000.pth")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(RR) and os.path.exists(CKPT)),
    reason="reference fixtures not available")


@pytest.mark.slow
def test_set5_x2_network_form():
    params = load_reference_checkpoint(CKPT)
    pred = NetPredictor.from_srnets(params)
    res = run_sr_benchmark(pred, RR, "Set5", [(2, 2)])
    psnr, ssim = res[(2, 2)]
    # LUT-G scores 35.71 dB after int8 quantization + fine-tuning
    # (scripts.sh:36); the float network form must land in the same band.
    assert 35.2 < psnr < 36.6, psnr
    assert 0.93 < ssim < 0.96, ssim
