"""Golden end-to-end test: shipped reference LUTs + bundled Set5 must
reproduce the published tables (reference scripts.sh:32-47)."""
import os

import numpy as np
import pytest

from conftest import REFERENCE_ROOT
from lerf_tpu.evaluate import run_sr_benchmark, run_warp_benchmark
from lerf_tpu.lut import load_lut_bank
from lerf_tpu.pipeline import LutPredictor

RR = os.path.join(REFERENCE_ROOT, "data", "rrBenchmark")
WARP = os.path.join(REFERENCE_ROOT, "data", "WarpBenchmark")
MODELS = os.path.join(REFERENCE_ROOT, "models")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RR), reason="reference fixtures not available")

# scripts.sh:33-38
GOLDEN_SR = {
    "lerf-g": {(2, 2): (35.71, 0.9475), (3, 3): (32.02, 0.8980),
               (4, 4): (30.15, 0.8548)},
    "lerf-l": {(2, 2): (34.84, 0.9432), (3, 3): (30.72, 0.8773),
               (4, 4): (29.13, 0.8270)},
}
# scripts.sh:42-47
GOLDEN_WARP = {
    "lerf-g": {"isc": 33.81, "osc": 27.89},
    "lerf-l": {"isc": 32.90, "osc": 27.13},
}


def make_predictor(model: str) -> LutPredictor:
    linear = model == "lerf-l"
    bank = load_lut_bank(os.path.join(MODELS, model),
                         out_c=1 if linear else 3)
    return LutPredictor(bank, linear=linear)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["lerf-g", "lerf-l"])
def test_set5_sr_golden(model):
    pred = make_predictor(model)
    res = run_sr_benchmark(pred, RR, "Set5", [(2, 2), (3, 3), (4, 4)])
    for scale, (want_p, want_s) in GOLDEN_SR[model].items():
        got_p, got_s = res[scale]
        assert abs(got_p - want_p) < 0.011, (model, scale, got_p, want_p)
        assert abs(got_s - want_s) < 0.0011, (model, scale, got_s, want_s)


# Deterministic products of the full shipped-artifact chain: checkpoint
# (Model_050000.pth) → OUR converter → OUR 17⁴ transfer enumeration → OUR
# int8 LUT runtime, evaluated on Set5 BEFORE LUT fine-tuning.  Captured
# 2026-08-20 on this repo (tools/exp_lutft_recovery.py); every stage is
# deterministic, so these are exact pins — one assertion covering model
# zoo + transfer + LUT serving jointly.  The gap to the shipped LUTft
# table above (35.71/32.02/30.15) is what reference fine-tuning
# (train_model.py:481-499) recovered: +0.97/+0.45/+0.38 dB.
GOLDEN_RAW_TRANSFER = {(2, 2): (34.7364, 0.941960),
                       (3, 3): (31.5667, 0.891936),
                       (4, 4): (29.7706, 0.847520)}


@pytest.mark.slow
def test_set5_raw_transfer_golden():
    """checkpoint → transfer → eval, no fine-tuning: pins the model-zoo →
    transfer → LUT-runtime chain end-to-end with one golden number per
    scale (VERDICT r3 item 3; reference flow scripts.sh:27-38)."""
    from lerf_tpu.lut.transfer import transfer_to_lut
    from lerf_tpu.models.convert import load_reference_checkpoint

    params = load_reference_checkpoint(
        os.path.join(MODELS, "lerf-g", "Model_050000.pth"))
    pred = LutPredictor(transfer_to_lut(params, out_c=3))
    res = run_sr_benchmark(pred, RR, "Set5", [(2, 2), (3, 3), (4, 4)])
    for scale, (want_p, want_s) in GOLDEN_RAW_TRANSFER.items():
        got_p, got_s = res[scale]
        assert abs(got_p - want_p) < 0.01, (scale, got_p, want_p)
        assert abs(got_s - want_s) < 0.001, (scale, got_s, want_s)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["lerf-g", "lerf-l"])
def test_set5_warp_golden(model):
    # WarpBenchmark fixtures ship isc/osc but not HR; the HR images are the
    # standard Set5 set bundled under rrBenchmark.
    pred = make_predictor(model)
    res = run_warp_benchmark(pred, WARP, "Set5", ("isc", "osc"), hr_root=RR)
    for scale_p, want in GOLDEN_WARP[model].items():
        assert abs(res[scale_p] - want) < 0.011, (model, scale_p, res, want)


@pytest.mark.slow
def test_set5_sr_golden_dynamic_serving():
    """The dynamic-scale serving path (one program per shape bucket, scales
    as traced data) must reproduce the published SR table with ZERO
    per-shape fallback compiles."""
    pred = make_predictor("lerf-g")
    res = run_sr_benchmark(pred, RR, "Set5", [(2, 2), (3, 3), (4, 4)],
                           dynamic=True, bucket=64)
    for scale, (want_p, want_s) in GOLDEN_SR["lerf-g"].items():
        got_p, got_s = res[scale]
        assert abs(got_p - want_p) < 0.011, (scale, got_p, want_p)
        assert abs(got_s - want_s) < 0.0011, (scale, got_s, want_s)
    assert not pred._resize_cache          # no per-shape fallbacks
    assert all(k[0] == "bucket" for k in pred._resize_dyn_cache)


# grid-aligned fractional-scale golden numbers (recorded from the framework's
# own make_benchmark → eval sequence; README "fractional/anisotropic scales")
GOLDEN_SR_FRACTIONAL = {(1.5, 2.0): (36.03, 0.9523), (2.5, 2.5): (33.76, 0.9247)}


@pytest.mark.slow
def test_set5_sr_golden_fractional_dynamic(tmp_path):
    """Non-integer scales end-to-end: generate grid-aligned LR with
    make_benchmark (anti-aliased bicubic, the reference data recipe —
    reference README.md:63-71), evaluate through the DYNAMIC serving path,
    and reproduce the recorded fractional golden numbers — scales that the
    bucketed-exact path cannot serve without per-shape recompiles."""
    from lerf_tpu.cli.make_benchmark import main as make_benchmark

    hr_dir = os.path.join(RR, "Set5", "HR")
    root = tmp_path / "rr"
    ds_hr = root / "Set5" / "HR"
    os.makedirs(root / "Set5", exist_ok=True)
    os.symlink(hr_dir, ds_hr)
    make_benchmark(["--hrDir", str(ds_hr), "--scales", "1.5x2.0,2.5"])

    pred = make_predictor("lerf-g")
    res = run_sr_benchmark(pred, str(root), "Set5",
                           [(1.5, 2.0), (2.5, 2.5)], dynamic=True, bucket=64)
    for scale, (want_p, want_s) in GOLDEN_SR_FRACTIONAL.items():
        got_p, got_s = res[scale]
        assert abs(got_p - want_p) < 0.011, (scale, got_p, want_p)
        assert abs(got_s - want_s) < 0.0011, (scale, got_s, want_s)
    assert not pred._resize_cache          # no per-shape fallbacks


@pytest.mark.slow
def test_set5_warp_golden_dynamic_serving():
    """The dynamic-homography serving path (one program per shape pair,
    matrices as traced data) must reproduce the published warp table too."""
    pred = make_predictor("lerf-g")
    res = run_warp_benchmark(pred, WARP, "Set5", ("isc", "osc"), hr_root=RR,
                             dynamic=True)
    for scale_p, want in GOLDEN_WARP["lerf-g"].items():
        assert abs(res[scale_p] - want) < 0.011, (scale_p, res, want)
