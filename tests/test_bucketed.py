"""Bucketed serving: one compiled program per (shape bucket, scale).

upscale_bucketed pads to the bucket with edge replication, re-clamps
rows/cols after every LUT stage, and crops the bucket-geometry resize — the
claim is BIT-equality with the per-shape exact path (pipeline.py docstring
derivation), plus no recompile across shapes sharing a bucket.
"""
import numpy as np

import jax

from conftest import (shared_imdn_predictor, shared_lut_predictor,
                      shared_net_predictor)
from lerf_tpu.lut.io import LUTBank
from lerf_tpu.models import srnet
from lerf_tpu.pipeline import LutPredictor, NetPredictor

L4 = 17 ** 4
MODES = ("s", "c", "t")


def make_predictor(seed=0, stages=2):
    rng = np.random.RandomState(seed)
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        inter=[{m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES} for _ in range(stages - 2)],
        out_c=3)
    return LutPredictor(bank, stages=stages)


def test_bucketed_bit_exact_and_shared_program():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(1)
    for h, w in [(11, 13), (16, 9)]:          # both land in the (16,16) bucket
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        want = pred.upscale(img, 2, 2)
        got = pred.upscale_bucketed(img, 2, 2, granularity=16)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
    # one program served both shapes (key-scoped: shared predictor)
    assert sum(1 for k in pred._bucket_cache
               if k == ((16, 16), (2.0, 2.0))) == 1
    # key-only pin for bucket GROWTH (no second program trace): a (23, 18)
    # input must compute the next (32, 32) bucket, not collide into (16, 16)
    from lerf_tpu.pipeline import _bucket_prep
    _, bucket2, _ = _bucket_prep(np.zeros((23, 18, 3), np.uint8), 2, 2, 16)
    assert bucket2 == (32, 32)


def test_net_bucketed_matches_exact():
    """NetPredictor (SRNet form, replicate-pad stages) bucketed serving:
    same clamp construction as the LUT path; float stages make bit-equality
    shape-dependent in principle, so allow exact-rounding-tie slack only."""
    pred = shared_net_predictor()
    rng = np.random.RandomState(4)
    for h, w in [(11, 13), (16, 9)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        want = pred.upscale(img, 2, 2).astype(np.int32)
        got = pred.upscale_bucketed(img, 2, 2, granularity=16).astype(np.int32)
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 1
        assert (got != want).mean() < 1e-3
    assert sum(1 for k in pred._bucket_cache
               if k == ((16, 16), (2.0, 2.0))) == 1


def test_net_bucketed_imdn_no_fallback():
    """The IMDN form's zero-pad convs bucket via traced-bound in-stage
    re-masking (imdn_s2d valid_hw) — bit-equal to the per-shape path
    WITHOUT falling back, across shapes sharing one bucket program."""
    pred = shared_imdn_predictor()
    rng = np.random.RandomState(5)
    for h, w in [(11, 13), (16, 9)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            pred.upscale_bucketed(img, 2, 2, 16), pred.upscale(img, 2, 2))
    assert sum(1 for k in pred._bucket_cache
               if k == ((16, 16), (2.0, 2.0))) == 1
    # only the reference calls trace static programs at these shapes
    assert sum(1 for k in pred._resize_cache
               if k[0] in ((11, 13), (16, 9))
               and k[1] == (2.0, 2.0)) == 2


def test_net_dynamic_imdn_bucketed():
    """IMDN through the fully recompile-free dynamic path (fractional
    scale, bucketed) — the masked stages compose with traced-geometry
    resize."""
    pred = shared_imdn_predictor()
    img = np.random.RandomState(6).randint(0, 256, (11, 13, 3),
                                           dtype=np.uint8)
    want = pred.upscale(img, 2.3, 2.3)
    got = pred.upscale_dynamic(img, 2.3, 2.3, granularity=16)
    np.testing.assert_array_equal(want, got)
    assert any(k[0] == "bucket" for k in pred._resize_dyn_cache)


def test_bucketed_multistage_bit_exact():
    """stages>2 banks: the intermediate feature stages are re-clamped too
    (every stage's replicate padding must see the unpadded edge values)."""
    pred = make_predictor(seed=7, stages=3)
    img = np.random.RandomState(8).randint(0, 256, (11, 13, 3),
                                           dtype=np.uint8)
    np.testing.assert_array_equal(pred.upscale_bucketed(img, 2, 2, 16),
                                  pred.upscale(img, 2, 2))


def test_eval_harness_bucket_wiring(monkeypatch):
    """run_sr_benchmark(bucket>0) must serve through upscale_bucketed and
    pass the granularity; bucket=0 stays on the exact path."""
    from lerf_tpu import evaluate

    rng = np.random.RandomState(6)
    hr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    calls = []

    class FakeBench:
        def __init__(self, *a, **k):
            pass

        def __len__(self):
            return 1

        def pair(self, i, sh, sw):
            return np.zeros((8, 8, 3), np.uint8), hr, "x.png"

    class FakePred:
        def upscale(self, img, sh, sw):
            calls.append("exact")
            return np.zeros((16, 16, 3), np.uint8)

        def upscale_bucketed(self, img, sh, sw, granularity=0):
            calls.append(f"bucket{granularity}")
            return np.zeros((16, 16, 3), np.uint8)

    monkeypatch.setattr(evaluate, "SRBenchmark", FakeBench)
    evaluate.run_sr_benchmark(FakePred(), "", "Set5", [(2, 2)], bucket=32)
    evaluate.run_sr_benchmark(FakePred(), "", "Set5", [(2, 2)])
    assert calls == ["bucket32", "exact"]


def test_bucketed_fractional_aligned_and_fallback():
    pred = shared_lut_predictor()

    def frac_keys():
        return sum(1 for k in pred._bucket_cache if k[1] == (2.5, 2.5))

    rng = np.random.RandomState(3)
    # 12*2.5 and 16*2.5 are integers -> grid translation-invariant -> exact
    img = rng.randint(0, 256, (12, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(pred.upscale_bucketed(img, 2.5, 2.5, 16),
                                  pred.upscale(img, 2.5, 2.5))
    assert frac_keys() == 1
    # 11*2.5 is not an integer: invariance breaks, must fall back (exact)
    img = rng.randint(0, 256, (11, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(pred.upscale_bucketed(img, 2.5, 2.5, 16),
                                  pred.upscale(img, 2.5, 2.5))
    assert frac_keys() == 1       # no new bucket program was built
