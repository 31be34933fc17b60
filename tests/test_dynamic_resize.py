"""Dynamic-scale SR serving (pipeline.upscale_dynamic /
ops.resample.*_resize_rings): the per-axis scale geometry becomes traced
data over a fixed ±pad frame, so ONE compiled program serves ANY
(scale_h, scale_w) at a given shape frame — and must be bit-identical to
the per-scale jitted path, including non-periodic scales (period > 32)
that fall off the gather-free slab path entirely, and anti-aliased
downscales through the support-bucket envelope."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import shared_lut_predictor, shared_net_predictor
from lerf_tpu.lut.io import LUTBank
from lerf_tpu.models import srnet
from lerf_tpu.ops import (ResizeGeometry, ResizeOperands,
                          amplified_linear_resize,
                          amplified_linear_resize_rings, resize_rings,
                          steering_gaussian_resize,
                          steering_gaussian_resize_rings)
from lerf_tpu.pipeline import LutPredictor, NetPredictor

L4 = 17 ** 4
MODES = ("s", "c", "t")
IN_SZ = (13, 17)

# spans the envelope: integer, aligned fractional, non-aligned fractional,
# non-periodic (rational period > MAX_FOV_PERIOD=32), mixed axes, scale-1
# on one axis
SCALES = [(2.0, 2.0), (3.0, 3.0), (1.5, 2.0), (2.5, 2.5), (3.55, 3.55),
          (1.0, 1.7), (4.0, 4.0), (1.37, 2.93)]


def test_operands_match_geometry():
    """Indices/distances must reproduce ResizeGeometry's exactly (the ±1
    frame re-expression changes only the index origin)."""
    for scale in SCALES:
        geom = ResizeGeometry.create(IN_SZ, scale_factors=list(scale),
                                     support=2)
        ops_ = ResizeOperands.create(IN_SZ, scale_factors=list(scale))
        assert geom.out_sz == ops_.out_sz
        np.testing.assert_array_equal(geom.dis_x, ops_.dis_x)
        np.testing.assert_array_equal(geom.dis_y, ops_.dis_y)
        # fov is stored in the pad0-padded frame; pad0 == 1 over the
        # upscale envelope, so the ±1-frame index equals it
        np.testing.assert_array_equal(geom.fov_x[:, 0], ops_.idx_x)
        np.testing.assert_array_equal(geom.fov_y[:, 0], ops_.idx_y)


def test_operands_reject_downscale_and_support():
    with pytest.raises(ValueError):
        ResizeOperands.create(IN_SZ, scale_factors=[0.5, 2.0])
    with pytest.raises(ValueError):
        ResizeOperands.create(IN_SZ, scale_factors=[2.0, 2.0], support=4)


# anti-aliased downscale envelope: pure, fractional, mixed up/down, and a
# deep downscale that crosses into a larger support bucket
AA_SCALES = [(0.5, 0.5), (0.71, 0.71), (0.5, 2.0), (1.5, 0.33),
             (0.21, 0.21)]


def test_operands_create_any_downscale():
    """create_any: upscales route to the exact ±1 form; downscales get the
    support-bucket AA frame (support = next pow2 ≥ ceil(2/min_scale),
    pad = support/2 + 1, weight masks zeroing the inactive slots)."""
    up = ResizeOperands.create_any((40, 56), scale_factors=[2.0, 1.5])
    assert up.support == 2 and up.pad == 1 and up.aa_scale == 1.0

    ops_ = ResizeOperands.create_any((40, 56), scale_factors=[0.5, 2.0])
    # min scale 0.5 → true support ceil(2/0.5)=4 on BOTH axes (the
    # reference inflates globally, resize_right2d_numpy.py:52-55), floor
    # bucket 4, pad 3
    assert ops_.support == 4 and ops_.pad == 3 and ops_.aa_scale == 0.5
    assert ops_.wmask_x.shape == (20, 4) and ops_.wmask_x.min() == 1.0
    deep = ResizeOperands.create_any((64, 64), scale_factors=[0.21, 0.21])
    # ceil(2/0.21)=10 → bucket 16; 6 inactive slots masked off
    assert deep.support == 16 and deep.pad == 9
    assert (deep.wmask_x[0] == [1] * 10 + [0] * 6).all()
    # beyond the 1/32 cap: no dynamic form
    with pytest.raises(ValueError):
        ResizeOperands.create_any((256, 256), scale_factors=[0.01, 0.01])


def test_operands_create_any_fractional_upscale_exact():
    """create_any must delegate pure upscales with the REQUESTED scale:
    re-deriving scale as out/in (out is its ceil) silently shifts
    idx/dis for fractional scales (round-4 review finding)."""
    want = ResizeOperands.create((40, 56), scale_factors=[2.26, 2.26])
    got = ResizeOperands.create_any((40, 56), scale_factors=[2.26, 2.26])
    np.testing.assert_array_equal(want.idx_x, got.idx_x)
    np.testing.assert_array_equal(want.idx_y, got.idx_y)
    np.testing.assert_array_equal(want.dis_x, got.dis_x)
    np.testing.assert_array_equal(want.dis_y, got.dis_y)


def test_rings_ops_aa_bit_equal():
    """Anti-aliased rings programs must be bit-identical to the per-shape
    static AA path — gaussian and amplified-linear forms."""
    rng = np.random.RandomState(2)
    img = rng.rand(3, 40, 56).astype(np.float32) * 255.0
    hyp = [rng.rand(3, 40, 56).astype(np.float32) for _ in range(3)]
    alpha = rng.rand(3, 40, 56).astype(np.float32)
    for scale in AA_SCALES:
        geom = ResizeGeometry.create((40, 56), scale_factors=list(scale),
                                     support=2)
        ops_ = ResizeOperands.create_any((40, 56),
                                         scale_factors=list(scale))
        want = steering_gaussian_resize(jnp.asarray(img),
                                        *map(jnp.asarray, hyp), geom)
        got = steering_gaussian_resize_rings(
            jnp.asarray(img), *map(jnp.asarray, hyp), resize_rings(ops_),
            pad=ops_.pad)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        want_l = amplified_linear_resize(jnp.asarray(img),
                                         jnp.asarray(alpha), geom)
        got_l = amplified_linear_resize_rings(
            jnp.asarray(img), jnp.asarray(alpha),
            resize_rings(ops_, linear=True), pad=ops_.pad)
        np.testing.assert_array_equal(np.asarray(want_l), np.asarray(got_l))


def test_rings_ops_bit_equal_across_scales():
    rng = np.random.RandomState(0)
    img = rng.rand(3, *IN_SZ).astype(np.float32) * 255.0
    hyp = [rng.rand(3, *IN_SZ).astype(np.float32) for _ in range(3)]
    for scale in SCALES:
        geom = ResizeGeometry.create(IN_SZ, scale_factors=list(scale),
                                     support=2)
        rings = resize_rings(ResizeOperands.create(IN_SZ,
                                                   scale_factors=list(scale)))
        want = steering_gaussian_resize(jnp.asarray(img),
                                        *map(jnp.asarray, hyp), geom)
        got = steering_gaussian_resize_rings(jnp.asarray(img),
                                             *map(jnp.asarray, hyp), rings)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_rings_ops_linear_bit_equal():
    rng = np.random.RandomState(1)
    img = rng.rand(3, *IN_SZ).astype(np.float32) * 255.0
    alpha = rng.rand(3, *IN_SZ).astype(np.float32)
    for scale in SCALES[:4]:
        geom = ResizeGeometry.create(IN_SZ, scale_factors=list(scale),
                                     support=2)
        rings = resize_rings(
            ResizeOperands.create(IN_SZ, scale_factors=list(scale)),
            linear=True)
        want = amplified_linear_resize(jnp.asarray(img), jnp.asarray(alpha),
                                       geom)
        got = amplified_linear_resize_rings(jnp.asarray(img),
                                            jnp.asarray(alpha), rings)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def _lut_predictor(linear=False):
    rng = np.random.RandomState(7)
    oc = 1 if linear else 3
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, oc)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        out_c=oc)
    return LutPredictor(bank, linear=linear)


@pytest.mark.smoke
def test_lut_upscale_dynamic_bit_exact_one_program():
    """Scales that share (in, out) shapes must share ONE compiled program
    (2.0 and 1.97 both produce out = 42×52 at 21×26)."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (21, 26, 3), dtype=np.uint8)
    # two scales prove the shared program; each extra scale re-traces the
    # whole static path on the comparison side
    for s in [(2.0, 2.0), (1.97, 1.97)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)
    # key-scoped pins (shared predictor): one dynamic program for both
    # scales at this shape vs one static program per scale
    assert sum(1 for k in pred._resize_dyn_cache
               if k[0] == (21, 26)) == 1
    assert sum(1 for k in pred._resize_cache if k[0] == (21, 26)) == 2


def test_lut_upscale_dynamic_nonperiodic_scale():
    """×3.55 has rational period 71 > MAX_FOV_PERIOD — the per-scale path
    must use the index-gather fallback and the dynamic path must match it
    bit-for-bit."""
    from lerf_tpu.ops.resample import MAX_FOV_PERIOD, _periodic_fov
    pred = shared_lut_predictor()
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (20, 20, 3), dtype=np.uint8)
    geom = ResizeGeometry.create((20, 20), scale_factors=[3.55, 3.55],
                                 support=2)
    assert _periodic_fov(geom.fov_x, geom.out_sz[0], 3.55) is None
    assert MAX_FOV_PERIOD < 71
    want = pred.upscale(img, 3.55, 3.55)
    got = pred.upscale_dynamic(img, 3.55, 3.55)
    np.testing.assert_array_equal(want, got)


def test_lut_upscale_dynamic_linear_form():
    pred = shared_lut_predictor(linear=True)
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (18, 15, 3), dtype=np.uint8)
    # one mixed-axis scale exercises the full linear dynamic form; the
    # multi-scale/one-program property is the gaussian test's job
    for s in [(2.5, 1.5)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)


def test_lut_upscale_bucketed_dynamic_bit_exact():
    """granularity>0: one program per (in-bucket, out-bucket) must serve
    different image shapes AND scales bit-exactly — including scales where
    upscale_bucketed's out == scale·in alignment fails."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(11)
    # the aligned (2.0, 2.0) baseline is covered by the one-program test;
    # these two vary input shape, ceil alignment, and axis asymmetry
    cases = [((19, 23), (2.26, 2.26)),   # ceil output, non-aligned
             ((21, 26), (2.17, 2.0))]
    for in_sz, s in cases:
        img = rng.randint(0, 256, (*in_sz, 3), dtype=np.uint8)
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s, granularity=16)
        np.testing.assert_array_equal(want, got)
    keys = [k for k in pred._resize_dyn_cache
            if k[:2] == ("bucket", (32, 32))]
    # all (shape, scale) combos share the single
    # ((32,32) → (48,64))-bucket program (key-scoped: shared predictor)
    assert keys == [("bucket", (32, 32), (48, 64))]


def test_net_upscale_dynamic_bit_exact():
    pred = shared_net_predictor()
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (17, 19, 3), dtype=np.uint8)
    for s in [(2.0, 2.0), (3.55, 3.55)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)
    assert sum(1 for k in pred._resize_dyn_cache
               if k[0] == (17, 19)) == 2


def test_net_upscale_dynamic_bucketed():
    """SRNet form (replicate-pad float stages): bucketed dynamic serving;
    allow only exact-rounding-tie slack like the bucketed warp test."""
    pred = shared_net_predictor()
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (17, 19, 3), dtype=np.uint8)
    want = pred.upscale(img, 2.3, 2.3)
    got = pred.upscale_dynamic(img, 2.3, 2.3, granularity=16)
    diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-2


def test_lut_upscale_dynamic_downscale_aa():
    """Anti-aliased downscales serve through the dynamic path bit-exactly —
    gaussian and linear LUT forms, mixed axes included (VERDICT r3 item 4;
    reference AA semantics resize_right2d_numpy.py:52-55,186-193)."""
    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, (32, 40, 3), dtype=np.uint8)
    pred = shared_lut_predictor()
    # (0.5, 0.5) covers the support-4 bucket; (1.5, 0.33) covers mixed
    # up/down axes and the support-8 bucket.  The full 5-scale AA grid
    # (incl. the deep 0.21 bucket-16 case) runs at op level in
    # test_rings_ops_aa_bit_equal — each pipeline-level scale here costs
    # a static + a dynamic program TRACE (uncacheable), so this test
    # keeps one scale per bucket only.
    for s in [(0.5, 0.5), (1.5, 0.33)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)
    predl = shared_lut_predictor(linear=True)
    for s in [(0.71, 0.71)]:
        want = predl.upscale(img, *s)
        got = predl.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)


def test_lut_upscale_dynamic_downscale_one_program():
    """Downscales sharing (in_sz, out_sz, support bucket) share ONE
    compiled program (0.3 and 0.29 both produce 12×17 at 40×56 within the
    support-8 bucket)."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, (30, 42, 3), dtype=np.uint8)
    for s in [(0.3, 0.3), (0.29, 0.29)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)
    assert sum(1 for k in pred._resize_dyn_cache
               if k[0] == (30, 42)) == 1


def test_net_upscale_dynamic_downscale():
    pred = shared_net_predictor()
    rng = np.random.RandomState(16)
    img = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    for s in [(0.5, 0.5), (0.71, 0.71)]:
        want = pred.upscale(img, *s)
        got = pred.upscale_dynamic(img, *s)
        np.testing.assert_array_equal(want, got)


def test_upscale_dynamic_fallback_outside_envelope(monkeypatch):
    """Scale-1 skips and beyond-cap downscales (support > 64, i.e. scale
    < 1/32) must fall back to the exact per-shape path."""
    pred = _lut_predictor()
    called = []

    def fake_upscale(img, sh, sw, return_aux=False):
        called.append((sh, sw))
        return "out"

    monkeypatch.setattr(pred, "upscale", fake_upscale)
    img = np.zeros((256, 256, 3), np.uint8)
    assert pred.upscale_dynamic(img, 0.01, 0.01) == "out"
    assert pred.upscale_dynamic(img, 1.0, 1.0) == "out"
    assert called == [(0.01, 0.01), (1.0, 1.0)]
    assert not pred._resize_dyn_cache
