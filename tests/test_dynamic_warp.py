"""Dynamic-homography warp serving (pipeline.warp_dynamic /
ops.resample.*_rings): the matrix-dependent geometry becomes traced data
over a fixed ±1 pad, so ONE compiled program serves every homography at a
given (in, out) shape pair — and must be bit-identical to the per-matrix
jitted path for every matrix."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lerf_tpu.lut.io import LUTBank
from lerf_tpu.models import srnet
from lerf_tpu.ops import (WarpGeometry, WarpOperands,
                          amplified_linear_warp,
                          amplified_linear_warp_rings, nearest_warp_mask,
                          nearest_warp_mask_host, steering_gaussian_warp,
                          steering_gaussian_warp_rings, warp_rings)
from conftest import (shared_imdn_predictor, shared_lut_predictor,
                      shared_net_predictor)
from lerf_tpu.pipeline import LutPredictor, NetPredictor

L4 = 17 ** 4
MODES = ("s", "c", "t")
IN_SZ = (37, 45)
OUT_SZ = (52, 40)


def _matrices():
    """Projective matrices spanning the quirk space: pads 0/1 per side,
    out-of-view regions (NaN windows), strong perspective terms."""
    rng = np.random.RandomState(3)
    mats = [
        np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0], [1e-4, 2e-5, 1.0]]),
        np.array([[0.7, -0.1, 10.0], [0.2, 1.3, -5.0], [5e-4, -2e-4, 1.0]]),
        np.diag([2.0, 2.0, 1.0]),                   # pure scale (zero pads)
    ]
    for _ in range(3):
        mats.append(np.eye(3) + rng.randn(3, 3)
                    * np.array([[.05, .05, 4.0], [.05, .05, 4.0],
                                [1e-4, 1e-4, 0.0]]))
    return mats


def _eq_with_nan(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return bool(((a == b) | (np.isnan(a) & np.isnan(b))).all())


def test_rings_ops_bit_equal_across_matrices():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (3, *IN_SZ)).astype(np.int32)
    hyp = [rng.randint(0, 256, (3, *IN_SZ)).astype(np.int32)
           for _ in range(3)]
    for m in _matrices():
        geom = WarpGeometry.create(IN_SZ, m, OUT_SZ, support=2)
        ops = WarpOperands.create(IN_SZ, m, OUT_SZ)

        want = steering_gaussian_warp(
            jnp.asarray(img), *map(jnp.asarray, hyp), geom, u8_inputs=True)
        got = steering_gaussian_warp_rings(
            jnp.asarray(img), *map(jnp.asarray, hyp), warp_rings(ops),
            out_sz=OUT_SZ, u8_inputs=True)
        assert _eq_with_nan(want, got), m

        wantl = amplified_linear_warp(jnp.asarray(img), jnp.asarray(hyp[0]),
                                      geom, u8_inputs=True)
        gotl = amplified_linear_warp_rings(
            jnp.asarray(img), jnp.asarray(hyp[0]),
            warp_rings(ops, linear=True), out_sz=OUT_SZ, u8_inputs=True)
        assert _eq_with_nan(wantl, gotl), m


def test_rings_ops_float_path_bit_equal():
    """The non-u8 (float stage outputs, e.g. IMDN hyper maps) path."""
    rng = np.random.RandomState(1)
    img = rng.rand(3, *IN_SZ).astype(np.float32) * 255.0
    hyp = [rng.rand(3, *IN_SZ).astype(np.float32) for _ in range(3)]
    m = _matrices()[0]
    geom = WarpGeometry.create(IN_SZ, m, OUT_SZ, support=2)
    ops = WarpOperands.create(IN_SZ, m, OUT_SZ)
    want = steering_gaussian_warp(jnp.asarray(img), *map(jnp.asarray, hyp),
                                  geom)
    got = steering_gaussian_warp_rings(jnp.asarray(img),
                                       *map(jnp.asarray, hyp),
                                       warp_rings(ops), out_sz=OUT_SZ)
    assert _eq_with_nan(want, got)


def test_host_mask_matches_device():
    for m in _matrices():
        mask_geom = WarpGeometry.create(IN_SZ, m, OUT_SZ, support=1)
        dev = np.asarray(nearest_warp_mask(IN_SZ, mask_geom,
                                           border=4)).astype(bool)
        host = nearest_warp_mask_host(IN_SZ, m, OUT_SZ, border=4)
        np.testing.assert_array_equal(dev, host)


def test_fused_host_precompute_bit_equal():
    """warp_serving_host_fused (one row-blocked pass, arithmetic mask) must
    reproduce the separate-pass operands/mask bit-for-bit: the rings leaves
    including float32-cast distances and linear branch masks, across odd
    block boundaries."""
    from lerf_tpu.ops.resample import warp_serving_host_fused

    for m in _matrices():
        for linear in (False, True):
            ops = WarpOperands.create(IN_SZ, m, OUT_SZ)
            want = warp_rings(ops, linear=linear)
            got, got_mask = warp_serving_host_fused(
                IN_SZ, m, OUT_SZ, linear=linear, block_rows=7)
            np.testing.assert_array_equal(want.ring_x, got.ring_x)
            np.testing.assert_array_equal(want.ring_y, got.ring_y)
            np.testing.assert_array_equal(want.corner, got.corner)
            np.testing.assert_array_equal(want.dis_x, got.dis_x)
            np.testing.assert_array_equal(want.dis_y, got.dis_y)
            if linear:
                for w_, g_ in zip(want.masks_x + want.masks_y,
                                  got.masks_x + got.masks_y):
                    np.testing.assert_array_equal(w_, g_)
            np.testing.assert_array_equal(
                nearest_warp_mask_host(IN_SZ, m, OUT_SZ, border=4), got_mask)


@pytest.mark.smoke
def test_native_matches_numpy():
    """The C single-pass precompute must be bit-identical to the numpy
    fused path (which is bit-identical to the separate-pass path) — every
    rings leaf, linear branch masks, and the validity mask.  Skipped when
    no host toolchain exists (the numpy path is then the production one)."""
    import pytest

    from lerf_tpu.native import get_warp_lib
    from lerf_tpu.ops.resample import warp_serving_host_fused

    if get_warp_lib() is None:
        pytest.skip("no C toolchain; numpy fused path is production")
    for m in _matrices():
        for linear in (False, True):
            want, want_mask = warp_serving_host_fused(
                IN_SZ, m, OUT_SZ, linear=linear, native=False)
            got, got_mask = warp_serving_host_fused(
                IN_SZ, m, OUT_SZ, linear=linear, native=True)
            np.testing.assert_array_equal(want_mask, got_mask)
            for a, b in zip(want, got):
                if a is None:
                    assert b is None
                elif isinstance(a, tuple):
                    for x, y in zip(a, b):
                        np.testing.assert_array_equal(x, y)
                else:
                    np.testing.assert_array_equal(a, b)


def test_native_threaded_bit_equal(monkeypatch):
    """Row-parallel C precompute: the output must be byte-identical for
    every worker count (rows partition disjointly — pure scheduling).
    Forced to 3 threads even on this 1-core host: correctness of the
    partition/join logic doesn't need real parallel hardware."""
    import pytest

    from lerf_tpu.native import get_warp_lib
    from lerf_tpu.ops.resample import warp_serving_host_fused

    if get_warp_lib() is None:
        pytest.skip("no C toolchain; numpy fused path is production")
    m = _matrices()[0]
    for linear in (False, True):
        monkeypatch.setenv("LERF_NATIVE_THREADS", "1")
        want, want_mask = warp_serving_host_fused(
            IN_SZ, m, OUT_SZ, linear=linear, native=True)
        monkeypatch.setenv("LERF_NATIVE_THREADS", "3")
        got, got_mask = warp_serving_host_fused(
            IN_SZ, m, OUT_SZ, linear=linear, native=True)
        np.testing.assert_array_equal(want_mask, got_mask)
        for a, b in zip(want, got):
            if a is None:
                assert b is None
            elif isinstance(a, tuple):
                for x, y in zip(a, b):
                    np.testing.assert_array_equal(x, y)
            else:
                np.testing.assert_array_equal(a, b)


def test_rings_for_bucket_matches_operands_bucket():
    """rings_for_bucket (rings-level bucketing) must equal bucketing at the
    operands level then building rings — including the linear masks' pad
    values (neg=0, pos=1)."""
    from lerf_tpu.ops.resample import rings_for_bucket

    m = _matrices()[1]
    nb = 48 * 48
    for linear in (False, True):
        ops = WarpOperands.create(IN_SZ, m, OUT_SZ)
        want = warp_rings(ops.for_bucket((48, 48), nb), linear=linear)
        got = rings_for_bucket(warp_rings(ops, linear=linear), IN_SZ,
                               (48, 48), nb)
        np.testing.assert_array_equal(want.ring_x, got.ring_x)
        np.testing.assert_array_equal(want.ring_y, got.ring_y)
        np.testing.assert_array_equal(want.corner, got.corner)
        np.testing.assert_array_equal(want.dis_x, got.dis_x)
        np.testing.assert_array_equal(want.dis_y, got.dis_y)
        if linear:
            for w_, g_ in zip(want.masks_x + want.masks_y,
                              got.masks_x + got.masks_y):
                np.testing.assert_array_equal(w_, g_)


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


def test_lut_warp_dynamic_bit_exact_one_program():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    # two matrices prove the one-program property; each extra matrix
    # costs a full static-path program TRACE on the comparison side
    for m in _matrices()[:2]:
        want_out, want_mask = pred.warp(img, m, OUT_SZ)
        got_out, got_mask = pred.warp_dynamic(img, m, OUT_SZ)
        np.testing.assert_array_equal(want_out, got_out)
        np.testing.assert_array_equal(want_mask, got_mask)
    # key-scoped pins (shared predictor): one dynamic program for both
    # matrices vs one static program per matrix at these shapes
    assert sum(1 for k in pred._warp_dyn_cache
               if k == (IN_SZ, OUT_SZ)) == 1
    assert sum(1 for k in pred._warp_cache
               if k[0] == IN_SZ and k[2] == OUT_SZ) == 2


def test_lut_warp_dynamic_linear_form():
    pred = shared_lut_predictor(linear=True)
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    m = _matrices()[0]
    want_out, want_mask = pred.warp(img, m, OUT_SZ)
    got_out, got_mask = pred.warp_dynamic(img, m, OUT_SZ)
    np.testing.assert_array_equal(want_out, got_out)
    np.testing.assert_array_equal(want_mask, got_mask)
    assert sum(1 for k in pred._warp_dyn_cache
               if k == (IN_SZ, OUT_SZ)) == 1


def test_net_warp_dynamic_bit_exact():
    pred = shared_net_predictor()
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    for m in _matrices()[:2]:
        want_out, want_mask = pred.warp(img, m, OUT_SZ)
        got_out, got_mask = pred.warp_dynamic(img, m, OUT_SZ)
        np.testing.assert_array_equal(want_out, got_out)
        np.testing.assert_array_equal(want_mask, got_mask)
    assert sum(1 for k in pred._warp_dyn_cache
               if k == (IN_SZ, OUT_SZ)) == 1


def test_lut_warp_bucketed_bit_exact_one_program():
    """granularity>0: one program per (in-bucket, N-bucket) must serve
    different image shapes, output shapes, AND matrices bit-exactly."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(11)
    # two cases vary input AND output shape (plus matrix) within one
    # bucket; a third combo re-proves the same key arithmetic at the cost
    # of another static-path program trace
    cases = [((37, 45), (52, 40)), ((33, 41), (49, 44))]
    mats = _matrices()
    for (in_sz, out_sz), m in zip(cases, mats):
        img = rng.randint(0, 256, (*in_sz, 3), dtype=np.uint8)
        want_out, want_mask = pred.warp(img, m, out_sz)
        got_out, got_mask = pred.warp_dynamic(img, m, out_sz,
                                              granularity=16)
        np.testing.assert_array_equal(want_out, got_out)
        np.testing.assert_array_equal(want_mask, got_mask)
    # both (in, out) shape combos share the (48, 48)-bucket program
    assert len([k for k in pred._warp_dyn_cache if k[0] == "bucket"]) == 1


def test_lut_warp_bucketed_aux_cropped():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    m = _matrices()[0]
    w_out, w_mask, w_feat, w_hyper = pred.warp(img, m, OUT_SZ,
                                               return_aux=True)
    g_out, g_mask, g_feat, g_hyper = pred.warp_dynamic(
        img, m, OUT_SZ, return_aux=True, granularity=16)
    np.testing.assert_array_equal(w_out, g_out)
    np.testing.assert_array_equal(np.asarray(w_feat), g_feat)
    np.testing.assert_array_equal(np.asarray(w_hyper), g_hyper)


def test_net_warp_bucketed_matches_exact():
    """SRNet form (replicate-pad float stages): same construction; allow
    only exact-rounding-tie slack like the bucketed SR test."""
    pred = shared_net_predictor()
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    m = _matrices()[0]
    want_out, want_mask = pred.warp(img, m, OUT_SZ)
    got_out, got_mask = pred.warp_dynamic(img, m, OUT_SZ, granularity=16)
    np.testing.assert_array_equal(want_mask, got_mask)
    diff = np.abs(want_out.astype(np.int32) - got_out.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-2


def test_imdn_warp_bucketed_matches_exact():
    """IMDN (zero-pad stages) through the fully recompile-free bucketed
    warp — enabled by the traced-bound in-stage re-masking."""
    pred = shared_imdn_predictor()
    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    m = _matrices()[0]
    want_out, want_mask = pred.warp(img, m, OUT_SZ)
    got_out, got_mask = pred.warp_dynamic(img, m, OUT_SZ, granularity=16)
    np.testing.assert_array_equal(want_mask, got_mask)
    np.testing.assert_array_equal(want_out, got_out)
    assert any(k[0] == "bucket" for k in pred._warp_dyn_cache)


def test_lut_warp_dynamic_on_shipped_homographies():
    """Real fixture homographies (the reference's Set5 isc/osc .pth
    matrices) through the shipped LeRF-G LUTs: dynamic == per-matrix."""
    import os

    import pytest

    from conftest import REFERENCE_ROOT
    from lerf_tpu.data.benchmarks import WarpBenchmark
    from lerf_tpu.lut import load_lut_bank

    warp_root = os.path.join(REFERENCE_ROOT, "data", "WarpBenchmark")
    rr = os.path.join(REFERENCE_ROOT, "data", "rrBenchmark")
    models = os.path.join(REFERENCE_ROOT, "models", "lerf-g")
    if not (os.path.isdir(warp_root) and os.path.isdir(rr)
            and os.path.isdir(models)):
        pytest.skip("reference fixtures not available")
    bank = load_lut_bank(models, out_c=3)
    pred = LutPredictor(bank)
    bench = WarpBenchmark(warp_root, "Set5", hr_root=rr)
    lr, hr, matrix, _ = bench.sample(0, "isc")
    # crop to keep the CPU compile cheap; the matrix stays the real one
    lr = lr[:64, :72]
    out_hw = (80, 96)
    want_out, want_mask = pred.warp(lr, matrix, out_hw)
    got_out, got_mask = pred.warp_dynamic(lr, matrix, out_hw)
    np.testing.assert_array_equal(want_out, got_out)
    np.testing.assert_array_equal(want_mask, got_mask)


def test_warp_dynamic_fallback_outside_deploy_config(monkeypatch):
    """support != 2 (and norm != 255 for the LUT form) must fall back to
    the exact per-matrix path."""
    pred = _lut_predictor()
    pred.supp_size = 3
    called = {}

    def fake_warp(img, matrix, out_hw, return_aux=False):
        called["yes"] = True
        return "out", "mask"

    monkeypatch.setattr(pred, "warp", fake_warp)
    img = np.zeros((8, 8, 3), np.uint8)
    assert pred.warp_dynamic(img, np.eye(3), (8, 8)) == ("out", "mask")
    assert called


def test_warp_device_geometry_close_to_host():
    """Device-geometry warp (rings + mask computed in-program from the
    traced 3×3 inverse — ops.resample.warp_rings_on_device): NOT bit-equal
    to the float64 host-geometry path (f32 projective divide can flip
    ceil/box boundaries at ~1e-4 px), but the agreement must be near-total:
    mask mismatches and pixel disagreements are boundary events, bounded
    here at the per-mille level, with >1-LSB deltas only where a gather
    window shifted (rare).  One program serves every matrix."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    for m in _matrices()[:3]:
        want_out, want_mask = pred.warp_dynamic(img, m, OUT_SZ)
        got_out, got_mask = pred.warp_device(img, m, OUT_SZ)
        assert (got_mask != want_mask).mean() < 2e-3, m
        both = (got_mask & want_mask)[:, :, None]
        diff = np.abs(got_out.astype(np.int32) - want_out.astype(np.int32))
        diff = diff * both
        assert (diff > 1).mean() < 5e-3, (m, (diff > 1).mean())
        assert (diff != 0).mean() < 5e-2, (m, (diff != 0).mean())
    assert sum(1 for k in pred._warp_dyn_cache
               if k[0] == "devgeo") == 1      # one program, three matrices


def test_warp_batch_device_geometry_matches_single():
    """The batched device-geometry form must equal per-frame warp_device
    exactly (same in-program geometry, vmapped)."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(10)
    imgs = rng.randint(0, 256, (2, *IN_SZ, 3), dtype=np.uint8)
    mats = np.stack(_matrices()[:2])
    out, mask = pred.warp_batch(imgs, mats, OUT_SZ, geometry="device")
    for i in range(2):
        w_out, w_mask = pred.warp_device(imgs[i], mats[i], OUT_SZ)
        np.testing.assert_array_equal(out[i], w_out)
        np.testing.assert_array_equal(mask[i], w_mask)


def test_warp_device_bucketed_bit_equal_and_one_program():
    """Bucketed device-geometry warp (granularity>0: input edge-padded
    with stages re-clamped, output rectangle padded and host-cropped,
    rings built in the bucket frame — warp_rings_on_device in_frame=) must
    be BIT-equal to the unbucketed device-geometry program, and one
    (in-bucket, out-bucket) program must serve every shape pair in the
    buckets and every matrix."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(11)
    shapes = [(IN_SZ, OUT_SZ), ((33, 41), (50, 38))]   # same 16-buckets
    for m in _matrices()[:2]:
        for in_sz, out_sz in shapes:
            img = rng.randint(0, 256, (*in_sz, 3), dtype=np.uint8)
            want_out, want_mask = pred.warp_device(img, m, out_sz)
            got_out, got_mask = pred.warp_device(img, m, out_sz,
                                                 granularity=16)
            np.testing.assert_array_equal(got_out, want_out)
            np.testing.assert_array_equal(got_mask, want_mask)
    assert sum(1 for k in pred._warp_dyn_cache
               if k[0] == "devgeo_bucket") == 1


def test_net_warp_device_bucketed_bit_equal():
    """NetPredictor (SRNet replicate-pad form): bucketed device-geometry
    warp equals the unbucketed device-geometry program bit-for-bit."""
    pred = shared_net_predictor()
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    m = _matrices()[0]
    want_out, want_mask = pred.warp_device(img, m, OUT_SZ)
    got_out, got_mask = pred.warp_device(img, m, OUT_SZ, granularity=16)
    np.testing.assert_array_equal(got_out, want_out)
    np.testing.assert_array_equal(got_mask, want_mask)


def test_net_warp_device_geometry_close_to_host():
    """NetPredictor.warp_device (both SRNet u8-row and IMDN float-row
    configs) vs the host-geometry dynamic path — same bounded-boundary
    discipline as the LUT form."""
    for pred in (shared_net_predictor(), shared_imdn_predictor()):
        rng = np.random.RandomState(15)
        img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
        m = _matrices()[0]
        want_out, want_mask = pred.warp_dynamic(img, m, OUT_SZ)
        got_out, got_mask = pred.warp_device(img, m, OUT_SZ)
        assert (got_mask != want_mask).mean() < 2e-3
        both = (got_mask & want_mask)[:, :, None]
        diff = np.abs(got_out.astype(np.int32) - want_out.astype(np.int32))
        diff = diff * both
        assert (diff > 1).mean() < 5e-3, (diff > 1).mean()
        assert (diff != 0).mean() < 5e-2, (diff != 0).mean()
