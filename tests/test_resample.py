"""Parity tests: steerable/fixed resize & warp vs the reference numpy oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from lerf_tpu.ops import (
    ResizeGeometry, WarpGeometry,
    steering_gaussian_resize, amplified_linear_resize, fixed_kernel_resize,
    steering_gaussian_warp, amplified_linear_warp, fixed_kernel_warp,
    nearest_warp_mask,
)
from oracle import requires_reference, ref_resize_numpy

RNG = np.random.RandomState


def rand_img(c, h, w, seed=0):
    return (RNG(seed).rand(c, h, w) * 255).astype(np.float32)


def rand_hyper(c, h, w, seed=1):
    return RNG(seed).rand(3, c, h, w).astype(np.float32)


SHAPES = [
    ((3, 12, 17), [2, 2]),
    ((3, 12, 17), [3, 3]),
    ((1, 9, 9), [4, 4]),
    ((3, 10, 14), [1.5, 2.0]),
    ((3, 16, 16), [2.5, 2.5]),
    ((3, 16, 16), [0.5, 0.5]),   # downscale: exercises anti-aliasing
    ((3, 20, 10), [1.0, 1.0]),
]


@requires_reference
@pytest.mark.parametrize("shape,scale", SHAPES)
@pytest.mark.smoke
def test_steering_gaussian_resize_matches_oracle(shape, scale):
    m = ref_resize_numpy()
    img = rand_img(*shape)
    rho, sx, sy = rand_hyper(*shape)

    ref = m.SteeringGaussianResize2dNumpy(support_sz=2, max_sigma=10)
    ref.set_shape(list(shape), scale_factors=scale)
    want = ref.resize(img, rho, sx, sy)

    geom = ResizeGeometry.create(shape[1:], scale_factors=scale, support=2)
    got = np.asarray(steering_gaussian_resize(
        jnp.asarray(img), jnp.asarray(rho), jnp.asarray(sx), jnp.asarray(sy),
        geom, max_sigma=10.0))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


@requires_reference
@pytest.mark.parametrize("shape,scale", SHAPES[:4])
def test_amplified_linear_resize_matches_oracle(shape, scale):
    m = ref_resize_numpy()
    img = rand_img(*shape, seed=3)
    alpha = RNG(4).rand(*shape).astype(np.float32)

    ref = m.AmplifiedLinearResize2dNumpy()
    ref.set_shape(list(shape), scale_factors=scale)
    want = ref.resize(img, alpha)

    geom = ResizeGeometry.create(shape[1:], scale_factors=scale, support=2)
    got = np.asarray(amplified_linear_resize(
        jnp.asarray(img), jnp.asarray(alpha), geom, max_alpha=1.0))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def _rand_homography(seed=0, jitter=1e-4):
    r = RNG(seed)
    m = np.eye(3)
    m[0, 0] = m[1, 1] = 0.5 + 0.1 * r.rand()    # upscale warp
    m[0, 1] = 0.05 * r.randn()
    m[1, 0] = 0.05 * r.randn()
    m[0, 2] = 2 * r.randn()
    m[1, 2] = 2 * r.randn()
    m[2, 0] = jitter * r.randn()
    m[2, 1] = jitter * r.randn()
    return np.linalg.inv(m)  # maps input -> output like the benchmark .pth


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_steering_gaussian_warp_matches_oracle(seed):
    m = ref_resize_numpy()
    c, h, w = 3, 14, 18
    oh, ow = 25, 31
    img = rand_img(c, h, w, seed=seed)
    rho, sx, sy = rand_hyper(c, h, w, seed=seed + 10)
    matrix = _rand_homography(seed)

    ref = m.SteeringGaussianWarp2dNumpy(support_sz=2, max_sigma=10)
    ref.set_shape([c, h, w], matrix, [c, oh, ow])
    want = ref.warp(img, rho, sx, sy)

    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=2)
    got = np.asarray(steering_gaussian_warp(
        jnp.asarray(img), jnp.asarray(rho), jnp.asarray(sx), jnp.asarray(sy),
        geom, max_sigma=10.0))

    # NaN pattern (fully out-of-view windows) must coincide; values match
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=2e-5, atol=2e-3)


@requires_reference
def test_amplified_linear_warp_matches_oracle():
    m = ref_resize_numpy()
    c, h, w = 3, 14, 18
    oh, ow = 25, 31
    img = rand_img(c, h, w, seed=7)
    alpha = RNG(8).rand(c, h, w).astype(np.float32)
    matrix = _rand_homography(5)

    ref = m.AmplifiedLinearWarp2dNumpy()
    ref.set_shape([c, h, w], matrix, [c, oh, ow])
    want = ref.warp(img, alpha)

    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=2)
    got = np.asarray(amplified_linear_warp(jnp.asarray(img),
                                           jnp.asarray(alpha), geom))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=2e-5, atol=2e-3)


@requires_reference
@pytest.mark.parametrize("kernel,ref_cls,support", [
    ("box", "NearestWarp2dNumpy", 1),
    ("linear", "BilinearWarp2dNumpy", 2),
    ("cubic", "BicubicWarp2dNumpy", 4),
    ("lanczos2", "Lanczos2Warp2dNumpy", 4),
])
def test_fixed_warp_matches_oracle(kernel, ref_cls, support):
    m = ref_resize_numpy()
    c, h, w = 3, 14, 18
    oh, ow = 20, 26
    img = rand_img(c, h, w, seed=11)
    matrix = _rand_homography(9)

    ref = getattr(m, ref_cls)()
    ref.set_shape([c, h, w], matrix, [c, oh, ow])
    want = ref.warp(img)

    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=support)
    got = np.asarray(fixed_kernel_warp(jnp.asarray(img), geom, kernel))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=2e-5, atol=2e-3)


@requires_reference
def test_nearest_warp_mask_matches_oracle():
    m = ref_resize_numpy()
    c, h, w = 3, 14, 18
    oh, ow = 20, 26
    matrix = _rand_homography(3)

    white = np.zeros((c, h, w), dtype=np.float32)
    white[:, 4:h - 4, 4:w - 4] = 255
    ref = m.NearestWarp2dNumpy()
    ref.set_shape([c, h, w], matrix, [c, oh, ow])
    want = (ref.warp(white) == 255)

    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=1)
    got = np.asarray(nearest_warp_mask((h, w), geom, border=4)) == 1.0
    np.testing.assert_array_equal(got, want[0])


def test_uniform_hyper_reduces_to_symmetric_gaussian():
    """Property: uniform ρ=0.5 (decoded 0) makes the kernel separable and
    symmetric; output must be invariant to transposing the image+scale."""
    img = rand_img(1, 13, 13, seed=2)
    rho = np.full((1, 13, 13), 0.5, np.float32)
    s = np.full((1, 13, 13), 0.3, np.float32)
    geom = ResizeGeometry.create((13, 13), scale_factors=[2, 2], support=2)
    out = np.asarray(steering_gaussian_resize(
        jnp.asarray(img), jnp.asarray(rho), jnp.asarray(s), jnp.asarray(s),
        geom))
    out_t = np.asarray(steering_gaussian_resize(
        jnp.asarray(img.transpose(0, 2, 1)), jnp.asarray(rho),
        jnp.asarray(s), jnp.asarray(s), geom))
    np.testing.assert_allclose(out, out_t.transpose(0, 2, 1), rtol=1e-5,
                               atol=1e-3)


def test_batched_matches_single():
    img = np.stack([rand_img(3, 10, 11, seed=i) for i in range(2)])
    rho = np.stack([rand_hyper(3, 10, 11, seed=i)[0] for i in range(2)])
    sx = np.stack([rand_hyper(3, 10, 11, seed=i + 5)[1] for i in range(2)])
    sy = np.stack([rand_hyper(3, 10, 11, seed=i + 9)[2] for i in range(2)])
    geom = ResizeGeometry.create((10, 11), scale_factors=[2, 2], support=2)
    batched = np.asarray(steering_gaussian_resize(
        jnp.asarray(img), jnp.asarray(rho), jnp.asarray(sx), jnp.asarray(sy),
        geom))
    for b in range(2):
        single = np.asarray(steering_gaussian_resize(
            jnp.asarray(img[b]), jnp.asarray(rho[b]), jnp.asarray(sx[b]),
            jnp.asarray(sy[b]), geom))
        np.testing.assert_allclose(batched[b], single, rtol=1e-6, atol=1e-6)


def test_rowpack_warp_matches_element_path():
    """The row-packed single-gather warp (support-2 [C,H,W] fast path) is
    bit-equal to the generic element-gather path, including clipped-FOV
    borders and NaN (out-of-view) pixels."""
    from lerf_tpu.ops.resample import (_gather_warp, _reduce_support_warp,
                                       _warp_dis, decode_gaussian_hyper,
                                       steering_gaussian_warp,
                                       steering_gaussian_weight,
                                       amplified_linear_warp)
    from lerf_tpu.ops.geometry import WarpGeometry

    rng = np.random.RandomState(7)
    mats = [np.linalg.inv(np.asarray([[0.45, 0.02, -0.1],
                                      [-0.03, 0.55, 0.2],
                                      [1e-4, -2e-5, 1.0]])),
            np.asarray([[0.9, 0.15, 5.0], [-0.1, 1.1, -3.0],
                        [2e-4, 1e-4, 1.0]])]
    for mat in mats:
        geom = WarpGeometry.create((22, 31), mat, (45, 60), support=2)
        img = jnp.asarray(rng.rand(3, 22, 31).astype(np.float32) * 255)
        hyp = [jnp.asarray(rng.rand(3, 22, 31).astype(np.float32))
               for _ in range(3)]

        got = np.asarray(steering_gaussian_warp(img, *hyp, geom))

        # reference: the generic element path, forced via a batch dim
        want = np.asarray(steering_gaussian_warp(img[None], *(
            h[None] for h in hyp), geom))[0]
        nan_w, nan_g = np.isnan(want), np.isnan(got)
        np.testing.assert_array_equal(nan_g, nan_w)
        np.testing.assert_array_equal(got[~nan_g], want[~nan_w])

        a_got = np.asarray(amplified_linear_warp(img, hyp[0], geom))
        a_want = np.asarray(amplified_linear_warp(img[None], hyp[0][None],
                                                  geom))[0]
        nan_w, nan_g = np.isnan(a_want), np.isnan(a_got)
        np.testing.assert_array_equal(nan_g, nan_w)
        np.testing.assert_array_equal(a_got[~nan_g], a_want[~nan_w])


def test_u8_rowpack_warp_matches_float_path():
    """u8-code packed rows (decode AFTER the gather) are bit-equal to the
    float fast path when the inputs are u8-exact: integer feat and hyper
    maps that are exact multiples of 1/255 — the LUT/SRNet deploy contract.
    Covers both steering-Gaussian and amplified-linear warps, borders and
    NaN out-of-view pixels."""
    from lerf_tpu.ops.geometry import WarpGeometry
    from lerf_tpu.ops.resample import (amplified_linear_warp,
                                       steering_gaussian_warp)

    rng = np.random.RandomState(11)
    mats = [np.linalg.inv(np.asarray([[0.45, 0.02, -0.1],
                                      [-0.03, 0.55, 0.2],
                                      [1e-4, -2e-5, 1.0]])),
            np.asarray([[0.9, 0.15, 5.0], [-0.1, 1.1, -3.0],
                        [2e-4, 1e-4, 1.0]])]
    for mat in mats:
        geom = WarpGeometry.create((22, 31), mat, (45, 60), support=2)
        img = jnp.asarray(
            rng.randint(0, 256, (3, 22, 31)).astype(np.float32))
        hyp = [jnp.asarray(rng.randint(0, 256, (3, 22, 31))
                           .astype(np.float32) / 255.0) for _ in range(3)]

        want = np.asarray(steering_gaussian_warp(img, *hyp, geom))
        got = np.asarray(steering_gaussian_warp(img, *hyp, geom,
                                                u8_inputs=True))
        nan_w, nan_g = np.isnan(want), np.isnan(got)
        np.testing.assert_array_equal(nan_g, nan_w)
        np.testing.assert_array_equal(got[~nan_g], want[~nan_w])

        a_want = np.asarray(amplified_linear_warp(img, hyp[0], geom))
        a_got = np.asarray(amplified_linear_warp(img, hyp[0], geom,
                                                 u8_inputs=True))
        nan_w, nan_g = np.isnan(a_want), np.isnan(a_got)
        np.testing.assert_array_equal(nan_g, nan_w)
        np.testing.assert_array_equal(a_got[~nan_g], a_want[~nan_w])


def test_u8_integer_codes_generic_fallback_support4():
    """Regression: u8_inputs with a support!=2 geometry takes the generic
    element-gather path, which must normalize raw integer codes 0..255
    before decoding (it used to decode them as [0,1] maps — rho up to 509,
    sigma up to 2550, silent garbage)."""
    from lerf_tpu.ops.geometry import WarpGeometry
    from lerf_tpu.ops.resample import (amplified_linear_warp,
                                       steering_gaussian_warp)

    rng = np.random.RandomState(13)
    mat = np.asarray([[0.9, 0.15, 5.0], [-0.1, 1.1, -3.0],
                      [2e-4, 1e-4, 1.0]])
    geom = WarpGeometry.create((18, 25), mat, (36, 50), support=4)
    img = jnp.asarray(rng.randint(0, 256, (3, 18, 25)).astype(np.float32))
    codes = [rng.randint(0, 256, (3, 18, 25)).astype(np.int32)
             for _ in range(3)]
    floats = [jnp.asarray(c.astype(np.float32) / 255.0) for c in codes]
    codes = [jnp.asarray(c) for c in codes]

    want = np.asarray(steering_gaussian_warp(img, *floats, geom))
    got = np.asarray(steering_gaussian_warp(img, *codes, geom,
                                            u8_inputs=True))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=1e-5,
                               atol=1e-3)

    a_want = np.asarray(amplified_linear_warp(img, floats[0], geom))
    a_got = np.asarray(amplified_linear_warp(img, codes[0], geom,
                                             u8_inputs=True))
    nan_w, nan_g = np.isnan(a_want), np.isnan(a_got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(a_got[~nan_g], a_want[~nan_w], rtol=1e-5,
                               atol=1e-3)


def test_per_block_periodic_resize_matches_lattice_path(monkeypatch):
    """The per-(s,t)-block periodic resize (production path — avoids the
    S²-expanded lattices, 2.4× at 4K) is bit-identical to the lattice
    path for all three resize ops."""
    import lerf_tpu.ops.resample as R

    rng = np.random.RandomState(5)
    for h, w, sc in ((20, 28, [2, 2]), (24, 30, [1.5, 2.0]), (16, 18, [4, 4])):
        geom = ResizeGeometry.create((h, w), scale_factors=sc, support=2)
        cgeom = ResizeGeometry.create((h, w), scale_factors=sc, support=4)
        img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.float32))
        hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
               for _ in range(3)]

        want_g = np.asarray(R.steering_gaussian_resize(img, *hyp, geom))
        want_a = np.asarray(R.amplified_linear_resize(img, hyp[0], geom))
        want_f = np.asarray(R.fixed_kernel_resize(img, cgeom, "cubic"))

        monkeypatch.setattr(R, "_periodic_pair", lambda g: None)
        got_g = np.asarray(R.steering_gaussian_resize(img, *hyp, geom))
        got_a = np.asarray(R.amplified_linear_resize(img, hyp[0], geom))
        got_f = np.asarray(R.fixed_kernel_resize(img, cgeom, "cubic"))
        monkeypatch.undo()

        np.testing.assert_array_equal(want_g, got_g)
        np.testing.assert_array_equal(want_a, got_a)
        np.testing.assert_array_equal(want_f, got_f)


def test_u8_warp_accepts_integer_codes():
    """The u8 fast path takes raw integer codes (the stage-2 output)
    directly — no float decode/re-encode round-trip — and matches the
    float-map call exactly; non-u8 fast path preserves the input dtype."""
    from lerf_tpu.ops.geometry import WarpGeometry
    from lerf_tpu.ops.resample import steering_gaussian_warp

    rng = np.random.RandomState(13)
    mat = np.asarray([[0.9, 0.15, 5.0], [-0.1, 1.1, -3.0],
                      [2e-4, 1e-4, 1.0]])
    geom = WarpGeometry.create((22, 31), mat, (45, 60), support=2)
    feat_i = rng.randint(0, 256, (3, 22, 31))
    codes = [rng.randint(0, 256, (3, 22, 31)) for _ in range(3)]

    a = np.asarray(steering_gaussian_warp(
        jnp.asarray(feat_i.astype(np.float32)),
        *(jnp.asarray(c.astype(np.float32) / 255.0) for c in codes),
        geom, u8_inputs=True))
    b = np.asarray(steering_gaussian_warp(
        jnp.asarray(feat_i.astype(np.int32)),
        *(jnp.asarray(c.astype(np.int32)) for c in codes),
        geom, u8_inputs=True))
    np.testing.assert_array_equal(np.nan_to_num(a), np.nan_to_num(b))

    # dtype preservation on the float fast path
    out = steering_gaussian_warp(
        jnp.asarray(feat_i.astype(np.float32)),
        *(jnp.asarray(c.astype(np.float32) / 255.0) for c in codes), geom)
    assert out.dtype == jnp.float32
