"""Public resize() parity vs the reference's vendored ResizeRight (the
data-preparation path, resize_right/resize_right.py)."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE_ROOT
from lerf_tpu.ops import resize
from oracle import requires_reference


def ref_resize_right():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from resize_right import resize_right
    return resize_right


@requires_reference
@pytest.mark.parametrize("scale", [0.5, 0.25, 1 / 3, 2.0, 1.7])
@pytest.mark.parametrize("kernel", ["cubic", "linear", "lanczos2"])
def test_resize_matches_resize_right(scale, kernel):
    rr = ref_resize_right()
    from resize_right import interp_methods as im

    r = np.random.RandomState(0)
    img = (r.rand(3, 24, 36) * 255).astype(np.float64)
    want = rr.resize(img, scale_factors=[1, scale, scale],
                     interp_method=getattr(im, kernel),
                     pad_mode="constant")
    got = np.asarray(resize(jnp.asarray(img, jnp.float32),
                            scale_factors=[scale, scale],
                            interp_method=kernel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


@requires_reference
def test_resize_out_shape_spec():
    rr = ref_resize_right()
    r = np.random.RandomState(1)
    img = (r.rand(1, 17, 19) * 255).astype(np.float64)
    want = rr.resize(img, out_shape=[1, 40, 23])
    got = np.asarray(resize(jnp.asarray(img, jnp.float32),
                            out_shape=(40, 23)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


@requires_reference
@pytest.mark.parametrize("scale", [2.0, 1.5, 0.5, 2.0 / 3.0, 1.25])
@pytest.mark.parametrize("kernel", ["cubic", "linear"])
def test_by_convs_matches_reference(scale, kernel):
    """Our by_convs (per-phase strided correlations) vs the vendored
    ResizeRight's strided-conv fast path (resize_right.py:221-281)."""
    torch = pytest.importorskip("torch")  # reference by_convs is torch-only
    rr = ref_resize_right()
    from resize_right import interp_methods as im

    rng = np.random.RandomState(3)
    # torch convention resizes the LAST dims; >=3 dims needed by fw_pad
    img = rng.rand(3, 20, 24).astype(np.float32)
    want = rr.resize(torch.from_numpy(img), scale_factors=scale,
                     interp_method=getattr(im, kernel),
                     by_convs=True).numpy()
    got = np.asarray(resize(jnp.asarray(img), scale_factors=scale,
                            interp_method=kernel, by_convs=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_by_convs_matches_gather_path():
    """by_convs output == generic geometry path for exact rational scales."""
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(3, 17, 21).astype(np.float32))
    for scale in [2.0, 1.5, 0.5]:
        a = np.asarray(resize(img, scale_factors=scale, by_convs=True))
        b = np.asarray(resize(img, scale_factors=scale))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_by_convs_nonmultiple_output_size():
    """Regression: every phase's tap slices span (n_max-1)*q, so the pad
    must cover n_max even when out_sz % p != 0 (10->13 at 5/4 crashed:
    later phases sliced out of bounds)."""
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(3, 10, 10).astype(np.float32))
    for scale in [1.25, 1.75, 2.5]:
        a = np.asarray(resize(img, scale_factors=scale, by_convs=True))
        b = np.asarray(resize(img, scale_factors=scale))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_by_convs_irrational_falls_back():
    """A dim whose scale has no small-fraction form uses the generic path
    (by_convs demoted per dim — resize_right.py:336-342)."""
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    s = 1.2345678
    a = np.asarray(resize(img, scale_factors=[s, 2.0], by_convs=True))
    b = np.asarray(resize(img, scale_factors=[s, 2.0]))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-3)


@requires_reference
@pytest.mark.parametrize("kernel", ["cubic", "linear"])
def test_resize_nd_matches_resize_right(kernel):
    """Specs LONGER than 2 dims route through the N-D per-dim loop
    (vendored resize_right semantics: ascending-scale dim order, per-dim
    antialias, per-dim weight normalization) — here a 3-D volume resized
    on ALL dims, mixed up/down/fractional."""
    rr = ref_resize_right()
    from resize_right import interp_methods as im

    r = np.random.RandomState(1)
    vol = (r.rand(7, 24, 36) * 255).astype(np.float64)
    spec = [0.5, 1.3, 2.0]
    want = rr.resize(vol, scale_factors=spec,
                     interp_method=getattr(im, kernel),
                     pad_mode="constant")
    got = np.asarray(resize(jnp.asarray(vol, jnp.float32),
                            scale_factors=spec, interp_method=kernel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


@requires_reference
def test_resize_nd_out_shape_and_by_convs():
    """N-D out_shape spec + by_convs on a non-spatial dim: exact-fraction
    snapping applies per dim, matching the vendored by_convs output."""
    rr = ref_resize_right()
    from resize_right import interp_methods as im

    import torch

    r = np.random.RandomState(2)
    vol = (r.rand(8, 20, 30) * 255).astype(np.float64)
    # the reference's by_convs path is torch-only (fw_conv's numpy branch
    # is an unimplemented TODO, resize_right.py:404-418) — run the oracle
    # on a torch tensor; a full-length spec makes the framework dim
    # conventions coincide
    want = rr.resize(torch.from_numpy(vol).float(),
                     scale_factors=[0.5, 2.0, 1.5],
                     interp_method=im.cubic, pad_mode="constant",
                     by_convs=True).numpy()
    got = np.asarray(resize(jnp.asarray(vol, jnp.float32),
                            scale_factors=[0.5, 2.0, 1.5],
                            interp_method="cubic", by_convs=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)
    # trailing-dims convention: a 3-length out_shape resolves against the
    # trailing 3 dims of a 4-D batch
    batch = (r.rand(2, 8, 20, 30) * 255).astype(np.float64)
    got4 = np.asarray(resize(jnp.asarray(batch, jnp.float32),
                             out_shape=[4, 10, 45], interp_method="cubic"))
    assert got4.shape == (2, 4, 10, 45)
    # a spec LONGER than the array rank must error (the vendored original
    # errors too), not silently resolve against truncated dims
    with pytest.raises(ValueError, match="entries"):
        resize(jnp.asarray(vol, jnp.float32), out_shape=[2, 4, 10, 45])
    with pytest.raises(ValueError, match="entries"):
        resize(jnp.asarray(vol, jnp.float32),
               scale_factors=[1.0, 0.5, 2.0, 1.5])
