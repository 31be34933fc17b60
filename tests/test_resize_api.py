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
