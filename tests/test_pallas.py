"""Pallas fused resize kernel vs the XLA path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
from lerf_tpu.ops.pallas.resize_kernel import steering_gaussian_resize_pallas


@pytest.mark.parametrize("shape,scale", [
    ((3, 12, 16), [2, 2]),
    ((1, 10, 12), [4, 4]),
    ((2, 8, 12), [2.5, 1.5]),
])
def test_pallas_matches_xla(shape, scale):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
    hyper = rng.rand(3, *shape).astype(np.float32)
    rho, sx, sy = (jnp.asarray(h) for h in hyper)
    geom = ResizeGeometry.create(shape[1:], scale_factors=scale, support=2)

    want = np.asarray(steering_gaussian_resize(img, rho, sx, sy, geom))
    got = np.asarray(steering_gaussian_resize_pallas(
        img, rho, sx, sy, geom, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_pallas_rejects_nonperiodic():
    geom = ResizeGeometry.create((10, 10), scale_factors=[3.37, 3.37],
                                 support=2)
    img = jnp.zeros((1, 10, 10))
    with pytest.raises(ValueError):
        steering_gaussian_resize_pallas(img, img, img, img, geom,
                                        interpret=True)


def test_pallas_hardware_parity():
    """On-chip Mosaic-compile parity vs the XLA path (the part interpret
    mode can't prove).  Gated: set LERF_TPU_TESTS=1 on a TPU machine."""
    import os
    if os.environ.get("LERF_TPU_TESTS") != "1":
        pytest.skip("hardware test; set LERF_TPU_TESTS=1 on a TPU machine")
    import jax
    from conftest import require_tpu
    require_tpu()
    import jax.numpy as jnp
    from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
    from lerf_tpu.ops.pallas.resize_kernel import \
        steering_gaussian_resize_pallas

    h, w = 360, 640
    geom = ResizeGeometry.create((h, w), scale_factors=[4, 4], support=2)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 255)
    hyp = [jnp.asarray(rng.rand(3, h, w).astype(np.float32))
           for _ in range(3)]
    want = np.asarray(jax.jit(lambda *a: steering_gaussian_resize(
        *a, geom, max_sigma=10.0))(img, *hyp))
    got = np.asarray(jax.jit(lambda *a: steering_gaussian_resize_pallas(
        *a, geom, max_sigma=10.0))(img, *hyp))
    np.testing.assert_array_equal(got, want)
