"""Spatial (output-row) sharding of the steerable resize on the CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lerf_tpu.ops import ResizeGeometry, WarpGeometry, \
    steering_gaussian_resize, steering_gaussian_warp
from lerf_tpu.parallel import make_mesh
from lerf_tpu.parallel.spatial import steering_gaussian_resize_sharded, \
    steering_gaussian_warp_sharded


@pytest.mark.parametrize("scale", [[2, 2], [2.5, 1.5], [2.35, 2.0]])
def test_sharded_resize_matches_unsharded(scale):
    """Includes a non-divisible outH (16*2.35=37 rows on 8 devices) — the
    sharded path pads duplicated geometry rows and crops."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    c, h, w = 3, 16, 20
    geom = ResizeGeometry.create((h, w), scale_factors=scale, support=2)
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32) * 255)
    hyper = rng.rand(3, c, h, w).astype(np.float32)
    rho, sx, sy = (jnp.asarray(x) for x in hyper)

    want = np.asarray(steering_gaussian_resize(img, rho, sx, sy, geom))
    got = np.asarray(jax.jit(
        lambda *a: steering_gaussian_resize_sharded(*a, geom, mesh))(
            img, rho, sx, sy))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_sharded_warp_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(1)
    c, h, w = 3, 14, 18
    oh, ow = 27, 30      # outH deliberately not divisible by 8
    matrix = np.linalg.inv(np.diag([0.55, 0.6, 1.0]))
    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=2)
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32) * 255)
    hyper = rng.rand(3, c, h, w).astype(np.float32)
    rho, sx, sy = (jnp.asarray(x) for x in hyper)

    want = np.asarray(steering_gaussian_warp(img, rho, sx, sy, geom))
    got = np.asarray(jax.jit(
        lambda *a: steering_gaussian_warp_sharded(*a, geom, mesh))(
            img, rho, sx, sy))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=1e-6,
                               atol=1e-4)
