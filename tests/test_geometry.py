"""Host geometry precompute — regression tests for the serving-cost
optimizations (rank-1 projection grid, float64 ``_serving_axis``).

The dynamic-warp serving host cost is dominated by this module
(BASELINE.md "Dynamic-homography warp serving"); these tests pin the
optimized forms to the straightforward reference formulations so future
edits can't silently change the geometry.
"""
import pytest
import numpy as np

from lerf_tpu.ops.geometry import WarpOperands, _serving_axis, _warp_grid


def _grid_matmul(matrix, in_sz, out_sz):
    """The pre-optimization formulation: one [3, oh*ow] float64 dgemm
    (reference semantics, resize_right2d_numpy.py:306-342)."""
    oh, ow = out_sz
    ys, xs = np.meshgrid(np.arange(oh, dtype=np.float64),
                         np.arange(ow, dtype=np.float64), indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(oh * ow)], axis=0)
    src = np.linalg.inv(np.asarray(matrix, dtype=np.float64)) @ pts
    grid_x = (src[1] / src[2]).reshape(oh, ow).clip(0, in_sz[0])
    grid_y = (src[0] / src[2]).reshape(oh, ow).clip(0, in_sz[1])
    return grid_x, grid_y


def test_rank1_warp_grid_matches_matmul_form():
    rng = np.random.RandomState(7)
    in_sz, out_sz = (23, 31), (41, 37)
    for _ in range(8):
        mat = np.eye(3) + 0.15 * rng.randn(3, 3)
        mat[2, 2] = 1.0
        gx, gy = _warp_grid(mat, in_sz, out_sz)
        wx, wy = _grid_matmul(mat, in_sz, out_sz)
        # float64 ULP-level agreement (different but equivalent sum order)
        np.testing.assert_allclose(gx, wx, rtol=0, atol=1e-10)
        np.testing.assert_allclose(gy, wy, rtol=0, atol=1e-10)


def _serving_axis_int64(grid, in_sz, support):
    """Pre-optimization ``_serving_axis``: materialized int64 FOV."""
    eps = float(np.finfo(np.float32).eps)
    left = np.ceil(grid - support / 2.0 - eps).astype(np.int64)
    fov = left[..., None] + np.arange(support, dtype=np.int64)
    pad0 = int(max(-fov[0, 0, 0], 0))
    fov = fov + pad0
    fov_clipped = fov.clip(0, in_sz - 1)
    dis = (grid[..., None] + pad0) - fov_clipped
    corner = left + pad0 + 1
    q = np.arange(in_sz + 4, dtype=np.int64)
    ring = np.clip(q - 1, 0, in_sz - 1) - pad0 + 1
    return corner, ring.astype(np.int32), dis


def test_serving_axis_float_form_bit_equal_to_int64_form():
    rng = np.random.RandomState(11)
    for in_sz, out in ((19, (29, 33)), (64, (16, 21))):
        grid = rng.rand(*out) * (in_sz + 0.5) - 0.25
        grid = grid.clip(0, in_sz)          # _warp_grid pre-clips likewise
        c_new, r_new, d_new = _serving_axis(grid, in_sz, 2)
        c_old, r_old, d_old = _serving_axis_int64(grid, in_sz, 2)
        np.testing.assert_array_equal(np.asarray(c_new, np.int64), c_old)
        np.testing.assert_array_equal(r_new, r_old)
        # exact: every term is an integer-valued float64 or the same grid
        np.testing.assert_array_equal(d_new, d_old)


@pytest.mark.smoke
def test_warp_operands_distances_match_warp_geometry():
    """WarpOperands (dynamic serving) and WarpGeometry (per-matrix) derive
    from the same grid; their distances must stay value-identical."""
    from lerf_tpu.ops.geometry import WarpGeometry

    mat = np.array([[1.1, 0.08, -3.0], [0.04, 0.95, 2.0], [1e-4, -2e-4, 1.0]])
    in_sz, out_sz = (20, 24), (33, 29)
    ops = WarpOperands.create(in_sz, mat, out_sz)
    geom = WarpGeometry.create(in_sz, mat, out_sz)
    np.testing.assert_array_equal(
        ops.dis_x.reshape(out_sz + (2,)), geom.dis_x)
    np.testing.assert_array_equal(
        ops.dis_y.reshape(out_sz + (2,)), geom.dis_y)
