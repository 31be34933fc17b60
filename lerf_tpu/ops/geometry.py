"""Host-side resampling geometry precompute.

All geometry (projected grids, fields of view, pad vectors, neighbor
distances) is computed once per (in_shape, out_shape) pair on the host in
numpy float64 and handed to the jitted device functions as static-shaped
arrays.  This mirrors — and is bit-parity tested against — the reference
precompute in ``resize_right/resize_right2d_numpy.py`` (``set_shape`` /
``get_projected_grid2d`` / ``get_field_of_view2d`` / ``calc_pad_sz`` /
``get_distance``, lines 18-140 for resize and 292-407 for warp).

TPU-first redesign notes
------------------------
* For scale-resize the field of view is **separable**: the neighbor row
  index depends only on the output row, the column index only on the output
  column.  We therefore store per-axis ``fov``/``dis`` arrays of shape
  ``[out, support]`` instead of the reference's materialized
  ``[outH*S, outW*S]`` lattices — the device gather becomes two cheap
  axis-takes instead of one giant 2-D fancy-index.
* For homographic warp the projection is genuinely per-pixel, but it is
  still separable *per neighbor axis*: we store ``[outH, outW, S]`` row and
  column candidates and form flat gather indices once on the host.
* The reference's quirks are reproduced deliberately (documented inline):
  clamped non-negative warp padding, field-of-view clipping to the
  *unpadded* input bounds, grid clipping to ``[0, in_sz]`` (inclusive), and
  anti-aliasing only on the numpy/deploy path.
"""
from __future__ import annotations

import dataclasses
from math import ceil
from typing import Sequence

import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def resolve_scale_and_out_sz(in_sz, scale_factors=None, out_sz=None):
    """Resolve (scale_h, scale_w), (outH, outW) from either spec.

    Parity: reference ``set_scale_and_out_sz`` (resize_right2d_numpy.py:25-49).
    ``in_sz``/``out_sz`` are spatial-only ``(H, W)`` pairs.
    """
    if out_sz is not None:
        out_sz = tuple(int(s) for s in out_sz)
        if scale_factors is None:
            scale_factors = [o / i for o, i in zip(out_sz, in_sz)]
    if scale_factors is not None:
        if not isinstance(scale_factors, (list, tuple)):
            scale_factors = [scale_factors, scale_factors]
        scale_factors = [float(s) for s in scale_factors]
        if out_sz is None:
            out_sz = tuple(ceil(s * i) for s, i in zip(scale_factors, in_sz))
    if scale_factors is None or out_sz is None:
        raise ValueError("need scale_factors and/or out_sz")
    return tuple(scale_factors), tuple(out_sz)


def _resize_axis(in_sz: int, out_sz: int, scale: float, support: int):
    """Per-axis projected grid / field-of-view / pad / distances.

    Parity: resize_right2d_numpy.py:57-104.  Projection formula
    ``g(o) = o/s + (in-1)/2 - (out-1)/(2s)`` computed in float64 (the
    reference numpy path uses float64 arange).  Pad may be negative
    (crop) — the resize path does NOT clamp it (numpy ref line 101).
    """
    grid = (np.arange(out_sz, dtype=np.float64) / scale
            + (in_sz - 1) / 2.0 - (out_sz - 1) / (2.0 * scale))
    left = np.ceil(grid - support / 2.0 - _EPS).astype(np.int64)
    fov = left[:, None] + np.arange(support, dtype=np.int64)[None, :]
    pad0 = int(-fov[0, 0])
    pad1 = int(fov[-1, -1] - in_sz + 1)
    fov = fov + pad0
    dis = (grid[:, None] + pad0) - fov
    return fov.astype(np.int32), dis, (pad0, pad1)


@dataclasses.dataclass(frozen=True)
class ResizeGeometry:
    """Static geometry for one (in_shape, scale/out_shape) resize config."""
    in_sz: tuple          # (H, W)
    out_sz: tuple         # (outH, outW)
    scale: tuple          # (scale_h, scale_w)
    support: int          # effective support size (after anti-alias inflate)
    base_support: int
    antialias: bool
    min_scale: float
    fov_x: np.ndarray     # [outH, S] int32 — row indices into padded image
    fov_y: np.ndarray     # [outW, S] int32
    dis_x: np.ndarray     # [outH, S] float64
    dis_y: np.ndarray     # [outW, S] float64
    pad_x: tuple          # (top, bottom), may be negative (crop)
    pad_y: tuple          # (left, right)

    @classmethod
    def create(cls, in_sz: Sequence[int], scale_factors=None, out_sz=None,
               support: int = 2, antialias: bool = True):
        """Build geometry.

        ``antialias=True`` reproduces the numpy deploy path: on downscale the
        support inflates by 1/min_scale and weights are evaluated at scaled
        distances (resize_right2d_numpy.py:51-55,186-193).  Pass
        ``antialias=False`` for the torch-training-path semantics where
        anti-aliasing is hard-disabled (resize_right2d_torch.py:42-46).
        """
        in_sz = tuple(int(s) for s in in_sz)
        scale, out = resolve_scale_and_out_sz(in_sz, scale_factors, out_sz)
        base_support = support
        aa = False
        min_scale = 1.0
        if antialias and (scale[0] < 1.0 or scale[1] < 1.0):
            aa = True
            min_scale = min(scale)
            support = ceil(support / min_scale)
        fov_x, dis_x, pad_x = _resize_axis(in_sz[0], out[0], scale[0], support)
        fov_y, dis_y, pad_y = _resize_axis(in_sz[1], out[1], scale[1], support)
        return cls(in_sz=in_sz, out_sz=out, scale=scale, support=support,
                   base_support=base_support, antialias=aa,
                   min_scale=min_scale, fov_x=fov_x, fov_y=fov_y,
                   dis_x=dis_x, dis_y=dis_y, pad_x=pad_x, pad_y=pad_y)


def _resize_serving_axis(in_sz: int, out_sz: int, scale: float,
                         support: int):
    """Per-axis operands for dynamic-scale serving.

    Runs the exact ``_resize_axis`` math (same grid/left/distance lines,
    resize_right2d_numpy.py:57-104), then re-expresses the gather over a
    FIXED ±1 pad: for upscaling (scale ≥ 1) at support 2 the reference's
    per-scale pads are always within {0, 1} per side (the projected grid's
    endpoints sit in ``(-1/2, 0]`` and ``[in-1, in-1/2)``), so the value at
    padded index ``j`` of the scale-dependent ``pad0``-padded plane sits at
    index ``j - pad0 + 1`` of a plane padded by exactly one row/col on each
    side — for BOTH pad modes (index 0 is the zero row under constant pad /
    the replicated first row under edge pad, exactly what ``pad0``-padding
    exposes; the unused top index ``in+1`` is only referenced when
    ``pad1 == 1``, where it exposes the matching bottom pad row).

    Returns ``(idx, dis)``: the left-neighbor index ``[out]`` into the
    ±1-padded plane (neighbor ``s`` sits at ``idx + s``) and the float64
    distances ``[out, S]`` (identical values to ``ResizeGeometry.dis_*``).
    """
    grid = (np.arange(out_sz, dtype=np.float64) / scale
            + (in_sz - 1) / 2.0 - (out_sz - 1) / (2.0 * scale))
    left = np.ceil(grid - support / 2.0 - _EPS).astype(np.int64)
    idx = left + 1
    if idx[0] != 0 or idx.min() < 0 or idx.max() + support - 1 > in_sz + 1:
        raise ValueError(
            "scale outside the ±1-frame serving envelope (upscaling only)")
    # distance arithmetic ORDER matters for float64 bit-parity with
    # ``_resize_axis``: the static path shifts grid and fov by pad0 (== 1
    # whenever idx[0] == 0, i.e. the whole upscale envelope) BEFORE
    # subtracting — ``grid - fov`` directly differs by 1 ulp at
    # non-representable grids (e.g. 1/3).
    dis = ((grid + 1.0)[:, None]
           - (idx[:, None] + np.arange(support, dtype=np.int64)[None, :]))
    return idx.astype(np.int32), dis


# distance assigned to inactive (support-bucket pad) neighbor slots: far
# enough that the float64 linear branch masks are zero and the float32
# gaussian exponent underflows, small enough that its square stays finite
# in float32 (no NaN/Inf can leak through the masked weights)
_FAR = 1.0e8


def _resize_serving_axis_aa(in_sz: int, out_sz: int, scale: float,
                            sup_true: int, sup_bucket: int, pad: int):
    """Per-axis operands for the ANY-scale serving envelope.

    Same grid/left/distance math as :func:`_resize_axis` with the true
    (anti-alias inflated) support, re-expressed over a FIXED ±``pad``
    frame: the value at index ``j`` of the scale-dependent ``pad0``-padded
    plane sits at index ``j - pad0 + pad`` of a plane padded by exactly
    ``pad`` rows/cols per side, for both pad modes (zero rows / replicated
    edge rows line up the same way as the upscale ±1 frame,
    :func:`_resize_serving_axis`).  Distances keep the static path's exact
    float64 arithmetic ORDER (shift both grid and fov by the true
    ``pad0`` before subtracting — see the 1-ulp note above).

    Neighbor slots ``s >= sup_true`` (the support-bucket padding) get
    distance :data:`_FAR` (zero weight via the linear float64 branch masks
    and the gaussian underflow) and weight-mask 0.

    Returns ``(idx [out] int32, dis [out, sup_bucket] float64,
    wmask [out, sup_bucket] float32)``.
    """
    grid = (np.arange(out_sz, dtype=np.float64) / scale
            + (in_sz - 1) / 2.0 - (out_sz - 1) / (2.0 * scale))
    left = np.ceil(grid - sup_true / 2.0 - _EPS).astype(np.int64)
    pad0 = int(-left[0])          # the static path's pad (may be negative)
    idx = left + pad
    if idx.min() < 0 or idx.max() + sup_true - 1 > in_sz + 2 * pad - 1:
        raise ValueError("scale outside the ±pad serving frame "
                         f"(support {sup_true}, pad {pad})")
    offs = np.arange(sup_true, dtype=np.int64)[None, :]
    dis_true = (grid + pad0)[:, None] - (left[:, None] + offs + pad0)
    dis = np.full((out_sz, sup_bucket), _FAR, np.float64)
    dis[:, :sup_true] = dis_true
    wmask = np.zeros((out_sz, sup_bucket), np.float32)
    wmask[:, :sup_true] = 1.0
    return idx.astype(np.int32), dis, wmask


def support_bucket(sup_true: int, floor: int = 2, cap: int = 64) -> int:
    """Smallest power of two ≥ ``sup_true`` (≥ ``floor``); raises beyond
    ``cap`` (cap 64 ⇒ anti-aliased downscales to 1/32 scale serve
    dynamically; smaller scales keep the exact per-shape path)."""
    b = floor
    while b < sup_true:
        b *= 2
    if b > cap:
        raise ValueError(f"support {sup_true} beyond the serving cap {cap}")
    return b


@dataclasses.dataclass(frozen=True)
class ResizeOperands:
    """Scale-dependent *data* (not program constants) for dynamic-scale SR
    serving (``pipeline.*.upscale_dynamic``).

    :class:`ResizeGeometry` bakes its index/distance arrays into the jitted
    program as constants, so every new ``(scale, shape)`` pays a full XLA
    compile (the periodic-slab path additionally requires the scale's
    rational period ≤ 32 — ops.resample.MAX_FOV_PERIOD).  Here every
    scale-dependent quantity has a shape fixed by ``(in_sz, out_sz)`` (and
    the support bucket) alone and is passed as a *traced input*: ONE
    compiled program serves ANY ``(scale_h, scale_w)`` at a shape pair —
    non-aligned fractional and period>32 scales included — and the
    per-scale host work is two O(out) 1-D float64 passes (resize is
    separable, so unlike the warp analog :class:`WarpOperands` no
    O(outH·outW) arrays exist at all).

    Matches the reference's arbitrary-scale serving envelope
    (eval_lut_sr.py:644-661 recomputes host ``set_shape`` per image/scale).

    :meth:`create` is the upscale deploy configuration (support 2, ±1
    frame, ``aa_scale == 1``).  :meth:`create_any` additionally serves
    anti-aliased DOWNSCALES (reference AA semantics,
    resize_right2d_numpy.py:52-55,186-193): the inflated support
    ``ceil(2/min_scale)`` rounds up to a power-of-two bucket whose pad
    slots carry zero weight, the frame pad grows to ``bucket/2 + 1``, and
    the AA kernel scale ``min_scale`` ships as a traced scalar — so one
    program per ``(in_sz, out_sz, support_bucket)`` serves every scale in
    the bucket, bit-equal to the per-shape AA path
    (tests/test_dynamic_resize.py).
    """
    in_sz: tuple
    out_sz: tuple
    support: int         # serving support bucket (2 = upscale deploy form)
    idx_x: np.ndarray    # [outH] int32 left-neighbor row into ±pad plane
    idx_y: np.ndarray    # [outW] int32
    dis_x: np.ndarray    # [outH, S] float64
    dis_y: np.ndarray    # [outW, S] float64
    pad: int = 1         # fixed frame pad per side
    aa_scale: float = 1.0          # min(scale) when anti-aliasing, else 1
    wmask_x: np.ndarray = None     # [outH, S] float32 0/1 — AA only
    wmask_y: np.ndarray = None     # [outW, S]

    @classmethod
    def create(cls, in_sz: Sequence[int], scale_factors=None, out_sz=None,
               support: int = 2):
        in_sz = tuple(int(s) for s in in_sz)
        scale, out = resolve_scale_and_out_sz(in_sz, scale_factors, out_sz)
        if support != 2:
            raise ValueError("dynamic resize serving is support-2 only")
        if scale[0] < 1.0 or scale[1] < 1.0:
            raise ValueError("dynamic resize serving is upscale-only "
                             "(anti-aliased downscale inflates support; "
                             "use create_any)")
        idx_x, dis_x = _resize_serving_axis(in_sz[0], out[0], scale[0],
                                            support)
        idx_y, dis_y = _resize_serving_axis(in_sz[1], out[1], scale[1],
                                            support)
        return cls(in_sz=in_sz, out_sz=out, support=support,
                   idx_x=idx_x, idx_y=idx_y, dis_x=dis_x, dis_y=dis_y)

    @classmethod
    def create_any(cls, in_sz: Sequence[int], scale_factors=None,
                   out_sz=None, support: int = 2, sup_cap: int = 64):
        """Any-scale operands: upscales via :meth:`create`; downscale (or
        mixed) axes via the anti-aliased support-bucket frame."""
        in_sz = tuple(int(s) for s in in_sz)
        scale, out = resolve_scale_and_out_sz(in_sz, scale_factors, out_sz)
        if support != 2:
            raise ValueError("dynamic resize serving is support-2 only")
        if scale[0] >= 1.0 and scale[1] >= 1.0:
            # pass the RESOLVED scale through, not just out_sz: re-deriving
            # scale as out/in differs from a requested fractional scale
            # (out is its ceil), which would silently shift idx/dis vs
            # `create` at the same request
            return cls.create(in_sz, scale_factors=list(scale), out_sz=out,
                              support=support)
        # the reference inflates support GLOBALLY by the min axis scale and
        # evaluates kernels at min_scale-scaled distances on BOTH axes
        # (resize_right2d_numpy.py:52-55,186-193)
        m = min(scale)
        sup_true = ceil(support / m)
        bucket = support_bucket(sup_true, floor=2 * support, cap=sup_cap)
        pad = bucket // 2 + 1
        idx_x, dis_x, wm_x = _resize_serving_axis_aa(
            in_sz[0], out[0], scale[0], sup_true, bucket, pad)
        idx_y, dis_y, wm_y = _resize_serving_axis_aa(
            in_sz[1], out[1], scale[1], sup_true, bucket, pad)
        return cls(in_sz=in_sz, out_sz=out, support=bucket,
                   idx_x=idx_x, idx_y=idx_y, dis_x=dis_x, dis_y=dis_y,
                   pad=pad, aa_scale=m, wmask_x=wm_x, wmask_y=wm_y)

    def for_bucket(self, in_bucket: Sequence[int], out_bucket: Sequence[int]):
        """Re-express the operands for bucket-shaped program frames — fully
        recompile-free SR serving (``upscale_dynamic`` with
        ``granularity > 0``).

        The indices/distances keep the TRUE geometry semantics; only the
        array SHAPES move to the bucket frame: output rows/cols beyond the
        true output gather plane index 0 with distance 0 (garbage outputs,
        host-cropped), and the input axis needs nothing at all — true
        indices never reach the bucket's pad rows because the serving
        callers zero-mask (image) / re-clamp (hyper) beyond the valid
        region, which reproduces the true plane's own ±1 pad rows.  The
        program key becomes ``(in_bucket, out_bucket)`` — independent of
        the image shape, the output shape, and the scale.
        """
        if self.aa_scale < 1.0:
            # the ±1-frame zero-mask/re-clamp argument above is specific
            # to the upscale form; AA requests serve granularity-0
            # (pipeline._dyn_resize_host forces it)
            raise ValueError("bucketed frames are upscale-only")
        hb, wb = (int(v) for v in in_bucket)
        ohb, owb = (int(v) for v in out_bucket)
        if (hb < self.in_sz[0] or wb < self.in_sz[1]
                or ohb < self.out_sz[0] or owb < self.out_sz[1]):
            raise ValueError("bucket smaller than the true shapes")
        padx = (0, ohb - self.out_sz[0])
        pady = (0, owb - self.out_sz[1])
        return dataclasses.replace(
            self,
            idx_x=np.pad(self.idx_x, padx), idx_y=np.pad(self.idx_y, pady),
            dis_x=np.pad(self.dis_x, (padx, (0, 0))),
            dis_y=np.pad(self.dis_y, (pady, (0, 0))))


def _warp_grid(matrix: np.ndarray, in_sz, out_sz):
    """Inverse-homography projected grid, float64.

    Parity: resize_right2d_numpy.py:306-342 — build output pixel coords,
    flip (h,w)->(x,y), multiply by inv(matrix) with homogeneous divide, flip
    back, clip to ``[0, in_sz]`` (note: inclusive upper bound ``in_sz``,
    not ``in_sz-1`` — reference line 338).
    Returns grid_x, grid_y of shape [outH, outW].
    """
    oh, ow = out_sz
    inv = np.linalg.inv(np.asarray(matrix, dtype=np.float64))
    # (x, y) order for the homography: x = width coord, y = height coord.
    # src[i] = inv[i,0]·x + inv[i,1]·y + inv[i,2] is rank-1 per component —
    # evaluate as 1-D outer sums instead of a [3, oh·ow] dgemm (the matmul
    # form built ~180 MB of intermediates at 1440p and dominated the
    # dynamic-warp serving host cost; values agree to float64 ULP).
    xs = np.arange(ow, dtype=np.float64)           # width coord, per column
    ys = np.arange(oh, dtype=np.float64)[:, None]  # height coord, per row
    den = (inv[2, 0] * xs + inv[2, 2]) + inv[2, 1] * ys
    src_x = ((inv[0, 0] * xs + inv[0, 2]) + inv[0, 1] * ys) / den
    src_y = ((inv[1, 0] * xs + inv[1, 2]) + inv[1, 1] * ys) / den
    grid_x = src_y.clip(0, in_sz[0])  # row coordinate
    grid_y = src_x.clip(0, in_sz[1])  # col coordinate
    return grid_x, grid_y


def _warp_axis(grid: np.ndarray, in_sz: int, support: int):
    """FOV / clamped pad / clipped indices / distances for one warp axis.

    Parity: resize_right2d_numpy.py:344-407.  Pad is clamped non-negative
    (line 365) and the field of view is clipped to the *unpadded* input
    bounds ``[0, in_sz-1]`` AFTER the pad offset is applied (line 397) —
    out-of-view gathers land on arbitrary in-range pixels and are later
    suppressed by near-zero weights / the validity mask.  Reproduced as-is.
    """
    left = np.ceil(grid - support / 2.0 - _EPS).astype(np.int64)
    fov = left[..., None] + np.arange(support, dtype=np.int64)
    pad0 = int(max(-fov[0, 0, 0], 0))
    pad1 = int(max(fov[-1, -1, -1] - in_sz + 1, 0))
    fov = fov + pad0
    fov_clipped = fov.clip(0, in_sz - 1)
    dis = (grid[..., None] + pad0) - fov_clipped
    return fov_clipped.astype(np.int32), dis, (pad0, pad1)


@dataclasses.dataclass(frozen=True)
class WarpGeometry:
    """Static geometry for one (in_shape, homography, out_shape) config."""
    in_sz: tuple
    out_sz: tuple
    support: int
    fov_x: np.ndarray    # [outH, outW, S] int32 row candidates (clipped)
    fov_y: np.ndarray    # [outH, outW, S] int32 col candidates (clipped)
    lin_idx: np.ndarray  # [S, S, outH, outW] int32 flat indices into padded
                         # img — support axes LEADING so device results are
                         # [..., S, S, outH, outW] (trailing dims large; the
                         # trailing-(S,S) layout pads 2→(8,128) tiles, a
                         # 256× HBM blowup)
    dis_x: np.ndarray    # [outH, outW, S] float64
    dis_y: np.ndarray    # [outH, outW, S] float64
    pad_x: tuple         # (top, bottom) >= 0
    pad_y: tuple         # (left, right) >= 0

    @property
    def padded_sz(self):
        return (self.in_sz[0] + self.pad_x[0] + self.pad_x[1],
                self.in_sz[1] + self.pad_y[0] + self.pad_y[1])

    @classmethod
    def create(cls, in_sz: Sequence[int], matrix, out_sz: Sequence[int],
               support: int = 2):
        in_sz = tuple(int(s) for s in in_sz)
        out_sz = tuple(int(s) for s in out_sz)
        grid_x, grid_y = _warp_grid(matrix, in_sz, out_sz)
        fov_x, dis_x, pad_x = _warp_axis(grid_x, in_sz[0], support)
        fov_y, dis_y, pad_y = _warp_axis(grid_y, in_sz[1], support)
        wp = in_sz[1] + pad_y[0] + pad_y[1]
        lin = (fov_x[:, :, :, None].astype(np.int64) * wp
               + fov_y[:, :, None, :].astype(np.int64))   # [oh, ow, S, S]
        lin = lin.transpose(2, 3, 0, 1)                    # [S, S, oh, ow]
        return cls(in_sz=in_sz, out_sz=out_sz, support=support,
                   fov_x=fov_x, fov_y=fov_y,
                   lin_idx=np.ascontiguousarray(lin).astype(np.int32),
                   dis_x=dis_x, dis_y=dis_y, pad_x=pad_x, pad_y=pad_y)


def _serving_axis(grid: np.ndarray, in_sz: int, support: int):
    """Per-axis operands for dynamic-homography serving.

    Runs the exact ``_warp_axis`` math (same left/pad/clip/distance lines),
    then re-expresses the clipped gather over a FIXED ±1 pad: the reference
    gathers ``padded[clip(j, 0, in-1)]`` at ring position ``j`` of a plane
    padded by the matrix-dependent ``pad0`` (≤1 at support 2, since the
    projected grid is pre-clipped to ``[0, in]``); over a plane padded by
    exactly one row/col on each side the same value sits at index
    ``clip(j, 0, in-1) - pad0 + 1`` — for BOTH pad modes, because index 0
    is the zero row (constant pad / image) or the replicated first row
    (edge pad / hyper maps), exactly what ``pad0``-padding exposes.

    Returns ``(corner, ring, dis)``: the per-output-pixel corner ring
    position ``[oh, ow]``, the ring map ``[in+4]`` into the ±1-padded
    plane, and the float64 distances ``[oh, ow, S]`` (identical values to
    ``WarpGeometry.dis_*``).
    """
    # ``left`` stays float64: ceil output is integral, and the per-neighbor
    # offset/pad/clip arithmetic on small integers is exact in float64, so
    # the distances match the int64-materialized form bit-for-bit while
    # skipping the [oh, ow, S] int64 intermediates (host serving cost).
    left = np.ceil(grid - support / 2.0 - _EPS)
    pad0 = int(max(-int(left.flat[0]), 0))
    shifted = grid + pad0
    dis = np.empty(grid.shape + (support,), np.float64)
    tmp = np.empty_like(grid)
    for j in range(support):
        np.add(left, j + pad0, out=tmp)
        np.clip(tmp, 0, in_sz - 1, out=tmp)
        np.subtract(shifted, tmp, out=dis[..., j])
    corner = (left + (pad0 + 1)).astype(np.int64)  # ring pos of neighbor 0
    q = np.arange(in_sz + 4, dtype=np.int64)
    ring = np.clip(q - 1, 0, in_sz - 1) - pad0 + 1
    return corner, ring.astype(np.int32), dis


@dataclasses.dataclass(frozen=True)
class WarpOperands:
    """Matrix-dependent *data* (not program constants) for dynamic-warp
    serving (``pipeline.LutPredictor.warp_dynamic``).

    :class:`WarpGeometry` bakes its index/distance arrays into the jitted
    program as constants, so every new homography pays a full XLA gather
    compile.  Here every matrix-dependent quantity has a shape fixed by
    ``(in_sz, out_sz)`` alone and is passed as a *traced input* — ONE
    compiled program serves every homography at a given shape pair, and the
    per-matrix work is this host-side float64 precompute (the same math as
    ``WarpGeometry.create``; bit-equal outputs, tests/test_dynamic_warp.py).
    """
    in_sz: tuple
    out_sz: tuple
    support: int         # always 2 — the deploy configuration
    ring_x: np.ndarray   # [inH+4] int32 row map into the ±1-padded planes
    ring_y: np.ndarray   # [inW+4] int32 col map
    corner: np.ndarray   # [N] int32 flat corner index, N = outH·outW
    dis_x: np.ndarray    # [N, S] float64 neighbor distances
    dis_y: np.ndarray    # [N, S] float64

    @classmethod
    def create(cls, in_sz: Sequence[int], matrix, out_sz: Sequence[int],
               support: int = 2):
        in_sz = tuple(int(s) for s in in_sz)
        out_sz = tuple(int(s) for s in out_sz)
        grid_x, grid_y = _warp_grid(matrix, in_sz, out_sz)
        return cls.from_grid(grid_x, grid_y, in_sz, out_sz, support)

    @classmethod
    def from_grid(cls, grid_x, grid_y, in_sz, out_sz, support: int = 2):
        """Build from a precomputed projection grid — the grid is the
        dominant host cost at large outputs, so serving callers compute it
        once and share it with the validity-mask precompute
        (``ops.resample.warp_serving_host``)."""
        if support != 2:
            raise ValueError("dynamic warp serving is support-2 only")
        cx, ring_x, dis_x = _serving_axis(grid_x, in_sz[0], support)
        cy, ring_y, dis_y = _serving_axis(grid_y, in_sz[1], support)
        n = out_sz[0] * out_sz[1]
        # packed-operand spatial shape is (inH+3, inW+3) — ring length - 1
        corner = cx.astype(np.int64) * (in_sz[1] + 3) + cy
        return cls(in_sz=tuple(in_sz), out_sz=tuple(out_sz), support=support,
                   ring_x=ring_x, ring_y=ring_y,
                   corner=corner.reshape(n).astype(np.int32),
                   dis_x=dis_x.reshape(n, support),
                   dis_y=dis_y.reshape(n, support))

    def for_bucket(self, in_bucket: Sequence[int], n_bucket: int):
        """Re-express these operands for bucket-shaped program frames —
        fully recompile-free warp serving (pipeline ``warp_dynamic`` with
        ``granularity > 0``).

        The rings/corner/distances keep the TRUE ``in_sz``/``out_sz``
        semantics (so gathers never touch the bucket's pad rows and the
        weights are unchanged); only the array SHAPES move to the bucket
        frame: rings edge-pad to ``in_bucket + 4`` (positions beyond the
        true ring are unreachable — corners are ≤ in+1), the corner index
        re-strides for the bucket's packed-operand width and zero-pads to
        ``n_bucket`` rows (garbage outputs, host-cropped), and the
        distances zero-pad likewise.  The program key becomes
        ``(in_bucket, n_bucket)`` — independent of the image shape, the
        output shape, and the matrix.
        """
        hb, wb = (int(v) for v in in_bucket)
        n = self.corner.shape[0]
        if hb < self.in_sz[0] or wb < self.in_sz[1] or n_bucket < n:
            raise ValueError("bucket smaller than the true shapes")
        ring_x = np.pad(self.ring_x, (0, hb - self.in_sz[0]), mode="edge")
        ring_y = np.pad(self.ring_y, (0, wb - self.in_sz[1]), mode="edge")
        # corner = cx·(inW+3) + cy  →  re-stride for the bucket width
        cx, cy = np.divmod(self.corner.astype(np.int64), self.in_sz[1] + 3)
        corner = np.pad(cx * (wb + 3) + cy, (0, n_bucket - n))
        pad = ((0, n_bucket - n), (0, 0))
        return dataclasses.replace(
            self, ring_x=ring_x, ring_y=ring_y,
            corner=corner.astype(np.int32),
            dis_x=np.pad(self.dis_x, pad), dis_y=np.pad(self.dis_y, pad))
