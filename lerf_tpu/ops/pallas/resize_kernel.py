"""Fused steerable-Gaussian resize as a Pallas TPU kernel.

STATUS — validated, then retired with data (BASELINE.md "Pallas resize
kernel"): compiled on real hardware and bit-exact vs the XLA path
(max_abs_err 0.0 at 360×640×4), but measured SLOWER under chained
steady-state timing (5.53 ms vs XLA 4.29 ms at 360×640→×4), and the
whole-input-per-tile VMEM plan exceeds the 16 MB scoped limit at
720×1280.  For periodic geometries the XLA path is already gather-free
(static strided slices fused with the weight math), so this kernel has no
DMA advantage to recover.  It is kept as a hardware-proven reference
implementation (tests/test_pallas.py; on-chip parity gated on
LERF_TPU_TESTS=1) and is NOT dispatched by the production ops.

One kernel fuses, per VMEM-resident output row tile: periodic neighbor
selection (static strided slices — no gathers, no index tensors), hyper-map
decode, anisotropic-Gaussian weighting, window normalization and
accumulation.  The S²-neighbor lattice that the XLA path expresses as
HBM-level arrays never exists here; everything between the padded source
rows and the output tile stays in VMEM.

Scope: periodic geometries (any rational scale p/q with the FOV pattern of
``lerf_tpu.ops.resample._periodic_fov``), support 2 — the LeRF deploy
configuration.  Arbitrary scales use the XLA path
(:func:`lerf_tpu.ops.steering_gaussian_resize`), which this kernel matches
(parity-tested in tests/test_pallas.py).

Mosaic constraint: dynamic second-minor loads must be 8-aligned, so each
tile loads one aligned source block (tile stride (T/p)·q forced to a
multiple of 8, output rows padded up to a whole number of tiles) and all
phase/support offsets are static slices within the loaded block.

Reference semantics: ``SteeringGaussianResize2dNumpy.resize``
(resize_right/resize_right2d_numpy.py:162-223).
"""
from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import ResizeGeometry
from ..resample import _periodic_fov, pad2d


def _pick_tile(oh: int, p: int, q: int, ow: int,
               vmem_budget: int = 4 << 20):
    """Tile height T (multiple of p, source stride (T/p)·q ≡ 0 mod 8) and
    the padded output height (whole number of tiles)."""
    base = p * (8 // gcd(q, 8))
    max_t = max(base, (vmem_budget // (ow * 4)) // base * base)
    t = min(max_t, ((oh + base - 1) // base) * base)
    # prefer a T that divides oh exactly to avoid padding
    for cand in range(t, base - 1, -base):
        if oh % cand == 0:
            return cand, oh
    oh_pad = ((oh + t - 1) // t) * t
    return t, oh_pad


def _kernel(x_ref, rho_ref, sx_ref, sy_ref, o_ref, *, px, py, dis_x, dis_y,
            rows_per_tile, block_rows, max_sigma):
    """Compute one phase-blocked [p1, p2, T/p1, OW/p2] output tile for one
    channel.  Phase interleaving to [T, OW] happens outside the kernel
    (Mosaic has no lane-merging shape cast)."""
    p1, qx, ex = px
    p2, qy, ey = py
    S = ex.shape[1]
    T = rows_per_tile
    m1 = T // p1
    m2 = o_ref.shape[4]

    i = pl.program_id(1)
    row0 = pl.multiple_of(i * (m1 * qx), 8)

    # one aligned load per input, covering every phase/support offset
    blocks = [ref[0, pl.ds(row0, block_rows), :]
              for ref in (x_ref, rho_ref, sx_ref, sy_ref)]

    span = (m1 - 1) * qx + 1

    def rows(b, k1, s):
        off = int(ex[k1, s])
        blk = b[off:off + span]
        return blk[::qx] if qx > 1 else blk

    for k1 in range(p1):
        xr, rr, sxr, syr = (rows(b, k1, 0) for b in blocks)
        xr2, rr2, sxr2, syr2 = (rows(b, k1, 1) for b in blocks) \
            if S > 1 else (None,) * 4
        per_s = [(xr, rr, sxr, syr)] + ([(xr2, rr2, sxr2, syr2)]
                                        if S > 1 else [])
        for k2 in range(p2):
            wn = None
            ws = None
            for s, (xs, rs, sxs, sys_) in enumerate(per_s):
                dx = float(dis_x[k1, s])
                for t in range(S):
                    sl = slice(int(ey[k2, t]),
                               int(ey[k2, t]) + (m2 - 1) * qy + 1, qy)
                    xc = xs[:, sl]
                    rho = rs[:, sl] * 2.0 - 1.0
                    sxv = sxs[:, sl] * max_sigma
                    syv = sys_[:, sl] * max_sigma
                    dy = float(dis_y[k2, t])
                    xn = (sxv * dx) ** 2
                    yn = (syv * dy) ** 2
                    xy = sxv * dx * syv * dy
                    w = jnp.exp(-0.5 * (xn - 2.0 * rho * xy + yn))
                    wn = w * xc if wn is None else wn + w * xc
                    ws = w if ws is None else ws + w
            o_ref[0, k1, k2, :, :] = wn / ws           # [m1, m2]


def steering_gaussian_resize_pallas(img, rho, sigma_x, sigma_y,
                                    geom: ResizeGeometry, *,
                                    max_sigma: float = 10.0,
                                    pad_mode: str = "constant",
                                    interpret: bool = False):
    """Pallas fused steerable resize (periodic scales, img [C, H, W])."""
    px = _periodic_fov(geom.fov_x, geom.out_sz[0], geom.scale[0])
    py = _periodic_fov(geom.fov_y, geom.out_sz[1], geom.scale[1])
    if px is None or py is None:
        raise ValueError("non-periodic geometry; use the XLA path")
    if geom.antialias:
        raise NotImplementedError("anti-aliased downscale uses the XLA path")

    p1, qx, ex = px
    p2, qy, ey = py
    dis_x = geom.dis_x[:p1]            # exact periodic patterns [p, S]
    dis_y = geom.dis_y[:p2]

    xpad = pad2d(img, geom.pad_x, geom.pad_y, pad_mode)
    rhop = pad2d(rho, geom.pad_x, geom.pad_y, "edge")
    sxp = pad2d(sigma_x, geom.pad_x, geom.pad_y, "edge")
    syp = pad2d(sigma_y, geom.pad_x, geom.pad_y, "edge")

    C = img.shape[0]
    oh, ow = geom.out_sz
    T, oh_pad = _pick_tile(oh, p1, qx, ow)
    m1 = T // p1
    block_rows = (m1 - 1) * qx + int(ex.max()) + 1

    # enough source rows for the last (padded) tile's aligned block
    need_rows = (oh_pad // T - 1) * (m1 * qx) + block_rows
    extra = need_rows - xpad.shape[-2]
    if extra > 0:
        cfg = [(0, 0)] * (xpad.ndim - 2) + [(0, extra), (0, 0)]
        xpad = jnp.pad(xpad, cfg, mode="edge")
        rhop = jnp.pad(rhop, cfg, mode="edge")
        sxp = jnp.pad(sxp, cfg, mode="edge")
        syp = jnp.pad(syp, cfg, mode="edge")

    hp, wp = xpad.shape[-2], xpad.shape[-1]
    kern = functools.partial(
        _kernel, px=px, py=py, dis_x=dis_x, dis_y=dis_y,
        rows_per_tile=T, block_rows=block_rows, max_sigma=float(max_sigma))

    in_spec = pl.BlockSpec((1, hp, wp), lambda c, i: (c, 0, 0),
                           memory_space=pltpu.VMEM)
    m1 = T // p1
    m2 = ow // p2
    out = pl.pallas_call(
        kern,
        grid=(C, oh_pad // T),
        in_specs=[in_spec] * 4,
        out_specs=pl.BlockSpec((1, p1, p2, m1, m2),
                               lambda c, i: (c, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (C, p1, p2, oh_pad // p1, m2), img.dtype),
        interpret=interpret,
    )(xpad, rhop, sxp, syp)
    # phase interleave: [C, p1, p2, ohp/p1, ow/p2] → [C, ohp, ow]
    out = out.transpose(0, 3, 1, 4, 2).reshape(C, oh_pad, ow)
    return out[:, :oh, :]