"""Spatial (image-tile) parallelism — the sequence-parallel analog.

The reference has no equivalent (single-GPU images).  For very large
outputs, the output grid is sharded across the mesh along the output-row
axis: the (small) source image and hyper maps are replicated, the per-row
geometry arrays (field-of-view rows + distances) are sharded, and each chip
computes only its slab of output rows.  For upscaling the input is a small
fraction of the output, so replicating it costs far less than the output
bandwidth saved; no halo exchange is needed because every chip gathers from
the full replicated source.

Implementation: ``shard_map`` over a 1-D mesh; geometry enters as device
arrays (sharded on the row axis) instead of trace-time constants.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.geometry import ResizeGeometry
from ..ops.resample import decode_gaussian_hyper, pad2d, \
    steering_gaussian_weight
from .mesh import DATA_AXIS


def _resize_local(xpad, rhop, sxp, syp, fov_x, dis_x, fov_y, dis_y,
                  support: int, aa_scale: float):
    """One shard's slab: gather its output rows from the replicated padded
    source, per support offset (every read contiguous — no stride-S lane
    relayouts).  fov_x/dis_x: [S, local_outH]; fov_y/dis_y: [S, outW]."""
    wn = None
    ws = None
    for s in range(support):
        rows = {k: jnp.take(z, fov_x[s], axis=-2)
                for k, z in (("x", xpad), ("r", rhop), ("sx", sxp),
                             ("sy", syp))}
        dx = (aa_scale * dis_x[s])[:, None]
        for t in range(support):
            g = {k: jnp.take(z, fov_y[t], axis=-1)
                 for k, z in rows.items()}
            dy = (aa_scale * dis_y[t])[None, :]
            w = steering_gaussian_weight(g["r"], g["sx"], g["sy"], dx, dy)
            if aa_scale != 1.0:
                w = aa_scale * w
            wn = w * g["x"] if wn is None else wn + w * g["x"]
            ws = w if ws is None else ws + w
    return wn / ws


def _replicate_once(mesh, *planes):
    """Move the row-sharded stage outputs to every chip with ONE input-sized
    all-gather: stack the planes, constrain the stack replicated, slice
    locally.  Passed separately, XLA inserts one all-gather per plane —
    4× the collective launches for the same bytes (the structure the
    all-gather-count pins in tests/test_spatial.py and __graft_entry__
    guard).  All planes are cast to float32 (every consumer decodes unit
    floats / rounds exactly back to u8 codes — ops.resample._encode_u8)."""
    stacked = jnp.stack([jnp.asarray(p, jnp.float32) for p in planes])
    stacked = jax.lax.with_sharding_constraint(
        stacked, NamedSharding(mesh, P()))
    return tuple(stacked[i] for i in range(len(planes)))


def _pad_rows(arr, axis: int, n: int):
    """Edge-pad ``axis`` up to a multiple of n (duplicated geometry rows —
    the extra output rows are computed redundantly and cropped after)."""
    size = arr.shape[axis]
    extra = (-size) % n
    if extra == 0:
        return arr, size
    cfg = [(0, 0)] * arr.ndim
    cfg[axis] = (0, extra)
    return jnp.pad(arr, cfg, mode="edge"), size


def steering_gaussian_resize_sharded(img, rho, sigma_x, sigma_y,
                                     geom: ResizeGeometry, mesh, *,
                                     max_sigma: float = 10.0,
                                     axis: str = DATA_AXIS,
                                     pad_mode: str = "constant"):
    """Row-sharded steerable resize: output [..., outH, outW] sharded on
    outH across ``mesh``.  Non-divisible outH is handled by duplicating the
    last row's geometry up to a multiple of the mesh size and cropping."""
    n = mesh.devices.size
    oh, ow = geom.out_sz
    S = geom.support

    rho, sigma_x, sigma_y = decode_gaussian_hyper(rho, sigma_x, sigma_y,
                                                  max_sigma)
    xpad = pad2d(img, geom.pad_x, geom.pad_y, pad_mode)
    rhop = pad2d(rho, geom.pad_x, geom.pad_y, "edge")
    sxp = pad2d(sigma_x, geom.pad_x, geom.pad_y, "edge")
    syp = pad2d(sigma_y, geom.pad_x, geom.pad_y, "edge")

    aa = geom.min_scale if geom.antialias else 1.0
    fov_x, _ = _pad_rows(jnp.asarray(geom.fov_x.T.copy()), 1, n)  # [S, oh']
    dis_x, _ = _pad_rows(jnp.asarray(geom.dis_x.T.copy(), img.dtype), 1, n)
    fov_y = jnp.asarray(geom.fov_y.T.copy())             # [S, ow]
    dis_y = jnp.asarray(geom.dis_y.T.copy(), img.dtype)

    fn = partial(_resize_local, support=S, aa_scale=float(aa))
    shardmapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, axis), P(None, axis),
                  P(), P()),
        out_specs=P(*([None] * (img.ndim - 2) + [axis, None])))
    out = shardmapped(xpad, rhop, sxp, syp, fov_x, dis_x, fov_y, dis_y)
    return out[..., :oh, :]


def sharded_out_sharding(mesh, ndim: int, axis: str = DATA_AXIS):
    """NamedSharding matching the sharded resize output (rows split)."""
    spec = [None] * ndim
    spec[-2] = axis
    return NamedSharding(mesh, P(*spec))


def _warp_local(xpad, rhop, sxp, syp, lin_idx, dis_x, dis_y, support: int):
    """One shard's slab of warped output rows.  lin_idx: [S,S,local_oh,ow]
    flat indices into the replicated padded source; dis: [S,local_oh,ow]."""
    lead = xpad.shape[:-2]
    n_lead = 1
    for d in lead:
        n_lead *= d
    hw = xpad.shape[-2] * xpad.shape[-1]

    def gather(z):
        idx = lin_idx.reshape(-1)
        if n_lead > 1:
            offs = (jnp.arange(n_lead, dtype=idx.dtype) * hw)[:, None]
            idx = (idx[None, :] + offs).reshape(-1)
        out = jnp.take(z.reshape(-1), idx, axis=0)
        return out.reshape(lead + lin_idx.shape)

    dx = dis_x[:, None]
    dy = dis_y[None, :]
    w = steering_gaussian_weight(gather(rhop), gather(sxp), gather(syp),
                                 dx, dy)
    acc = jnp.sum(w * gather(xpad), axis=(-4, -3))
    return acc / jnp.sum(w, axis=(-4, -3))


def steering_gaussian_warp_sharded(img, rho, sigma_x, sigma_y, geom, mesh, *,
                                   max_sigma: float = 10.0,
                                   axis: str = DATA_AXIS,
                                   pad_mode: str = "constant"):
    """Output-row-sharded homographic warp: the (small) source and hyper
    maps are replicated; the per-pixel gather indices and distances are
    sharded on the output-row axis.  Non-divisible outH is padded with
    duplicated last-row geometry and cropped after."""
    from ..ops.resample import decode_gaussian_hyper as _dec, pad2d as _pad

    n = mesh.devices.size
    oh, ow = geom.out_sz

    rho, sigma_x, sigma_y = _dec(rho, sigma_x, sigma_y, max_sigma)
    xpad = _pad(img, geom.pad_x, geom.pad_y, pad_mode)
    rhop = _pad(rho, geom.pad_x, geom.pad_y, "edge")
    sxp = _pad(sigma_x, geom.pad_x, geom.pad_y, "edge")
    syp = _pad(sigma_y, geom.pad_x, geom.pad_y, "edge")

    lin, _ = _pad_rows(jnp.asarray(geom.lin_idx), 2, n)      # [S,S,oh',ow]
    dx, _ = _pad_rows(jnp.asarray(geom.dis_x.transpose(2, 0, 1), img.dtype),
                      1, n)                                  # [S,oh',ow]
    dy, _ = _pad_rows(jnp.asarray(geom.dis_y.transpose(2, 0, 1), img.dtype),
                      1, n)

    fn = partial(_warp_local, support=geom.support)
    shardmapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, None, axis, None),
                  P(None, axis, None), P(None, axis, None)),
        out_specs=P(*([None] * (img.ndim - 2) + [axis, None])))
    out = shardmapped(xpad, rhop, sxp, syp, lin, dx, dy)
    return out[..., :oh, :]


# ---------------------------------------------------------------------------
# full sharded SR pipeline: input-row-sharded stages + row-sharded resize
# ---------------------------------------------------------------------------


def _two_stage_band_sharded(img, operands, stage1_fn, stage2_fn, mesh,
                            axis: str = DATA_AXIS):
    """Generic input-row-sharded two-stage ensemble execution.

    The stage ensembles are the dominant deploy cost and scale with INPUT
    pixels, so each device computes them for its band of input rows.  The
    input is replicated (it is small — for upscaling the output dwarfs it),
    so the band + halo is a local dynamic slice: no explicit communication
    at all.  The halo is ``MAX_PAD`` per chained stage (3 rows for stage
    1's sampling + 3 more so every feat row that stage 2 samples is exact);
    at true image borders the band edge-pad equals the full image's, so the
    sharded result is BIT-IDENTICAL to single-device (tests/test_spatial.py).

    ``stage1_fn(band, operands) -> feat`` (row axis -2) and
    ``stage2_fn(feat_band, operands) -> hyper`` (row axis -3) must be
    3-row-local per chained ensemble (true for both the LUT simplex
    ensembles and the micro-net pixel-MLP ensembles — both sample via the
    same ``MAX_PAD`` replicate padding).  Returns (feat, hyper) row-sharded
    over ``mesh``, cropped to the true height.
    """
    from ..ops.lut_pipeline import MAX_PAD

    n = mesh.devices.size
    h = img.shape[-2]
    hp = -(-h // n) * n
    if hp != h:
        cfg = [(0, 0)] * (img.ndim - 2) + [(0, hp - h), (0, 0)]
        img = jnp.pad(img, cfg, mode="edge")
    rows = hp // n
    halo = 2 * MAX_PAD
    band = min(rows + 2 * halo, hp)

    def local(img_rep, ops_rep):
        i = jax.lax.axis_index(axis)
        r0 = i * rows
        lo = jnp.clip(r0 - halo, 0, hp - band)
        sl = jax.lax.dynamic_slice_in_dim(img_rep, lo, band, axis=-2)
        feat_b = stage1_fn(sl, ops_rep)
        # Rows past the true image bottom must replicate feat(h-1): the
        # reference pads BETWEEN the stages, and feat of an edge-padded
        # image is not the edge-pad of feat (one-level padding commutes
        # with the ensemble, two chained levels do not).
        idx = jnp.minimum(jnp.arange(band), h - 1 - lo)
        feat_b = jnp.take(feat_b, idx, axis=-2)
        hyper_b = stage2_fn(feat_b, ops_rep)
        off = r0 - lo
        feat = jax.lax.dynamic_slice_in_dim(feat_b, off, rows, axis=-2)
        hyper = jax.lax.dynamic_slice_in_dim(hyper_b, off, rows, axis=-3)
        return feat, hyper

    row_spec = [None] * img.ndim
    row_spec[-2] = axis
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(*row_spec), P(*(row_spec + [None]))))
    feat, hyper = fn(img, operands)
    return feat[..., :h, :], hyper[..., :h, :, :]


def lut_stages_sharded(img, tables1, tables2, modes, mesh, *,
                       modes2=None, axis: str = DATA_AXIS,
                       interval: int = 4, norm: int = 255):
    """Input-row-sharded LUT stage ensembles (see
    :func:`_two_stage_band_sharded` for the band/halo structure —
    bit-identical to single-device,
    tests/test_spatial.py::test_sharded_lut_stages_bit_exact).

    ``modes2`` defaults to ``modes`` (stage-2 banks may use a different
    mode set — TestConfig.modes2).  Returns (feat, hyper) row-sharded over
    ``mesh`` (cropped to H).
    """
    from ..ops.lut_pipeline import lut_stage1, lut_stage2

    if modes2 is None:
        modes2 = modes

    def s1(band, ops):
        return lut_stage1(band, ops[0], modes, interval=interval, norm=norm)

    def s2(feat_band, ops):
        return lut_stage2(feat_band, ops[1], modes2, interval=interval,
                          norm=norm)

    return _two_stage_band_sharded(img, (tables1, tables2), s1, s2, mesh,
                                   axis)


def sharded_lut_sr_pipeline(img, tables1, tables2, modes,
                            geom: ResizeGeometry, mesh, *,
                            modes2=None, max_sigma: float = 10.0,
                            norm: int = 255, interval: int = 4,
                            axis: str = DATA_AXIS):
    """Complete multi-chip LeRF-G SR: row-sharded stage ensembles →
    row-sharded steerable resize.  The only collective is the all-gather of
    the (input-sized) feat/hyper slabs that XLA inserts to satisfy the
    resize's replicated-source spec — a tiny transfer next to the sharded
    output writes.  Returns the full ``geom.out_sz`` output (the sharded
    resize pads rows to a mesh multiple internally and crops before
    returning)."""
    from ..ops.lut_pipeline import split_gaussian_hyper

    feat, hyper = lut_stages_sharded(img, tables1, tables2, modes, mesh,
                                     modes2=modes2, axis=axis,
                                     interval=interval, norm=norm)
    rho, sx, sy = split_gaussian_hyper(hyper, norm)
    feat, rho, sx, sy = _replicate_once(mesh, feat, rho, sx, sy)
    return steering_gaussian_resize_sharded(
        feat, rho, sx, sy, geom, mesh, max_sigma=max_sigma, axis=axis)


def sharded_lut_warp_pipeline(img, tables1, tables2, modes,
                              geom, mesh, *, modes2=None,
                              max_sigma: float = 10.0,
                              norm: int = 255, interval: int = 4,
                              axis: str = DATA_AXIS):
    """Multi-chip homographic warp: row-sharded stage ensembles →
    output-row-sharded warp (replicated feat/hyper source, sharded
    per-pixel indices/distances).  Same communication structure as
    :func:`sharded_lut_sr_pipeline`."""
    from ..ops.lut_pipeline import split_gaussian_hyper

    feat, hyper = lut_stages_sharded(img, tables1, tables2, modes, mesh,
                                     modes2=modes2, axis=axis,
                                     interval=interval, norm=norm)
    rho, sx, sy = split_gaussian_hyper(hyper, norm)
    feat, rho, sx, sy = _replicate_once(mesh, feat, rho, sx, sy)
    return steering_gaussian_warp_sharded(
        feat, rho, sx, sy, geom, mesh, max_sigma=max_sigma, axis=axis)


# ---------------------------------------------------------------------------
# dynamic-homography (rings) warp, output-sharded
# ---------------------------------------------------------------------------


def steering_gaussian_warp_rings_sharded(img, rho, sigma_x, sigma_y,
                                         rings, mesh, *,
                                         max_sigma: float = 10.0,
                                         u8_inputs: bool = True,
                                         axis: str = DATA_AXIS,
                                         pad_mode: str = "constant"):
    """Multi-chip DYNAMIC-homography warp: the matrix enters as traced data
    (``ops.resample.WarpRings``), so one compiled sharded program serves
    every homography — the distributed form of ``warp_dynamic``.

    Structure: the (small) packed corner operand is built once and
    replicated; the flat per-output-pixel corner/distance arrays are
    sharded on the output axis, so each chip gathers and accumulates only
    its slice of output pixels.  No collective beyond the operand's
    replication (input-sized).  Non-divisible N pads with duplicated
    entries and crops after.  Returns flat [C, N] (host reshapes) —
    bit-identical per pixel to ``steering_gaussian_warp_rings`` eagerly;
    under jit, XLA fusion (FMA contraction) may shift float32 results at
    the ~1e-6 relative level (tests/test_spatial.py)."""
    from ..ops.resample import (gauss_rings_accumulate, gauss_rings_planes,
                                pack_rings_operand, split_rings_rows)

    n_dev = mesh.devices.size
    planes = gauss_rings_planes(img, rho, sigma_x, sigma_y,
                                max_sigma=max_sigma, u8_inputs=u8_inputs,
                                pad_mode=pad_mode)
    packed = pack_rings_operand(planes, rings)         # [M, k] replicated
    corner, n = _pad_rows(rings.corner, 0, n_dev)
    dis_x, _ = _pad_rows(rings.dis_x, 0, n_dev)
    dis_y, _ = _pad_rows(rings.dis_y, 0, n_dev)
    channels = planes[0].shape[0]

    def local(packed_rep, corner_l, dx_l, dy_l):
        rows = jnp.take(packed_rep, corner_l, axis=0)  # [N_local, k]
        gathered = split_rings_rows(rows, len(planes), channels)
        return gauss_rings_accumulate(gathered, dx_l, dy_l,
                                      max_sigma=max_sigma,
                                      u8_inputs=u8_inputs)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis, None), P(axis, None)),
        out_specs=P(axis, None))
    out = fn(packed, corner, dis_x, dis_y)             # [N', C]
    return out[:n].T                                   # [C, N]


def sharded_dynamic_warp_pipeline(img, tables1, tables2, modes,
                                  rings, mesh, *, modes2=None,
                                  max_sigma: float = 10.0,
                                  norm: int = 255, interval: int = 4,
                                  axis: str = DATA_AXIS):
    """Multi-chip dynamic-homography LUT warp: row-sharded stage ensembles
    → output-sharded rings warp.  Program identity is (in_sz, N, mesh) —
    independent of the homography; jit once, serve every matrix
    (the distributed analog of ``LutPredictor.warp_dynamic``).  Returns
    flat [C, N]; u8 row-pack deploy config (norm 255)."""
    from ..ops.lut_pipeline import split_gaussian_hyper

    feat, hyper = lut_stages_sharded(img, tables1, tables2, modes, mesh,
                                     modes2=modes2, axis=axis,
                                     interval=interval, norm=norm)
    # one all-gather for all four planes; unit floats round-trip the u8
    # codes bit-exactly (ops.resample._encode_u8)
    rho, sx, sy = split_gaussian_hyper(hyper, norm)
    feat, rho, sx, sy = _replicate_once(mesh, feat, rho, sx, sy)
    return steering_gaussian_warp_rings_sharded(
        feat, rho, sx, sy, rings, mesh,
        max_sigma=max_sigma, u8_inputs=norm == 255, axis=axis)


def sharded_devgeo_warp_pipeline(img, tables1, tables2, modes, inv,
                                 out_sz, mesh, *, modes2=None,
                                 max_sigma: float = 10.0, norm: int = 255,
                                 interval: int = 4, axis: str = DATA_AXIS):
    """Multi-chip DEVICE-GEOMETRY warp: the per-frame matrix operand is
    the 3×3 inverse alone AND the output is sharded across the mesh.

    Composition of :func:`sharded_dynamic_warp_pipeline` (row-sharded
    stages → output-sharded rings gather) with
    ``ops.resample.warp_rings_on_device`` (corner/ring/distance arrays
    computed in-program).  Written in the pjit-constraint style rather
    than shard_map: the rings arithmetic is elementwise over the flat
    output index, so constraining the corner/distance arrays (and the
    final output) to ``P(axis)`` lets the SPMD partitioner run each
    chip's slice of the geometry computation locally — each chip derives
    ITS OWN rings slice from the replicated 9-float inverse, no geometry
    transfer, no host precompute.  Returns flat [C, N].  Same f32
    caveats as the single-chip form (BASELINE "Device-geometry warp")."""
    from ..ops.lut_pipeline import split_gaussian_hyper
    from ..ops.resample import (gauss_rings_accumulate, gauss_rings_planes,
                                pack_rings_operand, split_rings_rows,
                                warp_rings_on_device)

    feat, hyper = lut_stages_sharded(img, tables1, tables2, modes, mesh,
                                     modes2=modes2, axis=axis,
                                     interval=interval, norm=norm)
    rho, sx, sy = split_gaussian_hyper(hyper, norm)
    feat, rho, sx, sy = _replicate_once(mesh, feat, rho, sx, sy)
    in_sz = img.shape[-2:]
    rings = warp_rings_on_device(inv, in_sz, out_sz)
    nshard = NamedSharding(mesh, P(axis))
    corner = jax.lax.with_sharding_constraint(rings.corner, nshard)
    dis_x = jax.lax.with_sharding_constraint(
        rings.dis_x, NamedSharding(mesh, P(axis, None)))
    dis_y = jax.lax.with_sharding_constraint(
        rings.dis_y, NamedSharding(mesh, P(axis, None)))
    planes = gauss_rings_planes(feat, rho, sx, sy, max_sigma=max_sigma,
                                u8_inputs=norm == 255)
    packed = jax.lax.with_sharding_constraint(
        pack_rings_operand(planes, rings), NamedSharding(mesh, P()))
    rows = jnp.take(packed, corner, axis=0)            # [N, k] sharded on N
    gathered = split_rings_rows(rows, len(planes), planes[0].shape[0])
    out = gauss_rings_accumulate(gathered, dis_x, dis_y,
                                 max_sigma=max_sigma,
                                 u8_inputs=norm == 255)
    out = jax.lax.with_sharding_constraint(out, NamedSharding(
        mesh, P(axis, None)))
    return out.T                                       # [C, N]


# ---------------------------------------------------------------------------
# dynamic-scale (rings) resize, output-row-sharded
# ---------------------------------------------------------------------------


def steering_gaussian_resize_rings_sharded(img, rho, sigma_x, sigma_y,
                                           rings, mesh, *,
                                           max_sigma: float = 10.0,
                                           axis: str = DATA_AXIS,
                                           pad_mode: str = "constant"):
    """Multi-chip DYNAMIC-scale resize: the scale enters as traced data
    (``ops.resample.ResizeRings``), so one compiled sharded program serves
    every ``(scale_h, scale_w)`` — the distributed form of
    ``upscale_dynamic``.

    Structure: the (input-sized) source and hyper maps are replicated; the
    per-output-ROW index/distance operands are sharded on the output axis
    (resize is separable, so only the row axis needs sharding — the column
    operands are tiny and replicated).  Each chip gathers and accumulates
    only its slab of output rows.  Non-divisible outH pads with duplicated
    rows and crops after.  Bit-identical per row to the single-device op
    eagerly; under jit XLA fusion may shift float32 results at the ~1e-6
    relative level like the other sharded forms (tests/test_spatial.py)."""
    from ..ops.resample import ResizeRings, steering_gaussian_resize_rings

    n_dev = mesh.devices.size
    idx_x, oh = _pad_rows(rings.idx_x, 0, n_dev)
    dis_x, _ = _pad_rows(rings.dis_x, 0, n_dev)

    def local(im, r, sx_, sy_, ix_l, dx_l, iy, dy):
        lr = ResizeRings(ix_l, iy, dx_l, dy)
        return steering_gaussian_resize_rings(im, r, sx_, sy_, lr,
                                              max_sigma=max_sigma,
                                              pad_mode=pad_mode)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis, None), P(), P()),
        out_specs=P(None, axis, None))
    out = fn(img, rho, sigma_x, sigma_y, jnp.asarray(idx_x),
             jnp.asarray(dis_x), jnp.asarray(rings.idx_y),
             jnp.asarray(rings.dis_y))
    return out[..., :oh, :]


def sharded_dynamic_sr_pipeline(img, tables1, tables2, modes,
                                rings, mesh, *, modes2=None,
                                max_sigma: float = 10.0,
                                norm: int = 255, interval: int = 4,
                                axis: str = DATA_AXIS):
    """Multi-chip dynamic-scale LUT SR: row-sharded stage ensembles →
    output-row-sharded rings resize.  Program identity is
    (in_sz, out_sz, mesh) — independent of the scale; jit once, serve any
    ``(scale_h, scale_w)`` (the distributed analog of
    ``LutPredictor.upscale_dynamic``)."""
    from ..ops.lut_pipeline import split_gaussian_hyper

    feat, hyper = lut_stages_sharded(img, tables1, tables2, modes, mesh,
                                     modes2=modes2, axis=axis,
                                     interval=interval, norm=norm)
    rho, sx, sy = split_gaussian_hyper(hyper, norm)
    feat, rho, sx, sy = _replicate_once(mesh, feat, rho, sx, sy)
    return steering_gaussian_resize_rings_sharded(
        feat, rho, sx, sy, rings, mesh, max_sigma=max_sigma, axis=axis)


# ---------------------------------------------------------------------------
# micro-net (SRNetsSWF2) form, input-row-sharded
# ---------------------------------------------------------------------------


def srnet_stages_sharded(img, params, mesh, *, modes=("s", "c", "t"),
                         modes2=None, norm: int = 255,
                         backend: str = "xla", axis: str = DATA_AXIS):
    """Input-row-sharded micro-net stage ensembles — the net-form analog of
    :func:`lut_stages_sharded`.  The pixel-MLP ensembles sample through the
    same ``MAX_PAD`` replicate padding as the LUT simplex ensembles
    (models/srnet.py::srunit_on_image), so the identical band/halo
    structure applies.

    ``img``: [..., H, W] integer or float in 0..255.  Returns
    (feat [..., H, W] in [0, 255], hyper [..., H, W, outC] in [0, 1]),
    row-sharded over ``mesh``.  Two-stage deploy config only (the default;
    a deeper stage-1 chain would need a re-clamp hook between its internal
    ensembles — reference: SRNetsSWF2.predict, model.py:100-129)."""
    from ..models import srnet

    if modes2 is None:
        modes2 = modes

    def s1(band, p):
        x = band.astype(jnp.float32) / float(norm)
        return srnet.predict_stage1(p, x, modes=modes, stages=2, norm=norm,
                                    backend=backend)

    def s2(feat_band, p):
        return srnet.predict_stage2(p, feat_band / float(norm),
                                    modes2=modes2, norm=norm,
                                    backend=backend)

    return _two_stage_band_sharded(img, params, s1, s2, mesh, axis)


def sharded_net_sr_pipeline(img, params, geom: ResizeGeometry, mesh, *,
                            modes=("s", "c", "t"), modes2=None,
                            norm: int = 255, max_sigma: float = 10.0,
                            backend: str = "xla", axis: str = DATA_AXIS):
    """Complete multi-chip micro-net SR: row-sharded pixel-MLP stage
    ensembles → row-sharded steerable resize — the net-form (fastest
    serving form) counterpart of :func:`sharded_lut_sr_pipeline`, with the
    same communication structure (the only collective is the input-sized
    all-gather of feat/hyper feeding the replicated-source resize)."""
    feat, hyper = srnet_stages_sharded(img, params, mesh, modes=modes,
                                       modes2=modes2, norm=norm,
                                       backend=backend, axis=axis)
    feat, rho, sx, sy = _replicate_once(mesh, feat, hyper[..., 0],
                                        hyper[..., 1], hyper[..., 2])
    return steering_gaussian_resize_sharded(
        feat, rho, sx, sy, geom, mesh, max_sigma=max_sigma, axis=axis)


# ---------------------------------------------------------------------------
# IMDN (LeRF-Net) form, input-row-sharded conv towers
# ---------------------------------------------------------------------------


def imdn_stages_sharded(img, variables, mesh, *, backend: str = "base",
                        block: int = 2, nf: int = 12, norm: int = 255,
                        out_c: int = 3, two_stage: bool = True,
                        dtype=None, axis: str = DATA_AXIS):
    """Input-row-sharded IMDN2 (LeRF-Net) conv towers — SURVEY §2.8's
    spatial conv parallelism for the zero-pad SAME-conv form.

    Structure mirrors :func:`_two_stage_band_sharded` (replicated input,
    each chip dynamic-slices its band locally — halo data without a
    collective), but the halo is sized to the CONV RECEPTIVE FIELD instead
    of ``MAX_PAD``: each IMDN_RTC tower chains 22 spatial 3×3 convs
    (models/imdn_s2d.TOWER_SPATIAL_CONVS — reference model.py:480-523), so
    band-edge garbage reaches 22 image rows per tower — for EVERY backend:
    the s2d conversion preserves the image-space receptive field, measured
    in ``tower_halo_rows`` — and each chip recomputes a
    ``(two stages)·22``-row halo in place of a
    per-conv halo exchange (bounded re-compute: identical arithmetic on
    the kept rows, zero collectives — at the ~1080-row frames this path
    targets, the halo is small next to ``H/n_chips``).

    Exactness at the seams: interior band edges hold REAL halo rows (the
    garbage depth is cropped), and the true bottom edge reproduces the
    unpadded program's SAME zero padding through the traced per-conv
    re-masking (``imdn_s2d`` ``valid_hw``) plus inter-stage zeroing — the
    same primitive that makes the IMDN form bucketable, so kept rows carry
    exactly the single-device program's values (modulo XLA's shape-
    dependent f32 reduction fusion — tests/test_spatial.py bounds it).

    ``img``: [..., C, H, W] integer or float in 0..255.  Returns
    (feat [..., C, H, W] in [0,255], hyper [..., C, H, W, out_c] in [0,1])
    row-sharded over ``mesh``, cropped to H.  ``two_stage=False`` skips
    the feature tower exactly like the reference (eval_model.py:124-129).
    """
    from ..models.imdn_s2d import make_chw_stage_fns, tower_halo_rows

    if dtype is None:
        dtype = jnp.float32
    variables, s1, s2 = make_chw_stage_fns(
        variables, backend=backend, block=block, nf=nf, norm=norm,
        out_c=out_c, dtype=dtype)

    n = mesh.devices.size
    h, w = img.shape[-2:]
    hp = -(-h // n) * n
    if hp != h:
        cfg = [(0, 0)] * (img.ndim - 2) + [(0, hp - h), (0, 0)]
        img = jnp.pad(img, cfg)        # zero rows — re-masked anyway
    rows = hp // n
    halo = (2 if two_stage else 1) * tower_halo_rows()
    band = min(rows + 2 * halo, hp)

    def local(img_rep, p_rep):
        i = jax.lax.axis_index(axis)
        r0 = i * rows
        lo = jnp.clip(r0 - halo, 0, hp - band)
        sl = jax.lax.dynamic_slice_in_dim(img_rep, lo, band, axis=-2)
        x = sl.astype(jnp.float32) / float(norm)
        h_loc = h - lo                 # traced valid rows in band coords
        row_ok = jnp.arange(band) < h_loc
        if two_stage:
            feat_b = s1(p_rep, x, (h_loc, w))
            # feat beyond the valid region must be ZERO so stage 2's conv
            # windows at the true bottom edge see exactly the unpadded
            # program's SAME zero padding
            feat_b = jnp.where(row_ok[:, None], feat_b, 0.0)
            hyper_in = feat_b / float(norm)
        else:
            feat_b = jnp.where(row_ok[:, None], jnp.round(x * norm), 0.0)
            hyper_in = jnp.where(row_ok[:, None], x, 0.0)
        hyper_b = s2(p_rep, hyper_in, (h_loc, w))
        off = r0 - lo
        feat = jax.lax.dynamic_slice_in_dim(feat_b, off, rows, axis=-2)
        hyper = jax.lax.dynamic_slice_in_dim(hyper_b, off, rows, axis=-3)
        return feat, hyper

    row_spec = [None] * img.ndim
    row_spec[-2] = axis
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(*row_spec), P(*(row_spec + [None]))))
    feat, hyper = fn(img, variables)
    return feat[..., :h, :], hyper[..., :h, :, :]


def imdn_stages_sharded_exchange(img_sharded, variables, mesh, *,
                                 backend: str = "base", block: int = 2,
                                 nf: int = 12, norm: int = 255,
                                 out_c: int = 3, two_stage: bool = True,
                                 true_h=None, dtype=None,
                                 axis: str = DATA_AXIS):
    """Row-sharded IMDN towers with a TRUE halo exchange over ICI.

    :func:`imdn_stages_sharded` replicates the input and slices bands
    locally — right when the input is small relative to the output.  When
    the input itself arrives ROW-SHARDED (chained from a sharded producer,
    or frames too large to replicate), replication wastes HBM and an
    all-gather; here each device keeps only its slab and fetches the
    receptive-field halo from its neighbors with ONE ``ppermute`` pair
    (2·halo·W·C bytes over ICI — SURVEY §2.8's "image tiling ... halo
    exchange", literally).  Devices at the true image edges receive the
    collective's zero fill, which the traced 3-tuple row mask
    (``imdn_s2d`` ``valid_hw=(lo, hi, w)``) turns into exact SAME-conv
    zero padding at every conv depth — same exactness argument as the
    replicated-band path, same kept-row values.

    ``img_sharded``: [..., C, H, W] float in 0..255 with H divided evenly
    over ``mesh`` (shard or constrain it with ``P(..., axis, None)``).
    ``true_h`` masks rows ≥ true_h as beyond-image (default H).  Requires
    ``H/n ≥ halo`` (= stages·22 rows) — single-hop neighbors must
    cover the receptive field; smaller slabs should use the replicated
    path.  Returns (feat, hyper) row-sharded like the band variant.
    """
    from ..models.imdn_s2d import make_chw_stage_fns, tower_halo_rows

    if dtype is None:
        dtype = jnp.float32
    variables, s1, s2 = make_chw_stage_fns(
        variables, backend=backend, block=block, nf=nf, norm=norm,
        out_c=out_c, dtype=dtype)

    n = mesh.devices.size
    h, w = img_sharded.shape[-2:]
    if h % n:
        raise ValueError(f"H={h} must divide over {n} devices (pad first)")
    rows = h // n
    halo = (2 if two_stage else 1) * tower_halo_rows()
    if rows < halo:
        raise ValueError(
            f"slab of {rows} rows < halo {halo}: single-hop exchange "
            f"cannot cover the receptive field — use imdn_stages_sharded")
    th = int(true_h) if true_h is not None else h

    def local(x_loc, p_rep):
        i = jax.lax.axis_index(axis)
        # halo exchange: my bottom rows → next device's top halo, my top
        # rows → previous device's bottom halo; absent pairs (the mesh
        # edges) deliver zeros, which the row mask treats as beyond-image
        top = jax.lax.ppermute(x_loc[..., rows - halo:, :], axis,
                               [(j, j + 1) for j in range(n - 1)])
        bot = jax.lax.ppermute(x_loc[..., :halo, :], axis,
                               [(j, j - 1) for j in range(1, n)])
        band = jnp.concatenate([top, x_loc, bot], axis=-2)
        x = band.astype(jnp.float32) / float(norm)
        lo_glob = i * rows - halo          # global row of band row 0
        row_lo = jnp.maximum(-lo_glob, 0)  # zero halo above the image top
        row_hi = th - lo_glob
        band_rows = jnp.arange(rows + 2 * halo)
        row_ok = (band_rows >= row_lo) & (band_rows < row_hi)
        if two_stage:
            feat_b = s1(p_rep, x, (row_lo, row_hi, w))
            feat_b = jnp.where(row_ok[:, None], feat_b, 0.0)
            hyper_in = feat_b / float(norm)
        else:
            feat_b = jnp.where(row_ok[:, None], jnp.round(x * norm), 0.0)
            hyper_in = jnp.where(row_ok[:, None], x, 0.0)
        hyper_b = s2(p_rep, hyper_in, (row_lo, row_hi, w))
        feat = jax.lax.dynamic_slice_in_dim(feat_b, halo, rows, axis=-2)
        hyper = jax.lax.dynamic_slice_in_dim(hyper_b, halo, rows, axis=-3)
        return feat, hyper

    row_spec = [None] * img_sharded.ndim
    row_spec[-2] = axis
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(*row_spec), P()),
        out_specs=(P(*row_spec), P(*(row_spec + [None]))))
    return fn(img_sharded, variables)


def sharded_imdn_sr_pipeline(img, variables, geom: ResizeGeometry, mesh, *,
                             backend: str = "base", block: int = 2,
                             nf: int = 12, norm: int = 255, out_c: int = 3,
                             two_stage: bool = True,
                             max_sigma: float = 10.0,
                             axis: str = DATA_AXIS):
    """Complete multi-chip IMDN (LeRF-Net) SR: row-sharded conv towers →
    row-sharded steerable resize — the conv-form counterpart of
    :func:`sharded_lut_sr_pipeline` with the same communication structure
    (the ONLY collective is the input-sized all-gather of the stacked
    feat/hyper planes feeding the replicated-source resize;
    tests/test_spatial.py pins the count).  The IMDN hyper maps are
    per-image-channel ([C, H, W, 3] for inC=3), matching the
    single-device ``NetPredictor.from_imdn`` resample exactly."""
    feat, hyper = imdn_stages_sharded(img, variables, mesh, backend=backend,
                                      block=block, nf=nf, norm=norm,
                                      out_c=out_c, two_stage=two_stage,
                                      axis=axis)
    feat, rho, sx, sy = _replicate_once(mesh, feat, hyper[..., 0],
                                        hyper[..., 1], hyper[..., 2])
    return steering_gaussian_resize_sharded(
        feat, rho, sx, sy, geom, mesh, max_sigma=max_sigma, axis=axis)


def sharded_imdn_warp_pipeline(img, variables, geom, mesh, *,
                               backend: str = "base", block: int = 2,
                               nf: int = 12, norm: int = 255,
                               out_c: int = 3, two_stage: bool = True,
                               max_sigma: float = 10.0,
                               axis: str = DATA_AXIS):
    """Multi-chip IMDN homographic warp: row-sharded conv towers →
    output-row-sharded warp (same structure as
    :func:`sharded_lut_warp_pipeline`; float rows — IMDN hyper maps are
    continuous, so the u8 row pack does not apply)."""
    feat, hyper = imdn_stages_sharded(img, variables, mesh, backend=backend,
                                      block=block, nf=nf, norm=norm,
                                      out_c=out_c, two_stage=two_stage,
                                      axis=axis)
    feat, rho, sx, sy = _replicate_once(mesh, feat, hyper[..., 0],
                                        hyper[..., 1], hyper[..., 2])
    return steering_gaussian_warp_sharded(
        feat, rho, sx, sy, geom, mesh, max_sigma=max_sigma, axis=axis)
