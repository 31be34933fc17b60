"""LUT-ensemble inference pipeline (the LeRF-L / LeRF-G deploy path).

Reference semantics: ``resample/eval_lut_sr.py:541-628`` — each stage rotates
the image 4×, pads bottom/right per sampling mode, runs 4D-simplex LUT
interpolation for every mode, rotates back and averages; stage 2 uses
separate r0/r1 parameter sets for even/odd rotations because the Gaussian
hyper-parameters are not rotation-equivariant (σx/σy swap under 90°).

TPU-first redesign
------------------
Rotating the *image* 4 ways creates 4 different shapes for non-square inputs
and defeats static-shape jit.  Instead we rotate the **sampling offsets**:
``rot_back(LUT(rot(img)))`` equals sampling the 4 mode neighbors at
inverse-rotated offsets from an all-sides edge-padded image.  Every neighbor
read becomes a *static slice* of the padded image — zero gathers for pixels,
and the entire 12-member ensemble fuses into one elementwise XLA kernel plus
the 5 LUT gathers per member (see :mod:`lerf_tpu.ops.simplex`).

All stage arithmetic is int32 with exact round-half-even division — the
stage outputs are bit-identical to the reference numpy oracle.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax.numpy as jnp
import jax.tree_util

from .simplex import (round_half_even_div, simplex4d, simplex4d_cells,
                      simplex_weights16)

# neighbor (row, col) offsets per sampling mode, in the rotated frame,
# role order (a, b, c, d) — eval_lut_sr.py:31-81
MODE_OFFSETS = {
    "s": ((0, 0), (0, 1), (1, 0), (1, 1)),
    "d": ((0, 0), (0, 2), (2, 0), (2, 2)),
    "y": ((0, 0), (1, 1), (1, 2), (2, 1)),
    "c": ((0, 0), (0, 1), (0, 2), (0, 3)),
    "t": ((0, 0), (1, 1), (2, 2), (3, 3)),
}

# bottom/right pad per mode in the reference (eval_lut_sr.py:12-18); our
# all-sides pad uses the max over modes.
MODE_PAD = {"s": 1, "d": 2, "y": 2, "c": 3, "t": 3}
MAX_PAD = 3


def rotate_offset(off, r: int):
    """Offset transform equivalent to rot90(img, r) → sample → rot90 back.

    Derivation: with φ_r the coordinate map of ``rot90(·, r)`` (result →
    source coords), sampling at +δ in the rotated frame reads source pixels
    at +L_r(δ) where L_r is φ_r's linear part: r=0 (i,j); r=1 (j,-i);
    r=2 (-i,-j); r=3 (-j,i).  Verified bit-exact against the reference's
    rotate/pad/interp/unrotate in tests/test_simplex.py
    (test_rotated_offsets_match_reference_rotation_ensemble).
    """
    i, j = off
    if r % 4 == 0:
        return (i, j)
    if r % 4 == 1:
        return (j, -i)
    if r % 4 == 2:
        return (-i, -j)
    return (-j, i)


def _pad_all_sides(img: jnp.ndarray, pad: int = MAX_PAD):
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge")


def _sample4(xpad: jnp.ndarray, h: int, w: int, mode: str, r: int,
             pad: int = MAX_PAD):
    """The 4 mode-geometry neighbors for rotation r, as static slices."""
    outs = []
    for off in MODE_OFFSETS[mode]:
        oi, oj = rotate_offset(off, r)
        outs.append(xpad[..., pad + oi:pad + oi + h, pad + oj:pad + oj + w])
    return outs


def ensemble_members(modes: Sequence[str], split_r: bool):
    """[(mode, rotation, lut_key)] for the 4·len(modes) ensemble members."""
    out = []
    for mode in modes:
        for r in range(4):
            out.append((mode, r, f"{mode}r{r % 2}" if split_r else mode))
    return out


def stack_ensemble_inputs(img: jnp.ndarray, modes: Sequence[str],
                          split_r: bool, luts: Dict[str, jnp.ndarray]):
    """Build the batched-ensemble operands: per-role neighbor stacks
    [M, ..., H, W], the concatenated LUT [K·L⁴, oC], and per-member flat
    offsets — so the whole mode×rotation ensemble is ONE simplex call."""
    h, w = img.shape[-2], img.shape[-1]
    xpad = _pad_all_sides(img)
    members = ensemble_members(modes, split_r)
    keys = sorted({k for _, _, k in members})
    key_idx = {k: i for i, k in enumerate(keys)}
    L4 = luts[keys[0]].shape[0]
    flat_lut = jnp.concatenate([luts[k] for k in keys], axis=0)

    roles = [[], [], [], []]
    offs = []
    for mode, r, key in members:
        samples = _sample4(xpad, h, w, mode, r)
        for role, sm in zip(roles, samples):
            role.append(sm)
        offs.append(key_idx[key] * L4)
    a, b, c, d = (jnp.stack(role, axis=0) for role in roles)
    lut_offset = jnp.asarray(offs, jnp.int32).reshape(
        (len(members),) + (1,) * (img.ndim))
    return flat_lut, lut_offset, a, b, c, d


# ---------------------------------------------------------------------------
# packed rotation-group tables (the fast deploy layout)
# ---------------------------------------------------------------------------
#
# Rotation-ensemble members of one mode often sample the SAME spatial pixel
# set, just with permuted (a,b,c,d) roles: all 4 rotations of the 2×2 modes
# (s, d), and the rotation pairs {0,2} / {1,3} of the collinear modes (c, t).
# Members sharing a pixel set share the lattice cell of that set — so their
# 16-corner rows can be packed side by side and fetched with ONE row gather,
# with each member's slot holding ITS table's values at ITS role-permuted
# coordinates (baked in at build time).  On TPU the gathers are the whole
# stage cost and HBM random reads pay per ~512-byte transaction, so fewer,
# wider rows are a direct win: 12 row gathers/pixel → 5 (stage 1) / 6
# (stage 2, r0/r1 tables keep {0,2}/{1,3} in-pair anyway).
#
# Rows are laid out [member, channel, corner-bits] with corner bits in
# CANONICAL position space (bit 3-m for canonical sample m); the runtime
# blend feeds role-permuted bit weights (simplex_weights16(bit_of=...)), so
# every per-(member, channel) corner row is a contiguous 16-lane slice.


def group_rotations(mode: str):
    """Group the 4 rotations of ``mode`` by translated-pixel-set equality.

    Returns a list of groups ``(rots, canon, deltas, perms)``: member
    rotation ``rots[i]`` samples role k at ``p + deltas[i] + canon[perms[i][k]]``
    for every output pixel p — verified against :func:`rotate_offset` for
    all modes in tests/test_packed.py.
    """
    offs = MODE_OFFSETS[mode]
    groups: List[dict] = []
    for r in range(4):
        o = [rotate_offset(off, r) for off in offs]
        mi = min(p[0] for p in o)
        mj = min(p[1] for p in o)
        norm = [(p[0] - mi, p[1] - mj) for p in o]
        for g in groups:
            if set(norm) == set(g["canon"]):
                g["rots"].append(r)
                g["deltas"].append((mi, mj))
                g["perms"].append(tuple(g["canon"].index(norm[k])
                                        for k in range(4)))
                break
        else:
            groups.append({"canon": tuple(norm), "rots": [r],
                           "deltas": [(mi, mj)], "perms": [(0, 1, 2, 3)]})
    return groups


@dataclasses.dataclass
class PackedTables:
    """{mode: [group]} where each group dict holds the packed device table
    ``[16⁴, G·oC·16]`` plus the static (rots, canon, deltas, perms, oc).

    Registered as a pytree with ONLY the table arrays as leaves (the
    geometry metadata is static jit structure), so banks pass through
    ``jax.tree.map`` / ``device_put`` / sharding utilities unchanged.
    """
    groups: Dict[str, List[dict]]
    interval: int = 4


def _packed_flatten(pt: PackedTables):
    leaves, meta = [], []
    for mode in pt.groups:
        for g in pt.groups[mode]:
            leaves.append(g["table"])
            meta.append((mode, tuple(sorted(
                (k, v) for k, v in g.items() if k != "table"))))
    return leaves, (tuple(meta), pt.interval)


def _packed_unflatten(aux, leaves):
    meta, interval = aux
    groups: Dict[str, List[dict]] = {}
    for (mode, static), table in zip(meta, leaves):
        groups.setdefault(mode, []).append(dict(static, table=table))
    return PackedTables(groups=groups, interval=interval)


jax.tree_util.register_pytree_node(PackedTables, _packed_flatten,
                                   _packed_unflatten)


def build_packed_tables(luts: Dict[str, jnp.ndarray], modes: Sequence[str],
                        *, split_r: bool = False, interval: int = 4,
                        dtype=None,
                        max_row_bytes: int = 128) -> PackedTables:
    """Host-side: flat [L⁴, oC] tables → packed rotation-group rows.

    ``luts`` keyed like :func:`lut_ensemble`: by mode (``split_r=False``) or
    ``f"{mode}r{0|1}"`` with the r0 table used at rotations 0/2 and r1 at
    1/3 (eval_lut_sr.py:580-619).

    ``max_row_bytes``: rotation groups whose packed row would exceed this
    are split into sub-groups (extra gathers), because the TPU gather
    engine's wall-clock is set by row BYTES — rows ≤128 B gather ~4×
    faster than 192 B rows (BASELINE.md "row-bytes sweep").  Affects only
    the gather count, never the values (tests/test_packed.py).
    """
    import numpy as np

    L = (1 << (8 - interval)) + 1
    B = L - 1
    out: Dict[str, List[dict]] = {}
    for mode in modes:
        out[mode] = []
        for g in group_rotations(mode):
            parts = []
            for r, perm in zip(g["rots"], g["perms"]):
                key = f"{mode}r{r % 2}" if split_r else mode
                lut5 = np.asarray(luts[key]).reshape(L, L, L, L, -1)
                oc = lut5.shape[-1]
                dt = np.dtype(dtype or lut5.dtype)
                member = np.empty((B, B, B, B, oc, 16), dt)
                # inv[m] = which role axis holds canonical coordinate m
                inv = [perm.index(m) for m in range(4)]
                for bits in range(16):
                    raise_m = [(bits >> (3 - m)) & 1 for m in range(4)]
                    sl = tuple(slice(raise_m[perm[k]], B + raise_m[perm[k]])
                               for k in range(4))
                    member[..., bits] = np.transpose(lut5[sl], inv + [4])
                parts.append(member.reshape(B ** 4, oc * 16))
            per_member = oc * 16 * dt.itemsize
            chunk = max(1, max_row_bytes // per_member)
            for lo in range(0, len(parts), chunk):
                hi = lo + chunk
                table = np.concatenate(parts[lo:hi], axis=1)
                out[mode].append({"table": jnp.asarray(table), "oc": oc,
                                  "rots": tuple(g["rots"][lo:hi]),
                                  "canon": g["canon"],
                                  "deltas": tuple(g["deltas"][lo:hi]),
                                  "perms": tuple(g["perms"][lo:hi])})
    return PackedTables(groups=out, interval=interval)


def lut_ensemble_packed(img: jnp.ndarray, packed: PackedTables,
                        modes: Sequence[str], *, interval: int = 4):
    """Σ of q×simplex outputs over modes × 4 rotations, packed-table form.

    Bit-identical to :func:`lut_ensemble` (tests/test_packed.py); one row
    gather per rotation GROUP instead of per member.
    """
    q = 1 << interval
    B = 1 << (8 - interval)
    h, w = img.shape[-2], img.shape[-1]
    xpad = _pad_all_sides(img)
    out = None
    for mode in modes:
        for g in packed.groups[mode]:
            deltas, perms, canon = g["deltas"], g["perms"], g["canon"]
            oc = g["oc"]
            u0 = min(d[0] for d in deltas)
            v0 = min(d[1] for d in deltas)
            ha = h + max(d[0] for d in deltas) - u0
            wa = w + max(d[1] for d in deltas) - v0
            # canonical sample planes over the anchor grid
            planes = [xpad[..., MAX_PAD + u0 + ci:MAX_PAD + u0 + ci + ha,
                           MAX_PAD + v0 + cj:MAX_PAD + v0 + cj + wa]
                      for ci, cj in canon]
            iv = [p // q for p in planes]
            cell = ((iv[0] * B + iv[1]) * B + iv[2]) * B + iv[3]
            rows = jnp.take(g["table"], cell, axis=0).astype(jnp.int32)
            for gi, (delta, perm) in enumerate(zip(deltas, perms)):
                su, sv = delta[0] - u0, delta[1] - v0
                win = (Ellipsis, slice(su, su + h), slice(sv, sv + w))
                fr = [planes[perm[k]][win] % q for k in range(4)]
                bit_of = tuple(1 << (3 - perm[k]) for k in range(4))
                w16 = simplex_weights16(*fr, q, bit_of=bit_of)
                chans = []
                for c_ in range(oc):
                    lane0 = (gi * oc + c_) * 16
                    c16 = rows[win + (slice(lane0, lane0 + 16),)]
                    chans.append(jnp.sum(w16 * c16, axis=-1))
                member = jnp.stack(chans, axis=-1)
                out = member if out is None else out + member
    return out


def lut_ensemble(img: jnp.ndarray, luts: Dict[str, jnp.ndarray],
                 modes: Sequence[str], *, interval: int = 4,
                 split_r: bool = False):
    """Sum of q×simplex outputs over modes × 4 rotations.

    ``img``: int32 [..., H, W] with values 0..255.
    ``luts``: for ``split_r=False`` keyed by mode (stage 1, r0 LUT used for
    all rotations — eval_lut_sr.py:544-564); for ``split_r=True`` keyed by
    ``f"{mode}r{0|1}"`` with r0 used at rotations 0/2 and r1 at 1/3
    (eval_lut_sr.py:580-619).
    Returns int32 [..., H, W, oC] (scale: q × avg-numerator).

    All 4·len(modes) members are evaluated as ONE batched simplex
    interpolation over a stacked LUT (see ``simplex4d``'s ``lut_offset``).
    With flat [L⁴, oC] tables that is 5 XLA gathers for the entire
    ensemble; with cell-major [16⁴, 16, oC] tables (``build_cell_table``)
    it is ONE contiguous row gather per member; :class:`PackedTables`
    (the fast path) shares one gather across the rotations of a group.
    """
    if isinstance(luts, PackedTables):
        return lut_ensemble_packed(img, luts, modes, interval=interval)
    flat_lut, lut_offset, a, b, c, d = stack_ensemble_inputs(
        img, modes, split_r, luts)
    if flat_lut.ndim == 3:          # cell-major tables
        s = simplex4d_cells(flat_lut, a, b, c, d, interval=interval,
                            cell_offset=lut_offset)
    else:
        s = simplex4d(flat_lut, a, b, c, d, interval=interval,
                      lut_offset=lut_offset)
    return jnp.sum(s, axis=0)


# The gather engine's row-issue rate degrades once a single gather exceeds
# ~0.7M rows (~190 → ~120M rows/s at 2.8M rows — BASELINE.md "gather-issue
# bound"), so large inputs run the stage ensembles in horizontal bands.
# Each band carries a MAX_PAD halo of REAL pixels, so banding is bit-exact:
# every sample offset is ≤ MAX_PAD, and at true image borders the band's
# edge-pad equals the full image's (tests/test_packed.py).
BAND_TARGET_ROWS = 768 * 1024


def _banded_rows(img: jnp.ndarray, fn, out_tail_dims: int,
                 target: int = BAND_TARGET_ROWS):
    """Run ``fn`` (a stage ensemble) over row bands of ``img`` with halo."""
    h, w = img.shape[-2:]
    lead = 1
    for d in img.shape[:-2]:
        lead *= d
    band_h = max(1, target // max(lead * w, 1))
    if band_h >= h:
        return fn(img)
    ax = -2 - out_tail_dims
    outs = []
    for r0 in range(0, h, band_h):
        r1 = min(r0 + band_h, h)
        lo, hi = max(r0 - MAX_PAD, 0), min(r1 + MAX_PAD, h)
        part = fn(img[..., lo:hi, :])
        sl = [slice(None)] * part.ndim
        sl[ax] = slice(r0 - lo, r0 - lo + (r1 - r0))
        outs.append(part[tuple(sl)])
    return jnp.concatenate(outs, axis=ax)


def lut_stage1(img: jnp.ndarray, luts_s1: Dict[str, jnp.ndarray],
               modes: Sequence[str], *, interval: int = 4, norm: int = 255,
               band_target: int = BAND_TARGET_ROWS):
    """Feature ("pre-filter") stage: int 0..255 image -> int 0..255 feature.

    feat = round_half_even(clip(Σ/(len(modes)·q), 0, 255)) — the reference's
    final-feature-stage averaging with avg_factor=len(modes), bias=0
    (eval_lut_sr.py:565-577).
    """
    q = 1 << interval

    def run(part):
        return lut_ensemble(part, luts_s1, modes, interval=interval)[..., 0]

    pred = _banded_rows(img, run, 0, band_target)
    den = len(modes) * q
    num = jnp.clip(pred, 0, norm * den)
    return round_half_even_div(num, den)


def lut_stage1_intermediate(img, luts_s1, modes, *, interval=4, norm=255,
                            band_target: int = BAND_TARGET_ROWS):
    """Non-final feature stage (stages > 2): avg len(modes)·4, bias norm//2
    (eval_lut_sr.py:566-572)."""
    q = 1 << interval

    def run(part):
        return lut_ensemble(part, luts_s1, modes, interval=interval)[..., 0]

    pred = _banded_rows(img, run, 0, band_target)
    den = len(modes) * 4 * q
    num = jnp.clip(pred + (norm // 2) * den, 0, norm * den)
    return round_half_even_div(num, den)


def lut_stage2(img: jnp.ndarray, luts_s2: Dict[str, jnp.ndarray],
               modes2: Sequence[str], *, interval: int = 4, norm: int = 255,
               band_target: int = BAND_TARGET_ROWS):
    """Hyper stage: int 0..255 feature -> int 0..255 hyper codes, [...,H,W,oC].

    hyper_u8 = round_half_even(clip(Σ/(len(modes2)·4·q) + norm//2, 0, norm))
    (eval_lut_sr.py:621-628).  Divide by ``norm`` afterwards for the [0,1]
    hyper maps.
    """
    q = 1 << interval

    def run(part):
        return lut_ensemble(part, luts_s2, modes2, interval=interval,
                            split_r=True)

    pred = _banded_rows(img, run, 1, band_target)
    den = len(modes2) * 4 * q
    num = jnp.clip(pred + (norm // 2) * den, 0, norm * den)
    return round_half_even_div(num, den)


def split_gaussian_hyper(hyper_u8: jnp.ndarray, norm: int = 255):
    """[..., C, H, W, 3] int codes -> (rho, sigma_x, sigma_y) float [...,C,H,W]
    in [0,1].  Channel de-interleave parity: eval_lut_sr.py:648-661 — the
    reference's flat channel list (c0_h0, c0_h1, c0_h2, c1_h0, ...) indexed
    with strides of 3 is exactly our trailing-axis split."""
    hyper = hyper_u8.astype(jnp.float32) / float(norm)
    return hyper[..., 0], hyper[..., 1], hyper[..., 2]
