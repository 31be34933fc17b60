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

from typing import Dict, Sequence

import jax.numpy as jnp

from .simplex import round_half_even_div, simplex4d, simplex4d_cells

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
    rotate/pad/interp/unrotate in tests/test_lut_pipeline.py.
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
    ensemble; with cell-major [16⁴, 16, oC] tables (``build_cell_table``,
    the fast path) it is ONE contiguous row gather.
    """
    flat_lut, lut_offset, a, b, c, d = stack_ensemble_inputs(
        img, modes, split_r, luts)
    if flat_lut.ndim == 3:          # cell-major tables
        s = simplex4d_cells(flat_lut, a, b, c, d, interval=interval,
                            cell_offset=lut_offset)
    else:
        s = simplex4d(flat_lut, a, b, c, d, interval=interval,
                      lut_offset=lut_offset)
    return jnp.sum(s, axis=0)


def lut_stage1(img: jnp.ndarray, luts_s1: Dict[str, jnp.ndarray],
               modes: Sequence[str], *, interval: int = 4, norm: int = 255):
    """Feature ("pre-filter") stage: int 0..255 image -> int 0..255 feature.

    feat = round_half_even(clip(Σ/(len(modes)·q), 0, 255)) — the reference's
    final-feature-stage averaging with avg_factor=len(modes), bias=0
    (eval_lut_sr.py:565-577).
    """
    q = 1 << interval
    pred = lut_ensemble(img, luts_s1, modes, interval=interval)[..., 0]
    den = len(modes) * q
    num = jnp.clip(pred, 0, norm * den)
    return round_half_even_div(num, den)


def lut_stage1_intermediate(img, luts_s1, modes, *, interval=4, norm=255):
    """Non-final feature stage (stages > 2): avg len(modes)·4, bias norm//2
    (eval_lut_sr.py:566-572)."""
    q = 1 << interval
    pred = lut_ensemble(img, luts_s1, modes, interval=interval)[..., 0]
    den = len(modes) * 4 * q
    num = jnp.clip(pred + (norm // 2) * den, 0, norm * den)
    return round_half_even_div(num, den)


def lut_stage2(img: jnp.ndarray, luts_s2: Dict[str, jnp.ndarray],
               modes2: Sequence[str], *, interval: int = 4, norm: int = 255):
    """Hyper stage: int 0..255 feature -> int 0..255 hyper codes, [...,H,W,oC].

    hyper_u8 = round_half_even(clip(Σ/(len(modes2)·4·q) + norm//2, 0, norm))
    (eval_lut_sr.py:621-628).  Divide by ``norm`` afterwards for the [0,1]
    hyper maps.
    """
    q = 1 << interval
    pred = lut_ensemble(img, luts_s2, modes2, interval=interval, split_r=True)
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
