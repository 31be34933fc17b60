"""Space-to-depth execution of the IMDN (LeRF-Net) towers.

The reference IMDN_RTC towers (``resample/model.py:475-537``) are stacks of
3x3 stride-1 convolutions at nf=12 channels.  On TPU a 12-lane minor dim is
padded to 128 lanes in both HBM layout and MXU tiles, so the stock NHWC
execution moves ~10x the necessary bytes between every conv and runs the MXU
at ~1/10 density (BASELINE.md "IMDN form cost note").

This module re-blocks the computation *exactly*: the input is space-to-depth
re-laid-out by a factor ``b`` (each bxb pixel block becomes b^2 channel
phases), and every conv kernel is re-embedded on the host into an equivalent
conv over ``C*b^2`` channels:

    y[i*b+p, j*b+q, k] = sum_{di,dj,c} W[di,dj,c,k] * x[i*b+p+di, j*b+q+dj, c]

becomes, with t = p+di = Di*b+u (and s = q+dj = Dj*b+v),

    y2[i, j, k*b^2+(p,q)] = sum_{Di,Dj,c,(u,v)} W2[Di,Dj, c*b^2+(u,v),
                                                   k*b^2+(p,q)] * x2[i+Di, j+Dj]

with W2 holding each original tap in exactly one (phase_in, phase_out) slot
and zeros elsewhere.  The zero-inflation keeps padded-MXU FLOPs identical,
but the activation minor dim grows 12 -> 12*b^2, cutting padded HBM traffic
between convs by ~b^2 (b=2: 48 lanes; b=4: 192 lanes) and collapsing b^2
pixels into each (8,128) tile.

Channel layout is c' = c*b^2 + (u*b + v) (original-channel major), so the
IMDModule channel splits/concats remain contiguous slices in s2d space.

Exactness: re-indexing only - every output value is the same sum of the same
products, modulo float summation order (the MXU accumulates the padded K dim
in f32 either way).  Parity test: tests/test_imdn.py::test_s2d_matches_base.

Non-multiple sizes are zero-padded up to a multiple of b; because a SAME conv
treats out-of-range taps as zeros, the pad region is re-zeroed after every
conv (a fused elementwise mask) so no garbage propagates into valid pixels -
bit-honest for every input size.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp
from jax import lax


def resolve_backend(backend: str) -> str:
    """Shared by NetPredictor.from_imdn and bench.py so production and
    benchmark dispatch identically.  "auto" resolves to s2d on TPU, stock
    flax elsewhere: measured on one v5e chip (tools/exp_imdn_s2d.py,
    2026-08-19, 360×640 serving towers) the s2d-2 re-embedding runs the
    stage chain in 5.1 ms bf16 / 5.5 f32 vs 23.7 / 25.4 for the stock
    12-lane path — the ~b² padded-HBM-traffic cut is real on hardware
    (s2d-4 measures the same as s2d-2, so block=2 stays the default).
    On CPU there is no lane padding to recover, so stock wins there."""
    if backend == "auto":
        import jax
        return "s2d" if jax.default_backend() == "tpu" else "base"
    if backend not in ("base", "s2d"):
        raise ValueError(f"unknown IMDN backend {backend!r}")
    return backend


# -- host-side weight re-embedding -------------------------------------------

def embed_kernel(w: np.ndarray, b: int) -> np.ndarray:
    """Embed an odd-sized [kh,kw,cin,cout] SAME/stride-1 conv kernel into the
    equivalent s2d-space kernel [KH,KW,cin*b^2,cout*b^2] (see module doc)."""
    kh, kw, cin, cout = w.shape
    if kh % 2 != 1 or kw % 2 != 1:
        raise ValueError("embed_kernel needs odd kernel sizes")
    rh, rw = kh // 2, kw // 2
    Rh, Rw = (b - 1 + rh) // b, (b - 1 + rw) // b
    w2 = np.zeros((2 * Rh + 1, 2 * Rw + 1, cin * b * b, cout * b * b),
                  dtype=w.dtype)
    bb = b * b
    for p in range(b):
        for q in range(b):
            for di in range(-rh, rh + 1):
                for dj in range(-rw, rw + 1):
                    t, s = p + di, q + dj
                    Di, u = t // b, t % b       # floor-div: correct for t<0
                    Dj, v = s // b, s % b
                    w2[Di + Rh, Dj + Rw,
                       u * b + v::bb,
                       p * b + q::bb] = w[di + rh, dj + rw]
    return w2


def embed_bias(bias: np.ndarray, b: int) -> np.ndarray:
    """[cout] -> [cout*b^2], each channel repeated over its b^2 phases."""
    return np.repeat(np.asarray(bias), b * b)


def convert_tower(tower_params: Dict, b: int) -> Dict:
    """Re-embed an IMDN_RTC tower's param tree (flax layout: ``fea``,
    ``imd{i}.c1..c5``, ``lr``, ``up`` with {kernel,bias}) for s2d-b
    execution.  Returns a plain dict of jnp arrays."""
    def emb(p):
        return {
            "kernel": jnp.asarray(embed_kernel(np.asarray(p["kernel"]), b)),
            "bias": jnp.asarray(embed_bias(np.asarray(p["bias"]), b)),
        }

    out: Dict = {}
    for name, p in tower_params.items():
        if name.startswith("imd"):
            out[name] = {k: emb(v) for k, v in p.items()}
        else:
            out[name] = emb(p)
    return out


def convert_imdn2(variables: Dict, b: int) -> Dict:
    """Re-embed both towers of an IMDN2 variables tree."""
    params = variables["params"]
    return {"params": {
        "stage1": convert_tower(params["stage1"], b),
        "stage2": convert_tower(params["stage2"], b),
    }}


# -- s2d data movement --------------------------------------------------------

def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> [B,H/b,W/b,C*b^2], layout c' = c*b^2 + (u*b+v)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H // b, W // b, C * b * b)


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    B, H2, W2, Cbb = x.shape
    C = Cbb // (b * b)
    x = x.reshape(B, H2, W2, C, b, b)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H2 * b, W2 * b, C)


# -- s2d-space forward --------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, p, mask, dtype, b):
    """SAME conv + bias; ``mask`` (if any) is the [1,H2,W2,b^2] phase-validity
    mask, re-applied after every conv so zero-padded rows/cols of non-multiple
    inputs never leak into valid pixels (applied channel-agnostically via a
    [..., C, b^2] reshape — XLA fuses it into the conv epilogue)."""
    k = p["kernel"].astype(dtype)
    y = lax.conv_general_dilated(x.astype(dtype), k, (1, 1), "SAME",
                                 dimension_numbers=_DN)
    y = y + p["bias"].astype(dtype)
    if mask is not None:
        B, H2, W2, Cbb = y.shape
        bb = b * b
        y = (y.reshape(B, H2, W2, Cbb // bb, bb)
             * mask.reshape(1, H2, W2, 1, bb)).reshape(y.shape)
    return y


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.05 * x)


def _imd_module(x, p, dc2, mask, dtype, b):
    """IMDModuleSpeed (model.py:480-503) in s2d space; dc2 = dc*b^2."""
    c1 = _lrelu(_conv(x, p["c1"], mask, dtype, b))
    d1, r1 = c1[..., :dc2], c1[..., dc2:]
    c2 = _lrelu(_conv(r1, p["c2"], mask, dtype, b))
    d2, r2 = c2[..., :dc2], c2[..., dc2:]
    c3 = _lrelu(_conv(r2, p["c3"], mask, dtype, b))
    d3, r3 = c3[..., :dc2], c3[..., dc2:]
    c4 = _conv(r3, p["c4"], mask, dtype, b)
    out = jnp.concatenate([d1, d2, d3, c4], axis=-1)
    return _conv(out, p["c5"], mask, dtype, b) + x


def apply_tower_s2d(p2: Dict, x: jnp.ndarray, *, block: int, nf: int = 12,
                    num_modules: int = 5, distillation_rate: float = 0.25,
                    dtype: Any = jnp.float32,
                    valid_hw=None) -> jnp.ndarray:
    """IMDN_RTC forward (upscale=1) with s2d-``block`` re-layout.

    ``x``: NHWC float in model units.  Handles any H,W (zero-pad + per-conv
    re-mask for non-multiples).  Returns NHWC [B,H,W,out_nc].

    ``valid_hw=(h, w)`` (traced scalars): bucketed serving — the input is
    zeroed beyond (h, w) and the per-conv re-mask uses the traced bounds,
    so every conv window inside the valid region sees exactly the zeros
    the unpadded program's SAME-padding would provide (bit-exact; output
    beyond (h, w) is garbage the caller masks/clamps).  ``block=1`` makes
    this the masked execution of the STOCK tower (the b=1 re-embedding is
    the identity), which is how the base backend serves bucketed.

    ``valid_hw=(row_lo, row_hi, w)`` (3-tuple) additionally masks rows
    BELOW ``row_lo`` — the halo-exchange sharded execution
    (parallel.spatial), where a device whose slab touches the true image
    top holds zero-filled halo rows that must behave as SAME padding at
    every conv depth, exactly like the bottom bound.
    """
    b = block
    B, H, W, C = x.shape
    Hp, Wp = -(-H // b) * b, -(-W // b) * b
    mask = None
    if valid_hw is not None and len(valid_hw) == 3:
        lo, hi, w = valid_hw
        rows = jnp.arange(Hp)
        m = (((rows >= lo) & (rows < hi))[:, None]
             & (jnp.arange(Wp) < w)[None, :]).astype(dtype)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        x = x * m[None, :, :, None]
        mask = space_to_depth(m[None, :, :, None], b)     # [1,H2,W2,b^2]
    elif valid_hw is not None:
        h, w = valid_hw
        m = ((jnp.arange(Hp) < h)[:, None]
             & (jnp.arange(Wp) < w)[None, :]).astype(dtype)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        x = x * m[None, :, :, None]
        mask = space_to_depth(m[None, :, :, None], b)     # [1,H2,W2,b^2]
    elif (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        m = np.zeros((Hp, Wp), np.float32)
        m[:H, :W] = 1.0
        m2 = space_to_depth(jnp.asarray(m)[None, :, :, None], b)  # [1,H2,W2,b^2]
        mask = m2.astype(dtype)

    x2 = space_to_depth(x, b)

    dc2 = int(nf * distillation_rate) * b * b
    h = _conv(x2, p2["fea"], mask, dtype, b)
    r = h
    for i in range(num_modules):
        r = _imd_module(r, p2[f"imd{i}"], dc2, mask, dtype, b)
    r = _conv(r, p2["lr"], mask, dtype, b)
    h = h + r
    up = _conv(h, p2["up"], None, dtype, b)   # output is cropped; no mask
    out = depth_to_space(up, b)
    return out[:, :H, :W, :]


def predict_imdn2_s2d(p2: Dict, x: jnp.ndarray, stage: int, *, block: int,
                      nf: int = 12, norm: int = 255,
                      dtype: Any = jnp.float32, valid_hw=None):
    """IMDN2.predict (model.py:526-537) on s2d-converted params ``p2``
    (from :func:`convert_imdn2`).  x NHWC in [0,1]."""
    params = p2["params"][f"stage{stage}"]
    y = apply_tower_s2d(params, x, block=block, nf=nf, dtype=dtype,
                        valid_hw=valid_hw)
    half = norm // 2
    if stage == 2:
        return jnp.clip(y, -1, 1) / 2 + 0.5
    return jnp.clip(y, -1, 1) * half + half


#: Chained spatial (3x3) convs per IMDN_RTC tower (upscale=1): ``fea`` +
#: 5 modules x (c1..c4) + ``up`` (c5 and lr are 1x1) — the tower's
#: receptive-field radius in rows/cols, and hence the depth to which
#: band-edge garbage propagates when a tower runs on a row slab
#: (parallel.spatial.imdn_stages_sharded).
TOWER_SPATIAL_CONVS = 22


def tower_halo_rows() -> int:
    """Image rows of band-edge halo ONE tower run needs for its interior
    output rows to be exact — independent of backend and s2d block: the
    s2d conversion preserves the image-space 3×3 receptive field (the
    converted kernel's extra taps are zero), so a corrupted input row
    spreads exactly ±22 image rows for block 1, 2, and 3 alike (measured:
    corrupt row r → garbage rows r−22..r+22, every block/alignment)."""
    return TOWER_SPATIAL_CONVS


def make_chw_stage_fns(variables: Dict, *, backend: str, block: int = 2,
                       nf: int = 12, norm: int = 255, out_c: int = 3,
                       dtype: Any = jnp.float32, model=None):
    """Build the channel-first IMDN2 stage fns shared by
    ``pipeline.NetPredictor.from_imdn`` and the row-sharded pipeline
    (``parallel.spatial.imdn_stages_sharded``).

    Returns ``(variables', s1, s2)`` where ``variables'`` are the (possibly
    s2d-converted) params and

    - ``s1(p, x, valid_hw=None)``: ``x`` [..., C, H, W] in [0,1] → feature
      [..., C, H, W] in [0,255] (reference eval_model.py:124-129 semantics),
    - ``s2(p, x, valid_hw=None)``: → hyper [..., C, H, W, out_c] in [0,1]
      (the reference's interleaved 3·C hyper channels, eval_model.py:149,
      reshaped to the trailing-axis convention).

    ``valid_hw=(h, w)`` (traced scalars) runs the per-conv re-masked
    execution that reproduces the unpadded program's SAME zero padding at
    ``(h, w)`` on a larger frame — the primitive behind both bucketed
    serving and the sharded band execution.  ``model`` (the flax IMDN2
    module) is only consulted for the base backend's unmasked path; when
    absent, the bit-equivalent ``block=1`` re-embedding runs instead.
    """
    backend = resolve_backend(backend)
    if backend == "s2d":
        variables = convert_imdn2(variables, block)

        def apply_fn(p, x, stage, valid_hw=None):
            return predict_imdn2_s2d(p, x, stage, block=block, nf=nf,
                                     norm=norm, dtype=dtype,
                                     valid_hw=valid_hw)
    else:
        def apply_fn(p, x, stage, valid_hw=None):
            if valid_hw is None and model is not None:
                return model.apply(p, x, stage)
            # the b=1 re-embedding is the stock computation (with traced
            # per-conv re-masking when valid_hw is given)
            return predict_imdn2_s2d({"params": p["params"]}, x, stage,
                                     block=1, nf=nf, norm=norm, dtype=dtype,
                                     valid_hw=valid_hw)

    def to_nhwc(x):                    # [..., C, H, W] → NHWC batch
        nhwc = jnp.moveaxis(x, -3, -1)
        return (nhwc[None], True) if nhwc.ndim == 3 else (nhwc, False)

    def s1(p, x, valid_hw=None):       # x [..., C,H,W] → [..., C,H,W]
        nhwc, single = to_nhwc(x)
        out = apply_fn(p, nhwc, 1, valid_hw)
        out = out[0] if single else out
        return jnp.moveaxis(out, -1, -3)

    def s2(p, x, valid_hw=None):
        nhwc, single = to_nhwc(x)
        out = apply_fn(p, nhwc, 2, valid_hw)      # [B,H,W,3·C]
        out = out[0] if single else out
        c = x.shape[-3]
        # [..., H,W,oC,C] → [..., C,H,W,oC]
        out = out.reshape(out.shape[:-1] + (out_c, c))
        return jnp.moveaxis(out, -1, -4)

    return variables, s1, s2
