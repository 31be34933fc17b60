"""LUT fine-tuning: the LUT tables themselves as trainable parameters.

Reference: ``SWF2LUT`` (resample/model.py:132-431) — loads the transferred
``LUT_*.npy`` tables as float params (/127), runs differentiable 4D-simplex
interpolation with straight-through rounding, trains end-to-end through the
steerable resample, then re-quantizes to int8 ``LUTft_*.npy``
(train_model.py:481-499).

Parity note: the reference torch path has a copy-paste bug for modes c/t
(LSB fractions reuse the y geometry, model.py:222-243) while its numpy
deploy path is self-consistent; we implement the self-consistent geometry
(deploy semantics) — see SURVEY.md §2.2.

TPU-first: same offset-rotation ensemble as the int deploy pipeline
(:mod:`lerf_tpu.ops.lut_pipeline`); the interpolation reuses the branchless
rank-order simplex of :mod:`lerf_tpu.ops.simplex`, in float with BPDA.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..lut.io import LUTBank
from ..models.srnet import round_ste


def params_from_bank(bank: LUTBank) -> Dict:
    """LUT int8 values → float trainables /127 (model.py:144-160)."""
    if bank.inter:
        raise NotImplementedError(
            "LUT fine-tuning is two-stage only, like the reference SWF2LUT "
            "(model.py:140-158 loads s1/s2 tables exclusively); got a bank "
            f"with {bank.stages} stages")
    return {
        "s1": {k: jnp.asarray(v.astype(np.float32) / 127.0)
               for k, v in bank.stage1.items()},
        "s2": {k: jnp.asarray(v.astype(np.float32) / 127.0)
               for k, v in bank.stage2.items()},
    }


def bank_from_params(params: Dict, out_c: int, interval: int = 4) -> LUTBank:
    """Re-quantize fine-tuned tables to int8 (train_model.py:488-497)."""
    def q(v):
        return np.round(np.clip(np.asarray(v), -1, 1) * 127).astype(np.int8)

    return LUTBank(
        stage1={k: q(v) for k, v in params["s1"].items()},
        stage2={k: q(v) for k, v in params["s2"].items()},
        out_c=out_c, interval=interval)


def simplex4d_ste(lut: jnp.ndarray, a, b, c, d, interval: int = 4,
                  lut_offset=None):
    """Differentiable 4D-simplex interpolation with BPDA quantization.

    ``lut``: [L⁴, oC] float trainable (values ≈ [-1, 1]); a..d: float arrays
    of integer-valued 8-bit pixels (BPDA-rounded upstream).  Returns
    float ``a.shape + (oC,)`` ≈ [-127, 127] — the reference's
    ``InterpTorchBatch`` output BEFORE its final /q (model.py:177-385),
    using the rank-order blend of :func:`lerf_tpu.ops.simplex.simplex4d`.
    Gradients flow to ``lut`` linearly and to the inputs through the
    fractional blend weights.
    """
    q = float(1 << interval)
    L = (1 << (8 - interval)) + 1
    w = jnp.clip(round_ste(lut * 127.0), -127, 127)

    def split(x):
        i = jax.lax.stop_gradient(jnp.floor(x / q)).astype(jnp.int32)
        return i, x - i.astype(x.dtype) * q

    ia, fa = split(a)
    ib, fb = split(b)
    ic, fc = split(c)
    id_, fd = split(d)
    base = ((ia * L + ib) * L + ic) * L + id_
    if lut_offset is not None:
        base = base + lut_offset

    # strict pairwise wins on the (integer-valued) fractions
    gt = lambda x, y: jax.lax.stop_gradient(x > y)
    fab, fac, fad = gt(fa, fb), gt(fa, fc), gt(fa, fd)
    fbc, fbd, fcd = gt(fb, fc), gt(fb, fd), gt(fc, fd)
    ii = lambda m: m.astype(jnp.int32)
    sa = ii(fab) + ii(fac) + ii(fad)
    sb = (1 - ii(fab)) + ii(fbc) + ii(fbd)
    sc = (1 - ii(fac)) + (1 - ii(fbc)) + ii(fcd)
    sd = (1 - ii(fad)) + (1 - ii(fbd)) + (1 - ii(fcd))
    ranks = (3 - sa, 3 - sb, 3 - sc, 3 - sd)
    offs = (L * L * L, L * L, L, 1)
    fracs = (fa, fb, fc, fd)

    def at_rank(t):
        sel = [(r == t) for r in ranks]
        v = sum(f * s.astype(f.dtype) for f, s in zip(fracs, sel))
        o = sum(o_ * s.astype(jnp.int32) for o_, s in zip(offs, sel))
        return v, o

    v0, o0 = at_rank(0)
    v1, o1 = at_rank(1)
    v2, o2 = at_rank(2)
    v3, o3 = at_rank(3)
    cum1, cum2, cum3 = o0 + o1, o0 + o1 + o2, o0 + o1 + o2 + o3

    def gather(idx):
        return jnp.take(w, idx.reshape(-1), axis=0).reshape(
            idx.shape + (w.shape[1],))

    e = lambda x: x[..., None]
    out = (e(q - v0) * gather(base)
           + e(v0 - v1) * gather(base + o0)
           + e(v1 - v2) * gather(base + cum1)
           + e(v2 - v3) * gather(base + cum2)
           + e(v3) * gather(base + cum3))
    return out / q


def _ensemble(x: jnp.ndarray, luts: Dict, modes: Sequence[str],
              interval: int, split_r: bool):
    """Σ over modes × rotations of round_ste(member) (model.py:403-424).

    Batched like the int deploy path: one simplex interpolation over the
    stacked member inputs and concatenated tables (5 gathers total)."""
    from ..ops.lut_pipeline import stack_ensemble_inputs

    flat_lut, lut_offset, a, b, c, d = stack_ensemble_inputs(
        x, modes, split_r, luts)
    members = simplex4d_ste(flat_lut, a, b, c, d, interval,
                            lut_offset=lut_offset)
    return jnp.sum(round_ste(members), axis=0)


def predict_stage1(params: Dict, x: jnp.ndarray, *,
                   modes: Sequence[str] = ("s", "c", "t"), stages: int = 2,
                   norm: int = 255, interval: int = 4) -> jnp.ndarray:
    """x [...,H,W] in [0,1] → feature in [0,255] (model.py:415-429)."""
    x = round_ste(x * float(norm))
    half = norm // 2
    for s in range(stages - 1):
        pred = _ensemble(x, params["s1"], modes, interval, split_r=False)
        if s + 1 == stages - 1:
            x = jnp.clip(round_ste(pred[..., 0] / float(len(modes))), 0, norm)
        else:
            x = jnp.clip(round_ste(pred[..., 0] / (len(modes) * 4.0)) + half,
                         0, norm)
            x = round_ste(x)  # already integral; keeps parity explicit
    return x


def predict_stage2(params: Dict, x: jnp.ndarray, *,
                   modes2: Sequence[str] = ("s", "c", "t"), norm: int = 255,
                   interval: int = 4) -> jnp.ndarray:
    """x [...,H,W] in [0,1] → hyper [...,H,W,oC] in [0,1] (model.py:403-414)."""
    x = round_ste(x * float(norm))
    pred = _ensemble(x, params["s2"], modes2, interval, split_r=True)
    half = norm // 2
    avg = float(len(modes2) * 4)
    return jnp.clip(round_ste(pred / avg + half), 0, norm) / float(norm)
