"""int8-MXU variant of the fused SRUnit-ensemble kernel (opt-in serving).

The f32/bf16 fused kernel (``srnet_kernel.py``) is compute-bound at ~47%
of the bf16 MXU peak (BASELINE.md "Fused SRUnit-ensemble"); the v5e MXU
runs int8×int8→int32 passes at 2× the bf16 rate, so the remaining
net-form headroom is quantized arithmetic.  This module is that path:
post-training symmetric int8 quantization of every dot in the DenseConv
chain, built so the kernel adds NO extra multiplies over the float
version — all scales fold into the per-layer scale+bias the kernel
already applies:

- **Input layer is exact.**  Deploy-form stage inputs are 8-bit codes
  ``k/255`` (reference quantizes between stages — model.py:113-127), so
  ``xq = k − 128`` is an exact int8 representation; the 1/255 scale folds
  into the layer-1 weights and the −128 shift into its bias.
- **Weights**: per-output-channel symmetric int8 (`round(W/s)`, s =
  col-max/127); the channel scale becomes the f32 column vector the
  kernel multiplies into the int32 accumulator.
- **Activations**: per-(head, layer) scale calibrated as the max over the
  17⁴ deploy input lattice (`lut/transfer.py::lattice_inputs` — the same
  enumeration the LUT transfer sweeps); the quantization factor 127/s is
  folded into that layer's scale+bias, so requantization is just
  ``clip(round(·), 0, 127) → int8`` (clip-at-0 doubles as the ReLU).
- **DenseConv concat**: each concatenated segment keeps its own scale by
  scaling the *rows* of the next layer's weight matrix at prep time —
  the concatenated int8 activations need no common scale.

Quality: the ensemble's member-sum rounds each member to 1/127 anyway
(``round(tanh(·)·127)``), so 7-bit hidden activations sit below the
output quantization the architecture was trained through; measured
end-to-end deltas are in BASELINE.md ("int8 serving form").  Inference
only, opt-in via ``backend="pallas_int8"`` — the parity/bench default
remains the float kernel.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lut_pipeline import MAX_PAD, _pad_all_sides, _sample4
from .srnet_kernel import LAYERS

_SEGS = (1, 1, 2, 3, 4, 5)   # input segments per layer (of 64 features each;
                             # layer 1's "segment" is the 4-pixel input)


def _doti8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# host-side quantization prep
# ---------------------------------------------------------------------------


def quantize_srunit_head(head: Dict, calib_x4: np.ndarray,
                         margin: float = 1.05) -> Dict:
    """Float SRUnit params → int8 kernel operands (host, one-time).

    ``calib_x4`` [N, 4] in [0,1] — activation-scale calibration inputs
    (the 17⁴ lattice covers the deploy input space's corners).  Returns
    ``{"wK": int8 [out,in], "cK": f32 [out,1], "bK": f32 [out,1]}`` for
    K=1..6 with every scale pre-folded as described in the module doc.
    """
    w = {k: np.asarray(head[f"w{k}"], np.float32) for k in LAYERS}
    b = {k: np.asarray(head[f"b{k}"], np.float32) for k in LAYERS}
    nf = w["1"].shape[1]                         # segment width (64 default)

    # calibration forward (f32, same math as apply_srunit) capturing the
    # PER-CHANNEL post-ReLU maxima — channel scales fold into weight rows
    # (inputs) and the colscale/bias (outputs), so they cost the kernel
    # nothing and isolate outlier channels from the whole layer's step size
    x = np.asarray(calib_x4, np.float32)
    segs = []                                    # h1..h5 [N, nf]
    h = np.maximum(x @ w["1"] + b["1"], 0.0)
    segs.append(h)
    cat = h
    for k in LAYERS[1:5]:
        hn = np.maximum(cat @ w[k] + b[k], 0.0)
        segs.append(hn)
        cat = np.concatenate([cat, hn], axis=-1)
    s_act = [np.maximum(s.max(axis=0) * margin, 1e-6) for s in segs]  # [nf]

    out = {}

    def quant_cols(weff: np.ndarray):
        sw = np.maximum(np.abs(weff).max(axis=0) / 127.0, 1e-12)
        wq = np.round(weff / sw).astype(np.int8)          # [in, out]
        return wq, sw.astype(np.float32)

    # layer 1: exact int8 input xq = round(x·255) − 128
    w1eff = w["1"] / 255.0
    b1eff = b["1"] + (128.0 / 255.0) * w["1"].sum(axis=0)
    wq, sw = quant_cols(w1eff)
    qf = 127.0 / s_act[0]
    out["w1"] = wq.T                                       # [out, in]
    out["c1"] = (sw * qf)[:, None]
    out["b1"] = (b1eff * qf)[:, None]

    # hidden layers 2..5: rows scaled by their channel's s/127; outputs
    # requantized by 127/s_k[channel] (folded into colscale/bias)
    for li, k in enumerate(LAYERS[1:5], start=1):
        weff = w[k].copy()
        for j in range(_SEGS[li]):
            weff[nf * j:nf * (j + 1)] *= (s_act[j] / 127.0)[:, None]
        wq, sw = quant_cols(weff)
        qf = 127.0 / s_act[li]
        out[f"w{k}"] = wq.T
        out[f"c{k}"] = (sw * qf)[:, None]
        out[f"b{k}"] = (b[k] * qf)[:, None]

    # head layer 6: tanh output stays f32 (no requant)
    weff = w["6"].copy()
    for j in range(5):
        weff[nf * j:nf * (j + 1)] *= (s_act[j] / 127.0)[:, None]
    wq, sw = quant_cols(weff)
    out["w6"] = wq.T
    out["c6"] = sw[:, None]
    out["b6"] = b["6"][:, None].astype(np.float32)
    return out


def stack_qheads(qheads: Sequence[Dict]):
    """Per-member quantized dicts → the kernel's 18 stacked operands
    [w1,c1,b1, …, w6,c6,b6] with a leading member axis."""
    ops = []
    for k in LAYERS:
        ops.append(jnp.stack([jnp.asarray(q[f"w{k}"]) for q in qheads], 0))
        ops.append(jnp.stack([jnp.asarray(q[f"c{k}"]) for q in qheads], 0))
        ops.append(jnp.stack([jnp.asarray(q[f"b{k}"]) for q in qheads], 0))
    return ops


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _requant(acc, c, b):
    """int32 accumulator → requantized int8 activation.

    clip-at-0 of the rounded value doubles as the ReLU (round(relu(x)) ==
    clip(round(x), 0, ·) — both map x<0 to 0)."""
    v = acc.astype(jnp.float32) * c + b
    return jnp.clip(jnp.round(v), 0, 127).astype(jnp.int8)


def _make_kernel_int8(n_members: int, half: float):
    def kernel(x_ref, w1, c1, b1, w2, c2, b2, w3, c3, b3, w4, c4, b4,
               w5, c5, b5, w6, c6, b6, out_ref):
        mids = ((w2, c2, b2), (w3, c3, b3), (w4, c4, b4), (w5, c5, b5))
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for m in range(n_members):
            x = x_ref[m]                                       # int8 [4, BN]
            h = _requant(_doti8(w1[m], x), c1[m], b1[m])       # int8 [64, BN]
            for wk, ck, bk in mids:
                hn = _requant(_doti8(wk[m], h), ck[m], bk[m])
                h = jnp.concatenate([h, hn], axis=0)
            o = jnp.tanh(_doti8(w6[m], h).astype(jnp.float32) * c6[m]
                         + b6[m])                              # f32 [oC, BN]
            acc = acc + jnp.round(o * half)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("half", "block_n", "interpret"))
def _ensemble_sum_flat_int8(x4q, qops, *, half: float, block_n: int,
                            interpret: bool):
    """x4q int8 [M, 4, N] → Σ_m round(chain_m · half), f32 [oC, N]."""
    m, _, n = x4q.shape
    oc = qops[-3].shape[1]                                 # w6 [M, oC, in]
    npad = -(-n // block_n) * block_n
    if npad != n:
        x4q = jnp.pad(x4q, ((0, 0), (0, 0), (0, npad - n)))

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((m, 4, block_n), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(op.shape) for op in qops]

    out = pl.pallas_call(
        _make_kernel_int8(m, half),
        out_shape=jax.ShapeDtypeStruct((oc, npad), jnp.float32),
        grid=(npad // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((oc, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4q, *qops)
    return out[:, :n]


def _sample_x4q(img, members):
    """img [..., H, W] float codes/255 → exact int8 operand [M, 4, N]."""
    h, w = img.shape[-2], img.shape[-1]
    codes = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int16)
    xpad = _pad_all_sides((codes - 128).astype(jnp.int8), MAX_PAD)
    x4 = jnp.stack(
        [jnp.stack(_sample4(xpad, h, w, mode, r), axis=0)
         for mode, r in members], axis=0)                  # [M, 4, ..., H, W]
    return x4.reshape(len(members), 4, -1)


def _unflatten(out, img, n_members):
    oc = out.shape[0]
    lead = img.shape[:-2]
    out = out.reshape((oc,) + lead + (img.shape[-2], img.shape[-1]))
    return jnp.moveaxis(out, 0, -1)


def ensemble_sum_on_image_int8(qheads: Sequence[Dict], img: jnp.ndarray,
                               members, *, half: float, block_n: int = 2048,
                               interpret: bool = False) -> jnp.ndarray:
    """int8 twin of ``srnet_kernel.ensemble_sum_on_image``.

    ``img`` [..., H, W] float in [0,1] holding exact 8-bit codes k/255
    (the deploy-form stage contract); ``qheads`` aligned with ``members``
    from :func:`quantize_srunit_head`.  Returns [..., H, W, oC] f32.
    """
    x4 = _sample_x4q(img, members)
    ops = stack_qheads(qheads)
    out = _ensemble_sum_flat_int8(x4, ops, half=float(half),
                                  block_n=block_n, interpret=interpret)
    return _unflatten(out, img, len(members))


@functools.partial(jax.jit, static_argnames=("half",))
def _ensemble_sum_flat_int8_ref(x4q, qops, *, half: float):
    """Plain-XLA reference of the kernel's quantized arithmetic (same int
    dots, same f32 scale+bias order) — the non-TPU execution path for
    ``backend="pallas_int8"`` and the oracle the kernel is tested against.
    Batched over members; tanh is the only op that may differ from Mosaic
    by 1 ULP (bounded in tests)."""
    def dot(w, h):                                  # [M,o,i] × [M,i,N]
        return jax.lax.dot_general(
            w, h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    def requant(acc, c, b):
        v = acc.astype(jnp.float32) * c + b
        return jnp.clip(jnp.round(v), 0, 127).astype(jnp.int8)

    w1, c1, b1, w2, c2, b2, w3, c3, b3, w4, c4, b4, w5, c5, b5, \
        w6, c6, b6 = qops
    h = requant(dot(w1, x4q), c1, b1)
    for wk, ck, bk in ((w2, c2, b2), (w3, c3, b3), (w4, c4, b4),
                       (w5, c5, b5)):
        hn = requant(dot(wk, h), ck, bk)
        h = jnp.concatenate([h, hn], axis=1)
    o = jnp.tanh(dot(w6, h).astype(jnp.float32) * c6 + b6)
    return jnp.sum(jnp.round(o * half), axis=0)           # [oC, N]


def ensemble_sum_on_image_int8_ref(qheads: Sequence[Dict], img: jnp.ndarray,
                                   members, *, half: float) -> jnp.ndarray:
    """XLA twin of :func:`ensemble_sum_on_image_int8` (same arithmetic)."""
    x4 = _sample_x4q(img, members)
    ops = stack_qheads(qheads)
    out = _ensemble_sum_flat_int8_ref(x4, ops, half=float(half))
    return _unflatten(out, img, len(members))
