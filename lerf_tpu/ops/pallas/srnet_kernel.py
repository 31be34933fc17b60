"""Fused micro-net (SRUnit) ensemble as a Pallas TPU kernel.

The LeRF trainable/serving network form evaluates 12 ensemble members
(3 modes × 4 rotations), each a 6-matmul DenseConv chain over 4 input
pixels per output pixel (reference: ``common/network.py:41-163``,
``resample/model.py:100-129``).  Under XLA each dot's activations
round-trip HBM — the chain is ~30 GB of intermediate traffic per frame and
measures ~100 ms at 360×640 RGB, memory-bound (bf16 is no faster than f32:
tools/exp_net_profile.py).

This kernel keeps the ENTIRE chain in VMEM: activations live as
``[features, pixels]`` tiles (features on sublanes so the contraction dims
are 64–320 — MXU-friendly), all 12 members' weights stay VMEM-resident
across the pixel grid, the member loop is unrolled in-kernel, and the
ensemble's member-sum ``Σ_m round(member · norm//2)`` (the reference's
``pred += torch.round(... * 127)``, resample/model.py:103-127) is
accumulated in place, so HBM sees only the 4-pixel operands in and one
summed [oC, N] tile out.

Forward/inference only — the training path keeps the XLA implementation
(autodiff through ``round_ste``).  Bit-parity with the XLA ensemble is
float-tolerance (identical math, different scheduling); parity tests in
tests/test_srnet_kernel.py, on-chip timing in BASELINE.md.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lut_pipeline import MAX_PAD, _pad_all_sides, _sample4

LAYERS = ("1", "2", "3", "4", "5", "6")


def _dotf(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _make_kernel(n_members: int, half: float, compute_dtype):
    def kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
               out_ref):
        ws = (w2, w3, w4, w5)
        bs = (b2, b3, b4, b5)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for m in range(n_members):
            x = x_ref[m].astype(compute_dtype)                 # [4, BN]
            h = jax.nn.relu(_dotf(w1[m], x) + b1[m])           # [64, BN]
            h = h.astype(compute_dtype)
            for wk, bk in zip(ws, bs):
                hn = jax.nn.relu(_dotf(wk[m], h) + bk[m])
                h = jnp.concatenate([h, hn.astype(compute_dtype)], axis=0)
            o = jnp.tanh(_dotf(w6[m], h) + b6[m])              # [oC, BN]
            acc = acc + jnp.round(o * half)
        out_ref[:] = acc

    return kernel


def stack_heads_transposed(heads: Sequence[Dict], compute_dtype):
    """SRUnit param dicts → kernel operands: wK [M, out, in] (transposed for
    the [features, pixels] activation layout), biases [M, out, 1] f32."""
    ops = []
    for k in LAYERS:
        w = jnp.stack([h[f"w{k}"] for h in heads], 0)          # [M, in, out]
        b = jnp.stack([h[f"b{k}"] for h in heads], 0)          # [M, out]
        ops.append(jnp.transpose(w, (0, 2, 1)).astype(compute_dtype))
        ops.append(b[..., None].astype(jnp.float32))
    return ops


@functools.partial(jax.jit, static_argnames=("half", "block_n", "interpret"))
def _ensemble_sum_flat(x4, weight_ops, *, half: float, block_n: int,
                       interpret: bool):
    """x4 [M, 4, N] → Σ_m round(chain_m(x4[m]) · half), shape [oC, N]."""
    m, _, n = x4.shape
    oc = weight_ops[-1].shape[1]
    compute_dtype = weight_ops[0].dtype
    npad = -(-n // block_n) * block_n
    if npad != n:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, npad - n)))

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((m, 4, block_n), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(op.shape) for op in weight_ops]

    out = pl.pallas_call(
        _make_kernel(m, half, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((oc, npad), jnp.float32),
        grid=(npad // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((oc, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, *weight_ops)
    return out[:, :n]


def ensemble_sum_on_image(heads: Sequence[Dict], img: jnp.ndarray,
                          members, *, half: float,
                          compute_dtype=jnp.float32, block_n: int = 2048,
                          interpret: bool = False) -> jnp.ndarray:
    """Rounded member-sum of the mode×rotation ensemble over an image.

    ``img`` [..., H, W] float; ``members`` [(mode, rot)] aligned with
    ``heads``.  Returns [..., H, W, oC] float32 — equal (float tolerance)
    to ``jnp.sum(jnp.round(ensemble_on_image(...) * half), axis=0)``.
    """
    h, w = img.shape[-2], img.shape[-1]
    lead = img.shape[:-2]
    xpad = _pad_all_sides(img, MAX_PAD)
    x4 = jnp.stack(
        [jnp.stack(_sample4(xpad, h, w, mode, r), axis=0)
         for mode, r in members], axis=0)                # [M, 4, ..., H, W]
    x4 = x4.reshape(len(members), 4, -1)
    ops = stack_heads_transposed(heads, compute_dtype)
    out = _ensemble_sum_flat(x4, ops, half=float(half), block_n=block_n,
                             interpret=interpret)        # [oC, N]
    oc = out.shape[0]
    out = out.reshape((oc,) + lead + (h, w))
    return jnp.moveaxis(out, 0, -1)
