"""SRNet micro-networks as pixel MLPs (the LeRF-L/G trainable form).

Reference: ``common/network.py:41-163`` — per-mode micro-CNNs that see only
4 input pixels, implemented there with an im2col unfold → tiny convs → fold
round-trip.  On TPU the same computation is a 4-feature MLP applied at every
pixel: one (H·W, 4) × (4, nf) matmul plus five more small matmuls — all MXU
work with zero data movement, replacing unfold/fold entirely.  The mode
geometry (which 4 pixels) is handled by the same static-shifted-slice
sampling as the LUT runtime (``lerf_tpu.ops.lut_pipeline``), and the
rotation ensemble rotates sampling offsets instead of images.

Weight layout note: a torch ``Conv2d(1, nf, 2)`` kernel ``[nf,1,2,2]``
flattens row-major to exactly our ``[4, nf]`` dense matrix in (a,b,c,d)
order for every mode ('s' direct, 'd' dilated corners, 'y'/'c'/'t' 1×4 row)
— verified in tests against the reference checkpoint.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lut_pipeline import MAX_PAD, _pad_all_sides, _sample4


def round_ste(x):
    """Straight-through rounding (BPDA): round forward, identity backward.

    Parity: ``round_func`` (resample/model.py:16-22).
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


# ---------------------------------------------------------------------------
# pixel-MLP (SRUnit equivalent)
# ---------------------------------------------------------------------------


def init_srunit(key, nf: int = 64, out_c: int = 1, dtype=jnp.float32) -> Dict:
    """Params for one SRUnit: conv1(4→nf), 4 dense blocks, head(5nf→outC).

    MSRA/Kaiming-normal init like the reference (network.py:15-24).
    """
    ks = jax.random.split(key, 6)

    def kaiming(k, fan_in, shape):
        std = np.sqrt(2.0 / fan_in)
        return (jax.random.normal(k, shape, dtype) * std)

    p = {
        "w1": kaiming(ks[0], 4, (4, nf)), "b1": jnp.zeros((nf,), dtype),
        "w2": kaiming(ks[1], nf, (nf, nf)), "b2": jnp.zeros((nf,), dtype),
        "w3": kaiming(ks[2], 2 * nf, (2 * nf, nf)),
        "b3": jnp.zeros((nf,), dtype),
        "w4": kaiming(ks[3], 3 * nf, (3 * nf, nf)),
        "b4": jnp.zeros((nf,), dtype),
        "w5": kaiming(ks[4], 4 * nf, (4 * nf, nf)),
        "b5": jnp.zeros((nf,), dtype),
        "w6": kaiming(ks[5], 5 * nf, (5 * nf, out_c)),
        "b6": jnp.zeros((out_c,), dtype),
    }
    return p


def apply_srunit(params: Dict, x4: jnp.ndarray) -> jnp.ndarray:
    """x4 [..., 4] → [..., outC] through the dense-block MLP + tanh.

    Matches SRUnit.forward (network.py:64-73): relu(conv1) then four
    DenseConvs (relu + concat) then 1×1 conv + tanh.
    """
    relu = jax.nn.relu
    h = relu(x4 @ params["w1"] + params["b1"])
    h = jnp.concatenate([h, relu(h @ params["w2"] + params["b2"])], -1)
    h = jnp.concatenate([h, relu(h @ params["w3"] + params["b3"])], -1)
    h = jnp.concatenate([h, relu(h @ params["w4"] + params["b4"])], -1)
    h = jnp.concatenate([h, relu(h @ params["w5"] + params["b5"])], -1)
    return jnp.tanh(h @ params["w6"] + params["b6"])


def srunit_on_image(params: Dict, img: jnp.ndarray, mode: str, rot: int):
    """Apply the pixel MLP over an image with mode geometry at rotation rot.

    img [..., H, W] float → [..., H, W, outC].  Replicate padding + rotated
    offsets replicate the reference's pad-after-rot90 exactly (see
    lut_pipeline.rotate_offset).
    """
    h, w = img.shape[-2], img.shape[-1]
    xpad = _pad_all_sides(img, MAX_PAD)
    a, b, c, d = _sample4(xpad, h, w, mode, rot)
    x4 = jnp.stack([a, b, c, d], axis=-1)
    return apply_srunit(params, x4)


def _stack_heads(heads):
    """List of SRUnit param dicts → one dict of [M, in, out] stacked mats.

    Member→head assignment is static, so the stack happens at trace time —
    no device gathers (XLA:TPU gathers are compile-time poison here); the
    whole mode×rotation ensemble becomes ONE batched-matmul chain on the
    MXU instead of 12 separate 6-matmul towers.
    """
    out = {}
    for k in heads[0]:
        out[k] = jnp.stack([h[k] for h in heads], axis=0)
    return out


def apply_srunit_batched(stacked: Dict, x4: jnp.ndarray) -> jnp.ndarray:
    """x4 [M, ..., 4] with stacked [M, in, out] weights → [M, ..., outC]."""
    relu = jax.nn.relu

    # bias broadcast: b [M, out] → [M, 1, ..., 1, out]
    def dense_nd(h, w, b):
        expand = (slice(None),) + (None,) * (h.ndim - 2)
        return jnp.einsum("m...i,mio->m...o", h, w) + b[expand]

    h = relu(dense_nd(x4, stacked["w1"], stacked["b1"]))
    h = jnp.concatenate([h, relu(dense_nd(h, stacked["w2"], stacked["b2"]))],
                        -1)
    h = jnp.concatenate([h, relu(dense_nd(h, stacked["w3"], stacked["b3"]))],
                        -1)
    h = jnp.concatenate([h, relu(dense_nd(h, stacked["w4"], stacked["b4"]))],
                        -1)
    h = jnp.concatenate([h, relu(dense_nd(h, stacked["w5"], stacked["b5"]))],
                        -1)
    return jnp.tanh(dense_nd(h, stacked["w6"], stacked["b6"]))


def ensemble_on_image(head_for_member, img: jnp.ndarray, members):
    """Batched rotation/mode ensemble: Σ-ready member outputs.

    ``members``: [(mode, rot)]; ``head_for_member(i)`` → SRUnit params for
    member i.  Returns [M, ..., H, W, outC].
    """
    h, w = img.shape[-2], img.shape[-1]
    xpad = _pad_all_sides(img, MAX_PAD)
    roles = [[], [], [], []]
    for mode, r in members:
        for role, sm in zip(roles, _sample4(xpad, h, w, mode, r)):
            role.append(sm)
    x4 = jnp.stack([jnp.stack(role, axis=0) for role in roles], axis=-1)
    stacked = _stack_heads([head_for_member(i) for i in range(len(members))])
    return apply_srunit_batched(stacked, x4)


# ---------------------------------------------------------------------------
# two-stage ensemble (SRNetsSWF2 equivalent)
# ---------------------------------------------------------------------------


def init_lerf_nets(key, *, modes: Sequence[str] = ("s", "c", "t"),
                   modes2: Sequence[str] = ("s", "c", "t"), nf: int = 64,
                   out_c: int = 3, stages: int = 2) -> Dict:
    """Parameter pytree for the LeRF two-stage micro-net ensemble.

    Layout parity with SRNetsSWF2 (model.py:69-93): stage-1 heads
    ``s1[mode]`` (r0 only, outC=1), stage-2 hyper heads ``s2[f"{mode}r{r}"]``
    (r∈{0,1}, outC=out_c).
    """
    n1 = len(modes) * max(stages - 1, 1)
    keys = jax.random.split(key, n1 + 2 * len(modes2))
    ki = iter(keys)
    s1 = {}
    for s in range(max(stages - 1, 1)):
        for m in modes:
            s1[f"s{s + 1}_{m}"] = init_srunit(next(ki), nf, 1)
    s2 = {}
    for m in modes2:
        for r in (0, 1):
            s2[f"{m}r{r}"] = init_srunit(next(ki), nf, out_c)
    return {"s1": s1, "s2": s2}


def resolve_backend(backend: str) -> str:
    """"auto" → the fused Pallas ensemble kernel on TPU, XLA elsewhere.

    One resolver shared by every dispatch site (NetPredictor, bench) so
    production and benchmark always pick the same implementation.
    ``pallas_int8`` (opt-in) = the quantized int8-MXU kernel
    (ops/pallas/srnet_kernel_int8.py) — heads must be pre-quantized with
    ``quantize_lerf_params``.
    """
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend not in ("xla", "pallas", "pallas_int8"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend


def quantize_lerf_params(params: Dict, *, interval: int = 4) -> Dict:
    """Post-training int8 quantization of every SRUnit head (host, once).

    Same pytree key structure as ``init_lerf_nets`` output, so the
    ``predict_stage*`` functions index it unchanged; pass the result as
    ``params`` with ``backend="pallas_int8"``.  Calibration sweeps the 17⁴
    deploy input lattice (the LUT-transfer enumeration).
    """
    from ..lut.transfer import lattice_inputs
    from ..ops.pallas.srnet_kernel_int8 import quantize_srunit_head

    calib = lattice_inputs(interval)
    return {sk: {name: quantize_srunit_head(
                 jax.tree.map(np.asarray, head), calib)
                 for name, head in params[sk].items()}
            for sk in ("s1", "s2")}


def _ensemble_pred(heads, x, members, half, *, backend: str,
                   interpret: bool = False):
    """Σ_m round(member_m · half): XLA (differentiable, round_ste) or the
    fused Pallas VMEM-chain kernel (inference-only — see
    ops/pallas/srnet_kernel.py; ~5× on chip, BASELINE.md)."""
    if backend == "pallas_int8":
        from ..ops.pallas.srnet_kernel_int8 import (
            ensemble_sum_on_image_int8, ensemble_sum_on_image_int8_ref)
        if interpret or jax.default_backend() == "tpu":
            return ensemble_sum_on_image_int8(heads, x, members, half=half,
                                              interpret=interpret)
        # same quantized arithmetic as plain XLA ops — CPU/GPU execution
        return ensemble_sum_on_image_int8_ref(heads, x, members, half=half)
    if backend == "pallas":
        from ..ops.pallas.srnet_kernel import ensemble_sum_on_image
        dt = heads[0]["w1"].dtype
        return ensemble_sum_on_image(heads, x, members, half=half,
                                     compute_dtype=dt, interpret=interpret)
    outs = ensemble_on_image(lambda i: heads[i], x, members)
    return jnp.sum(round_ste(outs * half), axis=0)


def predict_stage1(params: Dict, x: jnp.ndarray, *,
                   modes: Sequence[str] = ("s", "c", "t"),
                   stages: int = 2, norm: int = 255,
                   backend: str = "xla") -> jnp.ndarray:
    """Feature stage(s): x [..., H, W] in [0,1] → feature in [0,255].

    Parity: SRNetsSWF2.predict stage-1 branch (model.py:113-127):
    ``pred += round(rot_back(net(...)) · norm//2)`` over modes × 4 rots, then
    ``clamp(round(pred/len(modes)) + 0, 0, norm)`` for the final feature
    stage (norm divisor 1).  Straight-through rounding throughout.

    ``backend="pallas"`` uses the fused inference kernel (no autodiff);
    training keeps the default XLA path.
    """
    half = norm // 2
    members = [(m, r) for m in modes for r in range(4)]
    for s in range(stages - 1):
        heads = [params["s1"][f"s{s + 1}_{m}"] for m, _ in members]
        pred = _ensemble_pred(heads, x, members, half,
                              backend=backend)[..., 0]
        if s + 1 == stages - 1:
            avg, bias, div = float(len(modes)), 0.0, 1.0
        else:
            avg, bias, div = float(len(modes) * 4), float(half), float(norm)
        x = jnp.clip(round_ste(pred / avg) + bias, 0, norm) / div
    return x


def predict_stage2(params: Dict, x: jnp.ndarray, *,
                   modes2: Sequence[str] = ("s", "c", "t"),
                   norm: int = 255, backend: str = "xla") -> jnp.ndarray:
    """Hyper stage: x [..., H, W] in [0,1] → hyper [..., H, W, outC] in [0,1].

    Parity: SRNetsSWF2.predict stage-2 branch (model.py:101-112): r0 heads
    at rotations 0/2, r1 heads at 1/3 (hyper params are not
    rotation-equivariant), then clamp(round(pred/12 + 127), 0, 255)/255.
    """
    half = norm // 2
    members = [(m, r) for m in modes2 for r in range(4)]
    heads = [params["s2"][f"{m}r{r % 2}"] for m, r in members]
    pred = _ensemble_pred(heads, x, members, half, backend=backend)
    avg = float(len(modes2) * 4)
    return jnp.clip(round_ste(pred / avg + half), 0, norm) / float(norm)


def predict(params: Dict, x: jnp.ndarray, stage: int, *,
            modes=("s", "c", "t"), modes2=("s", "c", "t"), stages: int = 2,
            norm: int = 255, backend: str = "xla"):
    """Uniform duck-type predict(x, stage) like the reference model zoo."""
    if stage == 2:
        return predict_stage2(params, x, modes2=modes2, norm=norm,
                              backend=backend)
    return predict_stage1(params, x, modes=modes, stages=stages, norm=norm,
                          backend=backend)
