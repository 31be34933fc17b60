"""Network → LUT transfer (on-device exhaustive enumeration).

Reference: ``resample/transfer_to_lut.py`` — enumerate the 17⁴ quantized
input lattice, run every trained head over it, quantize to int8.

TPU-first: the reference must re-embed each 4-tuple into every mode's 2-D
conv receptive field (``get_mode_input_tensor``) because its heads are
CNNs; our heads are pixel MLPs over the (a,b,c,d) role vector, so the
enumeration is a single ``[17⁴, 4]`` matrix and each head is one batched
matmul chain on the MXU — no chunking, no geometry embedding.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.srnet import apply_srunit
from .io import LUTBank


def lattice_1d(interval: int = 4) -> np.ndarray:
    """base = arange(0, 257, 2^interval) with base[-1] -= 1 → {0,16,…,240,255}
    (transfer_to_lut.py:13-15)."""
    base = np.arange(0, 257, 2 ** interval)
    base[-1] -= 1
    return base


def lattice_inputs(interval: int = 4) -> np.ndarray:
    """All L⁴ (a,b,c,d) tuples / 255 → float32 [L⁴, 4], ordered like the
    reference's first/second/third/fourth nested repeat (transfer_to_lut.py:16-36)."""
    base = lattice_1d(interval).astype(np.float64)
    L = base.shape[0]
    a = np.repeat(base, L ** 3)
    b = np.tile(np.repeat(base, L ** 2), L)
    c = np.tile(np.repeat(base, L), L ** 2)
    d = np.tile(base, L ** 3)
    return (np.stack([a, b, c, d], axis=-1) / 255.0).astype(np.float32)


def quantize_head(out: np.ndarray) -> np.ndarray:
    """round(clamp(out,-1,1)·127) int8 (transfer_to_lut.py:124-129)."""
    return np.round(np.clip(out, -1, 1) * 127).astype(np.int8)


@jax.jit
def _run_head(head_params: Dict, x4: jnp.ndarray) -> jnp.ndarray:
    return apply_srunit(head_params, x4)


def transfer_to_lut(params: Dict, *, modes: Sequence[str] = ("s", "c", "t"),
                    modes2: Sequence[str] = ("s", "c", "t"),
                    stages: int = 2, out_c: int = 3,
                    interval: int = 4) -> LUTBank:
    """Enumerate every head of a trained lerf-nets pytree into int8 LUTs.

    Hyper heads keep separate r0/r1 tables; feature heads r0 only
    (transfer_to_lut.py:100-170).  With stages > 2, each feature stage gets
    its own table set (heads keyed ``s{n}_{mode}`` by
    :func:`lerf_tpu.models.srnet.init_lerf_nets`) — earlier stages land in
    ``LUTBank.inter``, the last in ``LUTBank.stage1``, matching the
    reference's per-stage bank files (eval_lut_sr.py:747-775).
    """
    x4 = jnp.asarray(lattice_inputs(interval))
    feature = []
    for s in range(max(stages - 1, 1)):
        feature.append({
            m: quantize_head(np.asarray(_run_head(params["s1"][f"s{s + 1}_{m}"],
                                                  x4)))
            for m in modes})
    stage2 = {}
    for m in modes2:
        for r in (0, 1):
            out = np.asarray(_run_head(params["s2"][f"{m}r{r}"], x4))
            stage2[f"{m}r{r}"] = quantize_head(out)
    return LUTBank(stage1=feature[-1], stage2=stage2, out_c=out_c,
                   interval=interval, inter=feature[:-1])
