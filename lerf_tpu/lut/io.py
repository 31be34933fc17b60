"""LUT bank load/save — byte-compatible with the reference `.npy` artifacts.

Reference layout (``resample/eval_lut_sr.py:750-775``, ``transfer_to_lut.py``):
an experiment directory containing int8 files

    {lutName}_s1_{mode}r0.npy          shape (83521, 1[, 1, 1])
    {lutName}_s2_{mode}r{0|1}.npy      shape (83521, oC[, 1, 1])

with oC = 3 for LeRF-G (ρ, σx, σy) and 1 for LeRF-L (α).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Sequence

import numpy as np


@dataclasses.dataclass
class LUTBank:
    """In-memory LUT set for the two-stage LeRF pipeline.

    ``stage1``: {mode: (L⁴, 1) int}; ``stage2``: {f"{mode}r{r}": (L⁴, oC) int}.
    """
    stage1: Dict[str, np.ndarray]
    stage2: Dict[str, np.ndarray]
    out_c: int
    interval: int = 4

    @property
    def lattice_size(self) -> int:
        return (1 << (8 - self.interval)) + 1

    def as_int32(self):
        """Device-ready dict pytrees."""
        s1 = {k: v.astype(np.int32) for k, v in self.stage1.items()}
        s2 = {k: v.astype(np.int32) for k, v in self.stage2.items()}
        return s1, s2


def load_lut_bank(exp_dir: str, *, lut_name: str = "LUTft",
                  modes: Sequence[str] = ("s", "c", "t"),
                  modes2: Sequence[str] = ("s", "c", "t"),
                  out_c: int = 3, interval: int = 4) -> LUTBank:
    """Load a reference-format LUT directory (e.g. ``models/lerf-g``)."""
    def _load(path, oc):
        arr = np.load(path)
        return np.asarray(arr).reshape(-1, oc)

    stage1 = {}
    for mode in modes:
        path = os.path.join(exp_dir, f"{lut_name}_s1_{mode}r0.npy")
        stage1[mode] = _load(path, 1)
    stage2 = {}
    for mode in modes2:
        for r in (0, 1):
            path = os.path.join(exp_dir, f"{lut_name}_s2_{mode}r{r}.npy")
            stage2[f"{mode}r{r}"] = _load(path, out_c)
    return LUTBank(stage1=stage1, stage2=stage2, out_c=out_c,
                   interval=interval)


def save_lut_bank(bank: LUTBank, exp_dir: str, *, lut_name: str = "LUT",
                  keep_trailing_dims: bool = True):
    """Write reference-compatible int8 files.

    ``keep_trailing_dims`` stores shape (N, oC, 1, 1) like the reference's
    transfer driver (scripts.sh:19-25); fine-tuned LUTs are stored (N, oC)
    (train_model.py:481-499) — both load identically.
    """
    os.makedirs(exp_dir, exist_ok=True)
    def _shape(a):
        return a.reshape(a.shape[0], a.shape[1], 1, 1) if keep_trailing_dims else a

    for mode, arr in bank.stage1.items():
        np.save(os.path.join(exp_dir, f"{lut_name}_s1_{mode}r0.npy"),
                _shape(arr.astype(np.int8)))
    for key, arr in bank.stage2.items():
        np.save(os.path.join(exp_dir, f"{lut_name}_s2_{key}.npy"),
                _shape(arr.astype(np.int8)))
