"""Network → LUT export (reference resample/transfer_to_lut.py).

    python -m lerf_tpu.cli.transfer -e models/lerf-g --loadIter 50000

Loads the orbax checkpoint at ``loadIter`` (or a converted reference
``Model_*.pth`` when present), enumerates every head over the 17⁴ lattice
on device and writes reference-format int8 ``LUT_*.npy`` files.
"""
from __future__ import annotations

import os
import sys

from ..config import TestConfig, parse_config
from ..lut.io import save_lut_bank
from ..lut.transfer import transfer_to_lut


def load_params(cfg: TestConfig):
    """Prefer our orbax checkpoint; fall back to a reference torch pickle."""
    ckpt_dir = os.path.join(cfg.exp_dir, "ckpt")
    if os.path.isdir(ckpt_dir):
        from ..train.checkpoint import CheckpointManager
        mgr = CheckpointManager(cfg.exp_dir)
        state = mgr.restore(cfg.load_iter)
        mgr.close()
        if state is not None:
            return state["params"] if isinstance(state, dict) else state.params
    pth = os.path.join(cfg.exp_dir, f"Model_{cfg.load_iter:06d}.pth")
    if os.path.exists(pth):
        from ..models.convert import load_reference_checkpoint
        return load_reference_checkpoint(
            pth, modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
            stages=cfg.stages)
    raise FileNotFoundError(
        f"no checkpoint at {ckpt_dir} or {pth}")


def main(argv=None):
    cfg = parse_config(TestConfig, argv)
    params = load_params(cfg)
    bank = transfer_to_lut(
        params, modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
        stages=cfg.stages, out_c=cfg.out_c, interval=cfg.interval)
    save_lut_bank(bank, cfg.exp_dir, lut_name="LUT")
    for s, tables in enumerate(bank.inter + [bank.stage1], start=1):
        for m, arr in tables.items():
            print(f"LUT_s{s}_{m}r0.npy",
                  arr.reshape(arr.shape[0], -1, 1, 1).shape)
    for k, arr in bank.stage2.items():
        print(f"LUT_s{bank.stages}_{k}.npy",
              arr.reshape(arr.shape[0], -1, 1, 1).shape)
    return bank


if __name__ == "__main__":
    main(sys.argv[1:])
