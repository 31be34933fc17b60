"""Orbax checkpointing for train state + reference-compatible LUT export.

Replaces the reference's whole-module pickles (``Model_{i:06d}.pth``,
train_model.py:56-65) with orbax pytree checkpoints under
``{exp_dir}/ckpt/{step}``; the deployable artifact stays the int8 ``.npy``
LUT set (``lerf_tpu.lut.io``), byte-compatible with the reference.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, exp_dir: str, keep: int = 5):
        path = os.path.abspath(os.path.join(exp_dir, "ckpt"))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True))

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def host_params(params):
    """Fetch params to host numpy (for LUT export / conversion)."""
    return jax.tree.map(lambda x: np.asarray(x), params)
