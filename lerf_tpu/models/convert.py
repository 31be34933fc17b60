"""Reference-checkpoint conversion: torch state_dicts → lerf_tpu pytrees.

The reference ships whole pickled ``SRNetsSWF2`` modules
(``models/lerf-{l,g}/Model_050000.pth``, saved via torch.save(module) —
train_model.py:56-65).  We read only the state_dict tensors; torch (CPU) is
required at conversion time only.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def srunit_from_torch(prefix: str, sd: Dict) -> Dict:
    """Convert one SRUnit's conv weights to the dense pixel-MLP layout.

    conv1 kernels flatten row-major to [4, nf] in (a,b,c,d) order for every
    mode geometry; 1×1 convs [out,in,1,1] become [in,out] dense mats.
    """
    def conv(name):
        w = _to_np(sd[f"{prefix}.{name}.conv.weight"])
        b = _to_np(sd[f"{prefix}.{name}.conv.bias"])
        return w, b

    w1, b1 = conv("conv1")
    nf = w1.shape[0]
    p = {"w1": w1.reshape(nf, -1).T, "b1": b1}
    for i, name in [(2, "conv2.conv1"), (3, "conv3.conv1"),
                    (4, "conv4.conv1"), (5, "conv5.conv1")]:
        w, b = conv(name)
        p[f"w{i}"] = w.reshape(w.shape[0], -1).T
        p[f"b{i}"] = b
    w6, b6 = conv("conv6")
    p["w6"] = w6.reshape(w6.shape[0], -1).T
    p["b6"] = b6
    return p


def lerf_nets_from_torch_state_dict(sd: Dict, *, modes=("s", "c", "t"),
                                    modes2=("s", "c", "t"),
                                    stages: int = 2) -> Dict:
    """SRNetsSWF2 state_dict → {"s1": {...}, "s2": {...}} pytree.

    Reference module names: ``s{stage}_{mode}r{r}.model.convN.conv.weight``
    (model.py:79-92 registers SRNet(mode) whose ``.model`` is the SRUnit).
    """
    s1 = {}
    for s in range(max(stages - 1, 1)):
        for m in modes:
            key = f"s{s + 1}_{m}r0.model"
            s1[f"s{s + 1}_{m}"] = srunit_from_torch(key, sd)
    s2 = {}
    for m in modes2:
        for r in (0, 1):
            key = f"s{stages}_{m}r{r}.model"
            s2[f"{m}r{r}"] = srunit_from_torch(key, sd)
    return {"s1": s1, "s2": s2}


def _conv_to_flax(w, b):
    """torch Conv2d [out,in,kh,kw] → flax {'kernel': [kh,kw,in,out], 'bias'}."""
    return {"kernel": _to_np(w).transpose(2, 3, 1, 0), "bias": _to_np(b)}


def imdn_rtc_from_torch(prefix: str, sd: Dict, num_modules: int = 5) -> Dict:
    """One IMDN_RTC tower (model.py:507-523).  torch Sequential layout:
    ``{prefix}.model.0`` fea conv, ``.model.1.sub.{0..n-1}`` IMD modules
    (c1..c5), ``.model.1.sub.{n}`` 1×1 LR conv, ``.model.2`` upsample conv."""
    def conv(name):
        return _conv_to_flax(sd[f"{prefix}.{name}.weight"],
                             sd[f"{prefix}.{name}.bias"])

    out = {"fea": conv("model.0"),
           "lr": conv(f"model.1.sub.{num_modules}"),
           "up": conv("model.2")}
    for i in range(num_modules):
        out[f"imd{i}"] = {c: conv(f"model.1.sub.{i}.{c}")
                          for c in ("c1", "c2", "c3", "c4", "c5")}
    return out


def imdn_from_torch_checkpoint(path: str, model=None,
                               num_modules: int = 5) -> Dict:
    """Pickled reference IMDN2 module → flax variables dict."""
    sd = _load_torch_pickle(path)
    return {"params": {
        "stage1": imdn_rtc_from_torch("stage1", sd, num_modules),
        "stage2": imdn_rtc_from_torch("stage2", sd, num_modules),
    }}


def _load_torch_pickle(path: str):
    """Unpickle a reference checkpoint.  The reference saves whole modules
    (train_model.py:61), so the pickle references its own package modules
    (``model``, ``common.network``); make them importable when the
    read-only reference tree is present."""
    import sys

    import torch
    for p in ("/root/reference", "/root/reference/resample"):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.append(p)
    module = torch.load(path, map_location="cpu", weights_only=False)
    return module.state_dict() if hasattr(module, "state_dict") else module


def load_reference_checkpoint(path: str, **kw) -> Dict:
    """Load a pickled reference module checkpoint and convert."""
    return lerf_nets_from_torch_state_dict(_load_torch_pickle(path), **kw)
