"""Model-zoo parity vs the reference torch checkpoint + training-step smoke.

The strongest check: convert the shipped ``Model_050000.pth`` (SRNetsSWF2)
and verify our pixel-MLP heads reproduce the torch SRNet forwards on the
full 17⁴ LUT-transfer enumeration — this is exactly the computation of
``transfer_to_lut.py``, so matching it end-to-end validates both the model
and the transfer driver.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, has_reference
from lerf_tpu.lut.transfer import lattice_inputs, quantize_head, \
    transfer_to_lut
from lerf_tpu.models import srnet
from lerf_tpu.models.convert import lerf_nets_from_torch_state_dict

CKPT = os.path.join(REFERENCE_ROOT, "models", "lerf-g", "Model_050000.pth")

requires_ckpt = pytest.mark.skipif(
    not (has_reference() and os.path.exists(CKPT)),
    reason="reference checkpoint not available")


def _load_reference_module():
    """Unpickle the whole-module checkpoint (train_model.py:61 saves the
    module, not a state_dict), with the reference package importable."""
    import torch
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "resample")):
        if p not in sys.path:
            sys.path.insert(0, p)
    return torch.load(CKPT, map_location="cpu", weights_only=False)


@pytest.fixture(scope="module")
def ref_module():
    return _load_reference_module()


@pytest.fixture(scope="module")
def our_params(ref_module):
    return lerf_nets_from_torch_state_dict(ref_module.state_dict())


@requires_ckpt
@pytest.mark.parametrize("mode", ["s", "c", "t"])
@pytest.mark.parametrize("stage,r", [(1, 0), (2, 0), (2, 1)])
def test_head_matches_torch_on_lattice(ref_module, our_params, stage, mode, r):
    """Each head's dense-MLP forward == the torch conv forward over the full
    LUT enumeration (the transfer_to_lut computation, chunked)."""
    import torch

    x4 = lattice_inputs()                                  # [83521, 4]

    # torch side: embed into the mode's conv receptive field like
    # transfer_to_lut.get_mode_input_tensor and run the SRNet head.
    net = getattr(ref_module, f"s{stage}_{mode}r{r}")
    t = torch.tensor(x4.reshape(-1, 1, 2, 2))
    if mode in ("c", "t"):
        k = 4
        emb = torch.zeros((t.shape[0], 1, k, k), dtype=t.dtype)
        if mode == "c":
            emb[:, 0, 0, 0:4] = t.reshape(-1, 4)
        else:
            for i in range(4):
                emb[:, 0, i, i] = t.reshape(-1, 4)[:, i]
        t = emb
    with torch.no_grad():
        outs = []
        for chunk in torch.split(t, 8352):
            outs.append(net(chunk))
        want = torch.cat(outs).numpy().reshape(x4.shape[0], -1)

    key = f"s1_{mode}" if stage == 1 else f"{mode}r{r}"
    head = (our_params["s1"] if stage == 1 else our_params["s2"])[key]
    got = np.asarray(srnet.apply_srunit(
        jax.tree.map(jnp.asarray, head), jnp.asarray(x4)))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # int8 quantization must agree except at exact rounding boundaries
    mismatch = np.mean(quantize_head(got) != quantize_head(want))
    assert mismatch < 1e-4


@requires_ckpt
def test_transfer_to_lut_shapes(our_params):
    bank = transfer_to_lut(our_params, out_c=3)
    for m in ("s", "c", "t"):
        assert bank.stage1[m].shape == (83521, 1)
        assert bank.stage1[m].dtype == np.int8
        for r in (0, 1):
            assert bank.stage2[f"{m}r{r}"].shape == (83521, 3)


@requires_ckpt
def test_transfer_artifacts_match_reference_driver(ref_module, our_params,
                                                   monkeypatch):
    """Array-level cross-check of the LUT transfer ARTIFACTS: run the
    reference transfer driver's own head loop (transfer_to_lut.py:100-170 —
    its ``get_input_tensor``/``get_mode_input_tensor`` enumeration, chunked
    forward, and int8 quantization, CPU torch via the oracle) on the shipped
    checkpoint and compare the produced tables entry-for-entry against
    ``lut/transfer.py`` output: ≥99.9% exact, ≤1 LSB anywhere (rounding
    ties of values agreeing to ~1e-5)."""
    import torch

    # the reference enumerator hard-codes .cuda(); run it on CPU
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from resample.transfer_to_lut import (get_input_tensor,
                                          get_mode_input_tensor)

    class _Opt:
        interval = 4

    bank = transfer_to_lut(our_params, out_c=3)

    def run_reference_head(stage, mode, r):
        it = get_input_tensor(_Opt())
        if mode != "s":
            it = get_mode_input_tensor(it, mode)
        B = it.size(0) // 100
        outs = []
        with torch.no_grad():
            ref_module.eval()
            for b in range(100):
                batch = it[b * B:] if b == 99 else it[b * B:(b + 1) * B]
                out = ref_module(batch, stage, mode, r)
                outs.append(torch.round(torch.clamp(out, -1, 1) * 127)
                            .cpu().data.numpy().astype(np.int8))
        return np.concatenate(outs, 0).reshape(it.shape[0], -1)

    def check(want, got, key):
        diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
        assert diff.max() <= 1, (key, diff.max())
        assert (diff == 0).mean() >= 0.999, (key, (diff == 0).mean())

    for mode in ("s", "c", "t"):
        for r in (0, 1):
            check(run_reference_head(2, mode, r),
                  bank.stage2[f"{mode}r{r}"], f"s2_{mode}r{r}")
        check(run_reference_head(1, mode, 0), bank.stage1[mode],
              f"s1_{mode}r0")


@requires_ckpt
def test_predict_stage_matches_torch(ref_module, our_params):
    """Full rotation-ensemble predict parity on a random image."""
    import torch

    img = (np.random.RandomState(0).rand(1, 1, 12, 14)
           .astype(np.float32))
    with torch.no_grad():
        want1 = ref_module.predict(torch.tensor(img), stage=1).numpy()
    got1 = np.asarray(srnet.predict_stage1(
        jax.tree.map(jnp.asarray, our_params), jnp.asarray(img[:, 0])))
    np.testing.assert_allclose(got1, want1[:, 0], rtol=1e-4, atol=0.51)
    # quantized features must be essentially identical
    assert np.mean(np.round(got1) != np.round(want1[:, 0])) < 0.02

    feat = want1 / 255.0
    with torch.no_grad():
        want2 = ref_module.predict(torch.tensor(feat), stage=2).numpy()
    got2 = np.asarray(srnet.predict_stage2(
        jax.tree.map(jnp.asarray, our_params), jnp.asarray(feat[:, 0])))
    want2 = want2[0].transpose(1, 2, 0)[None]            # [1,H,W,3]
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=0.51 / 255)
    assert np.mean(np.round(got2 * 255) != np.round(want2 * 255)) < 0.02
