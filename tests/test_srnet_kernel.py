"""Parity tests for the fused SRUnit-ensemble Pallas kernel
(lerf_tpu/ops/pallas/srnet_kernel.py) against the XLA ensemble path.

CPU tests run the kernel in interpret mode; the on-chip compile/timing
proof is gated on LERF_TPU_TESTS=1 (real TPU required) and recorded in
BASELINE.md.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lerf_tpu.models import srnet
from lerf_tpu.ops.pallas.srnet_kernel import ensemble_sum_on_image

MEMBERS = [(m, r) for m in ("s", "c", "t") for r in range(4)]


def _xla_sum(heads, x, members, half):
    outs = srnet.ensemble_on_image(lambda i: heads[i], x, members)
    return jnp.sum(jnp.round(outs * half), axis=0)


@pytest.mark.parametrize("shape,oc", [((2, 24, 40), 3), ((1, 17, 23), 1),
                                      ((3, 9, 130), 3)])
def test_kernel_matches_xla_ensemble(shape, oc):
    params = srnet.init_lerf_nets(jax.random.PRNGKey(0), out_c=oc)
    if oc == 1:
        heads = [params["s1"][f"s1_{m}"] for m, _ in MEMBERS]
    else:
        heads = [params["s2"][f"{m}r{r % 2}"] for m, r in MEMBERS]
    x = jnp.asarray(np.random.RandomState(1).rand(*shape).astype(np.float32))
    ref = _xla_sum(heads, x, MEMBERS, 127)
    got = ensemble_sum_on_image(heads, x, MEMBERS, half=127, block_n=256,
                                interpret=True)
    assert got.shape == ref.shape
    # identical math, different f32 accumulation order: the per-member
    # round(tanh·127) may flip on boundary pixels — bound the disagreement
    diff = np.abs(np.asarray(ref) - np.asarray(got))
    assert diff.max() <= 2.0, diff.max()
    assert (diff > 0).mean() < 0.005, (diff > 0).mean()


def test_kernel_bf16_close_to_f32():
    params = srnet.init_lerf_nets(jax.random.PRNGKey(2), out_c=3)
    heads = [params["s2"][f"{m}r{r % 2}"] for m, r in MEMBERS]
    x = jnp.asarray(np.random.RandomState(3).rand(1, 16, 24).astype(
        np.float32))
    f32 = ensemble_sum_on_image(heads, x, MEMBERS, half=127, block_n=256,
                                interpret=True)
    bf = ensemble_sum_on_image(heads, x, MEMBERS, half=127, block_n=256,
                               compute_dtype=jnp.bfloat16, interpret=True)
    # 12 members × ±half·tanh-precision; bf16 matmuls keep the rounded sum
    # within a few LSB of f32
    assert float(jnp.max(jnp.abs(f32 - bf))) <= 12.0


def test_predict_backend_dispatch_cpu_interpret():
    """predict_stage* backend plumbing: the pallas path (interpret via the
    kernel's own tests above) and the default XLA path agree end to end."""
    params = srnet.init_lerf_nets(jax.random.PRNGKey(4), out_c=3)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 12, 20).astype(
        np.float32))
    ref1 = srnet.predict_stage1(params, x, backend="xla")
    ref2 = srnet.predict_stage2(params, ref1 / 255.0, backend="xla")

    # monkeypatch-free interpret dispatch: call through _ensemble_pred
    got1 = srnet._ensemble_pred(
        [params["s1"][f"s1_{m}"] for m, _ in MEMBERS], x, MEMBERS, 127,
        backend="pallas", interpret=True)[..., 0]
    got1 = jnp.clip(jnp.round(got1 / 3.0), 0, 255)
    d1 = np.abs(np.asarray(ref1) - np.asarray(got1))
    assert d1.max() <= 1.0 and (d1 > 0).mean() < 0.005

    heads2 = [params["s2"][f"{m}r{r % 2}"] for m, r in MEMBERS]
    got2 = srnet._ensemble_pred(heads2, ref1 / 255.0, MEMBERS, 127,
                                backend="pallas", interpret=True)
    got2 = jnp.clip(jnp.round(got2 / 12.0 + 127), 0, 255) / 255.0
    d2 = np.abs(np.asarray(ref2) - np.asarray(got2))
    assert d2.max() <= 1.0 / 255.0 and (d2 > 0).mean() < 0.005


@pytest.mark.skipif(os.environ.get("LERF_TPU_TESTS") != "1",
                    reason="real-TPU test; set LERF_TPU_TESTS=1")
def test_kernel_on_chip_parity():
    """Compiled (Mosaic) kernel vs XLA on the real chip.

    On TPU, default-precision f32 matmuls run as bf16 MXU passes in BOTH
    paths, so each diverges from CPU-f32 truth by up to ±3 int levels on
    ~40-55%% of pixels (measured 2026-08-17: XLA mean 0.44, Pallas 0.60
    levels; Mosaic ignores Precision.HIGHEST so there is no cheap accuracy
    knob; golden Set5 PSNR is unchanged, 36.09 vs 36.10 dB).  The contract
    is bounded level difference and bounded bias vs TPU-XLA."""
    from conftest import require_tpu
    require_tpu()
    params = srnet.init_lerf_nets(jax.random.PRNGKey(0), out_c=3)
    x = jnp.asarray(np.random.RandomState(1).rand(3, 120, 160).astype(
        np.float32))
    f1_ref = srnet.predict_stage1(params, x, backend="xla")
    f1 = srnet.predict_stage1(params, x, backend="pallas")
    ref = np.asarray(f1_ref)
    got = np.asarray(f1)
    diff = np.abs(ref - got)
    assert diff.max() <= 2.0
    assert diff.mean() < 1.0
    # measured bias vs TPU-XLA: +0.29 levels (different bf16 pass
    # structure); bound it so a gross numeric regression still fails
    assert abs(float((got - ref).mean())) < 0.6
