"""stages > 2: per-stage LUT banks through transfer, I/O and deploy.

Reference semantics: eval_lut_sr.py:541-577 (per-stage feature loop with its
own table set; intermediate stages average over modes*4 with +norm//2 bias)
and :747-775 (one LUT file set per stage).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lerf_tpu.lut.io import LUTBank, load_lut_bank, save_lut_bank
from lerf_tpu.ops.lut_pipeline import MODE_PAD
from lerf_tpu.pipeline import LutPredictor
from oracle import requires_reference, ref_four_simplex

MODES = ("s", "c", "t")


def rand_bank(n_feature_stages, seed=0, out_c=3):
    rng = np.random.RandomState(seed)

    def lut(oc):
        return rng.randint(-127, 128, (17 ** 4, oc)).astype(np.int8)

    feature = [{m: lut(1) for m in MODES} for _ in range(n_feature_stages)]
    hyper = {f"{m}r{r}": lut(out_c) for m in MODES for r in (0, 1)}
    return LUTBank(stage1=feature[-1], stage2=hyper, out_c=out_c,
                   inter=feature[:-1])


def ref_stage_loop(img_hwc, bank: LUTBank, norm=255):
    """The reference eval driver's stage loop (eval_lut_sr.py:541-628)."""
    four = ref_four_simplex()
    x = img_hwc.astype(np.float32)
    feature_stages = bank.inter + [bank.stage1]

    def ensemble(x, luts, oC, r_split):
        pred = 0
        for m in MODES:
            pad = MODE_PAD[m]
            for r in range(4):
                rot = np.rot90(x, r)
                h, w, _ = rot.shape
                img_in = np.pad(rot, ((0, pad), (0, pad), (0, 0)),
                                mode="edge").transpose(2, 0, 1)
                key = f"{m}r{r % 2}" if r_split else m
                pred = pred + four(
                    luts[key].astype(np.float32).reshape(-1, oC),
                    img_in, h, w, 4, 4 - r, upscale=1, mode=m, oC=oC)
        return pred

    for s, luts in enumerate(feature_stages):
        pred = ensemble(x, luts, 1, r_split=False)
        if s == len(feature_stages) - 1:
            avg, bias = len(MODES), 0
        else:
            avg, bias = len(MODES) * 4, norm // 2
        x = np.round(np.clip(pred / avg + bias, 0, norm)) \
            .astype(np.float32).transpose(1, 2, 0)

    feat = x.transpose(2, 0, 1)
    pred = ensemble(x, bank.stage2, bank.out_c, r_split=True)
    hyper = np.round(np.clip(pred / (len(MODES) * 4) + norm // 2, 0, norm))
    c = img_hwc.shape[2]
    hyper = hyper.reshape(c, bank.out_c, feat.shape[1], feat.shape[2]) \
        .transpose(0, 2, 3, 1)
    return feat, hyper


@requires_reference
@pytest.mark.parametrize("stages", [3, 4])
def test_multistage_stages_bit_exact(stages):
    bank = rand_bank(stages - 1, seed=stages)
    img = np.random.RandomState(7).randint(
        0, 256, (9, 13, 3), dtype=np.int32)

    want_feat, want_hyper = ref_stage_loop(img, bank)

    pred = LutPredictor(bank, stages=stages)
    feat, hyper = jax.jit(pred._stages_fn)(
        jnp.asarray(img.transpose(2, 0, 1)))
    np.testing.assert_array_equal(np.asarray(feat), want_feat)
    np.testing.assert_array_equal(np.asarray(hyper), want_hyper)


def test_three_stage_transfer_save_load_eval(tmp_path):
    """init(stages=3) -> transfer -> save -> load -> upscale cycle."""
    from lerf_tpu.lut.transfer import transfer_to_lut
    from lerf_tpu.models.srnet import init_lerf_nets

    params = init_lerf_nets(jax.random.PRNGKey(0), nf=8, out_c=3, stages=3)
    bank = transfer_to_lut(params, stages=3, out_c=3)
    assert bank.stages == 3 and len(bank.inter) == 1

    save_lut_bank(bank, str(tmp_path), lut_name="LUT")
    for s in (1, 2):
        for m in MODES:
            assert os.path.exists(tmp_path / f"LUT_s{s}_{m}r0.npy")
    for m in MODES:
        for r in (0, 1):
            assert os.path.exists(tmp_path / f"LUT_s3_{m}r{r}.npy")

    back = load_lut_bank(str(tmp_path), lut_name="LUT", out_c=3, stages=3)
    for m in MODES:
        np.testing.assert_array_equal(back.inter[0][m], bank.inter[0][m])
        np.testing.assert_array_equal(back.stage1[m], bank.stage1[m])

    pred = LutPredictor(back, stages=3)
    out = pred.upscale(np.zeros((6, 8, 3), np.uint8) + 100, 2, 2)
    assert out.shape == (12, 16, 3)


def test_stage_count_mismatch_raises():
    bank = rand_bank(1, seed=1)
    with pytest.raises(ValueError, match="stages"):
        LutPredictor(bank, stages=3)


def test_lutft_rejects_multistage_banks():
    from lerf_tpu.train.lutft import params_from_bank
    bank = rand_bank(2, seed=2)
    with pytest.raises(NotImplementedError, match="two-stage"):
        params_from_bank(bank)
