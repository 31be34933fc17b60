"""LUT fine-tuning: forward parity with the int deploy path + gradients."""
import numpy as np

import jax
import jax.numpy as jnp

from lerf_tpu.lut.io import LUTBank
from lerf_tpu.ops import lut_stage1, lut_stage2
from lerf_tpu.train import lutft


def random_bank(seed=0, out_c=3):
    rng = np.random.RandomState(seed)
    L4 = 17 ** 4
    return LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in "sct"},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, out_c))
                .astype(np.int8) for m in "sct" for r in (0, 1)},
        out_c=out_c)


def test_forward_matches_int_deploy_path():
    """Float-STE stages on int8-derived tables == exact int pipeline.

    The deploy path keeps the ×q integer sum and divides once; the ft path
    rounds each member after /q — exactly like the reference
    (model.py:408 rounds each ensemble member, the numpy deploy path
    divides once).  Double rounding gives occasional ±1 differences; the
    values must never differ by more than 1 level."""
    bank = random_bank()
    params = lutft.params_from_bank(bank)
    rng = np.random.RandomState(1)
    img_u8 = rng.randint(0, 256, (1, 12, 14)).astype(np.int32)

    s1_int, s2_int = bank.as_int32()
    s1_int = {k: jnp.asarray(v) for k, v in s1_int.items()}
    s2_int = {k: jnp.asarray(v) for k, v in s2_int.items()}
    feat_int = np.asarray(lut_stage1(jnp.asarray(img_u8), s1_int,
                                     ("s", "c", "t")))

    feat_ft = np.asarray(lutft.predict_stage1(
        params, jnp.asarray(img_u8.astype(np.float32) / 255.0)))
    assert np.mean(feat_ft != feat_int) < 0.25
    np.testing.assert_allclose(feat_ft, feat_int, atol=1.0)

    hyper_int = np.asarray(lut_stage2(jnp.asarray(feat_int), s2_int,
                                      ("s", "c", "t")))
    hyper_ft = np.asarray(lutft.predict_stage2(
        params, jnp.asarray(feat_int.astype(np.float32) / 255.0)))
    assert np.mean(np.abs(hyper_ft * 255 - hyper_int) > 0.5) < 0.25
    np.testing.assert_allclose(hyper_ft * 255, hyper_int, atol=1.0)


def test_gradients_reach_lut_tables():
    bank = random_bank(seed=2)
    params = lutft.params_from_bank(bank)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 8).astype(np.float32))

    def loss(p):
        feat = lutft.predict_stage1(p, x)
        hyper = lutft.predict_stage2(p, feat / 255.0)
        return jnp.mean(feat ** 2) + jnp.mean(hyper ** 2)

    grads = jax.grad(loss)(params)
    for group in ("s1", "s2"):
        for k, g in grads[group].items():
            assert float(jnp.abs(g).sum()) > 0, (group, k)


def test_bank_roundtrip_quantization():
    bank = random_bank(seed=4)
    params = lutft.params_from_bank(bank)
    back = lutft.bank_from_params(params, out_c=3)
    for m in "sct":
        np.testing.assert_array_equal(back.stage1[m], bank.stage1[m])
        for r in (0, 1):
            np.testing.assert_array_equal(back.stage2[f"{m}r{r}"],
                                          bank.stage2[f"{m}r{r}"])
