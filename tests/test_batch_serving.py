"""Batched + mesh-sharded serving inference."""
import numpy as np
import pytest

import jax

from lerf_tpu.lut.io import LUTBank
from lerf_tpu.parallel import make_mesh
from lerf_tpu.pipeline import LutPredictor


def random_bank(seed=0):
    rng = np.random.RandomState(seed)
    L4 = 17 ** 4
    return LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in "sct"},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
                for m in "sct" for r in (0, 1)},
        out_c=3)


def test_batch_matches_single():
    bank = random_bank()
    pred = LutPredictor(bank)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 10, 12, 3), dtype=np.uint8)
    batch = pred.upscale_batch(imgs, 2, 2)
    assert batch.shape == (2, 20, 24, 3)
    for b in range(2):
        single = pred.upscale(imgs[b], 2, 2)
        np.testing.assert_array_equal(batch[b], single)


def test_batch_sharded_over_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    bank = random_bank(seed=2)
    pred = LutPredictor(bank, mesh=mesh)
    pred_ref = LutPredictor(bank)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (8, 8, 10, 3), dtype=np.uint8)
    got = pred.upscale_batch(imgs, 3, 3)
    want = pred_ref.upscale_batch(imgs, 3, 3)
    np.testing.assert_array_equal(got, want)


def test_net_batch_matches_single():
    import jax as _jax

    from lerf_tpu.models import srnet
    from lerf_tpu.pipeline import NetPredictor

    params = srnet.init_lerf_nets(_jax.random.PRNGKey(3), out_c=3)
    pred = NetPredictor.from_srnets(params)
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 256, (2, 10, 12, 3), dtype=np.uint8)
    batch = pred.upscale_batch(imgs, 2, 2)
    assert batch.shape == (2, 20, 24, 3)
    for b in range(2):
        single = pred.upscale(imgs[b], 2, 2)
        np.testing.assert_array_equal(batch[b], single)


def test_imdn_batch_matches_single():
    """from_imdn stage fns must be batch-polymorphic (regression: they were
    rank-fixed and upscale_batch crashed on the IMDN form)."""
    import jax as _jax

    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.pipeline import NetPredictor

    model = IMDN2(in_c=3, out_c=3, nf=8)
    variables = model.init(_jax.random.PRNGKey(0),
                           np.zeros((1, 8, 8, 3), np.float32), 0)
    pred = NetPredictor.from_imdn(model, variables, out_c=3)
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 8, 10, 3), dtype=np.uint8)
    batch = pred.upscale_batch(imgs, 2, 2)
    assert batch.shape == (2, 16, 20, 3)
    for b in range(2):
        np.testing.assert_array_equal(batch[b], pred.upscale(imgs[b], 2, 2))


def test_batch_scale1_passthrough():
    """scale==1 must take the same skip path as upscale
    (eval_model.py:153-154), not the lossy resample pipeline."""
    from lerf_tpu.models import srnet
    from lerf_tpu.pipeline import NetPredictor

    params = srnet.init_lerf_nets(jax.random.PRNGKey(8), out_c=3)
    pred = NetPredictor.from_srnets(params)
    rng = np.random.RandomState(9)
    imgs = rng.randint(0, 256, (2, 6, 7, 3), dtype=np.uint8)
    batch = pred.upscale_batch(imgs, 1.0, 1.0)
    np.testing.assert_array_equal(batch, imgs)
    np.testing.assert_array_equal(pred.upscale(imgs[0], 1.0, 1.0), imgs[0])


def test_upscale_cli_roundtrip(tmp_path):
    """End-user CLI: PNG in → upscaled PNG out, LUT and net forms."""
    from PIL import Image

    from lerf_tpu.cli import upscale as up
    from lerf_tpu.lut.io import save_lut_bank

    bank = random_bank(seed=5)
    exp = tmp_path / "exp"
    exp.mkdir()
    save_lut_bank(bank, str(exp), lut_name="LUTft")
    src = tmp_path / "in.png"
    rng = np.random.RandomState(6)
    Image.fromarray(rng.randint(0, 256, (12, 14, 3), dtype=np.uint8)) \
        .save(src)
    dst = tmp_path / "out.png"
    out = up.main(["-e", str(exp), "--input", str(src), "--output",
                   str(dst), "--scale", "2", "--platform", "cpu"])
    assert out.shape == (24, 28, 3)
    assert dst.exists()
    # anisotropic fractional scale through the same entry point
    out = up.main(["-e", str(exp), "--input", str(src), "--output",
                   str(tmp_path / "out2.png"), "--scale", "1.5x2.0",
                   "--platform", "cpu"])
    assert out.shape == (18, 28, 3)
