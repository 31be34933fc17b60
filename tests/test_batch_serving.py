"""Batched + mesh-sharded serving inference."""
import numpy as np
import pytest

import jax

from lerf_tpu.lut.io import LUTBank
from conftest import shared_lut_predictor
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
    pred = shared_lut_predictor()
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
    pred_ref = shared_lut_predictor()
    pred = LutPredictor(pred_ref.bank, mesh=mesh)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (8, 8, 10, 3), dtype=np.uint8)
    got = pred.upscale_batch(imgs, 3, 3)
    want = pred_ref.upscale_batch(imgs, 3, 3)
    np.testing.assert_array_equal(got, want)


def test_net_batch_matches_single():
    import jax as _jax

    from lerf_tpu.models import srnet
    from lerf_tpu.pipeline import NetPredictor

    from conftest import shared_net_predictor as _snp
    pred = _snp()
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

    from conftest import shared_imdn_predictor as _sip
    pred = _sip()
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 8, 10, 3), dtype=np.uint8)
    batch = pred.upscale_batch(imgs, 2, 2)
    assert batch.shape == (2, 16, 20, 3)
    for b in range(2):
        np.testing.assert_array_equal(batch[b], pred.upscale(imgs[b], 2, 2))


WARP_MATS = [
    np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0], [1e-4, 2e-5, 1.0]]),
    np.array([[0.7, -0.1, 10.0], [0.2, 1.3, -5.0], [5e-4, -2e-4, 1.0]]),
    np.diag([2.0, 2.0, 1.0]),
]


def test_warp_batch_matches_single():
    """Batched warp with DISTINCT per-frame homographies through one
    program must equal per-image warp bit-for-bit (output AND mask)."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(12)
    imgs = rng.randint(0, 256, (2, 14, 17, 3), dtype=np.uint8)
    out_hw = (20, 18)
    outs, masks = pred.warp_batch(imgs, np.stack(WARP_MATS[:2]), out_hw)
    assert outs.shape == (2, 20, 18, 3) and masks.shape == (2, 20, 18)
    # each distinct matrix costs a separate per-image program TRACE on the
    # reference side of the comparison; two frames prove per-frame
    # distinctness at 2/3 the cost of three
    for b in range(2):
        w_out, w_mask = pred.warp(imgs[b], WARP_MATS[b], out_hw)
        np.testing.assert_array_equal(outs[b], w_out)
        np.testing.assert_array_equal(masks[b], w_mask)
    # key-scoped (shared predictor): ONE batch program for this config
    assert ("batch", 2, (14, 17), (20, 18)) in pred._warp_dyn_cache
    assert len([k for k in pred._warp_dyn_cache
                if k[0] == "batch" and k[2] == (14, 17)]) == 1


def test_warp_batch_shared_matrix_broadcast():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(14)
    imgs = rng.randint(0, 256, (2, 12, 13, 3), dtype=np.uint8)
    outs, masks = pred.warp_batch(imgs, WARP_MATS[0], (15, 16))
    for b in range(2):
        w_out, w_mask = pred.warp(imgs[b], WARP_MATS[0], (15, 16))
        np.testing.assert_array_equal(outs[b], w_out)
        np.testing.assert_array_equal(masks[b], w_mask)


def test_net_warp_batch_matches_single():
    from lerf_tpu.models import srnet
    from lerf_tpu.pipeline import NetPredictor

    from conftest import shared_net_predictor as _snp
    pred = _snp()
    rng = np.random.RandomState(16)
    imgs = rng.randint(0, 256, (2, 12, 14, 3), dtype=np.uint8)
    out_hw = (16, 15)
    outs, masks = pred.warp_batch(imgs, np.stack(WARP_MATS[:2]), out_hw)
    for b in range(2):
        w_out, w_mask = pred.warp(imgs[b], WARP_MATS[b], out_hw)
        np.testing.assert_array_equal(outs[b], w_out)
        np.testing.assert_array_equal(masks[b], w_mask)


def test_static_batched_warp_uses_rowpack():
    """A [B,C,H,W] input through the static geometry op must match the
    per-frame row-packed path bit-for-bit (regression: it silently fell to
    the element-gather path, resize_right2d_torch.py:346-370 batch parity)."""
    import jax.numpy as jnp

    from lerf_tpu.ops import WarpGeometry, steering_gaussian_warp

    rng = np.random.RandomState(17)
    in_sz, out_sz = (11, 13), (14, 12)
    geom = WarpGeometry.create(in_sz, WARP_MATS[0], out_sz, support=2)
    img = rng.randint(0, 256, (2, 3, *in_sz)).astype(np.int32)
    hyp = [rng.randint(0, 256, (2, 3, *in_sz)).astype(np.int32)
           for _ in range(3)]
    batched = steering_gaussian_warp(jnp.asarray(img),
                                     *map(jnp.asarray, hyp), geom,
                                     u8_inputs=True)
    for b in range(2):
        one = steering_gaussian_warp(jnp.asarray(img[b]),
                                     *(jnp.asarray(h[b]) for h in hyp),
                                     geom, u8_inputs=True)
        a, bb = np.asarray(batched[b]), np.asarray(one)
        eq = (a == bb) | (np.isnan(a) & np.isnan(bb))
        assert eq.all()


def test_batch_scale1_passthrough():
    """scale==1 must take the same skip path as upscale
    (eval_model.py:153-154), not the lossy resample pipeline."""
    from lerf_tpu.models import srnet
    from lerf_tpu.pipeline import NetPredictor

    from conftest import shared_net_predictor as _snp
    pred = _snp()
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
