"""IMDN2 (LeRF-Net) model: forward shapes, predictor API, training step."""
import numpy as np

import jax
import jax.numpy as jnp

from lerf_tpu.models.imdn import IMDN2
from lerf_tpu.ops import ResizeGeometry
from lerf_tpu.pipeline import NetPredictor
from lerf_tpu.train.train_step import TrainHParams, TrainState, \
    make_optimizer, make_train_step


def make_model(nf=8):
    model = IMDN2(in_c=3, out_c=3, nf=nf)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), 0)
    return model, variables


def test_forward_ranges():
    model, variables = make_model()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 12, 14, 3),
                    jnp.float32)
    feat = model.apply(variables, x, 1)
    hyper = model.apply(variables, x, 2)
    assert feat.shape == (1, 12, 14, 3)
    assert hyper.shape == (1, 12, 14, 9)
    assert float(feat.min()) >= 0 and float(feat.max()) <= 255
    assert float(hyper.min()) >= 0 and float(hyper.max()) <= 1


def test_net_predictor_upscale_and_warp():
    model, variables = make_model()
    pred = NetPredictor.from_imdn(model, variables, out_c=3)
    img = np.random.RandomState(1).randint(0, 256, (14, 18, 3),
                                           dtype=np.uint8)
    out = pred.upscale(img, 2, 2)
    assert out.shape == (28, 36, 3) and out.dtype == np.uint8
    out15 = pred.upscale(img, 1.5, 2.5)
    assert out15.shape == (21, 45, 3)

    matrix = np.linalg.inv(np.diag([0.5, 0.5, 1.0]))
    warped, mask = pred.warp(img, matrix, (28, 36))
    assert warped.shape == (28, 36, 3) and mask.shape == (28, 36)


def test_from_imdn_single_stage_branch():
    """``two_stage=False`` must skip the feature tower exactly like the
    reference (eval_model.py:124-129: feat = round(img·norm), the hyper net
    sees the raw image).  Regression pin: an IMDN2 checkpoint trained
    without --twoStage used to be evaluated THROUGH the untrained stage-1
    tower (garbage PSNR); now the eval honors the flag, so mangling the
    stage-1 params must not change the single-stage output — and the
    two-stage predictor must differ from the single-stage one."""
    model, variables = make_model()
    img = np.random.RandomState(2).randint(0, 256, (10, 12, 3),
                                           dtype=np.uint8)

    pred = NetPredictor.from_imdn(model, variables, out_c=3,
                                  two_stage=False)
    out = pred.upscale(img, 2, 2)

    mangled = jax.tree.map(lambda x: x + 1.0, variables["params"]["stage1"])
    v2 = {"params": {"stage1": mangled,
                     "stage2": variables["params"]["stage2"]}}
    pred2 = NetPredictor.from_imdn(model, v2, out_c=3, two_stage=False)
    np.testing.assert_array_equal(pred2.upscale(img, 2, 2), out)

    pred_ts = NetPredictor.from_imdn(model, variables, out_c=3,
                                     two_stage=True)
    assert np.any(pred_ts.upscale(img, 2, 2) != out)


def test_imdn_train_step_runs():
    from lerf_tpu.config import TrainConfig
    from lerf_tpu.train.loop import hparams_from_config, imdn_adapter

    cfg = TrainConfig(model="IMDN2", in_c=3, out_c=3, nf=8, crop_size=8,
                      scale="2", two_stage=True, total_iter=10)
    hp = hparams_from_config(cfg)
    adapter = imdn_adapter(cfg, hp)
    params = adapter.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(hp)
    state = TrainState.create(params, tx)
    geom = ResizeGeometry.create((8, 8), scale_factors=[2.0, 2.0],
                                 support=2, antialias=False)
    step = make_train_step(tx, geom, hp, mesh=None,
                           stage1_fn=adapter.stage1_fn,
                           stage2_fn=adapter.stage2_fn)
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(2, 3, 8, 8).astype(np.float32))
    lb = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
    losses = []
    for _ in range(5):
        state, metrics = step(state, im, lb)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_s2d_matches_base():
    """Space-to-depth IMDN execution (models/imdn_s2d.py) is an exact
    re-indexing of the stock NHWC towers — parity to float-summation-order
    tolerance, on b-multiple AND non-multiple sizes (the zero-pad +
    per-conv re-mask path), for both blocking factors."""
    from lerf_tpu.models import imdn_s2d as s2d

    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), 0)
    rng = np.random.RandomState(1)
    for (h, w) in [(16, 16), (11, 13)]:
        x = jnp.asarray(rng.rand(2, h, w, 3), jnp.float32)
        for b in (2, 4):
            p2 = s2d.convert_imdn2(variables, b)
            for stage in (1, 2):
                want = np.asarray(model.apply(variables, x, stage))
                got = np.asarray(
                    s2d.predict_imdn2_s2d(p2, x, stage, block=b))
                atol = 1e-3 if stage == 1 else 1e-5   # stage1 is [0,255]
                np.testing.assert_allclose(got, want, atol=atol, rtol=0)


def test_net_predictor_imdn_s2d_backend():
    """NetPredictor.from_imdn(backend='s2d') serves the same pixels as the
    base backend (uint8 outputs may differ only at exact rounding ties)."""
    model, variables = make_model(nf=12)
    base = NetPredictor.from_imdn(model, variables, out_c=3, backend="base")
    fast = NetPredictor.from_imdn(model, variables, out_c=3, backend="s2d")
    img = np.random.RandomState(2).randint(0, 256, (11, 14, 3),
                                           dtype=np.uint8)
    a = base.upscale(img, 2, 2).astype(np.int32)
    b = fast.upscale(img, 2, 2).astype(np.int32)
    assert np.abs(a - b).max() <= 1
    matrix = np.linalg.inv(np.diag([0.5, 0.5, 1.0]))
    wa, ma = base.warp(img, matrix, (22, 28))
    wb, mb = fast.warp(img, matrix, (22, 28))
    assert np.array_equal(ma, mb)
    assert np.abs(wa.astype(np.int32) - wb.astype(np.int32)).max() <= 1


def test_imdn2_bit_parity_vs_reference_torch():
    """Random-init reference torch IMDN2 -> converter -> flax forward parity.

    Closes the model-zoo proof gap: the LeRF-Net/Net++ eval path now has the
    same oracle-parity evidence as the LUT form (reference
    resample/model.py:475-537; converter models/convert.py).
    """
    import pytest
    torch = pytest.importorskip("torch")
    from oracle import has_reference
    if not has_reference():
        pytest.skip("reference implementation not available")
    import sys
    for p in ("/root/reference", "/root/reference/resample"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import model as ref_model
    from types import SimpleNamespace

    torch.manual_seed(0)
    opt = SimpleNamespace(norm=255, nf=12)
    tmodel = ref_model.IMDN2(opt, inC=3, outC=3).eval()

    from lerf_tpu.models.convert import imdn_rtc_from_torch
    sd = tmodel.state_dict()
    variables = {"params": {
        "stage1": imdn_rtc_from_torch("stage1", sd),
        "stage2": imdn_rtc_from_torch("stage2", sd),
    }}
    jmodel = IMDN2(in_c=3, out_c=3, nf=12)

    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 11, 13).astype(np.float32)  # NCHW in [0,1]
    with torch.no_grad():
        want1 = tmodel.predict(torch.from_numpy(x), stage=1).numpy()
        want2 = tmodel.predict(torch.from_numpy(x), stage=2).numpy()

    nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got1 = np.asarray(jmodel.apply(variables, nhwc, 1)).transpose(0, 3, 1, 2)
    got2 = np.asarray(jmodel.apply(variables, nhwc, 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got1, want1, atol=2e-4, rtol=0)
    np.testing.assert_allclose(got2, want2, atol=2e-6, rtol=0)


def test_s2d_three_tuple_row_mask():
    """The (row_lo, row_hi, w) masked execution (halo-exchange sharding)
    must equal running the tower on the valid slab directly, for both the
    stock (b=1) and s2d (b=2) forms — rows outside [lo, hi) behave as
    SAME zero padding at every conv depth."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.models.imdn_s2d import convert_imdn2, predict_imdn2_s2d

    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 3)), 0)
    rng = np.random.RandomState(4)
    lo, hi, w = 5, 19, 10
    frame = rng.rand(1, 24, w, 3).astype(np.float32)
    want = model.apply(variables, jnp.asarray(frame[:, lo:hi]), 2)

    for block, p2 in ((1, {"params": variables["params"]}),
                      (2, convert_imdn2(variables, 2))):
        got = predict_imdn2_s2d(
            p2, jnp.asarray(frame), 2, block=block,
            valid_hw=(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w)))
        np.testing.assert_allclose(np.asarray(want),
                                   np.asarray(got)[:, lo:hi],
                                   rtol=1e-5, atol=1e-5)
