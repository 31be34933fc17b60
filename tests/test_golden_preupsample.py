"""Golden PreUpsample (LeRF-Net++ convention) eval: our ×2 pre-upsample
branch vs the reference torch eval loop, per image, EXACTLY (not a band).

The reference ships no LeRF-Net++ checkpoint, but the PreUpsample semantics
(eval_model.py:134-141: resample scale divided by post=2; eval_model.py:
220-226: homography right-multiplied by the fixed post matrix) are
model-agnostic, so the bundled rr/WarpPreUpsample Set5 fixtures plus the
shipped lerf-g SRNetsSWF2 checkpoint make the branch runnable today — the
same oracle discipline as tests/test_golden_net.py, applied to the one eval
branch that had no exact cross-check (round-4 verdict item #2).
"""
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT
from lerf_tpu.evaluate import eval_sr_image
from lerf_tpu.models.convert import load_reference_checkpoint
from lerf_tpu.pipeline import NetPredictor

RR = os.path.join(REFERENCE_ROOT, "data", "rrBenchmark")
PRE = os.path.join(REFERENCE_ROOT, "data", "rrPreUpsample")
WPRE = os.path.join(REFERENCE_ROOT, "data", "WarpPreUpsample")
CKPT = os.path.join(REFERENCE_ROOT, "models", "lerf-g", "Model_050000.pth")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(PRE) and os.path.isdir(RR) and os.path.exists(CKPT)),
    reason="reference fixtures not available")

# the two smallest Set5 images keep the torch CPU oracle affordable
FILES = ["butterfly.png", "bird.png"]

# the ×2 pre-upsample homography correction (eval_model.py:221-225); its
# entries are exact in float32, so the f32 Tensor round-trip the reference
# applies to it is lossless
POST = np.array([[0.5, 0.0, -0.25],
                 [0.0, 0.5, -0.25],
                 [0.0, 0.0, 1.0]], dtype=np.float64)


def _ref_paths():
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "resample")):
        if p not in sys.path:
            sys.path.insert(0, p)


def _mulut_predict(model_g, x, stage):           # eval_model.py:25-34, inC=1
    import torch

    with torch.no_grad():
        return torch.cat([model_g.predict(x[:, i:i + 1], stage=stage)
                          for i in range(x.shape[1])], dim=1)


def _reference_eval_sr_pre(files, scale=3.0):
    """The reference eval_model.py SR loop with the PreUpsample branch
    taken (eval_model.py:134-141): LR from rrPreUpsample (already ×2
    pre-upsampled), resampler scale = scale/2, PSNR shave = int(scale)
    of the ORIGINAL scale.  HR comes from rrBenchmark (the PreUpsample
    fixture ships no HR dir; the images are identical)."""
    import torch
    from PIL import Image

    _ref_paths()
    from common.utils import PSNR, _rgb2ycbcr, cal_ssim
    from resize_right.resize_right2d_torch import \
        SteeringGaussianResize2dTorch

    model_g = torch.load(CKPT, map_location="cpu", weights_only=False)
    model_g.eval()
    resizer = SteeringGaussianResize2dTorch(
        support_sz=2, device=torch.device("cpu"), max_sigma=10)

    post = 2                                    # "PreUpsample" in testDir
    in_scale = scale / post
    results = {}
    for f in files:
        lr = np.array(Image.open(os.path.join(
            PRE, "Set5", "LR_bicubic",
            f"rrLR_X{scale:.2f}_{scale:.2f}", f))).astype(np.float32)
        gt = np.array(Image.open(os.path.join(RR, "Set5", "HR", f)))
        x = torch.Tensor(lr)[None].permute(0, 3, 1, 2) / 255.0
        feat = _mulut_predict(model_g, x, 1)
        hyper = _mulut_predict(model_g, feat / 255.0, 2)
        resizer.set_shape(x.shape, [in_scale, in_scale])
        c = hyper.shape[1]
        pred = resizer.resize(feat,
                              hyper[:, list(range(0, c, 3))],
                              hyper[:, list(range(1, c + 1, 3))],
                              hyper[:, list(range(2, c + 2, 3))])
        out = np.clip(np.round(
            pred[0].numpy().transpose(1, 2, 0)), 0, 255).astype(np.uint8)
        if gt.shape != out.shape:                # eval_model.py:175-177
            gt = gt[:out.shape[0], :out.shape[1], :]
        y_gt, y_out = _rgb2ycbcr(gt)[:, :, 0], _rgb2ycbcr(out)[:, :, 0]
        results[f] = (out, PSNR(y_gt, y_out, int(scale)),
                      cal_ssim(y_gt, y_out))
    return results


def _reference_eval_warp_pre(files, scale_p):
    """The reference eval_model.py WARP loop with the PreUpsample branch
    taken (eval_model.py:220-226): homography right-multiplied by POST
    (both factors through the Tensor f32 round-trip), border-4 nearest
    validity mask, NaN-zeroing, RGB mPSNR."""
    import torch
    from PIL import Image

    _ref_paths()
    from common.utils import mPSNR
    from resize_right.resize_right2d_torch import (
        NearestWarp2dTorch, SteeringGaussianWarp2dTorch)

    model_g = torch.load(CKPT, map_location="cpu", weights_only=False)
    model_g.eval()
    warper = SteeringGaussianWarp2dTorch(
        support_sz=2, device=torch.device("cpu"), max_sigma=10)
    nn_warper = NearestWarp2dTorch(device=torch.device("cpu"))

    results = {}
    for f in files:
        lr = np.array(Image.open(os.path.join(
            WPRE, "Set5", scale_p, f))).astype(np.float32)
        gt = np.array(Image.open(os.path.join(RR, "Set5", "HR", f)))
        x = torch.Tensor(lr)[None].permute(0, 3, 1, 2) / 255.0
        lb = torch.Tensor(np.expand_dims(
            np.transpose(gt, [2, 0, 1]), axis=0))
        raw = torch.load(os.path.join(WPRE, "Set5", scale_p,
                                      f.replace("png", "pth")),
                         weights_only=False).numpy()
        m = torch.Tensor(raw).double()           # eval_model.py:219 f32 trip
        post_t = torch.Tensor([[0.5, 0, -0.25],
                               [0, 0.5, -0.25],
                               [0, 0, 1]])
        m = torch.matmul(m, post_t.double())     # eval_model.py:221-226

        feat = _mulut_predict(model_g, x, 1)
        hyper = _mulut_predict(model_g, feat / 255.0, 2)

        all_white = torch.zeros_like(x)          # eval_model.py:238-244
        h, w = all_white.shape[-2:]
        all_white[:, :, 4:h - 4, 4:w - 4] = 255
        nn_warper.set_shape(x.shape, m, lb.shape)
        mask = nn_warper.warp(all_white).bool()

        warper.set_shape(x.shape, m, lb.shape)
        c = hyper.shape[1]
        pred = warper.warp(feat,
                           hyper[:, list(range(0, c, 3))],
                           hyper[:, list(range(1, c + 1, 3))],
                           hyper[:, list(range(2, c + 2, 3))])
        pred[pred.isnan()] = 0                   # eval_model.py:261
        pred = torch.round(pred.clip(0, 255))
        psnr_v = float(mPSNR(pred, lb, mask, 255))
        out = np.clip(pred[0].numpy().transpose(1, 2, 0),
                      0, 255).astype(np.uint8)
        results[f] = (out, psnr_v, mask[0, 0].numpy())
    return results


@pytest.mark.slow
def test_preupsample_sr_matches_reference_eval_loop():
    """×3 PreUpsample SR (input scale 1.5 — the non-trivial branch; ×2's
    input scale 1.0 takes the skip path, pinned below): per-image PSNR
    within 0.01 dB, SSIM within 1e-4, pixel discipline as in
    test_golden_net.py."""
    from PIL import Image

    want = _reference_eval_sr_pre(FILES, scale=3.0)
    params = load_reference_checkpoint(CKPT)
    pred = NetPredictor.from_srnets(params)
    for f in FILES:
        lr = np.array(Image.open(os.path.join(
            PRE, "Set5", "LR_bicubic", "rrLR_X3.00_3.00", f)))
        gt = np.array(Image.open(os.path.join(RR, "Set5", "HR", f)))
        out = pred.upscale(lr, 1.5, 1.5)         # scale/post, evaluate.py:64
        w_out, w_psnr, w_ssim = want[f]
        diff = np.abs(out.astype(np.int32) - w_out.astype(np.int32))
        assert diff.max() <= 2, (f, diff.max())
        assert (diff != 0).mean() < 2e-2, (f, (diff != 0).mean())
        assert (diff > 1).mean() < 1e-3, (f, (diff > 1).mean())
        psnr_v, ssim_v = eval_sr_image(out, gt, 3.0, 3.0)
        assert abs(psnr_v - w_psnr) < 0.01, (f, psnr_v, w_psnr)
        assert abs(ssim_v - w_ssim) < 1e-4, (f, ssim_v, w_ssim)


def test_preupsample_x2_skip_path():
    """×2 PreUpsample has input scale 1.0 → the reference's skip branch
    (eval_model.py:153-154: output = round(lr)); ours must take it too."""
    from PIL import Image

    params = load_reference_checkpoint(CKPT)
    pred = NetPredictor.from_srnets(params)
    lr = np.array(Image.open(os.path.join(
        PRE, "Set5", "LR_bicubic", "rrLR_X2.00_2.00", "bird.png")))
    np.testing.assert_array_equal(pred.upscale(lr, 1.0, 1.0), lr)


@pytest.mark.slow
@pytest.mark.parametrize("scale_p", ["isc", "osc"])
def test_preupsample_warp_matches_reference_eval_loop(scale_p):
    """PreUpsample WARP branch: the homography correction ``m @ POST``
    (with the reference's f32 Tensor round-trip on m) must land our warp
    on the reference loop's per-image mPSNR within 0.01 dB with a
    bit-equal validity mask — same bounds as the non-pre warp golden."""
    import torch
    from PIL import Image

    from lerf_tpu.utils.metrics import mpsnr

    if not os.path.isdir(WPRE):
        pytest.skip("WarpPreUpsample fixtures not available")
    want = _reference_eval_warp_pre(FILES, scale_p)
    params = load_reference_checkpoint(CKPT)
    pred = NetPredictor.from_srnets(params)
    for f in FILES:
        lr = np.array(Image.open(os.path.join(WPRE, "Set5", scale_p, f)))
        gt = np.array(Image.open(os.path.join(RR, "Set5", "HR", f)))
        raw = torch.load(os.path.join(WPRE, "Set5", scale_p,
                                      f.replace("png", "pth")),
                         weights_only=False).numpy()
        matrix = raw.astype(np.float32).astype(np.float64) @ POST
        out, mask = pred.warp(lr, matrix, gt.shape[:2])
        w_out, w_psnr, w_mask = want[f]
        assert np.array_equal(mask, w_mask), (scale_p, f)
        diff = np.abs(out.astype(np.int32) - w_out.astype(np.int32))
        diff = diff * mask[:, :, None]
        assert diff.max() <= 3, (scale_p, f, diff.max())
        assert (diff != 0).mean() < 2e-2, (scale_p, f, (diff != 0).mean())
        assert (diff > 2).mean() < 1e-5, (scale_p, f, (diff > 2).mean())
        psnr_v = mpsnr(out.astype(np.float64), gt.astype(np.float64),
                       mask[:, :, None])
        assert abs(psnr_v - w_psnr) < 0.01, (scale_p, f, psnr_v, w_psnr)
