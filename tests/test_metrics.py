"""Metric / color parity vs the reference common/utils.py."""
import numpy as np
import pytest

from lerf_tpu.utils import color, metrics
from oracle import requires_reference, ref_utils

RNG = np.random.RandomState


@requires_reference
@pytest.mark.smoke
def test_psnr_matches_reference():
    u = ref_utils()
    r = RNG(0)
    a = r.randint(0, 256, (40, 50)).astype(np.float64)
    b = np.clip(a + r.randn(40, 50) * 8, 0, 255)
    for shave in (0, 2, 4):
        want = u.PSNR(a, b, shave)
        got = metrics.psnr(a, b, shave)
        assert abs(got - want) < 1e-9


@requires_reference
def test_cpsnr_matches_reference():
    u = ref_utils()
    r = RNG(1)
    a = r.randint(0, 256, (30, 30, 3)).astype(np.float64)
    b = np.clip(a + r.randn(30, 30, 3) * 5, 0, 255)
    assert abs(metrics.cpsnr(a, b, 0) - u.cPSNR(a, b, 0)) < 1e-9


@requires_reference
def test_mpsnr_matches_reference():
    import torch
    u = ref_utils()
    r = RNG(2)
    sr = r.randint(0, 256, (1, 3, 24, 26)).astype(np.float64)
    hr = np.clip(sr + r.randn(*sr.shape) * 6, 0, 255)
    mask = (r.rand(1, 3, 24, 26) > 0.3)
    want = float(u.mPSNR(torch.tensor(sr), torch.tensor(hr),
                         torch.tensor(mask), 255))
    got = metrics.mpsnr(sr, hr, mask)
    assert abs(got - want) < 1e-6


@requires_reference
@pytest.mark.smoke
def test_ssim_matches_reference():
    u = ref_utils()
    r = RNG(3)
    a = r.randint(0, 256, (64, 64)).astype(np.float64)
    b = np.clip(a + r.randn(64, 64) * 10, 0, 255)
    want = u.cal_ssim(a, b)
    got = metrics.ssim(a, b)
    assert abs(got - want) < 1e-8


@requires_reference
@pytest.mark.smoke
def test_rgb2ycbcr_matches_reference():
    u = ref_utils()
    r = RNG(4)
    img = r.randint(0, 256, (16, 17, 3)).astype(np.float64)
    np.testing.assert_allclose(color.rgb_to_ycbcr(img), u._rgb2ycbcr(img),
                               rtol=0, atol=1e-9)
    img_u8 = img.astype(np.uint8)
    np.testing.assert_array_equal(color.rgb_to_ycbcr_matlab(img_u8),
                                  u.rgb2ycbcr(img_u8))


@requires_reference
def test_modcrop_matches_reference():
    u = ref_utils()
    r = RNG(5)
    img = r.randint(0, 256, (37, 41, 3)).astype(np.uint8)
    for m in (2, 3, 4):
        np.testing.assert_array_equal(color.modcrop(img, m),
                                      u.modcrop(img, m))
