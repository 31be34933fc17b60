"""Device-resident dataset: shape/range/augmentation-distribution checks and
end-to-end training smoke."""
import os

import numpy as np
import pytest
from PIL import Image

import jax

from lerf_tpu.data.device_data import DeviceDataset


def make_images(n=3, seed=0):
    rng = np.random.RandomState(seed)
    lrs, hrs = [], []
    for i in range(n):
        h, w = 16 + 4 * i, 20 + 4 * i
        lr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        hr = rng.randint(0, 256, (h * 4, w * 4, 3), dtype=np.uint8)
        lrs.append(lr)
        hrs.append(hr)
    return lrs, hrs


def test_sample_shapes_and_alignment():
    lrs, hrs = make_images()
    ds = DeviceDataset(lrs, hrs, scale=4, crop_size=8, in_c=1)
    im, lb = ds.sample_batch(jax.random.PRNGKey(0), 6)
    assert im.shape == (6, 1, 8, 8) and lb.shape == (6, 1, 32, 32)
    assert float(im.min()) >= 0 and float(im.max()) <= 1

    # crops must come from valid (unpadded) regions: with constant images
    # per index, im pixels identify the source image
    lrs2 = [np.full((12, 12, 3), v, np.uint8) for v in (10, 100, 200)]
    hrs2 = [np.full((48, 48, 3), v, np.uint8) for v in (10, 100, 200)]
    ds2 = DeviceDataset(lrs2, hrs2, scale=4, crop_size=8, in_c=1)
    im2, lb2 = ds2.sample_batch(jax.random.PRNGKey(1), 16)
    vals = np.unique(np.round(np.asarray(im2) * 255))
    assert set(vals.tolist()) <= {10.0, 100.0, 200.0}
    # lr and hr crops must come from the same image
    np.testing.assert_array_equal(np.asarray(im2)[:, 0, 0, 0],
                                  np.asarray(lb2)[:, 0, 0, 0])


def test_rgb_mode():
    lrs, hrs = make_images(seed=2)
    ds = DeviceDataset(lrs, hrs, scale=4, crop_size=8, in_c=3)
    im, lb = ds.sample_batch(jax.random.PRNGKey(2), 4)
    assert im.shape == (4, 3, 8, 8) and lb.shape == (4, 3, 32, 32)


def test_train_loop_with_device_data(tmp_path):
    from lerf_tpu.config import TrainConfig
    from lerf_tpu.train.loop import train

    data = tmp_path / "div2k"
    os.makedirs(data / "HR")
    os.makedirs(data / "LR" / "X4")
    rng = np.random.RandomState(0)
    for f in ["0001", "0002"]:
        hr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(hr).save(data / "HR" / f"{f}.png")
        Image.fromarray(hr[::4, ::4]).save(data / "LR" / "X4" / f"{f}x4.png")

    cfg = TrainConfig(
        exp_dir=str(tmp_path / "exp"), train_dir=str(data),
        val_dir=str(tmp_path / "none"), val_w_dir=str(tmp_path / "none"),
        scale="4", crop_size=8, batch_size=8, total_iter=4,
        display_step=2, save_step=100, val_step=100, nf=8, out_c=3,
        two_stage=True, device_data=True, auto_reseed=0, seed=1)
    params = train(cfg)
    assert "s1" in params and "s2" in params


def test_tiled_dataset_dense_and_valid():
    """tile= pre-tiling: zero padding waste on heterogeneous sizes, crops
    still drawn from real image content."""
    from lerf_tpu.data.device_data import DeviceDataset, tile_images

    rng = np.random.RandomState(0)
    sizes = [(24, 40), (32, 28), (48, 48)]
    lrs = [np.full((h, w, 3), 10 * i + 10, np.uint8)
           for i, (h, w) in enumerate(sizes)]
    hrs = [np.full((2 * h, 2 * w, 3), 10 * i + 10, np.uint8)
           for i, (h, w) in enumerate(sizes)]

    tl, th = tile_images(lrs, hrs, 2, 16)
    assert all(t.shape == (16, 16, 3) for t in tl)
    assert all(t.shape == (32, 32, 3) for t in th)
    # per-image tile counts: ceil-cover grids
    assert len(tl) == 2 * 3 + 2 * 2 + 3 * 3

    ds = DeviceDataset(lrs, hrs, scale=2, crop_size=8, in_c=3, tile=16)
    # dense: footprint is exactly n_tiles * tile bytes * (1 + scale^2)
    n = len(tl)
    assert ds.hbm_bytes == n * 16 * 16 * 3 + n * 32 * 32 * 3
    # max-pad stacking of the same images would cost the max-shape blowup
    padded = DeviceDataset(lrs, hrs, scale=2, crop_size=8, in_c=3)
    assert padded.hbm_bytes == 3 * (48 * 48 * 3) * 5
    im, lb = ds.sample_batch(jax.random.PRNGKey(0), 16)
    assert im.shape == (16, 3, 8, 8) and lb.shape == (16, 3, 16, 16)
    vals = np.unique(np.asarray(im) * 255.0)
    assert set(np.round(vals).astype(int)).issubset({10, 20, 30})
    # lr/hr crops pair up (constant per image)
    np.testing.assert_allclose(np.asarray(im).mean((1, 2, 3)),
                               np.asarray(lb).mean((1, 2, 3)), atol=1e-6)


def test_tile_hr_shape_mismatch_rejected():
    """Regression: a short HR used to zero-pad the edge-aligned tiles'
    labels silently; now it is a hard error."""
    import pytest

    from lerf_tpu.data.device_data import tile_images

    rng = np.random.RandomState(0)
    lr = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    hr_short = rng.randint(0, 256, (79, 80, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="HR shape"):
        tile_images([lr], [hr_short], 2, 16)


def test_tile_smaller_than_crop_rejected():
    from lerf_tpu.data.device_data import DeviceDataset
    lrs = [np.zeros((32, 32, 3), np.uint8)]
    hrs = [np.zeros((64, 64, 3), np.uint8)]
    with pytest.raises(ValueError, match="tile"):
        DeviceDataset(lrs, hrs, scale=2, crop_size=24, in_c=3, tile=16)
