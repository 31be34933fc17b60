"""Data pipeline + config tests (synthetic DIV2K layout)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from lerf_tpu import config as config_mod
from lerf_tpu.config import TrainConfig, parse_config
from lerf_tpu.data.div2k import DIV2K, Provider


@pytest.fixture(scope="module")
def tiny_div2k(tmp_path_factory):
    root = tmp_path_factory.mktemp("div2k")
    os.makedirs(root / "HR")
    os.makedirs(root / "LR" / "X4")
    rng = np.random.RandomState(0)
    files = ["0001", "0002"]
    for f in files:
        hr = rng.randint(0, 256, (96, 128, 3), dtype=np.uint8)
        lr = hr[::4, ::4]
        Image.fromarray(hr).save(root / "HR" / f"{f}.png")
        Image.fromarray(lr).save(root / "LR" / "X4" / f"{f}x4.png")
    return str(root), files


@pytest.mark.smoke
def test_div2k_sampler_shapes_and_cache(tiny_div2k):
    root, files = tiny_div2k
    ds = DIV2K(root, 4, crop_size=12, in_c=1, seed=0, file_list=files)
    assert os.path.exists(os.path.join(root, "cache_hr.npy"))
    assert os.path.exists(os.path.join(root, "cache_lr_x4.npy"))
    im, lb = ds.sample()
    assert im.shape == (1, 12, 12) and lb.shape == (1, 48, 48)
    assert im.dtype == np.float32 and 0 <= im.min() and im.max() <= 1
    bim, blb = ds.batch(3)
    assert bim.shape == (3, 1, 12, 12) and blb.shape == (3, 1, 48, 48)

    # RGB mode
    ds3 = DIV2K(root, 4, crop_size=8, in_c=3, seed=1, file_list=files)
    im3, lb3 = ds3.sample()
    assert im3.shape == (3, 8, 8) and lb3.shape == (3, 32, 32)


def test_provider_prefetch(tiny_div2k):
    root, files = tiny_div2k
    ds = DIV2K(root, 4, crop_size=8, in_c=1, seed=2, file_list=files)
    p = Provider(ds, batch_size=2, prefetch=2)
    for _ in range(5):
        im, lb = p.next()
        assert im.shape == (2, 1, 8, 8)
    p.close()


@pytest.mark.smoke
def test_config_camel_case_aliases(tmp_path):
    cfg = parse_config(TrainConfig, [
        "--batchSize", "8", "--cropSize", "24", "--totalIter", "100",
        "--twoStage", "--outC", "3", "-e", str(tmp_path / "exp"),
        "--scale", "4"])
    assert cfg.batch_size == 8 and cfg.crop_size == 24
    assert cfg.total_iter == 100 and cfg.two_stage and cfg.out_c == 3
    assert cfg.scale_value == 4 and isinstance(cfg.scale_value, int)

    cfg2 = parse_config(config_mod.TestConfig, ["--scale", "2.5"])
    assert cfg2.scale_value == 2.5


def test_config_save_load_roundtrip(tmp_path):
    cfg = parse_config(TrainConfig, ["-e", str(tmp_path / "exp"), "--nf",
                                     "32"])
    cfg.resolve_exp_dir()
    cfg.save()
    assert os.path.exists(os.path.join(cfg.exp_dir, "opt.json"))
    assert os.path.exists(os.path.join(cfg.exp_dir, "opt.txt"))
    loaded = TrainConfig.load(cfg.exp_dir)
    assert loaded.nf == 32

    with open(os.path.join(cfg.exp_dir, "opt.json")) as f:
        assert json.load(f)["nf"] == 32


def test_debug_shrinkage():
    cfg = TrainConfig(debug=True)
    cfg.apply_debug()
    assert cfg.total_iter == 200 and cfg.batch_size == 4


def test_grayscale_benchmark_promotion(tmp_path):
    """Grayscale benchmark images are promoted to 3 channels end to end
    (eval_lut_sr.py:514-538 convention; Set14 contains grayscale pngs)."""
    from lerf_tpu.data.benchmarks import SRBenchmark

    os.makedirs(tmp_path / "Gray" / "HR")
    os.makedirs(tmp_path / "Gray" / "LR_bicubic" / "rrLR_X2.00_2.00")
    rng = np.random.RandomState(0)
    hr = rng.randint(0, 256, (16, 16), dtype=np.uint8)     # single channel
    Image.fromarray(hr, mode="L").save(tmp_path / "Gray" / "HR" / "a.png")
    Image.fromarray(hr[::2, ::2], mode="L").save(
        tmp_path / "Gray" / "LR_bicubic" / "rrLR_X2.00_2.00" / "a.png")

    bench = SRBenchmark(str(tmp_path), "Gray")
    lr, hr3, name = bench.pair(0, 2, 2)
    assert lr.shape == (8, 8, 3) and hr3.shape == (16, 16, 3)
    assert np.array_equal(hr3[:, :, 0], hr3[:, :, 1])


def test_srbenchmark_nsigma_noisy_eval(tmp_path):
    """nsigma>0 adds deterministic Gaussian noise to LR (denoising-mode
    eval; the reference's MultiSRBenchmark accepts nsigma at data.py:248
    but never applies it — we implement the intended behavior)."""
    from lerf_tpu.data.benchmarks import SRBenchmark

    os.makedirs(tmp_path / "S" / "HR")
    os.makedirs(tmp_path / "S" / "LR_bicubic" / "rrLR_X2.00_2.00")
    rng = np.random.RandomState(1)
    hr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    Image.fromarray(hr).save(tmp_path / "S" / "HR" / "a.png")
    Image.fromarray(hr[::2, ::2]).save(
        tmp_path / "S" / "LR_bicubic" / "rrLR_X2.00_2.00" / "a.png")

    clean = SRBenchmark(str(tmp_path), "S").pair(0, 2, 2)[0]
    noisy_bench = SRBenchmark(str(tmp_path), "S", nsigma=10.0)
    noisy = noisy_bench.pair(0, 2, 2)[0]
    assert not np.array_equal(noisy, clean)
    assert noisy.min() >= 0 and noisy.max() <= 255
    assert noisy.dtype == np.float32
    # integral (round applied) and deterministic across re-reads
    np.testing.assert_array_equal(noisy, np.round(noisy))
    np.testing.assert_array_equal(noisy, noisy_bench.pair(0, 2, 2)[0])
    got_sigma = np.std(noisy.astype(np.float64) - clean)
    assert 5.0 < got_sigma < 15.0


def test_bool_flags_no_prefix(tmp_path):
    """BooleanOptionalAction: default-True bools are disablable."""
    from lerf_tpu.config import TestConfig, parse_config

    cfg = parse_config(TestConfig, ["--linear"])
    assert cfg.linear is True
    cfg = parse_config(TestConfig, ["--no-linear"])
    assert cfg.linear is False
    cfg = parse_config(TestConfig, ["--nsigma", "2.5"])
    assert cfg.nsigma == 2.5
