"""End-to-end smoke of the training loop (tiny synthetic DIV2K, CPU mesh):
network training + checkpointing, then LUT transfer, then LUT fine-tuning."""
import os

import numpy as np
import pytest
from PIL import Image

# compiles the full SPMD train step + validation pipelines — minutes on
# this 1-core host.  Fast tier: `pytest -m "not slow"` (README "Test tiers").
pytestmark = pytest.mark.slow

from lerf_tpu.config import TrainConfig
from lerf_tpu.lut.io import load_lut_bank, save_lut_bank
from lerf_tpu.lut.transfer import transfer_to_lut
from lerf_tpu.train.loop import train


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp_root")
    data = root / "div2k"
    os.makedirs(data / "HR")
    os.makedirs(data / "LR" / "X4")
    rng = np.random.RandomState(0)
    for f in ["0001", "0002"]:
        hr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(hr).save(data / "HR" / f"{f}.png")
        Image.fromarray(hr[::4, ::4]).save(data / "LR" / "X4" / f"{f}x4.png")
    return root


def base_cfg(root, exp, **kw):
    return TrainConfig(
        exp_dir=str(root / exp), train_dir=str(root / "div2k"),
        val_dir=str(root / "none"), val_w_dir=str(root / "none"),
        scale="4", crop_size=8, batch_size=8, total_iter=6,
        display_step=2, save_step=3, val_step=100, nf=8, out_c=3,
        two_stage=True, **kw)


def test_train_transfer_lutft_cycle(tiny_root):
    # 1. short network training run
    cfg = base_cfg(tiny_root, "exp1")
    params = train(cfg)
    assert os.path.isdir(os.path.join(cfg.exp_dir, "ckpt"))
    assert os.path.exists(os.path.join(cfg.exp_dir, "scalars.jsonl"))

    # 2. transfer trained params to LUTs
    bank = transfer_to_lut(params, out_c=3)
    save_lut_bank(bank, cfg.exp_dir, lut_name="LUT",
                  keep_trailing_dims=False)
    assert bank.stage1["s"].shape == (17 ** 4, 1)

    # 3. fine-tune the LUTs for a few steps and export LUTft
    cfg2 = base_cfg(tiny_root, "exp1", lutft=True)
    cfg2.total_iter = 4
    train(cfg2)
    ft = load_lut_bank(cfg.exp_dir, lut_name="LUTft", out_c=3)
    assert ft.stage2["sr0"].shape == (17 ** 4, 3)
    assert ft.stage2["sr0"].dtype == np.int8


def test_resume_from_checkpoint(tiny_root):
    cfg = base_cfg(tiny_root, "exp2")
    train(cfg)
    cfg_resume = base_cfg(tiny_root, "exp2", start_iter=6)
    cfg_resume.total_iter = 8
    train(cfg_resume)   # restores step-6 checkpoint and continues
