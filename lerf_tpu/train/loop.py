"""LeRF training loop (network form and LUT fine-tuning).

Reference: ``resample/train_model.py:318-500``.  One jitted SPMD step over
the device mesh; host-side: data prefetch, periodic logging (train.log +
scalars.jsonl), orbax checkpoints, Set5 SR/warp validation, final LUT
export for ``--lutft`` runs.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax

from ..config import TrainConfig
from ..data.div2k import DIV2K, Provider
from ..evaluate import run_sr_benchmark, run_warp_benchmark
from ..lut.io import load_lut_bank, save_lut_bank
from ..models import srnet
from ..ops import ResizeGeometry
from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import CheckpointManager, host_params
from . import lutft
from .train_step import TrainHParams, TrainState, make_optimizer, \
    make_train_step


def setup_logger(exp_dir: str, name: str = "train") -> logging.Logger:
    """File + stream logger (reference common/utils.py:8-28)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s - %(message)s")
        fh = logging.FileHandler(os.path.join(exp_dir, f"{name}.log"))
        fh.setFormatter(fmt)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(sh)
    return logger


class ScalarWriter:
    """Scalar log: one JSON line per point (scalars.jsonl), plus real
    TensorBoard event files when the tensorboard package is importable —
    same tags as the reference's SummaryWriter (loss_Pixel,
    PSNR_X{s}/{ds}, SSIM_X{s}/{ds}, mPSNR_{isc,osc}/{ds};
    train_model.py:173-176,310-312,453-454)."""

    def __init__(self, exp_dir: str):
        self._f = open(os.path.join(exp_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(exp_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def hparams_from_config(cfg: TrainConfig) -> TrainHParams:
    return TrainHParams(
        scale=float(cfg.scale_value), crop_size=cfg.crop_size,
        norm=cfg.norm, max_sigma=float(cfg.max_sigma),
        supp_size=cfg.supp_size, linear=cfg.linear,
        two_stage=cfg.two_stage, stages=cfg.stages,
        modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
        feat_c=cfg.feat_c, lr0=cfg.lr0, lr1=cfg.lr1,
        weight_decay=cfg.weight_decay, total_iter=cfg.total_iter)


@dataclasses.dataclass
class ModelAdapter:
    """Plugs a trainable model family into the generic loop."""
    init_params: Callable[[jax.Array], Any]
    stage1_fn: Optional[Callable]       # (params, x2d) -> feat [0,255]
    stage2_fn: Optional[Callable]       # (params, x2d) -> hyper [...,oC]
    make_predictor: Callable[[Any], Any]
    finalize: Callable[[Any, TrainConfig], None]


def srnets_adapter(cfg: TrainConfig, hp: TrainHParams) -> ModelAdapter:
    """The default SRNetsSWF2-equivalent pixel-MLP ensemble."""
    from ..pipeline import NetPredictor

    def init(key):
        return srnet.init_lerf_nets(
            key, modes=hp.modes, modes2=hp.modes2, nf=cfg.nf,
            out_c=cfg.out_c, stages=cfg.stages)

    def predictor(params):
        return NetPredictor.from_srnets(
            params, modes=hp.modes, modes2=hp.modes2, stages=hp.stages,
            linear=hp.linear, two_stage=hp.two_stage,
            supp_size=hp.supp_size, max_sigma=hp.max_sigma, norm=hp.norm)

    return ModelAdapter(init_params=init, stage1_fn=None, stage2_fn=None,
                        make_predictor=predictor,
                        finalize=lambda params, cfg: None)


def imdn_adapter(cfg: TrainConfig, hp: TrainHParams) -> ModelAdapter:
    """LeRF-Net / LeRF-Net++ (IMDN2, inC=3): CNN hyper-predictor trained
    through the same steerable-resize objective (train_model.py:336-338
    with --model IMDN2)."""
    import jax.numpy as jnp

    from ..models.imdn import IMDN2
    from ..pipeline import NetPredictor

    model = IMDN2(in_c=cfg.in_c, out_c=cfg.out_c, nf=cfg.nf, norm=cfg.norm)

    def init(key):
        return model.init(key, jnp.zeros((1, cfg.crop_size, cfg.crop_size,
                                          cfg.in_c)), 0)

    def s1(p, x):                       # [B,C,h,w] → [B,C,h,w]
        nhwc = x.transpose(0, 2, 3, 1)
        return model.apply(p, nhwc, 1).transpose(0, 3, 1, 2)

    def s2(p, x):                       # [B,C,h,w] → [B,C,h,w,oC]
        nhwc = x.transpose(0, 2, 3, 1)
        out = model.apply(p, nhwc, 2)   # [B,h,w,oC·C]
        b, hh, ww, _ = out.shape
        out = out.reshape(b, hh, ww, cfg.out_c, cfg.in_c)
        return out.transpose(0, 4, 1, 2, 3)

    def predictor(params):
        return NetPredictor.from_imdn(model, params, out_c=cfg.out_c,
                                      linear=hp.linear,
                                      two_stage=hp.two_stage,
                                      supp_size=hp.supp_size,
                                      max_sigma=hp.max_sigma, norm=hp.norm)

    return ModelAdapter(init_params=init, stage1_fn=s1, stage2_fn=s2,
                        make_predictor=predictor,
                        finalize=lambda params, cfg: None)


def lutft_adapter(cfg: TrainConfig, hp: TrainHParams) -> ModelAdapter:
    """LUT fine-tuning: tables from ``{exp_dir}/LUT_*.npy`` become the
    trainable params; finalize writes int8 ``LUTft_*.npy``."""
    from ..pipeline import NetPredictor

    bank = load_lut_bank(cfg.exp_dir, lut_name="LUT",
                         modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
                         out_c=cfg.out_c, interval=cfg.interval)

    s1 = partial(lutft.predict_stage1, modes=hp.modes, stages=hp.stages,
                 norm=hp.norm, interval=cfg.interval)
    s2 = partial(lutft.predict_stage2, modes2=hp.modes2, norm=hp.norm,
                 interval=cfg.interval)

    def predictor(params):
        return NetPredictor(params, s1, s2, linear=hp.linear,
                            two_stage=hp.two_stage, supp_size=hp.supp_size,
                            max_sigma=hp.max_sigma, norm=hp.norm)

    def finalize(params, cfg):
        save_lut_bank(lutft.bank_from_params(params, cfg.out_c,
                                             cfg.interval),
                      cfg.exp_dir, lut_name="LUTft",
                      keep_trailing_dims=False)

    return ModelAdapter(
        init_params=lambda key: lutft.params_from_bank(bank),
        stage1_fn=s1, stage2_fn=s2, make_predictor=predictor,
        finalize=finalize)


def validate(predictor, cfg: TrainConfig, logger, writer: ScalarWriter,
             step: int, datasets=("Set5",)):
    """Set5 SR (X2/3/4) + warp (isc/osc) validation, logged like the
    reference's valid_steps / valid_steps_warp scalars
    (train_model.py:173-176,310-312).  Output images are dumped under
    ``{expDir}/val/{step}`` like the reference's artifact saves."""
    scales = [(2, 2), (3, 3), (4, 4)]
    val_root = os.path.join(cfg.exp_dir, "val", f"{step:06d}")
    for ds in datasets:
        if os.path.isdir(os.path.join(cfg.val_dir, ds, "HR")):
            res = run_sr_benchmark(predictor, cfg.val_dir, ds, scales,
                                   result_root=val_root, exp_name="sr")
            for (sh, sw), (p, s) in res.items():
                logger.info(f"Iter {step} | {ds} X{sh} PSNR: {p:.2f} "
                            f"SSIM: {s:.4f}")
                writer.add_scalar(f"PSNR_X{sh}/{ds}", p, step)
                writer.add_scalar(f"SSIM_X{sh}/{ds}", s, step)
        if os.path.isdir(os.path.join(cfg.val_w_dir, ds, "HR")):
            resw = run_warp_benchmark(predictor, cfg.val_w_dir, ds,
                                      result_root=val_root, exp_name="warp")
            for sp, p in resw.items():
                logger.info(f"Iter {step} | {ds} {sp} mPSNR: {p:.2f}")
                writer.add_scalar(f"mPSNR_{sp}/{ds}", p, step)


def train(cfg: TrainConfig, adapter: Optional[ModelAdapter] = None) -> Dict:
    """Run the full training job; returns the final params pytree."""
    cfg.apply_debug()
    cfg.resolve_exp_dir()
    cfg.save()
    cfg.snapshot_code()
    logger = setup_logger(cfg.exp_dir, "lutft" if cfg.lutft else "train")
    writer = ScalarWriter(cfg.exp_dir)
    hp = hparams_from_config(cfg)
    if adapter is None:
        if cfg.lutft:
            adapter = lutft_adapter(cfg, hp)
        elif cfg.model == "IMDN2":
            adapter = imdn_adapter(cfg, hp)
        else:
            adapter = srnets_adapter(cfg, hp)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if cfg.batch_size % n_dev:
        raise ValueError(f"batch {cfg.batch_size} % devices {n_dev} != 0")
    logger.info(f"mesh: {n_dev} × {mesh.devices.flat[0].platform}")

    params = adapter.init_params(jax.random.PRNGKey(cfg.seed))
    tx = make_optimizer(hp)
    ckpt = CheckpointManager(cfg.exp_dir, keep=cfg.keep_checkpoints)
    state = TrainState.create(params, tx)
    if cfg.start_iter > 0:
        state = ckpt.restore(cfg.start_iter, template=state)
        logger.info(f"restored step {cfg.start_iter}")
    state = replicate(state, mesh)

    # training geometry: torch-path semantics (no anti-alias,
    # resize_right2d_torch.py:42-46)
    geom = ResizeGeometry.create(
        (cfg.crop_size, cfg.crop_size),
        scale_factors=[hp.scale, hp.scale], support=hp.supp_size,
        antialias=False)
    step_fn = make_train_step(tx, geom, hp, mesh=mesh,
                              stage1_fn=adapter.stage1_fn,
                              stage2_fn=adapter.stage2_fn)

    dataset = DIV2K(cfg.train_dir, cfg.scale_value, cfg.crop_size,
                    nsigma=cfg.nsigma, in_c=cfg.in_c, seed=cfg.seed)
    device_ds = None
    provider = None
    if cfg.device_data:
        # HBM-resident sampling: host does nothing per step
        from ..data.device_data import DeviceDataset
        device_ds = DeviceDataset.from_div2k(dataset)
        data_key = jax.random.PRNGKey(cfg.seed + 17)
        logger.info("device-resident dataset: "
                    f"{device_ds.lr.nbytes / 1e6:.0f} MB LR + "
                    f"{device_ds.hr.nbytes / 1e6:.0f} MB HR in HBM")
    else:
        provider = Provider(dataset, cfg.batch_size)

    # optional device-level profiling window (aux subsystem; the reference
    # only has wall-clock dT/rT accumulators — train_model.py:406-412)
    prof_start = cfg.start_iter + 10 if cfg.profile_steps > 0 else -1
    prof_stop = prof_start + cfg.profile_steps

    # dead-run guard: the LeRF objective has a clamp-saturation trap (all
    # predictions pinned at 0/255 → zero gradients, permanently stuck).
    # Detected as high loss + ~zero grad norm early on; reinit with the
    # next seed (disable with --auto_reseed 0).
    reseed_left = cfg.auto_reseed if cfg.start_iter == 0 else 0
    reseed_check = cfg.start_iter + max(2 * cfg.display_step, 50)
    next_seed = cfg.seed + 1

    dT, rT = 0.0, 0.0
    loss = None
    i = cfg.start_iter
    while i < cfg.total_iter:
        i += 1
        if i == prof_start:
            jax.profiler.start_trace(os.path.join(cfg.exp_dir, "profile"))
        st = time.time()
        if device_ds is not None:
            batch = device_ds.sample_batch(
                jax.random.fold_in(data_key, i), cfg.batch_size)
            batch = shard_batch(batch, mesh)
        else:
            im, lb = provider.next()
            batch = shard_batch((im, lb), mesh)
        dT += time.time() - st

        st = time.time()
        state, metrics = step_fn(state, *batch)
        loss = metrics["loss"]
        if i % cfg.display_step == 0:
            loss.block_until_ready()
        rT += time.time() - st

        if i == prof_stop:
            loss.block_until_ready()
            jax.profiler.stop_trace()
            logger.info(f"profile trace written to {cfg.exp_dir}/profile")

        if i == reseed_check and reseed_left > 0:
            lval = float(loss)
            gn = float(metrics["grad_norm"])
            if lval > 0.15 and gn < 1e-3:
                logger.warning(
                    f"dead run at iter {i} (loss {lval:.3f}, grad_norm "
                    f"{gn:.2e}): clamp-saturation trap — reinitializing "
                    f"with seed {next_seed}")
                params = adapter.init_params(jax.random.PRNGKey(next_seed))
                state = replicate(TrainState.create(params, tx), mesh)
                next_seed += 1
                reseed_left -= 1
                i = cfg.start_iter
                continue

        if i % cfg.display_step == 0:
            lval = float(loss)
            gn = float(metrics["grad_norm"])
            writer.add_scalar("loss_Pixel", lval, i)
            writer.add_scalar("grad_norm", gn, i)
            logger.info(
                f"{cfg.exp_dir} | Iter:{i:6d}, GPixel:{lval:.2e}, "
                f"gNorm:{gn:.2e}, dT:{dT / cfg.display_step:.4f}, "
                f"rT:{rT / cfg.display_step:.4f}")
            dT, rT = 0.0, 0.0

        if i % cfg.save_step == 0 and not cfg.lutft:
            ckpt.save(i, jax.device_get(state))
            logger.info(f"Checkpoint saved {i}")

        if i % cfg.val_step == 0 or (cfg.debug and i == 1):
            validate(adapter.make_predictor(host_params(state.params)),
                     cfg, logger, writer, i)

    if provider is not None:
        provider.close()
    final = host_params(state.params)
    adapter.finalize(final, cfg)
    writer.close()
    ckpt.close()
    logger.info("Complete")
    return final
