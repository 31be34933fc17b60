"""Network-form evaluation (LeRF-Net / LeRF-Net++ / trained SRNets).

Drop-in equivalent of the reference driver (resample/eval_model.py): the SR
vs warp branch follows the reference convention — "warp" in ``resultRoot``
selects warping (eval_model.py:307).

    python -m lerf_tpu.cli.eval_model --testDir data/rrBenchmark \
        --resultRoot results/sr-net -e models/lerf-net --model IMDN2 \
        --inC 3 --featC 3
"""
from __future__ import annotations

import os
import sys

from ..config import TestConfig, parse_config
from ..evaluate import (format_sr_header, format_sr_row, format_warp_header,
                        format_warp_row, run_sr_benchmark,
                        run_warp_benchmark)
from ..pipeline import NetPredictor

DEFAULT_DATASETS = ["Set5"]
DEFAULT_SCALES = [[2, 2], [3, 3], [4, 4]]


def build_predictor(cfg: TestConfig) -> NetPredictor:
    if cfg.model == "IMDN2":
        import jax
        import jax.numpy as jnp

        from ..models.imdn import IMDN2
        model = IMDN2(in_c=cfg.in_c, out_c=cfg.out_c, nf=cfg.nf,
                      norm=cfg.norm)
        variables = None
        if os.path.isdir(os.path.join(cfg.exp_dir, "ckpt")):
            # our own orbax checkpoints (cli.train --model IMDN2)
            from ..train.checkpoint import CheckpointManager
            mgr = CheckpointManager(cfg.exp_dir)
            state = mgr.restore(cfg.load_iter)
            mgr.close()
            if state is not None:
                variables = (state["params"] if isinstance(state, dict)
                             else state.params)
        ckpt = os.path.join(cfg.exp_dir, f"Model_{cfg.load_iter:06d}.pth")
        if variables is None and os.path.exists(ckpt):
            from ..models.convert import imdn_from_torch_checkpoint
            variables = imdn_from_torch_checkpoint(ckpt, model)
        elif variables is None:
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, cfg.in_c)), 1)
        return NetPredictor.from_imdn(model, variables, out_c=cfg.out_c,
                                      linear=cfg.linear,
                                      two_stage=cfg.two_stage,
                                      supp_size=cfg.supp_size,
                                      max_sigma=cfg.max_sigma, norm=cfg.norm)
    # SRNetsSWF2 pixel-MLP form from our checkpoints / reference pickles
    from .transfer import load_params
    params = load_params(cfg)
    return NetPredictor.from_srnets(
        params, modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
        stages=cfg.stages, linear=cfg.linear, two_stage=cfg.two_stage,
        supp_size=cfg.supp_size, max_sigma=cfg.max_sigma, norm=cfg.norm,
        backend=getattr(cfg, "backend", "auto"))


def main(argv=None, datasets=None):
    cfg = parse_config(TestConfig, argv)
    datasets = datasets or cfg.dataset_list() or DEFAULT_DATASETS
    pred = build_predictor(cfg)
    exp_name = cfg.exp_dir.rstrip("/").split("/")[-1]

    if "warp" in cfg.result_root:
        pre_up = "PreUpsample" in cfg.test_dir
        results = {}
        print(format_warp_header(), flush=True)
        for ds in datasets:
            results[ds] = run_warp_benchmark(
                pred, cfg.test_dir, ds, ("isc", "osc"),
                hr_root=cfg.hr_root or None, result_root=cfg.result_root,
                exp_name=exp_name, pre_upsample=pre_up,
                dynamic=cfg.dynamic_warp, bucket=cfg.bucket)
            print(format_warp_row(ds, results[ds]), flush=True)
        return results

    post = 2 if "PreUpsample" in cfg.test_dir else 1
    scales = cfg.scale_list() or [tuple(s) for s in DEFAULT_SCALES]
    results = {}
    print(format_sr_header(scales), flush=True)
    for ds in datasets:
        results[ds] = run_sr_benchmark(
            pred, cfg.test_dir, ds, scales, result_root=cfg.result_root,
            exp_name=exp_name, post=post, nsigma=cfg.nsigma,
            bucket=cfg.bucket, dynamic=cfg.dynamic_sr)
        print(format_sr_row(ds, results[ds], scales), flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
