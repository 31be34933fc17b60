"""Jitted, mesh-sharded LeRF training step.

Reference semantics (resample/train_model.py:403-443): two-stage ensemble
prediction with straight-through rounding, steerable resize of the stage-1
feature with the stage-2 hyper maps, ``MSE(clamp(pred,0,norm)/norm, label)``,
Adam with a cosine lr ramp lr0→lr1 stepped per iteration.

TPU-first: the whole step (both ensembles, the resample gather, the loss,
the backward pass and the Adam update) is ONE jitted SPMD program; the batch
is sharded over the mesh ``data`` axis and XLA all-reduces gradients over
ICI.  The training resampler uses the torch-path geometry (anti-aliasing
hard-disabled — resize_right2d_torch.py:42-46).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import srnet
from ..ops import ResizeGeometry, amplified_linear_resize, \
    steering_gaussian_resize
from ..parallel import batch_sharding, replicated


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    """The knobs the loss/step functions need (subset of TrainConfig)."""
    scale: float = 4.0
    crop_size: int = 48
    norm: int = 255
    max_sigma: float = 10.0
    supp_size: int = 2
    linear: bool = False
    two_stage: bool = True
    stages: int = 2
    modes: Tuple[str, ...] = ("s", "c", "t")
    modes2: Tuple[str, ...] = ("s", "c", "t")
    feat_c: int = 1
    lr0: float = 1e-3
    lr1: float = 1e-4
    weight_decay: float = 0.0
    total_iter: int = 50000


def cosine_lr(hp: TrainHParams) -> optax.Schedule:
    """lr(i) = lr0·(((1+cos(iπ/T))/2)·a + b), b = lr1/lr0 (train_model.py:362-369).

    ``lr1 < 0`` selects the reference's fallback a=0.8, b=0.2 ramp.
    """
    if hp.lr1 < 0:
        a, b = 0.8, 0.2
    else:
        b = hp.lr1 / hp.lr0
        a = 1.0 - b

    def schedule(count):
        cos = (1.0 + jnp.cos(count * math.pi / hp.total_iter)) / 2.0
        return hp.lr0 * (cos * a + b)

    return schedule


def make_optimizer(hp: TrainHParams) -> optax.GradientTransformation:
    """Adam(β=0.9/0.999, ε=1e-8) with torch-style L2 (decay added to the
    gradient BEFORE the moment updates — train_model.py:360)."""
    chain = []
    if hp.weight_decay:
        chain.append(optax.add_decayed_weights(hp.weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(cosine_lr(hp)))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# forward = stage1 ensemble → stage2 ensemble → steerable resize
# ---------------------------------------------------------------------------


def lerf_forward(params: Dict, im: jnp.ndarray, geom: ResizeGeometry,
                 hp: TrainHParams,
                 stage1_fn: Optional[Callable] = None,
                 stage2_fn: Optional[Callable] = None) -> jnp.ndarray:
    """im [B, C, h, w] in [0,1] → prediction [B, C, H, W] in [0,1].

    The reference's ``mulut_predict`` per-channel loop (train_model.py:38-45)
    becomes a vmap over the channel axis fused into the same program.
    Custom ``stage1_fn(params, x2d)->feat2d`` / ``stage2_fn(params, x2d)->
    hyper[...,oC]`` plug in other model families (LUT fine-tuning, IMDN).
    """
    if stage1_fn is None:
        stage1_fn = partial(srnet.predict_stage1, modes=hp.modes,
                            stages=hp.stages, norm=hp.norm)
    if stage2_fn is None:
        stage2_fn = partial(srnet.predict_stage2, modes2=hp.modes2,
                            norm=hp.norm)

    if hp.two_stage:
        feat = stage1_fn(params, im)          # [B,C,h,w] in [0,255]
        hyper_in = feat / float(hp.norm)
    else:
        feat = jnp.round(im * hp.norm)
        hyper_in = im
    hyper = stage2_fn(params, hyper_in)       # [B,C,h,w,oC] in [0,1]

    if hp.linear:
        pred = amplified_linear_resize(feat, hyper[..., 0], geom)
    else:
        fc = hp.feat_c
        # channel packing parity: pred_hyper[:, :featC]=ρ etc.
        # (train_model.py:434); with featC=1 per-channel this is the
        # trailing-axis split.
        pred = steering_gaussian_resize(
            feat, hyper[..., 0 * fc], hyper[..., 1 * fc], hyper[..., 2 * fc],
            geom, max_sigma=hp.max_sigma)
    return jnp.clip(pred, 0, hp.norm) / float(hp.norm)


def make_loss_fn(geom: ResizeGeometry, hp: TrainHParams,
                 stage1_fn=None, stage2_fn=None):
    def loss_fn(params, im, lb):
        pred = lerf_forward(params, im, geom, hp, stage1_fn, stage2_fn)
        return jnp.mean((pred - lb) ** 2)
    return loss_fn


# ---------------------------------------------------------------------------
# train state + step
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_train_step(tx: optax.GradientTransformation,
                    geom: ResizeGeometry, hp: TrainHParams,
                    mesh=None, stage1_fn=None, stage2_fn=None,
                    donate: bool = True):
    """Build the jitted SPMD step: (state, im, lb) → (state, loss).

    With a mesh, state is replicated and (im, lb) are sharded on the batch
    axis; gradients are all-reduced by XLA over ICI.  Without a mesh it is a
    plain single-device jit.
    """
    loss_fn = make_loss_fn(geom, hp, stage1_fn, stage2_fn)

    def step(state: TrainState, im, lb):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, im, lb)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # grad global-norm: observability for the clamp-saturation trap
        # (a dead run shows high loss + ~zero grad norm)
        gnorm = optax.global_norm(grads)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), \
            {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
