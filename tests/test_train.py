"""Training-step tests: SPMD data-parallel step on the virtual 8-device CPU
mesh, loss decrease, cosine schedule parity, gradient flow through BPDA."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lerf_tpu.models import srnet
from lerf_tpu.ops import ResizeGeometry
from lerf_tpu.parallel import make_mesh, replicate, shard_batch
from lerf_tpu.train.train_step import (
    TrainHParams, TrainState, cosine_lr, lerf_forward, make_loss_fn,
    make_optimizer, make_train_step,
)

HP = TrainHParams(scale=2.0, crop_size=8, total_iter=100, lr0=1e-3, lr1=1e-4)


def small_geom(hp=HP):
    return ResizeGeometry.create((hp.crop_size, hp.crop_size),
                                 scale_factors=[hp.scale, hp.scale],
                                 support=hp.supp_size, antialias=False)


def small_params(nf=8, seed=0):
    return srnet.init_lerf_nets(jax.random.PRNGKey(seed), nf=nf, out_c=3)


def fake_batch(b, hp=HP, seed=0):
    r = np.random.RandomState(seed)
    sz = hp.crop_size
    im = r.rand(b, 1, sz, sz).astype(np.float32)
    lb = r.rand(b, 1, int(sz * hp.scale), int(sz * hp.scale)) \
        .astype(np.float32)
    return im, lb


def test_cosine_lr_matches_torch_lambda():
    """Parity with the reference LambdaLR closure (train_model.py:362-369)."""
    sched = cosine_lr(HP)
    lr_b = HP.lr1 / HP.lr0
    lr_a = 1 - lr_b
    for x in [0, 1, 13, 50, 100]:
        want = HP.lr0 * ((((1 + math.cos(x * math.pi / HP.total_iter)) / 2)
                          ** 1.0) * lr_a + lr_b)
        got = float(sched(jnp.asarray(x)))
        assert abs(got - want) < 1e-10


@pytest.mark.smoke
def test_gradients_flow_through_both_stages():
    params = small_params()
    im, lb = fake_batch(2)
    loss_fn = make_loss_fn(small_geom(), HP)
    grads = jax.grad(loss_fn)(params, jnp.asarray(im), jnp.asarray(lb))
    # every head of both stages must receive nonzero gradient (BPDA works)
    for group in ("s1", "s2"):
        for key, head in grads[group].items():
            norms = sum(float(jnp.abs(v).sum()) for v in head.values())
            assert norms > 0, (group, key)


def test_loss_decreases_single_device():
    params = small_params()
    tx = make_optimizer(HP)
    state = TrainState.create(params, tx)
    step = make_train_step(tx, small_geom(), HP, mesh=None)
    im, lb = fake_batch(4)
    im, lb = jnp.asarray(im), jnp.asarray(lb)
    first = None
    for i in range(30):
        state, metrics = step(state, im, lb)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 30


def test_spmd_step_on_mesh_matches_single_device():
    """The 8-way sharded step computes the same update as single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = small_params(seed=3)
    tx = make_optimizer(HP)
    im, lb = fake_batch(8, seed=5)

    ref_state = TrainState.create(params, tx)
    ref_step = make_train_step(tx, small_geom(), HP, mesh=None, donate=False)
    ref_state, ref_metrics = ref_step(ref_state, jnp.asarray(im),
                                      jnp.asarray(lb))

    mesh = make_mesh(8)
    state = replicate(TrainState.create(params, tx), mesh)
    step = make_train_step(tx, small_geom(), HP, mesh=mesh, donate=False)
    bim, blb = shard_batch((im, lb), mesh)
    state, metrics = step(state, bim, blb)

    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-6
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, ref_state.params))
    assert diff < 1e-5


def test_linear_variant_forward():
    hp = TrainHParams(scale=2.0, crop_size=8, linear=True, total_iter=100)
    params = small_params()
    # linear stage-2 heads emit 1 channel
    params = {
        "s1": params["s1"],
        "s2": {k: srnet.init_srunit(jax.random.PRNGKey(7), 8, 1)
               for k in params["s2"]},
    }
    im, _ = fake_batch(2, hp)
    out = lerf_forward(params, jnp.asarray(im), small_geom(hp), hp)
    assert out.shape == (2, 1, 16, 16)
    assert bool(jnp.all(jnp.isfinite(out)))
