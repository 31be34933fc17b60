"""Spatial (output-row) sharding of the steerable resize on the CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# every test here jit-compiles shard_map pipelines on the virtual 8-device
# CPU mesh — minutes of compile each on this 1-core host; the driver's
# dryrun_multichip covers the same pipelines every round.  Fast tier:
# `pytest -m "not slow"` (README "Test tiers").
pytestmark = pytest.mark.slow

from lerf_tpu.ops import ResizeGeometry, WarpGeometry, \
    steering_gaussian_resize, steering_gaussian_warp
from lerf_tpu.parallel import make_mesh
from lerf_tpu.parallel.spatial import steering_gaussian_resize_sharded, \
    steering_gaussian_warp_sharded


@pytest.mark.parametrize("scale", [[2, 2], [2.5, 1.5], [2.35, 2.0]])
def test_sharded_resize_matches_unsharded(scale):
    """Includes a non-divisible outH (16*2.35=37 rows on 8 devices) — the
    sharded path pads duplicated geometry rows and crops."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    c, h, w = 3, 16, 20
    geom = ResizeGeometry.create((h, w), scale_factors=scale, support=2)
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32) * 255)
    hyper = rng.rand(3, c, h, w).astype(np.float32)
    rho, sx, sy = (jnp.asarray(x) for x in hyper)

    want = np.asarray(steering_gaussian_resize(img, rho, sx, sy, geom))
    got = np.asarray(jax.jit(
        lambda *a: steering_gaussian_resize_sharded(*a, geom, mesh))(
            img, rho, sx, sy))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_sharded_warp_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(1)
    c, h, w = 3, 14, 18
    oh, ow = 27, 30      # outH deliberately not divisible by 8
    matrix = np.linalg.inv(np.diag([0.55, 0.6, 1.0]))
    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=2)
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32) * 255)
    hyper = rng.rand(3, c, h, w).astype(np.float32)
    rho, sx, sy = (jnp.asarray(x) for x in hyper)

    want = np.asarray(steering_gaussian_warp(img, rho, sx, sy, geom))
    got = np.asarray(jax.jit(
        lambda *a: steering_gaussian_warp_sharded(*a, geom, mesh))(
            img, rho, sx, sy))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=1e-6,
                               atol=1e-4)


def test_sharded_lut_stages_bit_exact():
    """Full sharded SR pipeline (row-sharded stages + row-sharded resize)
    matches the single-device pipeline bit-for-bit, divisible and
    non-divisible input heights."""
    import numpy as np

    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2, split_gaussian_hyper)
    from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize
    from lerf_tpu.parallel import (lut_stages_sharded, make_mesh,
                                   sharded_lut_sr_pipeline)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(7)
    L4 = 17 ** 4
    modes = ("s", "c", "t")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True)

    for h in (32, 29):                      # divisible and non-divisible
        img = jnp.asarray(rng.randint(0, 256, (3, h, 24)).astype(np.int32))
        feat_ref = lut_stage1(img, s1, modes)
        hyper_ref = lut_stage2(feat_ref, s2, modes)
        feat, hyper = lut_stages_sharded(img, s1, s2, modes, mesh)
        np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat))
        np.testing.assert_array_equal(np.asarray(hyper_ref),
                                      np.asarray(hyper))

        geom = ResizeGeometry.create((h, 24), scale_factors=[2, 2],
                                     support=2)
        rho, sx, sy = split_gaussian_hyper(hyper_ref)
        want = np.asarray(steering_gaussian_resize(
            feat_ref.astype(jnp.float32), rho, sx, sy, geom,
            max_sigma=10.0))
        got = np.asarray(sharded_lut_sr_pipeline(img, s1, s2, modes, geom,
                                                 mesh))
        np.testing.assert_array_equal(want, got)


def test_sharded_dynamic_resize_matches_unsharded():
    """Output-row-sharded rings resize: one sharded program, scales as
    traced data — matches the single-device rings op across scales
    (including non-divisible outH and a non-periodic scale)."""
    from lerf_tpu.ops import (ResizeOperands, resize_rings,
                              steering_gaussian_resize_rings)
    from lerf_tpu.parallel import (make_mesh,
                                   steering_gaussian_resize_rings_sharded)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(5)
    c, h, w = 3, 14, 18
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32) * 255)
    hyper = rng.rand(3, c, h, w).astype(np.float32)
    rho, sx, sy = (jnp.asarray(x) for x in hyper)

    fn = jax.jit(lambda *a: steering_gaussian_resize_rings_sharded(
        *a, mesh))
    for scale in [(2.0, 2.0), (1.93, 2.0)]:   # outH 28 / 28·27 mixes
        rings = resize_rings(ResizeOperands.create((h, w),
                                                   scale_factors=list(scale)))
        want = np.asarray(steering_gaussian_resize_rings(
            img, rho, sx, sy, rings))
        got = np.asarray(fn(img, rho, sx, sy,
                            jax.tree.map(jnp.asarray, rings)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_sharded_sr_pipeline_single_allgather():
    """Communication-structure pin: the sharded SR pipeline must emit
    exactly ONE all-gather (the input-sized feat/hyper gather feeding the
    replicated-source resize) — a regression here means the sharding specs
    started moving output-sized tensors between chips."""
    from lerf_tpu.ops import ResizeGeometry
    from lerf_tpu.ops.lut_pipeline import build_packed_tables
    from lerf_tpu.parallel import make_mesh, sharded_lut_sr_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(11)
    L4 = 17 ** 4
    modes = ("s", "c", "t")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True)
    geom = ResizeGeometry.create((16, 16), scale_factors=[2, 2], support=2)
    img = jnp.asarray(rng.randint(0, 256, (3, 16, 16)).astype(np.int32))
    hlo = jax.jit(lambda im: sharded_lut_sr_pipeline(
        im, s1, s2, modes, geom, mesh)).lower(img).compile().as_text()
    n_ag = hlo.count(" all-gather(") + hlo.count(" all-gather-start(")
    assert n_ag == 1, hlo[:2000]


def test_sharded_stages_distinct_modes2():
    """Regression: stage-2 banks may use a different mode set than stage 1
    (TestConfig.modes2); the sharded stages must key stage 2 by modes2."""
    import numpy as np

    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2)
    from lerf_tpu.parallel import lut_stages_sharded, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(23)
    L4 = 17 ** 4
    modes, modes2 = ("s", "c", "t"), ("s", "d")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes2 for r in (0, 1)}, modes2, split_r=True)
    img = jnp.asarray(rng.randint(0, 256, (3, 26, 20)).astype(np.int32))
    feat_ref = lut_stage1(img, s1, modes)
    hyper_ref = lut_stage2(feat_ref, s2, modes2)
    feat, hyper = lut_stages_sharded(img, s1, s2, modes, mesh, modes2=modes2)
    np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat))
    np.testing.assert_array_equal(np.asarray(hyper_ref), np.asarray(hyper))


def test_sharded_warp_pipeline_bit_exact():
    import numpy as np

    from lerf_tpu.ops.geometry import WarpGeometry
    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2, split_gaussian_hyper)
    from lerf_tpu.ops import steering_gaussian_warp
    from lerf_tpu.parallel import make_mesh, sharded_lut_warp_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(9)
    L4 = 17 ** 4
    modes = ("s", "c", "t")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True)
    h, w = 29, 24
    mat = np.linalg.inv(np.diag([0.5, 0.5, 1.0]))
    geom = WarpGeometry.create((h, w), mat, (2 * h, 2 * w), support=2)
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.int32))

    feat = lut_stage1(img, s1, modes)
    hyper = lut_stage2(feat, s2, modes)
    rho, sx, sy = split_gaussian_hyper(hyper)
    want = np.asarray(steering_gaussian_warp(
        feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0))
    got = np.asarray(sharded_lut_warp_pipeline(img, s1, s2, modes, geom,
                                               mesh))
    np.testing.assert_array_equal(np.nan_to_num(want), np.nan_to_num(got))


def test_sharded_net_pipeline_matches_single_device():
    """The net-form multi-chip SR pipeline (row-sharded pixel-MLP stage
    ensembles → row-sharded resize) matches the single-device net pipeline
    on the 8-device mesh, non-divisible input height.  Stage outputs are
    integer-quantized (round+clip at every stage end), so they are compared
    exactly; the final resize is float."""
    from lerf_tpu.models import srnet
    from lerf_tpu.parallel import (make_mesh, sharded_net_sr_pipeline,
                                   srnet_stages_sharded)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    params = srnet.init_lerf_nets(jax.random.PRNGKey(3), nf=16, out_c=3)
    h, w = 21, 17                      # not divisible by 8
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randint(0, 256, (2, h, w)).astype(np.int32))
    geom = ResizeGeometry.create((h, w), scale_factors=[2, 2], support=2)

    x = img.astype(jnp.float32) / 255.0
    feat_ref = srnet.predict_stage1(params, x)
    hyper_ref = srnet.predict_stage2(params, feat_ref / 255.0)
    feat, hyper = srnet_stages_sharded(img, params, mesh)
    np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat))
    np.testing.assert_array_equal(np.asarray(hyper_ref), np.asarray(hyper))

    want = np.asarray(steering_gaussian_resize(
        feat_ref, hyper_ref[..., 0], hyper_ref[..., 1], hyper_ref[..., 2],
        geom, max_sigma=10.0))
    got = np.asarray(sharded_net_sr_pipeline(img, params, geom, mesh))
    np.testing.assert_allclose(want, got, rtol=1e-6, atol=1e-4)


def test_sharded_dynamic_warp_bit_exact_across_matrices():
    """The sharded DYNAMIC warp (matrix as traced rings data) must match
    the single-device rings path bit-exactly when evaluated eagerly, and to
    fusion-level float32 tolerance under jit (XLA may contract mul+add to
    FMA inside the compiled sharded program) — for several homographies,
    including a non-divisible flat N."""
    from lerf_tpu.ops.geometry import WarpOperands
    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2)
    from lerf_tpu.ops.resample import (steering_gaussian_warp_rings,
                                       warp_rings)
    from lerf_tpu.parallel import make_mesh, sharded_dynamic_warp_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(10)
    L4 = 17 ** 4
    modes = ("s", "c", "t")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True)
    h, w = 22, 19
    oh, ow = 31, 27                   # N = 837, not divisible by 8
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.int32))

    run = jax.jit(lambda im, r: sharded_dynamic_warp_pipeline(
        im, s1, s2, modes, r, mesh))
    mats = [np.linalg.inv(np.diag([0.55, 0.6, 1.0])),
            np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0],
                      [1e-4, 2e-5, 1.0]])]
    for mat in mats:
        rings = warp_rings(WarpOperands.create((h, w), mat, (oh, ow)))
        feat = lut_stage1(img, s1, modes)
        hyper = lut_stage2(feat, s2, modes)
        want = np.asarray(steering_gaussian_warp_rings(
            feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
            jax.tree.map(jnp.asarray, rings), max_sigma=10.0,
            u8_inputs=True))
        got_eager = np.asarray(sharded_dynamic_warp_pipeline(
            img, s1, s2, modes, jax.tree.map(jnp.asarray, rings), mesh))
        np.testing.assert_array_equal(np.nan_to_num(want),
                                      np.nan_to_num(got_eager))
        got_jit = np.asarray(run(img, jax.tree.map(jnp.asarray, rings)))
        np.testing.assert_allclose(np.nan_to_num(want),
                                   np.nan_to_num(got_jit),
                                   rtol=2e-5, atol=1e-4)


def test_sharded_imdn_pipeline_matches_single_device():
    """The IMDN (LeRF-Net) multi-chip SR pipeline — row-sharded conv
    towers with receptive-field-sized recompute halos (44 rows for the
    two-stage chain) feeding the row-sharded resize — matches the
    single-device stage fns + resize.  H=160 on 8 devices gives 20-row
    slabs with 108-row bands, so interior band edges and their garbage
    crops are genuinely exercised (not just full-image bands), plus the
    non-divisible-width masking.  Also pins the communication structure:
    exactly ONE all-gather (the stacked feat/hyper planes)."""
    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.models.imdn_s2d import make_chw_stage_fns
    from lerf_tpu.parallel import make_mesh, sharded_imdn_sr_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)), 0)
    h, w = 160, 13                     # w odd: exercises the width masking
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.int32))
    geom = ResizeGeometry.create((h, w), scale_factors=[2, 2], support=2)

    _, s1, s2 = make_chw_stage_fns(variables, backend="base", model=model)
    x = img.astype(jnp.float32) / 255.0
    feat_ref = s1(variables, x)
    hyper_ref = s2(variables, feat_ref / 255.0)
    want = np.asarray(steering_gaussian_resize(
        feat_ref, hyper_ref[..., 0], hyper_ref[..., 1], hyper_ref[..., 2],
        geom, max_sigma=10.0))

    run = jax.jit(lambda im: sharded_imdn_sr_pipeline(
        im, variables, geom, mesh, backend="base"))
    got = np.asarray(run(img))
    # kept rows carry the same conv arithmetic; XLA's shape-dependent f32
    # fusion bounds the comparison like the other sharded conv-free forms
    np.testing.assert_allclose(want, got, rtol=1e-5, atol=1e-3)

    hlo = run.lower(img).compile().as_text()
    n_ag = hlo.count(" all-gather(") + hlo.count(" all-gather-start(")
    assert n_ag == 1, f"sharded IMDN pipeline emits {n_ag} all-gathers"


def test_sharded_imdn_single_stage_and_warp():
    """two_stage=False (reference eval_model.py:124-129: the hyper tower
    sees the raw image) and the warp-form pipeline, on a smaller frame."""
    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.models.imdn_s2d import make_chw_stage_fns
    from lerf_tpu.parallel import (make_mesh, imdn_stages_sharded,
                                   sharded_imdn_warp_pipeline)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 8, 8, 3)), 0)
    h, w = 21, 15
    rng = np.random.RandomState(12)
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.int32))

    _, s1, s2 = make_chw_stage_fns(variables, backend="base", model=model)
    x = img.astype(jnp.float32) / 255.0
    feat_ref = jnp.round(x * 255.0)
    hyper_ref = s2(variables, x)
    feat, hyper = imdn_stages_sharded(img, variables, mesh, backend="base",
                                      two_stage=False)
    np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat))
    np.testing.assert_allclose(np.asarray(hyper_ref), np.asarray(hyper),
                               rtol=1e-5, atol=1e-5)

    oh, ow = 31, 27
    matrix = np.linalg.inv(np.diag([0.55, 0.6, 1.0]))
    geom = WarpGeometry.create((h, w), matrix, (oh, ow), support=2)
    want = np.asarray(steering_gaussian_warp(
        feat_ref, hyper_ref[..., 0], hyper_ref[..., 1], hyper_ref[..., 2],
        geom, max_sigma=10.0))
    got = np.asarray(sharded_imdn_warp_pipeline(
        img, variables, geom, mesh, backend="base", two_stage=False))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(np.nan_to_num(want), np.nan_to_num(got),
                               rtol=1e-5, atol=1e-3)


def test_imdn_halo_exchange_matches_single_device():
    """The TRUE halo-exchange variant (row-SHARDED input, receptive-field
    halos fetched from neighbors via one ppermute pair, zero-filled mesh
    edges turned into SAME padding by the traced 3-tuple row mask) must
    match the single-device stages — H=512 on 8 devices gives 64-row
    slabs > the 44-row two-stage halo.  Pins the communication structure:
    exactly TWO collective-permutes (one per direction), zero all-gathers
    in the stage computation."""
    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.models.imdn_s2d import make_chw_stage_fns
    from lerf_tpu.parallel import imdn_stages_sharded_exchange, make_mesh
    from lerf_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(8), jnp.zeros((1, 8, 8, 3)), 0)
    h, w = 512, 11
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (3, h, w)).astype(np.float32)

    _, s1, s2 = make_chw_stage_fns(variables, backend="base", model=model)
    x = jnp.asarray(img) / 255.0
    feat_ref = s1(variables, x)
    hyper_ref = s2(variables, feat_ref / 255.0)

    sharded = jax.device_put(
        jnp.asarray(img),
        NamedSharding(mesh, P(None, DATA_AXIS, None)))
    run = jax.jit(lambda im: imdn_stages_sharded_exchange(
        im, variables, mesh, backend="base"))
    feat, hyper = run(sharded)
    np.testing.assert_allclose(np.asarray(feat_ref), np.asarray(feat),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hyper_ref), np.asarray(hyper),
                               rtol=1e-5, atol=1e-5)

    hlo = run.lower(sharded).compile().as_text()
    n_cp = hlo.count(" collective-permute(") \
        + hlo.count(" collective-permute-start(")
    n_ag = hlo.count(" all-gather(") + hlo.count(" all-gather-start(")
    assert n_cp == 2, f"halo exchange emits {n_cp} collective-permutes"
    assert n_ag == 0, f"stage computation emits {n_ag} all-gathers"


def test_imdn_sharded_s2d_halved_halo_bit_exact():
    """The s2d (production) backend through BOTH sharded tower paths with
    the block-independent 44-row two-stage halo (imdn_s2d.tower_halo_rows:
    the s2d conversion preserves the image-space receptive field, so the
    old 22·block sizing was 2x oversized at block=2) — band and exchange
    variants must stay BIT-exact vs the single-device s2d stages."""
    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.models.imdn_s2d import make_chw_stage_fns
    from lerf_tpu.parallel import (imdn_stages_sharded,
                                   imdn_stages_sharded_exchange, make_mesh)
    from lerf_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = IMDN2(in_c=3, out_c=3, nf=12)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)), 0)
    h, w = 320, 16
    img = np.random.RandomState(1).randint(0, 256, (3, h, w)) \
        .astype(np.float32)
    v2, s1, s2 = make_chw_stage_fns(variables, backend="s2d", block=2,
                                    model=model)
    x = jnp.asarray(img) / 255.0
    feat_ref = s1(v2, x)
    hyper_ref = s2(v2, feat_ref / 255.0)

    feat, hyper = imdn_stages_sharded(jnp.asarray(img), variables,
                                      make_mesh(8), backend="s2d", block=2)
    np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat))
    np.testing.assert_array_equal(np.asarray(hyper_ref), np.asarray(hyper))

    mesh4 = make_mesh(4)                 # 80-row slabs ≥ the 44-row halo
    sharded = jax.device_put(
        jnp.asarray(img), NamedSharding(mesh4, P(None, DATA_AXIS, None)))
    feat_e, hyper_e = imdn_stages_sharded_exchange(
        sharded, variables, mesh4, backend="s2d", block=2)
    np.testing.assert_array_equal(np.asarray(feat_ref), np.asarray(feat_e))
    np.testing.assert_array_equal(np.asarray(hyper_ref),
                                  np.asarray(hyper_e))


def test_sharded_devgeo_warp_matches_single_device():
    """Multi-chip device-geometry warp (pjit-constraint composition:
    in-program rings sharded on the flat output axis) must match the
    single-device device-geometry rings path; same tolerance class as the
    other sharded forms."""
    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2, split_gaussian_hyper)
    from lerf_tpu.ops.resample import (steering_gaussian_warp_rings,
                                       warp_rings_on_device)
    from lerf_tpu.parallel import make_mesh, sharded_devgeo_warp_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    rng = np.random.RandomState(17)
    L4 = 17 ** 4
    modes = ("s", "c", "t")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (L4, 1)).astype(np.int8) for m in modes},
        modes)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True)
    h, w = 22, 19
    oh, ow = 32, 24                    # N = 768, divisible by 8
    img = jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(np.int32))
    mat = np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0],
                    [1e-4, 2e-5, 1.0]])
    inv = jnp.asarray(np.linalg.inv(mat).astype(np.float32))

    feat = lut_stage1(img, s1, modes)
    hyper = lut_stage2(feat, s2, modes)
    rho, sx, sy = split_gaussian_hyper(hyper)
    want = np.asarray(jax.jit(lambda *a: steering_gaussian_warp_rings(
        *a, warp_rings_on_device(inv, (h, w), (oh, ow)), max_sigma=10.0,
        u8_inputs=True))(feat, rho, sx, sy))

    got = np.asarray(jax.jit(lambda im, iv: sharded_devgeo_warp_pipeline(
        im, s1, s2, modes, iv, (oh, ow), mesh))(img, inv))
    nan_w, nan_g = np.isnan(want), np.isnan(got)
    np.testing.assert_array_equal(nan_g, nan_w)
    np.testing.assert_allclose(np.nan_to_num(want), np.nan_to_num(got),
                               rtol=2e-5, atol=1e-4)
