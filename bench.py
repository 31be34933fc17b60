"""Headline benchmark: LeRF-G LUT-pipeline arbitrary-scale SR throughput.

Measures end-to-end device throughput (output megapixels/sec) of the full
deploy pipeline — stage-1 LUT ensemble → stage-2 hyper LUT ensemble →
steerable-Gaussian ×4 resize — on one chip, steady state.

Baseline: the reference implementation's deploy path (numpy
``eval_lut_sr.py``) measured on this machine's host CPU — see BASELINE.md.
Default prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``--all`` additionally machine-captures the full BASELINE.md table: the 4K
scaling point, LUT warp throughput, and the micro-net (non-LUT) serving
forms in f32 and bf16 — one JSON line each.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Reference numpy deploy path (FourSimplexInterpFaster ensemble + numpy
# steering resize), measured on this host via tools/bench_reference.py:
# 52.86 s/frame at 360×640→×4 = 0.0697 output MP/s.  Warp variant
# (SteeringGaussianWarp2dNumpy, tools/bench_reference_warp.py): 52.10
# s/frame = 0.0708 MP/s at the same output size.
REF_NUMPY_MPS = float(os.environ.get("LERF_REF_NUMPY_MPS", "0.0697"))
REF_NUMPY_WARP_MPS = float(os.environ.get("LERF_REF_NUMPY_WARP_MPS",
                                          "0.0708"))

LR_H, LR_W = 360, 640           # 1440×2560 (QHD) output at ×4
SCALE = 4
WARMUP = 3
ITERS = 20
MODES = ("s", "c", "t")


def load_flat_luts():
    """Shipped LeRF-G LUTs when available; random otherwise (same shapes)."""
    ref = "/root/reference/models/lerf-g"
    try:
        from lerf_tpu.lut.io import load_lut_bank
        bank = load_lut_bank(ref, out_c=3)
        return bank.as_int32()
    except Exception:
        rng = np.random.RandomState(0)
        L4 = 17 ** 4
        s1 = {m: rng.randint(-127, 128, (L4, 1)).astype(np.int32)
              for m in MODES}
        s2 = {f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int32)
              for m in MODES for r in (0, 1)}
        return s1, s2


def load_luts():
    """Packed-int8 rotation-group tables (the deploy fast path)."""
    from lerf_tpu.ops.lut_pipeline import build_packed_tables

    s1, s2 = load_flat_luts()
    s1 = build_packed_tables({k: v.astype(np.int8) for k, v in s1.items()},
                             MODES)
    s2 = build_packed_tables({k: v.astype(np.int8) for k, v in s2.items()},
                             MODES, split_r=True)
    return s1, s2


def chain_time(step, x0, warmup=WARMUP, iters=ITERS):
    """Steady-state seconds/iter on a serial dependency chain
    (lerf_tpu/utils/timing.py; methodology note in BASELINE.md)."""
    from lerf_tpu.utils.timing import chain_time as ct
    return ct(step, x0, warmup=warmup, iters=iters)


def emit(metric, mps, vs=None, unit="output_megapixels_per_sec"):
    print(json.dumps({
        "metric": metric,
        "value": round(mps, 3),
        "unit": unit,
        "vs_baseline": round(mps / vs, 2) if vs else None,
    }), flush=True)


def rand_img(h, w, dtype=np.int32, seed=0):
    rng = np.random.RandomState(seed)
    import jax.numpy as jnp
    return jnp.asarray(rng.randint(0, 256, (3, h, w)).astype(dtype))


def bench_lut_sr(s1, s2, h, w, scale=SCALE):
    import jax
    import jax.numpy as jnp
    from lerf_tpu.ops import (
        ResizeGeometry, lut_stage1, lut_stage2, split_gaussian_hyper,
        steering_gaussian_resize,
    )

    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)

    @jax.jit
    def pipeline(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        rho, sx, sy = split_gaussian_hyper(hyper)
        out = steering_gaussian_resize(
            feat.astype(jnp.float32), rho, sx, sy, geom, max_sigma=10.0)
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)
        if geom.out_sz[0] >= h and geom.out_sz[1] >= w:
            return out[:, :h, :w]
        # downscale: keep the chain input shape while deriving it from
        # this iteration's output (DCE safety) — tile and crop
        reps = (1, -(-h // geom.out_sz[0]), -(-w // geom.out_sz[1]))
        return jnp.tile(out, reps)[:, :h, :w]

    dt = chain_time(pipeline, rand_img(h, w))
    return geom.out_sz[0] * geom.out_sz[1] / 1e6 / dt


def bench_lut_sr_rings(s1, s2, h, w, scale):
    """Arbitrary-scale SR through the traced-geometry rings program
    (steering_gaussian_resize_rings) — the serving path for scales whose
    rational period exceeds MAX_FOV_PERIOD (e.g. ×3.55 = period 71), where
    the static path falls back to baked index gathers.  Per-scale operands
    are O(outH+outW) host data; device chain timed like bench_lut_sr."""
    import jax
    import jax.numpy as jnp
    from lerf_tpu.ops import (
        ResizeOperands, lut_stage1, lut_stage2, resize_rings,
        split_gaussian_hyper, steering_gaussian_resize_rings,
    )

    if scale >= 1.0:
        ops_ = ResizeOperands.create((h, w), scale_factors=[scale, scale])
    else:
        # anti-aliased downscale: support-bucket serving envelope
        ops_ = ResizeOperands.create_any((h, w), scale_factors=[scale, scale])
    rings = jax.device_put(resize_rings(ops_))
    pad = ops_.pad

    @jax.jit
    def pipeline(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        rho, sx, sy = split_gaussian_hyper(hyper)
        out = steering_gaussian_resize_rings(
            feat.astype(jnp.float32), rho, sx, sy, rings, max_sigma=10.0,
            pad=pad)
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)
        if ops_.out_sz[0] >= h and ops_.out_sz[1] >= w:
            return out[:, :h, :w]
        # downscale: the next chain input must keep the INPUT shape, and
        # must still be derived from this iteration's output (DCE safety,
        # BASELINE "Timing-methodology note") — tile the smaller output
        # back up and crop
        reps = (1, -(-h // ops_.out_sz[0]), -(-w // ops_.out_sz[1]))
        return jnp.tile(out, reps)[:, :h, :w]

    dt = chain_time(pipeline, rand_img(h, w))
    return ops_.out_sz[0] * ops_.out_sz[1] / 1e6 / dt


def bench_lut_warp(s1, s2, h, w, scale=SCALE):
    import jax
    import jax.numpy as jnp
    from lerf_tpu.ops import (
        WarpGeometry, lut_stage2, lut_stage1, split_gaussian_hyper,
        steering_gaussian_warp,
    )

    matrix = np.linalg.inv(np.diag([1.0 / scale, 1.0 / scale, 1.0]))
    out_hw = (h * scale, w * scale)
    geom = WarpGeometry.create((h, w), matrix, out_hw, support=2)

    @jax.jit
    def pipeline(img_i32):
        feat = lut_stage1(img_i32, s1, MODES)
        hyper = lut_stage2(feat, s2, MODES)
        out = steering_gaussian_warp(
            feat, hyper[..., 0], hyper[..., 1], hyper[..., 2], geom,
            max_sigma=10.0, u8_inputs=True)
        out = jnp.nan_to_num(out, nan=0.0)
        return jnp.clip(jnp.round(out[:, :h, :w]), 0, 255).astype(jnp.int32)

    dt = chain_time(pipeline, rand_img(h, w))
    return out_hw[0] * out_hw[1] / 1e6 / dt


def bench_net_sr(h, w, scale=SCALE, dtype="float32", backend="auto",
                 batch=None):
    """Micro-net (SRNetsSWF2) serving form — reference weights when present.

    ``backend="auto"`` = the production dispatch (fused Pallas ensemble
    kernel on TPU, XLA elsewhere — see ops/pallas/srnet_kernel.py).
    """
    import jax
    import jax.numpy as jnp
    from lerf_tpu.models import srnet
    from lerf_tpu.ops import (ResizeGeometry, steering_gaussian_resize)

    backend = srnet.resolve_backend(backend)
    pth = "/root/reference/models/lerf-g/Model_050000.pth"
    try:
        from lerf_tpu.models.convert import load_reference_checkpoint
        params = load_reference_checkpoint(pth)
    except Exception:
        params = srnet.init_lerf_nets(jax.random.PRNGKey(1), out_c=3)
    dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if backend == "pallas_int8":
        params = srnet.quantize_lerf_params(params)
    else:
        params = jax.tree.map(lambda x: jnp.asarray(x, dt_), params)
    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)

    @jax.jit
    def pipeline(img):
        x = img.astype(dt_) / 255.0
        feat = srnet.predict_stage1(params, x, backend=backend)
        hyper = srnet.predict_stage2(params, feat / 255.0, backend=backend)
        out = steering_gaussian_resize(
            feat.astype(jnp.float32), hyper[..., 0].astype(jnp.float32),
            hyper[..., 1].astype(jnp.float32),
            hyper[..., 2].astype(jnp.float32), geom, max_sigma=10.0)
        return jnp.clip(jnp.round(out[..., :h, :w]),
                        0, 255).astype(jnp.int32)

    img0 = rand_img(h, w)
    if batch:
        img0 = (jnp.stack([img0] * batch) + jnp.arange(
            batch, dtype=img0.dtype)[:, None, None, None]) % 256
    dt = chain_time(pipeline, img0)
    return (batch or 1) * (h * scale) * (w * scale) / 1e6 / dt


def bench_imdn_sr(h, w, scale=SCALE, dtype="float32", backend="auto"):
    """LeRF-Net (IMDN2 conv towers) serving form, random init (no trained
    IMDN checkpoint ships with the reference snapshot).

    ``backend`` follows the production dispatch (imdn_s2d.resolve_backend);
    "s2d" opts into the space-to-depth tower execution."""
    import jax
    import jax.numpy as jnp
    from lerf_tpu.models import imdn_s2d
    from lerf_tpu.models.imdn import IMDN2
    from lerf_tpu.ops import ResizeGeometry, steering_gaussian_resize

    dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = IMDN2(in_c=3, out_c=3, nf=12, dtype=dt_)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), dt_), 0)
    variables = jax.tree.map(lambda x: jnp.asarray(x, dt_), variables)
    backend = imdn_s2d.resolve_backend(backend)
    if backend == "s2d":
        p2 = imdn_s2d.convert_imdn2(variables, 2)

        def tower(x, stage):
            return imdn_s2d.predict_imdn2_s2d(p2, x, stage, block=2, nf=12,
                                              dtype=dt_)
    else:
        def tower(x, stage):
            return model.apply(variables, x, stage)
    geom = ResizeGeometry.create((h, w), scale_factors=[scale, scale],
                                 support=2)

    @jax.jit
    def pipeline(img):
        nhwc = (img.astype(dt_) / 255.0).transpose(1, 2, 0)[None]
        feat = tower(nhwc, 1)[0].transpose(2, 0, 1)
        hyper = tower(feat[None].transpose(0, 2, 3, 1) / 255.0, 2)[0]
        c = 3
        hyper = hyper.reshape(h, w, 3, c).transpose(3, 0, 1, 2)
        out = steering_gaussian_resize(
            feat.astype(jnp.float32), hyper[..., 0].astype(jnp.float32),
            hyper[..., 1].astype(jnp.float32),
            hyper[..., 2].astype(jnp.float32), geom, max_sigma=10.0)
        return jnp.clip(jnp.round(out[:, :h, :w]), 0, 255).astype(jnp.int32)

    dt = chain_time(pipeline, rand_img(h, w))
    return (h * scale) * (w * scale) / 1e6 / dt


def bench_latency(form, h, w, scale=SCALE, iters=50):
    """End-to-end single-image serving latency (ms): uint8 numpy in →
    uint8 numpy out, including host↔device transfers and output rounding —
    what a serving frontend actually waits for.  Returns (p50, p99)."""
    import jax
    from lerf_tpu.lut.io import LUTBank
    from lerf_tpu.pipeline import LutPredictor, NetPredictor

    if form == "lut":
        try:
            from lerf_tpu.lut.io import load_lut_bank
            bank = load_lut_bank("/root/reference/models/lerf-g", out_c=3)
        except Exception:
            s1, s2 = load_flat_luts()
            bank = LUTBank(
                stage1={m: v.astype(np.int8) for m, v in s1.items()},
                stage2={k: v.astype(np.int8) for k, v in s2.items()},
                out_c=3)
        pred = LutPredictor(bank)
    else:
        from lerf_tpu.models import srnet
        params = srnet.init_lerf_nets(jax.random.PRNGKey(0), out_c=3)
        pred = NetPredictor.from_srnets(params)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    for _ in range(WARMUP):
        out = pred.upscale(img, scale, scale)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = pred.upscale(img, scale, scale)       # noqa: F841 (sync: numpy out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], times[int(len(times) * 0.99)]


def bench_bucketed(h, w, scale=SCALE, iters=40, granularity=64):
    """Mixed-shape serving through ONE bucket program
    (LutPredictor.upscale_bucketed): p50 ms/frame across distinct input
    shapes sharing a bucket.  The exact per-shape path compiles a new
    executable per shape (minutes each for TPU gather programs on this
    stack); the bucket program compiles once and stays bit-identical."""
    from lerf_tpu.lut.io import LUTBank
    from lerf_tpu.pipeline import LutPredictor

    try:
        from lerf_tpu.lut.io import load_lut_bank
        bank = load_lut_bank("/root/reference/models/lerf-g", out_c=3)
    except Exception:
        s1, s2 = load_flat_luts()
        bank = LUTBank(stage1={m: v.astype(np.int8) for m, v in s1.items()},
                       stage2={k: v.astype(np.int8) for k, v in s2.items()},
                       out_c=3)
    pred = LutPredictor(bank)
    shapes = [(h, w), (h - 7, w - 9), (h - 13, w - 1), (h - 24, w - 17)]
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)
            for sh, sw in shapes]
    for im in imgs:                                     # compile + warm
        pred.upscale_bucketed(im, scale, scale, granularity=granularity)
    assert len(pred._bucket_cache) == 1, "shapes must share one program"
    times = []
    for i in range(iters):
        im = imgs[i % len(imgs)]
        t0 = time.perf_counter()
        pred.upscale_bucketed(im, scale, scale, granularity=granularity)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], len(shapes)


def _load_bank():
    """Shipped LeRF-G bank when available; random (same shapes) otherwise."""
    from lerf_tpu.lut.io import LUTBank

    try:
        from lerf_tpu.lut.io import load_lut_bank
        return load_lut_bank("/root/reference/models/lerf-g", out_c=3)
    except Exception:
        s1, s2 = load_flat_luts()
        return LUTBank(stage1={m: v.astype(np.int8) for m, v in s1.items()},
                       stage2={k: v.astype(np.int8) for k, v in s2.items()},
                       out_c=3)


def bench_warp_dynamic(h, w, scale=SCALE, iters=40, n_matrices=6):
    """Dynamic-homography serving (LutPredictor.warp_dynamic): p50 ms/frame
    across DISTINCT homographies through ONE compiled program — the
    per-matrix path pays a fresh XLA gather compile for every new matrix;
    here a new matrix costs only the host float64 geometry precompute."""
    from lerf_tpu.pipeline import LutPredictor

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    mats = [np.eye(3) + rng.randn(3, 3)
            * np.array([[.05, .05, 4.0], [.05, .05, 4.0], [1e-4, 1e-4, 0.0]])
            for _ in range(n_matrices)]
    for m in mats[:2]:                                  # compile + warm
        pred.warp_dynamic(img, m, out_hw)
    assert len(pred._warp_dyn_cache) == 1, "matrices must share one program"
    times = []
    for i in range(iters):
        m = mats[i % len(mats)]
        t0 = time.perf_counter()
        pred.warp_dynamic(img, m, out_hw)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], n_matrices


def bench_warp_devgeo(h, w, scale=SCALE, iters=40, n_matrices=6):
    """DEVICE-GEOMETRY dynamic warp (LutPredictor.warp_device): p50
    ms/frame across distinct homographies — the per-frame matrix operand
    is the 3×3 inverse alone (vs ~20 B/output-px of corner+distance rings)
    and the host geometry precompute disappears; rings + validity mask are
    computed in-program (ops.resample.warp_rings_on_device; f32 quality
    tax measured in tools/exp_device_geometry.py / BASELINE.md)."""
    from lerf_tpu.pipeline import LutPredictor

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    mats = [np.eye(3) + rng.randn(3, 3)
            * np.array([[.05, .05, 4.0], [.05, .05, 4.0], [1e-4, 1e-4, 0.0]])
            for _ in range(n_matrices)]
    for m in mats[:2]:                                  # compile + warm
        pred.warp_device(img, m, out_hw)
    assert len(pred._warp_dyn_cache) == 1, "matrices must share one program"
    times = []
    for i in range(iters):
        m = mats[i % len(mats)]
        t0 = time.perf_counter()
        pred.warp_device(img, m, out_hw)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], n_matrices


def bench_warp_devgeo_bucket(h, w, scale=SCALE, iters=40, n_matrices=6,
                             g=64):
    """BUCKETED device-geometry warp (warp_device granularity>0): mixed
    input shapes within one bucket + distinct matrices through ONE
    program — the fully recompile-free, 36 B/frame-operand warp form
    (rings built in-program in the bucket frame,
    ops.resample.warp_rings_on_device in_frame=)."""
    from lerf_tpu.pipeline import LutPredictor

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    # distinct shapes sharing one g-bucket: step one pixel toward the
    # bucket interior (±1 never crosses the boundary except from ≡1 mod g,
    # where +1 stays inside)
    def off(v):
        return v + 1 if v % g == 1 else v - 1

    shapes = [(h, w), (off(h), off(w))]
    assert [-(-v // g) for v in shapes[0]] == [-(-v // g) for v in shapes[1]]
    imgs = [rng.randint(0, 256, (*s, 3), dtype=np.uint8) for s in shapes]
    mats = [np.eye(3) + rng.randn(3, 3)
            * np.array([[.05, .05, 4.0], [.05, .05, 4.0], [1e-4, 1e-4, 0.0]])
            for _ in range(n_matrices)]
    for i in range(2):                                  # compile + warm
        pred.warp_device(imgs[i], mats[i], out_hw, granularity=g)
    assert sum(1 for k in pred._warp_dyn_cache
               if k[0] == "devgeo_bucket") == 1, \
        "shapes and matrices must share one bucket program"
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        pred.warp_device(imgs[i % 2], mats[i % n_matrices], out_hw,
                         granularity=g)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], n_matrices


def bench_warp_stream_devgeo(h, w, scale=SCALE, frames=24, n_matrices=6,
                             depth=2):
    """Pipelined DEVICE-GEOMETRY warp stream: per-frame host work is just
    the decode + 3×3 inverse, so sustained throughput ≈ the image-up /
    result-down transfer bound."""
    from lerf_tpu.pipeline import LutPredictor
    from lerf_tpu.serve import stream_warp

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    mats = [np.eye(3) + rng.randn(3, 3)
            * np.array([[.05, .05, 4.0], [.05, .05, 4.0], [1e-4, 1e-4, 0.0]])
            for _ in range(n_matrices)]
    reqs = [(img, mats[i % n_matrices]) for i in range(frames)]
    for m in mats[:2]:                                  # compile + warm
        pred.warp_device(img, m, out_hw)
    t0 = time.perf_counter()
    n_out = sum(1 for _ in stream_warp(pred, reqs, out_hw, depth=depth,
                                       geometry="device"))
    t_pipe = time.perf_counter() - t0
    assert n_out == frames
    return frames * out_hw[0] * out_hw[1] / 1e6 / t_pipe


def bench_warp_stream(h, w, scale=SCALE, frames=24, n_matrices=6, depth=2):
    """Pipelined dynamic-warp serving (lerf_tpu.serve.stream_warp): sustained
    output MP/s over a stream of DISTINCT homographies with frame k+1's host
    geometry precompute overlapped against frame k's device execution and
    D2H copy (bounded in-flight queue over warp_dynamic_async).  Returns
    (stream MP/s, gain vs the strictly sequential warp_dynamic loop on the
    SAME stream)."""
    from lerf_tpu.pipeline import LutPredictor
    from lerf_tpu.serve import stream_warp

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    mats = [np.eye(3) + rng.randn(3, 3)
            * np.array([[.05, .05, 4.0], [.05, .05, 4.0], [1e-4, 1e-4, 0.0]])
            for _ in range(n_matrices)]
    reqs = [(img, mats[i % n_matrices]) for i in range(frames)]
    for m in mats[:2]:                                  # compile + warm
        pred.warp_dynamic(img, m, out_hw)
    t0 = time.perf_counter()
    for f, m in reqs:
        pred.warp_dynamic(f, m, out_hw)
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_out = sum(1 for _ in stream_warp(pred, reqs, out_hw, depth=depth))
    t_pipe = time.perf_counter() - t0
    assert n_out == frames
    mps = frames * out_hw[0] * out_hw[1] / 1e6 / t_pipe
    return mps, t_seq / t_pipe


def bench_warp_batch(h, w, scale=SCALE, iters=20, batch=4,
                     geometry="host"):
    """Batched warp serving (LutPredictor.warp_batch): B frames with
    DISTINCT per-frame homographies through ONE device program.  Returns
    output MP/s across the batch (end-to-end, incl. per-frame host
    precompute + transfers).  ``geometry="device"`` runs the in-program-
    geometry form (B·9-float matrix operand instead of B per-frame rings
    stacks — the transfer-bound case's escape hatch)."""
    from lerf_tpu.pipeline import LutPredictor

    pred = LutPredictor(_load_bank())
    out_hw = (h * scale, w * scale)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (batch, h, w, 3), dtype=np.uint8)
    mats = np.stack([np.eye(3) + rng.randn(3, 3)
                     * np.array([[.05, .05, 4.0], [.05, .05, 4.0],
                                 [1e-4, 1e-4, 0.0]]) for _ in range(batch)])
    for _ in range(2):                                  # compile + warm
        pred.warp_batch(imgs, mats, out_hw, geometry=geometry)
    t0 = time.perf_counter()
    for _ in range(iters):
        pred.warp_batch(imgs, mats, out_hw, geometry=geometry)
    dt = (time.perf_counter() - t0) / iters
    return batch * out_hw[0] * out_hw[1] / 1e6 / dt


def bench_sr_dynamic(h, w, iters=40, granularity=64,
                     scales=((4.0, 4.0), (3.55, 3.55), (2.5, 2.5),
                             (1.5, 2.0))):
    """Arbitrary-scale serving (LutPredictor.upscale_dynamic): p50 ms/frame
    across DISTINCT scales — integer, non-periodic (×3.55, period 71 >
    MAX_FOV_PERIOD), and fractional/anisotropic — through bucket programs.
    The per-scale path pays a fresh XLA compile for every new scale (and
    the S²-gather program for non-periodic ones); here a new scale costs
    two O(out) 1-D host passes."""
    from lerf_tpu.pipeline import LutPredictor

    pred = LutPredictor(_load_bank())
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    for s in scales:                                    # compile + warm
        pred.upscale_dynamic(img, *s, granularity=granularity)
    assert not pred._resize_cache, "no per-scale fallbacks allowed"
    times = []
    for i in range(iters):
        s = scales[i % len(scales)]
        t0 = time.perf_counter()
        pred.upscale_dynamic(img, *s, granularity=granularity)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2], len(scales)


def bench_train(batch=16, crop=48, scale=4, iters=30):
    """Full SPMD training-step throughput at the reference's default config
    (train_model.py / option.py: B=16, cropSize=48, ×4, inC=1): both micro-net
    ensembles, the steerable resize, backward, and the Adam update in one
    jitted program.  State threading makes every step a true dependency chain.
    Returns steps/sec."""
    import jax
    import jax.numpy as jnp
    from lerf_tpu.models.srnet import init_lerf_nets
    from lerf_tpu.ops import ResizeGeometry
    from lerf_tpu.train.train_step import (TrainHParams, TrainState,
                                           make_optimizer, make_train_step)

    hp = TrainHParams(scale=float(scale), crop_size=crop)
    # training resampler = torch-path geometry, AA hard-disabled
    # (resize_right2d_torch.py:42-46)
    geom = ResizeGeometry.create((crop, crop), scale_factors=(scale, scale),
                                 antialias=False)
    tx = make_optimizer(hp)
    state = TrainState.create(init_lerf_nets(jax.random.PRNGKey(0)), tx)
    step = make_train_step(tx, geom, hp, mesh=None)

    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(batch, 1, crop, crop).astype(np.float32))
    lb = jnp.asarray(
        rng.rand(batch, 1, crop * scale, crop * scale).astype(np.float32))
    for _ in range(WARMUP):
        state, metrics = step(state, im, lb)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, im, lb)
    jax.block_until_ready(metrics)
    return iters / (time.perf_counter() - t0)


def _wait_for_tpu(budget_s=None, poll_s=30.0):
    """The axon TPU tunnel flaps; a bench run landing in a flap window
    should wait for the chip, not crash or record a host-CPU number.
    Probes in a SUBPROCESS (a JAX backend choice is process-permanent, so
    the parent must not touch jax until a probe succeeds).  After the
    budget it returns False and the run proceeds on whatever backend
    exists — the emitted numbers then honestly reflect that backend.
    Tune/disable with LERF_BENCH_WAIT_TPU_SECS (0 = no wait)."""
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("LERF_BENCH_WAIT_TPU_SECS", "1800"))
    pinned = os.environ.get("JAX_PLATFORMS", "")
    if pinned.strip().lower() == "cpu":
        return False        # an explicit CPU run: honor the pin, don't wait
    probe = ("import jax, sys; "
             "sys.exit(0 if jax.devices()[0].platform != 'cpu' else 1)")
    deadline = time.time() + budget_s
    first = True
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=max(poll_s * 4, 120)).returncode == 0
        except subprocess.TimeoutExpired:   # half-up tunnel: probe hangs
            ok = False
        if ok:
            return True
        if time.time() >= deadline:
            print("bench: no TPU visible after waiting; proceeding on the "
                  "available backend", file=sys.stderr)
            # a pin to a TPU platform (e.g. "axon") would make jax init
            # raise outright with the tunnel down — clear only that; any
            # other user pin stays intact
            if pinned:
                os.environ["JAX_PLATFORMS"] = ""
            return False
        if first:
            print("bench: TPU not visible (tunnel flap?); waiting up to "
                  f"{budget_s:.0f}s", file=sys.stderr)
            first = False
        time.sleep(poll_s)


def fam_headline():
    s1, s2 = load_luts()
    emit("lerf_g_lut_sr_x4_throughput", bench_lut_sr(s1, s2, LR_H, LR_W),
         REF_NUMPY_MPS)


def fam_sr_4k():
    s1, s2 = load_luts()
    emit("lerf_g_lut_sr_4k_throughput",
         bench_lut_sr(s1, s2, 720, 1280))               # 2880×5120 output


def fam_warp():
    s1, s2 = load_luts()
    emit("lerf_g_lut_warp_x4_throughput",
         bench_lut_warp(s1, s2, LR_H, LR_W), REF_NUMPY_WARP_MPS)


def fam_net_sr():
    emit("lerf_g_net_sr_x4_f32_throughput",
         bench_net_sr(LR_H, LR_W, dtype="float32"), REF_NUMPY_MPS)
    emit("lerf_g_net_sr_x4_bf16_throughput",
         bench_net_sr(LR_H, LR_W, dtype="bfloat16"), REF_NUMPY_MPS)
    emit("lerf_g_net_sr_x4_f32_xla_throughput",
         bench_net_sr(LR_H, LR_W, dtype="float32", backend="xla"),
         REF_NUMPY_MPS)
    emit("lerf_g_net_sr_x4_bf16_batch4_throughput",
         bench_net_sr(LR_H, LR_W, dtype="bfloat16", batch=4),
         REF_NUMPY_MPS)


def fam_imdn():
    emit("lerf_net_imdn_sr_x4_bf16_throughput",
         bench_imdn_sr(LR_H, LR_W, dtype="bfloat16"), REF_NUMPY_MPS)


def fam_train():
    # the 40× in-process-after-4K-benches artifact (BASELINE round-4) is
    # structurally impossible now: every family gets a fresh process
    emit("lerf_g_train_step_throughput", bench_train(),
         unit="train_steps_per_sec")


def fam_latency():
    for form in ("lut", "net"):
        p50, p99 = bench_latency(form, LR_H, LR_W)
        emit(f"lerf_g_{form}_sr_x4_latency_p50", p50, unit="ms")
        emit(f"lerf_g_{form}_sr_x4_latency_p99", p99, unit="ms")


def fam_bucketed():
    p50, nshapes = bench_bucketed(LR_H, LR_W)
    emit("lerf_g_lut_sr_x4_bucketed_mixed_shape_latency_p50", p50,
         unit=f"ms_across_{nshapes}_shapes_one_program")


def fam_warp_dynamic():
    p50, nmats = bench_warp_dynamic(LR_H, LR_W)
    emit("lerf_g_lut_warp_x4_dynamic_matrix_latency_p50", p50,
         unit=f"ms_across_{nmats}_homographies_one_program")
    p50, nmats = bench_warp_devgeo(LR_H, LR_W)
    emit("lerf_g_lut_warp_x4_devgeo_matrix_latency_p50", p50,
         unit=f"ms_across_{nmats}_homographies_one_program")
    p50, nmats = bench_warp_devgeo_bucket(LR_H, LR_W)
    emit("lerf_g_lut_warp_x4_devgeo_bucket_latency_p50", p50,
         unit=f"ms_across_shapes_and_{nmats}_homographies_one_program")


def fam_stream():
    mps, gain = bench_warp_stream(LR_H, LR_W)
    emit("lerf_g_lut_warp_dynamic_stream_throughput", mps,
         REF_NUMPY_WARP_MPS)
    emit("lerf_g_lut_warp_dynamic_stream_overlap_gain", gain,
         unit="x_vs_sequential_loop")
    emit("lerf_g_lut_warp_devgeo_stream_throughput",
         bench_warp_stream_devgeo(LR_H, LR_W), REF_NUMPY_WARP_MPS)


def fam_x355():
    # non-periodic scale (×3.55, rational period 71 > MAX_FOV_PERIOD):
    # the static baked-gather path vs the traced-geometry rings program
    s1, s2 = load_luts()
    emit("lerf_g_lut_sr_x3.55_gather_throughput",
         bench_lut_sr(s1, s2, LR_H, LR_W, scale=3.55), REF_NUMPY_MPS)
    emit("lerf_g_lut_sr_x3.55_rings_throughput",
         bench_lut_sr_rings(s1, s2, LR_H, LR_W, 3.55), REF_NUMPY_MPS)
    p50, nscales = bench_sr_dynamic(LR_H, LR_W)
    emit("lerf_g_lut_sr_dynamic_scale_latency_p50", p50,
         unit=f"ms_across_{nscales}_scales_bucket_programs")


def fam_warp_batch():
    emit("lerf_g_lut_warp_x4_batch4_distinct_matrices_throughput",
         bench_warp_batch(LR_H, LR_W), REF_NUMPY_WARP_MPS)
    emit("lerf_g_lut_warp_x4_batch4_devgeo_throughput",
         bench_warp_batch(LR_H, LR_W, geometry="device"),
         REF_NUMPY_WARP_MPS)


def fam_big_dynamic():
    # 4K-class dynamic points (720×1280 in, ×3.55 → 2556×4544 out) and
    # the anti-aliased downscale serving form (1440p in, ×0.5)
    s1, s2 = load_luts()
    emit("lerf_g_lut_sr_4k_x3.55_gather_throughput",
         bench_lut_sr(s1, s2, 720, 1280, scale=3.55), REF_NUMPY_MPS)
    emit("lerf_g_lut_sr_4k_x3.55_rings_throughput",
         bench_lut_sr_rings(s1, s2, 720, 1280, 3.55), REF_NUMPY_MPS)
    emit("lerf_g_lut_sr_x0.5_aa_rings_throughput",
         bench_lut_sr_rings(s1, s2, 1440, 2560, 0.5), REF_NUMPY_MPS)
    # static per-shape AA companion point (tax table, BASELINE r4:
    # 1.501 vs 1.486 rings — recompile freedom ~1% for AA downscales)
    emit("lerf_g_lut_sr_x0.5_aa_static_throughput",
         bench_lut_sr(s1, s2, 1440, 2560, 0.5), REF_NUMPY_MPS)


#: --all runs each family in a FRESH SUBPROCESS (default): round 4 caught
#: an in-process ordering artifact (bench_train read 40× slow after the 4K
#: benches) and fixed it point-wise in tools/exp_dynamic_tax.py; this is
#: that fix as policy — no family's device/allocator state can leak into
#: another's numbers.  `--one <family>` runs one family in-process (what
#: the subprocesses invoke); `--inprocess` restores the old single-process
#: sweep for debugging.
FAMILIES = [
    ("headline", fam_headline),
    ("sr_4k", fam_sr_4k),
    ("warp", fam_warp),
    ("net_sr", fam_net_sr),
    ("imdn", fam_imdn),
    ("train", fam_train),
    ("latency", fam_latency),
    ("bucketed", fam_bucketed),
    ("warp_dynamic", fam_warp_dynamic),
    ("stream", fam_stream),
    ("x355", fam_x355),
    ("warp_batch", fam_warp_batch),
    ("big_dynamic", fam_big_dynamic),
]


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--one" in argv:
        name = argv[argv.index("--one") + 1]
        fn = dict(FAMILIES)[name]
        _wait_for_tpu()
        from lerf_tpu.config import enable_jit_cache
        enable_jit_cache()
        fn()
        return

    if "--all" in argv:
        if "--inprocess" in argv:
            _wait_for_tpu()
            from lerf_tpu.config import enable_jit_cache
            enable_jit_cache()
            for _, fn in FAMILIES:
                fn()
            return
        import subprocess
        failed = []
        for name, _ in FAMILIES:
            r = subprocess.run([sys.executable, __file__, "--one", name])
            if r.returncode != 0:
                failed.append(name)
                print(json.dumps({"metric": f"family_{name}_failed",
                                  "value": r.returncode,
                                  "unit": "returncode",
                                  "vs_baseline": None}), flush=True)
        if failed:
            sys.exit(1)
        return

    _wait_for_tpu()
    # XLA:TPU gather compiles are minutes-long on this stack; the persistent
    # cache makes them one-time per machine.
    from lerf_tpu.config import enable_jit_cache
    enable_jit_cache()
    fam_headline()


if __name__ == "__main__":
    main()
