"""High-level LeRF inference pipelines (LUT deploy path).

Glues the LUT ensemble stages to the steerable resample ops, with a
per-shape jit cache (static shapes per (in_shape, out_spec) pair — the
TPU-idiomatic replacement for the reference's per-image ``set_shape``
precompute, eval_lut_sr.py:644-661).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lut.io import LUTBank
from .ops import (
    ResizeGeometry,
    ResizeOperands,
    WarpGeometry,
    amplified_linear_resize,
    amplified_linear_resize_rings,
    amplified_linear_warp,
    amplified_linear_warp_rings,
    lut_stage1,
    lut_stage2,
    nearest_warp_mask,
    resize_rings,
    resolve_scale_and_out_sz,
    split_gaussian_hyper,
    steering_gaussian_resize,
    steering_gaussian_resize_rings,
    steering_gaussian_warp,
    steering_gaussian_warp_rings,
)
from .ops.resample import (nearest_warp_mask_on_device, rings_for_bucket,
                           warp_rings_on_device, warp_serving_host_fused)
from .ops.lut_pipeline import PackedTables, lut_stage1_intermediate


def _device_tables(t):
    if isinstance(t, PackedTables):
        return t                       # tables already device arrays
    return {k: jnp.asarray(v) for k, v in t.items()}


def _quantize_device(out, norm, nan_to_zero=False):
    """Round/clip/cast to uint8 ON DEVICE when the range allows it.

    Serving latency is dominated by the device→host copy of the HR frame;
    shipping uint8 instead of float32 cuts that transfer 4× (measured:
    single-image p50 3.9 s → ~1 s through the axon-tunneled chip).  Bitwise
    identical to the former host-side np.round/np.clip/np.uint8 path."""
    if nan_to_zero:
        out = jnp.nan_to_num(out, nan=0.0)
    if norm <= 255:
        return jnp.clip(jnp.round(out), 0, norm).astype(jnp.uint8)
    return out


def _quantize_host(arr, norm):
    """Finish quantization for outputs the device couldn't cast (norm>255)."""
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        return a
    return np.clip(np.round(a), 0, norm).astype(np.uint8)


def _copy_host_async(*arrays):
    """Ask the runtime to start the device→host copy as soon as the producing
    computation finishes — so an in-flight frame's transfer overlaps the next
    frame's host precompute and device compute instead of serializing inside
    ``result()``.  Measured on the axon-tunneled chip: host work between
    dispatch and fetch hides the same amount of transfer time ~1:1."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:      # non-jax (already-host) values
            pass


class ServingFuture:
    """An in-flight serving request: host geometry precompute done, device
    program dispatched (JAX dispatch is asynchronous), device→host copy not
    yet awaited.  ``result()`` blocks on the transfer, finishes the host-side
    post-processing, and is idempotent.

    Serving loops hold a bounded queue of these (``lerf_tpu.serve.engine``)
    so the host precompute of frame k+1 overlaps the device execution of
    frame k — sustained throughput approaches max(host, device) instead of
    host + device.  The reference's deploy loop is strictly sequential
    (eval_lut_warp.py per-image ``set_shape`` + forward); the traced-data
    geometry forms are what make this split possible."""
    __slots__ = ("_finish", "_value")

    def __init__(self, finish):
        self._finish = finish

    @classmethod
    def resolved(cls, value):
        """A future that already holds its value (fallback paths that ran
        synchronously) — keeps the streaming loop uniform."""
        fut = cls(None)
        fut._value = value
        return fut

    def result(self):
        if self._finish is not None:
            self._value = self._finish()
            self._finish = None
        return self._value


def _clamp_valid(t, h_ax, w_ax, clamp_hw):
    """Re-clamp rows/cols beyond the valid (h, w) region to the last valid
    index — on a bucket-padded tensor this reproduces the replicate-padding
    values the unpadded program's next stage would see (bucketed serving)."""
    if clamp_hw is None:
        return t
    h, w = clamp_hw
    rows = jnp.minimum(jnp.arange(t.shape[h_ax]), h - 1)
    cols = jnp.minimum(jnp.arange(t.shape[w_ax]), w - 1)
    return jnp.take(jnp.take(t, rows, axis=h_ax), cols, axis=w_ax)


def _bucket_prep(img_hwc, scale_h, scale_w, granularity):
    """Host-side prep shared by the bucketed-serving entry points.

    Returns ``(padded_hwc, (hb, wb), (h, w))`` with edge-replicate padding
    up to the next ``granularity`` multiple, or ``None`` when the projection
    grid ``g(o) = o/s - 1/2 + 1/(2s)`` is not translation-invariant for both
    the real and the bucket shape (``out == scale·in`` must hold exactly;
    the reference's ``ceil`` output size breaks invariance otherwise —
    resize_right2d_numpy.py:25-49) and the caller must fall back to the
    exact per-shape path."""
    h, w = img_hwc.shape[:2]
    g = int(granularity)
    hb, wb = -(-h // g) * g, -(-w // g) * g

    def aligned(n, s):
        return abs(n * s - round(n * s)) < 1e-9

    if not (aligned(h, scale_h) and aligned(w, scale_w)
            and aligned(hb, scale_h) and aligned(wb, scale_w)):
        return None
    padded = np.pad(img_hwc, ((0, hb - h), (0, wb - w), (0, 0)), mode="edge")
    return padded, (hb, wb), (h, w)


def _dyn_resize_host(img_hwc, scale_h, scale_w, granularity, supp_size,
                     linear):
    """Host prep shared by the ``upscale_dynamic`` entry points.

    Returns ``(rings, program_key, image, out_sz)`` — where ``program_key``
    is ``(in_sz, out_sz, pad)`` (granularity 0) or
    ``("bucket", in_bucket, out_bucket)`` with ``image`` edge-padded to the
    in-bucket — or ``None`` when the request is outside the dynamic serving
    envelope (support ≠ 2, downscale beyond the 1/32 support cap, or the
    scale-1 skip path) and the caller must use the exact per-shape path.

    Downscale (or mixed) axes serve through the anti-aliased support-bucket
    operands (``ResizeOperands.create_any``) — one program per
    ``(in_sz, out_sz, support bucket)``, any scale; the shape-bucket
    (granularity) form is upscale-only, so AA requests ignore
    ``granularity`` (still recompile-free across scales/matrices at a
    shape pair)."""
    sh, sw = float(scale_h), float(scale_w)
    if supp_size != 2 or (sh == 1.0 and sw == 1.0):
        return None
    in_sz = img_hwc.shape[:2]
    try:
        if sh >= 1.0 and sw >= 1.0:
            ops_ = ResizeOperands.create(in_sz, scale_factors=[sh, sw])
        else:
            ops_ = ResizeOperands.create_any(in_sz, scale_factors=[sh, sw])
            granularity = 0
    except ValueError:
        return None
    out_sz = ops_.out_sz
    if granularity > 0:
        g = int(granularity)
        hb, wb = -(-in_sz[0] // g) * g, -(-in_sz[1] // g) * g
        ohb = -(-out_sz[0] // g) * g
        owb = -(-out_sz[1] // g) * g
        rings = resize_rings(ops_.for_bucket((hb, wb), (ohb, owb)),
                             linear=linear)
        padded = np.pad(img_hwc, ((0, hb - in_sz[0]), (0, wb - in_sz[1]),
                                  (0, 0)), mode="edge")
        return rings, ("bucket", (hb, wb), (ohb, owb)), padded, out_sz
    rings = resize_rings(ops_, linear=linear)
    return rings, (in_sz, out_sz, ops_.pad), img_hwc, out_sz


class NetPredictor:
    """Two-stage *network* inference: feature net → hyper net → resample.

    Mirrors the reference torch eval driver (eval_model.py:95-286) and the
    in-training validation path (train_model.py:181-314), with the same
    public API as :class:`LutPredictor` so the evaluation harness accepts
    either.  ``stage1_fn(params, x)`` maps [C,H,W] in [0,1] → feature in
    [0,255]; ``stage2_fn(params, x)`` maps [C,H,W] in [0,1] →
    [C,H,W,oC] hyper in [0,1] (the reference's interleaved 3·C hyper
    channels for inC=1, eval_model.py:142-147, are exactly this layout).
    """

    def __init__(self, params, stage1_fn, stage2_fn, *, linear: bool = False,
                 two_stage: bool = True, supp_size: int = 2,
                 max_sigma: float = 10.0, norm: int = 255,
                 hyper_u8: bool = False, stage_pad: str = "replicate",
                 stage1_masked_fn=None, stage2_masked_fn=None, mesh=None):
        self.params = params
        # multi-chip serving, matching LutPredictor(mesh=...): params
        # replicated once here; upscale_batch shards its batch across the
        # mesh (pure data-parallel scale-out, zero forward collectives)
        self.mesh = mesh
        if mesh is not None:
            from .parallel import replicate
            self.params = replicate(params, mesh)
        self.stage1_fn = stage1_fn
        self.stage2_fn = stage2_fn
        # (params, x, h, w) variants that reproduce the unpadded program's
        # zero-pad conv semantics on a bucket frame (per-conv traced-bound
        # re-masking) — what makes the zero-pad (IMDN) form bucketable
        self.stage1_masked_fn = stage1_masked_fn
        self.stage2_masked_fn = stage2_masked_fn
        self.linear = linear
        self.two_stage = two_stage
        self.supp_size = supp_size
        self.max_sigma = max_sigma
        self.norm = norm
        # True when the stages emit integer feat + u8-exact hyper codes
        # (SRNet forms) — enables the u8 row-packed warp gather.  IMDN
        # hyper maps are continuous, so the IMDN form keeps float rows.
        self.hyper_u8 = hyper_u8
        # Edge semantics of the stage fns: "replicate" (SRNet pixel-MLPs,
        # _pad_all_sides) buckets via post-stage re-clamping; "zero" (IMDN
        # SAME convs) buckets via the masked stage fns above (falls back to
        # the exact per-shape path only when those are absent).
        self.stage_pad = stage_pad
        self._resize_cache: Dict = {}
        self._warp_cache: Dict = {}
        self._bucket_cache: Dict = {}
        self._warp_dyn_cache: Dict = {}
        self._resize_dyn_cache: Dict = {}

    @classmethod
    def from_srnets(cls, params, *, modes=("s", "c", "t"),
                    modes2=("s", "c", "t"), stages: int = 2,
                    linear: bool = False, two_stage: bool = True,
                    supp_size: int = 2, max_sigma: float = 10.0,
                    norm: int = 255, backend: str = "auto", mesh=None):
        """LeRF-L/G trainable form (SRNetsSWF2 pixel-MLP ensemble).

        ``backend``: "auto" (default) runs the fused Pallas ensemble kernel
        on TPU (6.4× the XLA chain — BASELINE.md) and the XLA path
        elsewhere; "xla"/"pallas" force one; "pallas_int8" (opt-in) runs
        the quantized int8-MXU kernel — heads are post-training-quantized
        here, once, against the 17⁴ deploy lattice (quality deltas:
        BASELINE.md "int8 serving form").  Inference only either way.
        """
        from .models import srnet

        backend = srnet.resolve_backend(backend)
        if backend == "pallas_int8":
            params = srnet.quantize_lerf_params(params)

        def s1(p, x):
            return srnet.predict_stage1(p, x, modes=modes, stages=stages,
                                        norm=norm, backend=backend)

        def s2(p, x):
            return srnet.predict_stage2(p, x, modes2=modes2, norm=norm,
                                        backend=backend)

        # u8 warp rows require codes that are exact multiples of 1/255
        return cls(params, s1, s2, linear=linear, two_stage=two_stage,
                   supp_size=supp_size, max_sigma=max_sigma, norm=norm,
                   hyper_u8=(norm == 255), mesh=mesh)

    @classmethod
    def from_imdn(cls, model, variables, *, out_c: int = 3,
                  linear: bool = False, two_stage: bool = True,
                  supp_size: int = 2,
                  max_sigma: float = 10.0, norm: int = 255,
                  backend: str = "auto", s2d_block: int = 2, mesh=None):
        """LeRF-Net / LeRF-Net++ (IMDN2 flax module, inC=3).

        ``two_stage=False`` skips the feature tower at eval exactly like
        the reference (eval_model.py:124-129: feat = round(img·norm), the
        hyper net sees the raw image) — it must match how the checkpoint
        was trained, or the resample reads an untrained stage-1 tower.

        Hyper layout parity: stage2 emits 3·featC channels ordered
        [ρ·featC, σx·featC, σy·featC] (eval_model.py:149) → reshaped to the
        trailing-axis convention [C,H,W,oC] with oC blocks outermost.

        ``backend``: "s2d" runs the towers via the space-to-depth
        re-embedding (the stock NHWC path pads the 12-channel minor dim to
        128 lanes on every conv; s2d-``s2d_block`` cuts that padded HBM
        traffic ~block² with bit-honest re-indexed weights —
        models/imdn_s2d.py).  "auto" = s2d on TPU (measured 4.7× on chip),
        stock elsewhere (imdn_s2d.resolve_backend).
        """
        from .models.imdn_s2d import make_chw_stage_fns
        variables, s1, s2 = make_chw_stage_fns(
            variables, backend=backend, block=s2d_block, nf=model.nf,
            norm=norm, out_c=out_c, dtype=model.dtype, model=model)

        return cls(variables, s1, s2, linear=linear, two_stage=two_stage,
                   supp_size=supp_size,
                   max_sigma=max_sigma, norm=norm, stage_pad="zero",
                   stage1_masked_fn=lambda p, x, h, w: s1(p, x, (h, w)),
                   stage2_masked_fn=lambda p, x, h, w: s2(p, x, (h, w)),
                   mesh=mesh)

    @property
    def _bucketable(self):
        """Bucketed serving needs stage fns whose bucket-frame values match
        the unpadded program's: replicate-pad stages via post-stage
        re-clamping, zero-pad stages via traced-bound in-stage masking."""
        return (self.stage_pad == "replicate"
                or self.stage1_masked_fn is not None)

    def _stages(self, img_f, clamp_hw=None):
        """img [C,H,W] float in [0,1] → (feat [0,255], hyper [C,H,W,oC]).

        ``clamp_hw=(h, w)``: bucketed serving — re-clamp each stage output
        beyond the valid region so the next stage (whose replicate padding
        reads the tensor edge) sees exactly the values of the unpadded
        program (see LutPredictor._stages_fn).  Zero-pad stage fns (IMDN
        SAME convs) instead run their masked variants: per-conv re-masking
        inside the tower reproduces the unpadded program's zero padding,
        the feat is zeroed beyond (h, w) so stage 2's conv windows see
        zeros, and the hyper re-clamps for the resample's edge-pad gather."""
        if clamp_hw is not None and self.stage_pad == "zero" \
                and self.stage1_masked_fn is not None:
            h, w = clamp_hw
            valid = ((jnp.arange(img_f.shape[-2]) < h)[:, None]
                     & (jnp.arange(img_f.shape[-1]) < w)[None, :])
            if self.two_stage:
                feat = self.stage1_masked_fn(self.params, img_f, h, w)
                feat = jnp.where(valid, feat, 0.0)
                hyper_in = feat / float(self.norm)
            else:
                feat = jnp.where(valid, jnp.round(img_f * self.norm), 0.0)
                hyper_in = jnp.where(valid, img_f, 0.0)
            hyper = self.stage2_masked_fn(self.params, hyper_in, h, w)
            hyper = _clamp_valid(hyper, -3, -2, clamp_hw)
            return feat, hyper
        if self.two_stage:
            feat = self.stage1_fn(self.params, img_f)
            feat = _clamp_valid(feat, -2, -1, clamp_hw)
            hyper_in = feat / float(self.norm)
        else:
            feat = jnp.round(img_f * self.norm)
            hyper_in = img_f
        hyper = self.stage2_fn(self.params, hyper_in)
        hyper = _clamp_valid(hyper, -3, -2, clamp_hw)
        return feat, hyper

    def _resize_fn(self, in_sz, scale):
        key = (in_sz, scale)
        if key not in self._resize_cache:
            geom = ResizeGeometry.create(in_sz, scale_factors=list(scale),
                                         support=self.supp_size)

            @jax.jit
            def run(img_f):
                feat, hyper = self._stages(img_f)
                if self.linear:
                    out = amplified_linear_resize(feat, hyper[..., 0], geom)
                else:
                    out = steering_gaussian_resize(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        geom, max_sigma=self.max_sigma)
                return _quantize_device(out, self.norm), feat, hyper

            self._resize_cache[key] = run
        return self._resize_cache[key]

    def upscale(self, img_hwc: np.ndarray, scale_h: float, scale_w: float,
                return_aux: bool = False):
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        if float(scale_h) == 1.0 and float(scale_w) == 1.0:
            # skip path (eval_model.py:153-154)
            out = np.round(chw * self.norm)
            out_u8 = np.clip(out, 0, self.norm).astype(np.uint8)
            return out_u8.transpose(1, 2, 0)
        run = self._resize_fn(chw.shape[1:], (float(scale_h), float(scale_w)))
        out, feat, hyper = run(jnp.asarray(chw))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        if return_aux:
            return out_u8, np.asarray(feat), np.asarray(hyper)
        return out_u8

    def _bucket_fn(self, bucket_sz, scale):
        key = (bucket_sz, scale)
        if key not in self._bucket_cache:
            geom = ResizeGeometry.create(bucket_sz, scale_factors=list(scale),
                                         support=self.supp_size)

            @jax.jit
            def run(img_f, h, w):
                feat, hyper = self._stages(img_f, clamp_hw=(h, w))
                # the resample constant-pads the image but replicate-pads
                # the hyper maps — feat beyond (h, w) must be ZERO for the
                # neighbor gather while hyper stays clamped-replicated
                valid = ((jnp.arange(bucket_sz[0]) < h)[:, None]
                         & (jnp.arange(bucket_sz[1]) < w)[None, :])
                feat = jnp.where(valid, feat, 0)
                if self.linear:
                    out = amplified_linear_resize(feat, hyper[..., 0], geom)
                else:
                    out = steering_gaussian_resize(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        geom, max_sigma=self.max_sigma)
                return _quantize_device(out, self.norm)

            self._bucket_cache[key] = run
        return self._bucket_cache[key]

    def upscale_bucketed(self, img_hwc: np.ndarray, scale_h: float,
                         scale_w: float, granularity: int = 64):
        """Net-form serving without per-shape recompiles: one compiled
        program per (shape bucket, scale) — same construction as
        :meth:`LutPredictor.upscale_bucketed` (edge-replicate pad, post-stage
        re-clamp, bucket-geometry resize, crop), valid because the SRNet
        stage fns use replicate padding (_pad_all_sides) exactly like the
        LUT stages.  Falls back to the exact per-shape path when grid
        translation-invariance can't hold or when the stage fns use
        zero-pad convs (the IMDN form — in-stage masks would be needed)."""
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        sh, sw = float(scale_h), float(scale_w)
        if sh == 1.0 and sw == 1.0:
            return self.upscale(img, sh, sw)
        prep = None if not self._bucketable else \
            _bucket_prep(img, sh, sw, granularity)
        if prep is None:
            return self.upscale(img, sh, sw)
        padded, (hb, wb), (h, w) = prep
        chw = np.ascontiguousarray(padded.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        run = self._bucket_fn((hb, wb), (sh, sw))
        out = run(jnp.asarray(chw), jnp.asarray(h, jnp.int32),
                  jnp.asarray(w, jnp.int32))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        return out_u8[:int(round(h * sh)), :int(round(w * sw))]

    def _resample_rings(self, feat, hyper, rings, pad=1):
        """Shared rings-resize dispatch for the net forms (float stage
        outputs, hyper layout [C,H,W,oC] — see :meth:`_resize_fn`)."""
        if self.linear:
            return amplified_linear_resize_rings(feat, hyper[..., 0], rings,
                                                 pad=pad)
        return steering_gaussian_resize_rings(
            feat, hyper[..., 0], hyper[..., 1], hyper[..., 2], rings,
            max_sigma=self.max_sigma, pad=pad)

    def _resize_dyn_fn(self, in_sz, out_sz, pad=1):
        key = (in_sz, out_sz, pad)
        if key not in self._resize_dyn_cache:

            @jax.jit
            def run(img_f, rings):
                feat, hyper = self._stages(img_f)
                out = self._resample_rings(feat, hyper, rings, pad=pad)
                return _quantize_device(out, self.norm)

            self._resize_dyn_cache[key] = run
        return self._resize_dyn_cache[key]

    def _resize_dyn_bucket_fn(self, in_bucket, out_bucket):
        key = ("bucket", in_bucket, out_bucket)
        if key not in self._resize_dyn_cache:

            @jax.jit
            def run(img_f, rings, h, w):
                feat, hyper = self._stages(img_f, clamp_hw=(h, w))
                valid = ((jnp.arange(in_bucket[0]) < h)[:, None]
                         & (jnp.arange(in_bucket[1]) < w)[None, :])
                out = self._resample_rings(jnp.where(valid, feat, 0.0),
                                           hyper, rings)
                return _quantize_device(out, self.norm)

            self._resize_dyn_cache[key] = run
        return self._resize_dyn_cache[key]

    def upscale_dynamic_async(self, img_hwc: np.ndarray, scale_h: float,
                              scale_w: float, granularity: int = 0):
        """Non-blocking :meth:`upscale_dynamic`: host geometry precompute and
        device dispatch happen NOW; the returned :class:`ServingFuture`'s
        ``result()`` blocks on the device→host copy.  Requests outside the
        dynamic envelope resolve synchronously (already-materialized
        future)."""
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if granularity > 0 and not self._bucketable:
            granularity = 0
        prep = _dyn_resize_host(img, scale_h, scale_w, granularity,
                                self.supp_size, self.linear)
        if prep is None:
            return ServingFuture.resolved(
                self.upscale(img, scale_h, scale_w))
        rings, key, image, out_sz = prep
        chw = np.ascontiguousarray(image.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        if key[0] == "bucket":
            run = self._resize_dyn_bucket_fn(key[1], key[2])
            h, w = img.shape[:2]
            out = run(jnp.asarray(chw), rings, jnp.asarray(h, jnp.int32),
                      jnp.asarray(w, jnp.int32))
        else:
            run = self._resize_dyn_fn(*key)
            out = run(jnp.asarray(chw), rings)
        _copy_host_async(out)

        def finish():
            out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
            return out_u8[:out_sz[0], :out_sz[1]]

        return ServingFuture(finish)

    def upscale_dynamic(self, img_hwc: np.ndarray, scale_h: float,
                        scale_w: float, granularity: int = 0):
        """Arbitrary-scale SR serving for the net forms — no per-scale
        recompiles (see :meth:`LutPredictor.upscale_dynamic`; identical
        construction).  The bucketed mode (``granularity>0``) requires
        replicate-pad stages (SRNet form); the IMDN form serves through the
        per-(in, out)-shape dynamic program instead."""
        return self.upscale_dynamic_async(img_hwc, scale_h, scale_w,
                                          granularity).result()

    def upscale_batch(self, imgs_bhwc: np.ndarray, scale_h: float,
                      scale_w: float) -> np.ndarray:
        """Serving form: uint8 [B,H,W,C] → uint8 [B,outH,outW,C] — one
        device program for the whole batch (the stage fns and resample are
        batch-polymorphic over leading dims, including the fused Pallas
        ensemble kernel's pixel axis)."""
        imgs = np.asarray(imgs_bhwc)
        bchw = np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)) \
            .astype(np.float32) / self.norm
        if float(scale_h) == 1.0 and float(scale_w) == 1.0:
            # skip path, matching upscale (eval_model.py:153-154)
            out = np.round(bchw * self.norm)
            return np.clip(out, 0, self.norm).astype(np.uint8) \
                .transpose(0, 2, 3, 1)
        batch = jnp.asarray(bchw)
        if self.mesh is not None:
            from .parallel import shard_batch
            batch = shard_batch(batch, self.mesh)
        run = self._resize_fn(bchw.shape[2:],
                              (float(scale_h), float(scale_w)))
        out, _, _ = run(batch)
        return _quantize_host(out, self.norm).transpose(0, 2, 3, 1)

    def _warp_fn(self, in_sz, matrix_key, geom, mask_geom):
        key = (in_sz, matrix_key, geom.out_sz)
        if key not in self._warp_cache:

            @jax.jit
            def run(img_f):
                feat, hyper = self._stages(img_f)
                if self.linear:
                    out = amplified_linear_warp(feat, hyper[..., 0], geom,
                                                u8_inputs=self.hyper_u8)
                else:
                    out = steering_gaussian_warp(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        geom, max_sigma=self.max_sigma,
                        u8_inputs=self.hyper_u8)
                mask = nearest_warp_mask(in_sz, mask_geom, border=4)
                # out-of-view support windows are NaN (0-sum weights);
                # zero them before quantizing, matching eval_model.py:261
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask.astype(jnp.bool_)

            self._warp_cache[key] = run
        return self._warp_cache[key]

    def warp(self, img_hwc: np.ndarray, matrix: np.ndarray,
             out_hw: Tuple[int, int]):
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        in_sz = chw.shape[1:]
        geom = WarpGeometry.create(in_sz, matrix, out_hw,
                                   support=self.supp_size)
        mask_geom = WarpGeometry.create(in_sz, matrix, out_hw, support=1)
        run = self._warp_fn(in_sz, matrix.tobytes(), geom, mask_geom)
        out, mask = run(jnp.asarray(chw))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        return out_u8, np.asarray(mask)

    def _warp_dyn_fn(self, in_sz, out_sz):
        key = (in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_f, rings):
                feat, hyper = self._stages(img_f)
                if self.linear:
                    out = amplified_linear_warp_rings(
                        feat, hyper[..., 0], rings, out_sz=out_sz,
                        u8_inputs=self.hyper_u8)
                else:
                    out = steering_gaussian_warp_rings(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        rings, out_sz=out_sz, max_sigma=self.max_sigma,
                        u8_inputs=self.hyper_u8)
                return _quantize_device(out, self.norm, nan_to_zero=True)

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def _warp_bucket_fn(self, in_bucket, n_bucket):
        key = ("bucket", in_bucket, n_bucket)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_f, rings, h, w):
                feat, hyper = self._stages(img_f, clamp_hw=(h, w))
                if self.linear:
                    out = amplified_linear_warp_rings(
                        feat, hyper[..., 0], rings, u8_inputs=self.hyper_u8)
                else:
                    out = steering_gaussian_warp_rings(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        rings, max_sigma=self.max_sigma,
                        u8_inputs=self.hyper_u8)
                return _quantize_device(out, self.norm, nan_to_zero=True)

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_dynamic_async(self, img_hwc: np.ndarray, matrix: np.ndarray,
                           out_hw: Tuple[int, int], granularity: int = 0):
        """Non-blocking :meth:`warp_dynamic` — host precompute + device
        dispatch now, device→host copy deferred to the returned
        :class:`ServingFuture`'s ``result()``."""
        matrix = np.asarray(matrix)
        if self.supp_size != 2:
            return ServingFuture.resolved(self.warp(img_hwc, matrix, out_hw))
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        in_sz = img.shape[:2]
        out_hw = tuple(int(v) for v in out_hw)
        rings, mask = warp_serving_host_fused(in_sz, matrix, out_hw,
                                              border=4, linear=self.linear)
        if granularity > 0 and self._bucketable:
            g = int(granularity)
            hb, wb = -(-in_sz[0] // g) * g, -(-in_sz[1] // g) * g
            n = out_hw[0] * out_hw[1]
            nb = -(-n // (g * g)) * (g * g)
            rings = rings_for_bucket(rings, in_sz, (hb, wb), nb)
            padded = np.pad(img, ((0, hb - in_sz[0]), (0, wb - in_sz[1]),
                                  (0, 0)), mode="edge")
            chw = np.ascontiguousarray(padded.transpose(2, 0, 1)) \
                .astype(np.float32) / self.norm
            run = self._warp_bucket_fn((hb, wb), nb)
            out = run(jnp.asarray(chw), rings,
                      jnp.asarray(in_sz[0], jnp.int32),
                      jnp.asarray(in_sz[1], jnp.int32))
            _copy_host_async(out)

            def finish():
                out_u8 = _quantize_host(out, self.norm)[:, :n] \
                    .reshape(-1, *out_hw).transpose(1, 2, 0)
                return out_u8, mask

            return ServingFuture(finish)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        run = self._warp_dyn_fn(in_sz, out_hw)
        out = run(jnp.asarray(chw), rings)
        _copy_host_async(out)

        def finish():
            return _quantize_host(out, self.norm).transpose(1, 2, 0), mask

        return ServingFuture(finish)

    def warp_dynamic(self, img_hwc: np.ndarray, matrix: np.ndarray,
                     out_hw: Tuple[int, int], granularity: int = 0):
        """Homographic warp as a serving form — no per-matrix recompiles
        (see :meth:`LutPredictor.warp_dynamic`; same construction).

        ``granularity=0``: one program per (in_sz, out_sz), any matrix.
        ``granularity=g>0``: one program per (in-bucket, N-bucket) — any
        image size, output size, and matrix; requires replicate-pad stages
        (the SRNet form; the IMDN form serves un-bucketed).  Support-2
        only; otherwise the per-matrix path."""
        return self.warp_dynamic_async(img_hwc, matrix, out_hw,
                                       granularity).result()

    def _warp_devgeo_fn(self, in_sz, out_sz):
        key = ("devgeo", in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_f, inv):
                rings = warp_rings_on_device(inv, in_sz, out_sz)
                mask = nearest_warp_mask_on_device(inv, in_sz, out_sz,
                                                   border=4)
                feat, hyper = self._stages(img_f)
                out = steering_gaussian_warp_rings(
                    feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                    rings, out_sz=out_sz, max_sigma=self.max_sigma,
                    u8_inputs=self.hyper_u8)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def _warp_devgeo_bucket_fn(self, in_bucket, out_bucket):
        key = ("devgeo_bucket", in_bucket, out_bucket)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_f, inv, h, w):
                rings = warp_rings_on_device(inv, (h, w), out_bucket,
                                             in_frame=in_bucket)
                mask = nearest_warp_mask_on_device(inv, (h, w), out_bucket,
                                                   border=4)
                feat, hyper = self._stages(img_f, clamp_hw=(h, w))
                out = steering_gaussian_warp_rings(
                    feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                    rings, out_sz=out_bucket, max_sigma=self.max_sigma,
                    u8_inputs=self.hyper_u8)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_device_async(self, img_hwc: np.ndarray, matrix: np.ndarray,
                          out_hw: Tuple[int, int], granularity: int = 0):
        """Non-blocking :meth:`warp_device`."""
        matrix = np.asarray(matrix)
        if self.supp_size != 2 or self.linear:
            return ServingFuture.resolved(self.warp(img_hwc, matrix, out_hw))
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        in_sz = img.shape[:2]
        out_hw = tuple(int(v) for v in out_hw)
        inv = np.linalg.inv(matrix.astype(np.float64)).astype(np.float32)
        if granularity > 0 and self._bucketable:
            g = int(granularity)
            hb, wb = -(-in_sz[0] // g) * g, -(-in_sz[1] // g) * g
            ohb, owb = -(-out_hw[0] // g) * g, -(-out_hw[1] // g) * g
            padded = np.pad(img, ((0, hb - in_sz[0]), (0, wb - in_sz[1]),
                                  (0, 0)), mode="edge")
            chw = np.ascontiguousarray(padded.transpose(2, 0, 1)) \
                .astype(np.float32) / self.norm
            run = self._warp_devgeo_bucket_fn((hb, wb), (ohb, owb))
            out, mask = run(jnp.asarray(chw), jnp.asarray(inv),
                            jnp.asarray(in_sz[0], jnp.int32),
                            jnp.asarray(in_sz[1], jnp.int32))
            _copy_host_async(out, mask)

            def finish_bucket():
                oh, ow = out_hw
                return (_quantize_host(out, self.norm)[:, :oh, :ow]
                        .transpose(1, 2, 0),
                        np.asarray(mask)[:oh, :ow])

            return ServingFuture(finish_bucket)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)) \
            .astype(np.float32) / self.norm
        run = self._warp_devgeo_fn(in_sz, out_hw)
        out, mask = run(jnp.asarray(chw), jnp.asarray(inv))
        _copy_host_async(out, mask)

        def finish():
            return (_quantize_host(out, self.norm).transpose(1, 2, 0),
                    np.asarray(mask))

        return ServingFuture(finish)

    def warp_device(self, img_hwc: np.ndarray, matrix: np.ndarray,
                    out_hw: Tuple[int, int], granularity: int = 0):
        """DEVICE-GEOMETRY warp serving for the net forms — rings +
        validity mask computed in-program from the traced 3×3 inverse
        (see :meth:`LutPredictor.warp_device`; same construction, same
        f32 caveats, same per-link decision, same ``granularity``
        bucketing)."""
        return self.warp_device_async(img_hwc, matrix, out_hw,
                                      granularity).result()

    def _warp_batch_fn(self, batch, in_sz, out_sz):
        key = ("batch", batch, in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(imgs_f, rings):
                feat, hyper = self._stages(imgs_f)      # batch-polymorphic

                def one(f1, h1, r1):
                    if self.linear:
                        return amplified_linear_warp_rings(
                            f1, h1[..., 0], r1, out_sz=out_sz,
                            u8_inputs=self.hyper_u8)
                    return steering_gaussian_warp_rings(
                        f1, h1[..., 0], h1[..., 1], h1[..., 2], r1,
                        out_sz=out_sz, max_sigma=self.max_sigma,
                        u8_inputs=self.hyper_u8)

                out = jax.vmap(one)(feat, hyper, rings)
                return _quantize_device(out, self.norm, nan_to_zero=True)

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_batch(self, imgs_bhwc: np.ndarray, matrices: np.ndarray,
                   out_hw: Tuple[int, int]):
        """Batched warp serving for the net forms — per-frame homographies
        through ONE device program (see :meth:`LutPredictor.warp_batch`;
        identical construction on float stages)."""
        imgs = np.asarray(imgs_bhwc)
        matrices = np.asarray(matrices, dtype=np.float64)
        if matrices.ndim == 2:
            matrices = np.broadcast_to(matrices, (imgs.shape[0], 3, 3))
        out_hw = tuple(int(v) for v in out_hw)
        if self.supp_size != 2:
            outs, masks = zip(*(self.warp(imgs[i], matrices[i], out_hw)
                                for i in range(imgs.shape[0])))
            return np.stack(outs), np.stack(masks)
        in_sz = imgs.shape[1:3]
        rings_list, masks = [], []
        for i in range(imgs.shape[0]):
            r, m = warp_serving_host_fused(in_sz, matrices[i], out_hw,
                                           border=4, linear=self.linear)
            rings_list.append(r)
            masks.append(m)
        rings = jax.tree.map(lambda *xs: np.stack(xs), *rings_list)
        bchw = np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)) \
            .astype(np.float32) / self.norm
        run = self._warp_batch_fn(imgs.shape[0], in_sz, out_hw)
        out = run(jnp.asarray(bchw), rings)
        return (_quantize_host(out, self.norm).transpose(0, 2, 3, 1),
                np.stack(masks))


class LutPredictor:
    """Two-stage LUT inference: feature LUTs → hyper LUTs → steerable resample.

    Mirrors the reference deploy driver semantics (eval_lut_sr.py /
    eval_lut_warp.py) with bit-exact stage arithmetic.  One compiled
    executable per distinct (input shape, output spec); traces are cached.
    """

    @classmethod
    def from_config(cls, cfg, **kwargs):
        """Load the LUT bank named by a TestConfig and build the predictor —
        the shared construction behind the eval_lut_sr / eval_lut_warp /
        upscale CLIs (reference: eval_lut_sr.py:750-775)."""
        from .lut import load_lut_bank

        out_c = 1 if cfg.linear else 3
        bank = load_lut_bank(cfg.exp_dir, lut_name=cfg.lut_name,
                             modes=tuple(cfg.modes), modes2=tuple(cfg.modes2),
                             out_c=out_c, interval=cfg.interval,
                             stages=cfg.stages)
        return cls(bank, linear=cfg.linear, modes=tuple(cfg.modes),
                   modes2=tuple(cfg.modes2), supp_size=cfg.supp_size,
                   max_sigma=cfg.max_sigma, stages=cfg.stages,
                   norm=cfg.norm, **kwargs)

    def __init__(self, bank: LUTBank, *, linear: bool = False,
                 modes=("s", "c", "t"), modes2=("s", "c", "t"),
                 supp_size: int = 2, max_sigma: float = 10.0,
                 stages: int = 2, norm: int = 255,
                 table_layout: str = "packed8", mesh=None):
        self.bank = bank
        self.linear = linear
        self.modes = tuple(modes)
        self.modes2 = tuple(modes2)
        self.supp_size = supp_size
        self.max_sigma = max_sigma
        if stages != bank.stages:
            raise ValueError(
                f"stages={stages} but the LUT bank holds {bank.stages} "
                f"stages ({len(bank.inter)} intermediate feature table sets "
                "+ final feature + hyper) — load_lut_bank(stages=...) must "
                "match (eval_lut_sr.py:747-775 loads one table set per "
                "stage)")
        self.stages = stages
        self.norm = norm
        s1, s2 = bank.as_int32()
        inter = bank.inter_as_int32()
        if table_layout in ("packed8", "packed32"):
            # packed rotation-group rows (lut_pipeline.build_packed_tables):
            # members sharing a spatial pixel set share one row gather —
            # 12 row gathers/pixel → 5 (stage 1) / 6 (stage 2).  int8 rows
            # measured 1.6× faster than int32 on top (flat contiguous rows
            # avoid the sub-word gather penalty the old [N,16,oC] cell
            # layout paid): 169 ms → 44 ms for both stages at 360×640
            # (BASELINE.md experiment matrix).
            from .ops.lut_pipeline import build_packed_tables
            dt = np.int8 if table_layout == "packed8" else np.int32
            interval = bank.interval

            def pack(tables, split_r):
                cast = {k: v.astype(dt) for k, v in tables.items()}
                return build_packed_tables(cast, self.modes if not split_r
                                           else self.modes2, split_r=split_r,
                                           interval=interval)

            s1 = pack(s1, False)
            s2 = pack(s2, True)
            inter = [pack(t, False) for t in inter]
        elif table_layout == "cells":
            # cell-major [16⁴, 16, oC] rows: one gather per ensemble member
            from .ops.simplex import build_cell_table
            s1 = {k: build_cell_table(v, bank.interval)
                  for k, v in s1.items()}
            s2 = {k: build_cell_table(v, bank.interval)
                  for k, v in s2.items()}
            inter = [{k: build_cell_table(v, bank.interval)
                      for k, v in t.items()} for t in inter]
        elif table_layout != "flat":
            raise ValueError(f"unknown table_layout {table_layout!r}")
        self.mesh = mesh
        if mesh is not None:
            from .parallel import replicate
            s1 = replicate(s1, mesh)
            s2 = replicate(s2, mesh)
            inter = [replicate(t, mesh) for t in inter]
        self._s1 = _device_tables(s1)
        self._s2 = _device_tables(s2)
        self._inter = [_device_tables(t) for t in inter]
        self._resize_cache: Dict = {}
        self._warp_cache: Dict = {}
        self._bucket_cache: Dict = {}
        self._warp_dyn_cache: Dict = {}
        self._resize_dyn_cache: Dict = {}

    # -- stages -------------------------------------------------------------

    def _stages_fn(self, img_i32, clamp_hw=None):
        """img [C,H,W] int32 → (feat int32 [C,H,W], hyper_u8 int32 [C,H,W,oC]).

        Stage loop parity: eval_lut_sr.py:541-577 — each feature stage uses
        its OWN table set; intermediate stages average over modes·4 with a
        +norm//2 bias, the final feature stage over modes with no bias.

        ``clamp_hw=(h, w)`` (traced scalars) re-clamps rows/cols beyond the
        valid region to the last valid index after EVERY stage — on a
        bucket-padded input this reproduces the exact replicate-padding
        values the unpadded program would feed the next stage, making
        bucketed serving bit-exact (see :meth:`upscale_bucketed`).
        """
        def cl(t, h_ax, w_ax):
            return _clamp_valid(t, h_ax, w_ax, clamp_hw)

        interval = self.bank.interval
        feat = img_i32
        for tables in self._inter:
            feat = lut_stage1_intermediate(feat, tables, self.modes,
                                           interval=interval, norm=self.norm)
            feat = cl(feat, -2, -1)
        feat = lut_stage1(feat, self._s1, self.modes,
                          interval=interval, norm=self.norm)
        feat = cl(feat, -2, -1)
        hyper = lut_stage2(feat, self._s2, self.modes2, interval=interval,
                           norm=self.norm)
        hyper = cl(hyper, -3, -2)
        return feat, hyper

    # -- SR -----------------------------------------------------------------

    def _resize_fn(self, in_sz: Tuple[int, int], scale: Tuple[float, float]):
        key = (in_sz, scale)
        if key not in self._resize_cache:
            geom = ResizeGeometry.create(in_sz, scale_factors=list(scale),
                                         support=self.supp_size)

            @jax.jit
            def run(img_i32):
                feat, hyper = self._stages_fn(img_i32)
                featf = feat.astype(jnp.float32)
                if self.linear:
                    alpha = hyper[..., 0].astype(jnp.float32) / self.norm
                    out = amplified_linear_resize(featf, alpha, geom)
                else:
                    rho, sx, sy = split_gaussian_hyper(hyper, self.norm)
                    out = steering_gaussian_resize(featf, rho, sx, sy, geom,
                                                   max_sigma=self.max_sigma)
                return _quantize_device(out, self.norm), feat, hyper

            self._resize_cache[key] = run
        return self._resize_cache[key]

    def upscale(self, img_hwc: np.ndarray, scale_h: float, scale_w: float,
                return_aux: bool = False):
        """uint8/float [H,W,C] → uint8 [outH,outW,C] (plus feat/hyper)."""
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)).astype(np.int32)
        run = self._resize_fn(chw.shape[1:], (float(scale_h), float(scale_w)))
        out, feat, hyper = run(jnp.asarray(chw))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        if return_aux:
            return out_u8, np.asarray(feat), np.asarray(hyper)
        return out_u8

    # -- bucketed serving ---------------------------------------------------

    def _bucket_fn(self, bucket_sz: Tuple[int, int],
                   scale: Tuple[float, float]):
        key = (bucket_sz, scale)
        if key not in self._bucket_cache:
            geom = ResizeGeometry.create(bucket_sz, scale_factors=list(scale),
                                         support=self.supp_size)

            @jax.jit
            def run(img_i32, h, w):
                feat, hyper = self._stages_fn(img_i32, clamp_hw=(h, w))
                # the resample zero-pads the IMAGE (reference constant-pad
                # semantics) but replicate-pads the hyper maps — so feat
                # beyond (h, w) must be ZERO for the neighbor gather while
                # hyper stays clamped-replicated (see _stages_fn clamp)
                valid = ((jnp.arange(bucket_sz[0]) < h)[:, None]
                         & (jnp.arange(bucket_sz[1]) < w)[None, :])
                featf = jnp.where(valid, feat, 0).astype(jnp.float32)
                if self.linear:
                    alpha = hyper[..., 0].astype(jnp.float32) / self.norm
                    out = amplified_linear_resize(featf, alpha, geom)
                else:
                    rho, sx, sy = split_gaussian_hyper(hyper, self.norm)
                    out = steering_gaussian_resize(featf, rho, sx, sy, geom,
                                                   max_sigma=self.max_sigma)
                return _quantize_device(out, self.norm)

            self._bucket_cache[key] = run
        return self._bucket_cache[key]

    def upscale_bucketed(self, img_hwc: np.ndarray, scale_h: float,
                         scale_w: float, granularity: int = 64):
        """Serving without per-shape recompiles: ONE compiled program per
        (shape bucket, scale) instead of per image shape.

        The image is edge-replicate padded up to the next ``granularity``
        multiple, the stage ensembles re-clamp rows/cols after every stage
        (reproducing the unpadded program's replicate-pad values exactly),
        and the resize runs on the bucket geometry — **bit-identical** to
        :meth:`upscale` (tests/test_bucketed.py) because the projection grid
        ``g(o) = o/s - 1/2 + 1/(2s)`` is translation-invariant whenever
        ``out_sz == scale·in_sz`` exactly.  When that alignment fails for
        either the real or the bucket shape (fractional scales on
        non-multiple sizes, where the reference's ``ceil`` output size
        breaks invariance — resize_right2d_numpy.py:25-49), falls back to
        the exact per-shape path.

        The reference recomputes ``set_shape`` per image on the host
        (eval_lut_sr.py:644-646); per-shape jit is the TPU analog of that,
        and this is the serving-friendly replacement (SURVEY §7 "static
        shapes" hard part).
        """
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        sh, sw = float(scale_h), float(scale_w)
        prep = _bucket_prep(img, sh, sw, granularity)
        if prep is None:
            return self.upscale(img, sh, sw)
        padded, (hb, wb), (h, w) = prep
        chw = np.ascontiguousarray(padded.transpose(2, 0, 1)).astype(np.int32)
        run = self._bucket_fn((hb, wb), (sh, sw))
        out = run(jnp.asarray(chw), jnp.asarray(h, jnp.int32),
                  jnp.asarray(w, jnp.int32))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        return out_u8[:int(round(h * sh)), :int(round(w * sw))]

    # -- dynamic-scale serving ------------------------------------------------

    def _resample_rings(self, feat, hyper, rings, pad=1):
        """Shared rings-resize dispatch: decode the LUT stage outputs like
        the static path (:meth:`_resize_fn`) and resample with traced
        geometry."""
        featf = feat.astype(jnp.float32)
        if self.linear:
            alpha = hyper[..., 0].astype(jnp.float32) / self.norm
            return amplified_linear_resize_rings(featf, alpha, rings,
                                                 pad=pad)
        rho, sx, sy = split_gaussian_hyper(hyper, self.norm)
        return steering_gaussian_resize_rings(featf, rho, sx, sy, rings,
                                              max_sigma=self.max_sigma,
                                              pad=pad)

    def _resize_dyn_fn(self, in_sz, out_sz, pad=1):
        key = (in_sz, out_sz, pad)
        if key not in self._resize_dyn_cache:

            @jax.jit
            def run(img_i32, rings):
                feat, hyper = self._stages_fn(img_i32)
                out = self._resample_rings(feat, hyper, rings, pad=pad)
                return _quantize_device(out, self.norm)

            self._resize_dyn_cache[key] = run
        return self._resize_dyn_cache[key]

    def _resize_dyn_bucket_fn(self, in_bucket, out_bucket):
        key = ("bucket", in_bucket, out_bucket)
        if key not in self._resize_dyn_cache:

            @jax.jit
            def run(img_i32, rings, h, w):
                feat, hyper = self._stages_fn(img_i32, clamp_hw=(h, w))
                # feat beyond (h, w) must be ZERO so the bucket plane's row
                # h+1 holds exactly the true program's constant-pad row;
                # hyper stays clamped-replicated (edge-pad parity) — the
                # same split as _bucket_fn
                valid = ((jnp.arange(in_bucket[0]) < h)[:, None]
                         & (jnp.arange(in_bucket[1]) < w)[None, :])
                out = self._resample_rings(jnp.where(valid, feat, 0), hyper,
                                           rings)
                return _quantize_device(out, self.norm)

            self._resize_dyn_cache[key] = run
        return self._resize_dyn_cache[key]

    def upscale_dynamic(self, img_hwc: np.ndarray, scale_h: float,
                        scale_w: float, granularity: int = 0):
        """Arbitrary-scale SR as a SERVING form — no per-scale recompiles.

        :meth:`upscale` bakes the per-scale geometry into the program (and
        only rational scales with period ≤ 32 take the gather-free periodic
        path; :meth:`upscale_bucketed` additionally needs exact
        ``out == scale·in`` alignment).  Here the per-axis geometry becomes
        traced DATA (ops.geometry.ResizeOperands: left-neighbor indices into
        a fixed ±1 pad + float64 distances, two O(out) 1-D host passes):

        * ``granularity=0`` — one compiled program per (in_sz, out_sz)
          shape pair, ANY ``(scale_h, scale_w)``.
        * ``granularity=g>0`` — fully recompile-free: input and output pad
          to shape buckets (stages re-clamped like :meth:`upscale_bucketed`),
          so one program per (in-bucket, out-bucket) serves any image size
          and any scale.

        Both modes are bit-identical to :meth:`upscale`
        (tests/test_dynamic_resize.py).  Downscales serve through the
        anti-aliased support-bucket envelope (``ResizeOperands.create_any``,
        reference AA semantics resize_right2d_numpy.py:52-55,186-193) down
        to scale 1/32; only the scale-1 skip and beyond-cap downscales
        fall back to :meth:`upscale`.  Match: the reference's per-image
        host ``set_shape`` serving (eval_lut_sr.py:644-661), which serves
        ANY scale the same way.
        """
        return self.upscale_dynamic_async(img_hwc, scale_h, scale_w,
                                          granularity).result()

    def upscale_dynamic_async(self, img_hwc: np.ndarray, scale_h: float,
                              scale_w: float, granularity: int = 0):
        """Non-blocking :meth:`upscale_dynamic` — host per-axis geometry +
        device dispatch now; ``result()`` blocks on the device→host copy
        (see :class:`ServingFuture`)."""
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        prep = _dyn_resize_host(img, scale_h, scale_w, granularity,
                                self.supp_size, self.linear)
        if prep is None:
            return ServingFuture.resolved(
                self.upscale(img, scale_h, scale_w))
        rings, key, image, out_sz = prep
        chw = np.ascontiguousarray(image.transpose(2, 0, 1)).astype(np.int32)
        if key[0] == "bucket":
            run = self._resize_dyn_bucket_fn(key[1], key[2])
            h, w = img.shape[:2]
            out = run(jnp.asarray(chw), rings, jnp.asarray(h, jnp.int32),
                      jnp.asarray(w, jnp.int32))
        else:
            run = self._resize_dyn_fn(*key)
            out = run(jnp.asarray(chw), rings)
        _copy_host_async(out)

        def finish():
            out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
            return out_u8[:out_sz[0], :out_sz[1]]

        return ServingFuture(finish)

    def upscale_batch(self, imgs_bhwc: np.ndarray, scale_h: float,
                      scale_w: float) -> np.ndarray:
        """Serving form: uint8 [B,H,W,C] → uint8 [B,outH,outW,C].

        Every op is batch-polymorphic ([..., H, W] leading dims), so the
        whole batch runs as one device program (one compiled executable per
        (H, W, scale)).  With a mesh, the batch is sharded across chips
        (LUT tables replicated) — pure data-parallel scale-out, zero
        collectives in the forward pass."""
        imgs = np.asarray(imgs_bhwc)
        bchw = jnp.asarray(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2))
                           .astype(np.int32))
        if self.mesh is not None:
            from .parallel import shard_batch
            bchw = shard_batch(bchw, self.mesh)
        run = self._resize_fn(bchw.shape[2:],
                              (float(scale_h), float(scale_w)))
        out, _, _ = run(bchw)
        return _quantize_host(out, self.norm).transpose(0, 2, 3, 1)

    # -- warp ---------------------------------------------------------------

    def _warp_fn(self, in_sz, matrix_key, geom: WarpGeometry,
                 mask_geom: WarpGeometry):
        key = (in_sz, matrix_key, geom.out_sz)
        if key not in self._warp_cache:

            # norm==255 ⇒ the u8 row-packed gather applies; the stage
            # outputs ARE the u8 codes, so they pass through as integers
            # (decoded after the gather — no float round-trip).
            u8 = self.norm == 255

            @jax.jit
            def run(img_i32):
                feat, hyper = self._stages_fn(img_i32)
                featf = feat if u8 else feat.astype(jnp.float32)
                if self.linear:
                    alpha = hyper[..., 0] if u8 else \
                        hyper[..., 0].astype(jnp.float32) / self.norm
                    out = amplified_linear_warp(featf, alpha, geom,
                                                u8_inputs=u8)
                else:
                    if u8:
                        rho, sx, sy = (hyper[..., 0], hyper[..., 1],
                                       hyper[..., 2])
                    else:
                        rho, sx, sy = split_gaussian_hyper(hyper, self.norm)
                    out = steering_gaussian_warp(featf, rho, sx, sy, geom,
                                                 max_sigma=self.max_sigma,
                                                 u8_inputs=u8)
                mask = nearest_warp_mask(in_sz, mask_geom, border=4)
                # NaN (out-of-view) → 0 before quantization, matching
                # eval_model.py:261
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask.astype(jnp.bool_), feat, hyper

            self._warp_cache[key] = run
        return self._warp_cache[key]

    def warp(self, img_hwc: np.ndarray, matrix: np.ndarray,
             out_hw: Tuple[int, int], return_aux: bool = False):
        """Homographic warp.  Returns (uint8 out [oH,oW,C], bool mask [oH,oW]).

        NaN outputs (fully out-of-view support windows) are zeroed before
        quantization, matching the torch eval path (eval_model.py:261); those
        pixels are excluded by the mask in mPSNR anyway.
        """
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)).astype(np.int32)
        in_sz = chw.shape[1:]
        geom = WarpGeometry.create(in_sz, matrix, out_hw,
                                   support=self.supp_size)
        mask_geom = WarpGeometry.create(in_sz, matrix, out_hw, support=1)
        run = self._warp_fn(in_sz, matrix.tobytes(), geom, mask_geom)
        out, mask, feat, hyper = run(jnp.asarray(chw))
        out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
        mask = np.asarray(mask)
        if return_aux:
            return out_u8, mask, np.asarray(feat), np.asarray(hyper)
        return out_u8, mask

    def _warp_dyn_fn(self, in_sz, out_sz):
        key = (in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_i32, rings):
                feat, hyper = self._stages_fn(img_i32)
                if self.linear:
                    out = amplified_linear_warp_rings(
                        feat, hyper[..., 0], rings, out_sz=out_sz,
                        u8_inputs=True)
                else:
                    out = steering_gaussian_warp_rings(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        rings, out_sz=out_sz, max_sigma=self.max_sigma,
                        u8_inputs=True)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    feat, hyper

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def _warp_bucket_fn(self, in_bucket, n_bucket):
        key = ("bucket", in_bucket, n_bucket)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_i32, rings, h, w):
                feat, hyper = self._stages_fn(img_i32, clamp_hw=(h, w))
                # no in-program masking: the rings only ever index the
                # true rows/cols (+ the shared zero/edge pad row), and the
                # post-stage re-clamp makes those rows bit-equal to the
                # unpadded program's (see upscale_bucketed)
                if self.linear:
                    out = amplified_linear_warp_rings(
                        feat, hyper[..., 0], rings, u8_inputs=True)
                else:
                    out = steering_gaussian_warp_rings(
                        feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                        rings, max_sigma=self.max_sigma, u8_inputs=True)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    feat, hyper

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_dynamic(self, img_hwc: np.ndarray, matrix: np.ndarray,
                     out_hw: Tuple[int, int], return_aux: bool = False,
                     granularity: int = 0):
        """Homographic warp as a SERVING form — no per-matrix recompiles.

        :meth:`warp` bakes the per-matrix geometry into the program (the
        TPU analog of the reference's per-image host ``set_shape``,
        eval_lut_warp.py), so every new homography pays an XLA gather
        compile.  Here the geometry becomes traced DATA
        (ops.geometry.WarpOperands: two clip-ring maps, a corner index, the
        float64 distances) computed on the host per call, and the validity
        mask is host-numpy (``nearest_warp_mask_host``):

        * ``granularity=0`` — one compiled program per (in_sz, out_sz)
          shape pair, any matrix.
        * ``granularity=g>0`` — fully recompile-free: the input pads to a
          shape bucket (stages re-clamped, like :meth:`upscale_bucketed`),
          the output stays FLAT in the program and is host-cropped, so one
          program per (in-bucket, N-bucket) serves any image size, any
          output size, and any matrix.

        Both modes are bit-identical to :meth:`warp`
        (tests/test_dynamic_warp.py).  Falls back to the per-matrix path
        outside the u8 row-pack deploy config (support 2, norm 255)."""
        return self.warp_dynamic_async(img_hwc, matrix, out_hw,
                                       return_aux=return_aux,
                                       granularity=granularity).result()

    def warp_dynamic_async(self, img_hwc: np.ndarray, matrix: np.ndarray,
                           out_hw: Tuple[int, int], return_aux: bool = False,
                           granularity: int = 0):
        """Non-blocking :meth:`warp_dynamic` — host precompute (the C warp
        kernel) + device dispatch now; ``result()`` blocks on the
        device→host copy (see :class:`ServingFuture`)."""
        matrix = np.asarray(matrix)
        if self.supp_size != 2 or self.norm != 255:
            return ServingFuture.resolved(
                self.warp(img_hwc, matrix, out_hw, return_aux))
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        in_sz = img.shape[:2]
        out_hw = tuple(int(v) for v in out_hw)
        rings, mask = warp_serving_host_fused(in_sz, matrix, out_hw,
                                              border=4, linear=self.linear)
        if granularity > 0:
            g = int(granularity)
            hb, wb = -(-in_sz[0] // g) * g, -(-in_sz[1] // g) * g
            n = out_hw[0] * out_hw[1]
            nb = -(-n // (g * g)) * (g * g)
            rings = rings_for_bucket(rings, in_sz, (hb, wb), nb)
            padded = np.pad(img, ((0, hb - in_sz[0]), (0, wb - in_sz[1]),
                                  (0, 0)), mode="edge")
            chw = np.ascontiguousarray(padded.transpose(2, 0, 1)) \
                .astype(np.int32)
            run = self._warp_bucket_fn((hb, wb), nb)
            out, feat, hyper = run(jnp.asarray(chw), rings,
                                   jnp.asarray(in_sz[0], jnp.int32),
                                   jnp.asarray(in_sz[1], jnp.int32))
            _copy_host_async(*((out, feat, hyper) if return_aux
                               else (out,)))

            def finish_bucket():
                out_u8 = _quantize_host(out, self.norm)[:, :n] \
                    .reshape(-1, *out_hw).transpose(1, 2, 0)
                if return_aux:
                    h, w = in_sz
                    return out_u8, mask, \
                        np.asarray(feat)[..., :h, :w], \
                        np.asarray(hyper)[..., :h, :w, :]
                return out_u8, mask

            return ServingFuture(finish_bucket)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)).astype(np.int32)
        run = self._warp_dyn_fn(in_sz, out_hw)
        out, feat, hyper = run(jnp.asarray(chw), rings)
        _copy_host_async(*((out, feat, hyper) if return_aux else (out,)))

        def finish():
            out_u8 = _quantize_host(out, self.norm).transpose(1, 2, 0)
            if return_aux:
                return out_u8, mask, np.asarray(feat), np.asarray(hyper)
            return out_u8, mask

        return ServingFuture(finish)

    def _warp_devgeo_fn(self, in_sz, out_sz):
        key = ("devgeo", in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_i32, inv):
                rings = warp_rings_on_device(inv, in_sz, out_sz)
                mask = nearest_warp_mask_on_device(inv, in_sz, out_sz,
                                                   border=4)
                feat, hyper = self._stages_fn(img_i32)
                out = steering_gaussian_warp_rings(
                    feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                    rings, out_sz=out_sz, max_sigma=self.max_sigma,
                    u8_inputs=True)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def _warp_devgeo_bucket_fn(self, in_bucket, out_bucket):
        key = ("devgeo_bucket", in_bucket, out_bucket)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(img_i32, inv, h, w):
                rings = warp_rings_on_device(inv, (h, w), out_bucket,
                                             in_frame=in_bucket)
                mask = nearest_warp_mask_on_device(inv, (h, w), out_bucket,
                                                   border=4)
                feat, hyper = self._stages_fn(img_i32, clamp_hw=(h, w))
                out = steering_gaussian_warp_rings(
                    feat, hyper[..., 0], hyper[..., 1], hyper[..., 2],
                    rings, out_sz=out_bucket, max_sigma=self.max_sigma,
                    u8_inputs=True)
                return _quantize_device(out, self.norm, nan_to_zero=True), \
                    mask

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_device_async(self, img_hwc: np.ndarray, matrix: np.ndarray,
                          out_hw: Tuple[int, int], granularity: int = 0):
        """Non-blocking :meth:`warp_device`."""
        matrix = np.asarray(matrix)
        if self.supp_size != 2 or self.norm != 255 or self.linear:
            return ServingFuture.resolved(self.warp(img_hwc, matrix, out_hw))
        img = np.asarray(img_hwc)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        in_sz = img.shape[:2]
        out_hw = tuple(int(v) for v in out_hw)
        inv = np.linalg.inv(matrix.astype(np.float64)).astype(np.float32)
        if granularity > 0:
            g = int(granularity)
            hb, wb = -(-in_sz[0] // g) * g, -(-in_sz[1] // g) * g
            ohb, owb = -(-out_hw[0] // g) * g, -(-out_hw[1] // g) * g
            padded = np.pad(img, ((0, hb - in_sz[0]), (0, wb - in_sz[1]),
                                  (0, 0)), mode="edge")
            chw = np.ascontiguousarray(padded.transpose(2, 0, 1)) \
                .astype(np.int32)
            run = self._warp_devgeo_bucket_fn((hb, wb), (ohb, owb))
            out, mask = run(jnp.asarray(chw), jnp.asarray(inv),
                            jnp.asarray(in_sz[0], jnp.int32),
                            jnp.asarray(in_sz[1], jnp.int32))
            _copy_host_async(out, mask)

            def finish_bucket():
                oh, ow = out_hw
                return (_quantize_host(out, self.norm)[:, :oh, :ow]
                        .transpose(1, 2, 0),
                        np.asarray(mask)[:oh, :ow])

            return ServingFuture(finish_bucket)
        chw = np.ascontiguousarray(img.transpose(2, 0, 1)).astype(np.int32)
        run = self._warp_devgeo_fn(in_sz, out_hw)
        out, mask = run(jnp.asarray(chw), jnp.asarray(inv))
        _copy_host_async(out, mask)

        def finish():
            return (_quantize_host(out, self.norm).transpose(1, 2, 0),
                    np.asarray(mask))

        return ServingFuture(finish)

    def warp_device(self, img_hwc: np.ndarray, matrix: np.ndarray,
                    out_hw: Tuple[int, int], granularity: int = 0):
        """DEVICE-GEOMETRY homographic warp serving: the per-frame matrix
        operand is the 3×3 inverse alone — no corner/distance upload
        (~20 B/output-px with :meth:`warp_dynamic`) and no host geometry
        precompute (~70 ms/frame at 1440p); rings and validity mask are
        computed in-program (``ops.resample.warp_rings_on_device``).

        One compiled program per (in_sz, out_sz), any matrix — the same
        program identity as :meth:`warp_dynamic`, minus its operand
        transfer.  ``granularity=g>0`` buckets BOTH rectangles (input
        edge-padded with stages re-clamped, output padded and host-
        cropped), making the form fully recompile-free: one program per
        (in-bucket, out-bucket) serves any shape pair and any matrix —
        bit-equal to the unbucketed device-geometry program
        (tests/test_dynamic_warp.py).  NOT bit-equal to the float64
        host-geometry paths: the f32 in-program projective divide can
        flip ceil/box boundaries at a ~1e-4-px scale (measured Set5
        quality deltas: BASELINE.md "Device-geometry warp").  Gaussian
        deploy config only (support 2, norm 255, non-linear); other
        configs fall back to :meth:`warp`."""
        return self.warp_device_async(img_hwc, matrix, out_hw,
                                      granularity).result()

    def _warp_devgeo_batch_fn(self, batch, in_sz, out_sz):
        key = ("devgeo_batch", batch, in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(imgs_i32, invs):
                feat, hyper = self._stages_fn(imgs_i32)   # batch-polymorphic

                def one(f1, h1, inv1):
                    rings = warp_rings_on_device(inv1, in_sz, out_sz)
                    out = steering_gaussian_warp_rings(
                        f1, h1[..., 0], h1[..., 1], h1[..., 2], rings,
                        out_sz=out_sz, max_sigma=self.max_sigma,
                        u8_inputs=True)
                    return out, nearest_warp_mask_on_device(
                        inv1, in_sz, out_sz, border=4)

                out, mask = jax.vmap(one)(feat, hyper, invs)
                return _quantize_device(out, self.norm,
                                        nan_to_zero=True), mask

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def _warp_batch_fn(self, batch, in_sz, out_sz):
        key = ("batch", batch, in_sz, out_sz)
        if key not in self._warp_dyn_cache:

            @jax.jit
            def run(imgs_i32, rings):
                feat, hyper = self._stages_fn(imgs_i32)   # batch-polymorphic

                def one(f1, h1, r1):
                    if self.linear:
                        return amplified_linear_warp_rings(
                            f1, h1[..., 0], r1, out_sz=out_sz,
                            u8_inputs=True)
                    return steering_gaussian_warp_rings(
                        f1, h1[..., 0], h1[..., 1], h1[..., 2], r1,
                        out_sz=out_sz, max_sigma=self.max_sigma,
                        u8_inputs=True)

                out = jax.vmap(one)(feat, hyper, rings)
                return _quantize_device(out, self.norm, nan_to_zero=True)

            self._warp_dyn_cache[key] = run
        return self._warp_dyn_cache[key]

    def warp_batch(self, imgs_bhwc: np.ndarray, matrices: np.ndarray,
                   out_hw: Tuple[int, int], geometry: str = "host"):
        """Batched warp serving: uint8 [B,H,W,C] + per-frame homographies
        [B,3,3] (or one shared [3,3]) → (uint8 [B,oH,oW,C], bool mask
        [B,oH,oW]) — ONE device program for the whole batch, any matrices.

        The stage ensembles run batch-polymorphic and the row-packed rings
        warp is vmapped over per-frame operand stacks; bit-identical per
        frame to :meth:`warp` (tests/test_batch_serving.py).  Match: the
        reference's batched warp semantics (resize_right2d_torch.py:346-370)
        generalized to per-frame matrices.

        ``geometry="device"`` computes the per-frame rings + masks
        in-program from the 3×3 inverses (B·9 floats of matrix operand
        instead of B·20 B/output-px — the batched form of
        :meth:`warp_device`, same f32 caveats/fallbacks)."""
        imgs = np.asarray(imgs_bhwc)
        matrices = np.asarray(matrices, dtype=np.float64)
        if matrices.ndim == 2:
            matrices = np.broadcast_to(matrices, (imgs.shape[0], 3, 3))
        out_hw = tuple(int(v) for v in out_hw)
        if geometry not in ("host", "device"):
            raise ValueError(
                f"geometry={geometry!r}: must be 'host' or 'device'")
        if self.supp_size != 2 or self.norm != 255 \
                or (geometry == "device" and self.linear):
            outs, masks = zip(*(self.warp(imgs[i], matrices[i], out_hw)
                                for i in range(imgs.shape[0])))
            return np.stack(outs), np.stack(masks)
        in_sz = imgs.shape[1:3]
        if geometry == "device":
            invs = np.stack([np.linalg.inv(m).astype(np.float32)
                             for m in matrices])
            bchw = np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)) \
                .astype(np.int32)
            run = self._warp_devgeo_batch_fn(imgs.shape[0], in_sz, out_hw)
            out, mask = run(jnp.asarray(bchw), jnp.asarray(invs))
            return (_quantize_host(out, self.norm).transpose(0, 2, 3, 1),
                    np.asarray(mask))
        rings_list, masks = [], []
        for i in range(imgs.shape[0]):
            r, m = warp_serving_host_fused(in_sz, matrices[i], out_hw,
                                           border=4, linear=self.linear)
            rings_list.append(r)
            masks.append(m)
        rings = jax.tree.map(lambda *xs: np.stack(xs), *rings_list)
        bchw = np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)) \
            .astype(np.int32)
        run = self._warp_batch_fn(imgs.shape[0], in_sz, out_hw)
        out = run(jnp.asarray(bchw), rings)
        return (_quantize_host(out, self.norm).transpose(0, 2, 3, 1),
                np.stack(masks))
