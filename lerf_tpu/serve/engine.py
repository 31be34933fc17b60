"""Pipelined serving loops — software pipelining over the async predictors.

The dynamic serving forms split per frame into (a) host geometry
precompute (the native C warp kernel / the O(out) per-axis resize
passes), (b) asynchronously dispatched device compute, and (c) the
device→host copy plus host post-processing.  A bounded queue of
in-flight :class:`~lerf_tpu.pipeline.ServingFuture` objects overlaps
(a)/(b) of frame k+1 with (b)/(c) of frame k, so sustained throughput
approaches ``1 / max(host, device)`` instead of ``1 / (host + device)``
— the split BASELINE.md ("Dynamic-warp host precompute") measures at
~70 ms host vs ~50 ms device per 1440p frame on this rig.

The reference deploys strictly sequentially: one ``set_shape`` host
precompute, then the forward, per image (eval_lut_warp.py /
eval_lut_sr.py:644-661).  Pipelining is only possible here because the
dynamic forms made the per-frame geometry traced DATA — a new frame
never waits on an XLA compile, so its dispatch cost is just the host
precompute that the pipeline hides.

Ordering: results yield in request order.  Bit-exactness: each yielded
result is the same object chain as the sequential ``warp_dynamic`` /
``upscale_dynamic`` call (tests/test_serving_engine.py asserts equality).
"""
from collections import deque

__all__ = ["stream_warp", "stream_upscale"]


def _drain(q, depth):
    while len(q) > depth:
        yield q.popleft().result()


def stream_warp(predictor, requests, out_hw, *, granularity: int = 0,
                depth: int = 2, geometry: str = "host"):
    """Pipelined homographic-warp serving.

    Args:
      predictor: a ``LutPredictor`` or ``NetPredictor``.
      requests: iterable of ``(img_hwc, matrix)`` — e.g. a video stream
        with per-frame homographies.
      out_hw: output size shared by the stream (one device program;
        with ``granularity>0`` even that is per-bucket, not per-shape).
      depth: max in-flight frames (bounds device queue + host memory).
      geometry: "device" streams through ``warp_device_async`` (rings
        computed in-program from the 3×3 inverse — nothing left for the
        pipeline to hide on the host side but the decode; the win is the
        vanished operand upload, README "Choosing a serving form").

    Yields ``(out_u8, mask)`` per request, in order.
    """
    if geometry not in ("host", "device"):
        raise ValueError(f"geometry={geometry!r}: must be 'host' or 'device'")
    use_dev = geometry == "device" and hasattr(predictor,
                                               "warp_device_async")
    q = deque()
    for img, matrix in requests:
        if use_dev:
            q.append(predictor.warp_device_async(img, matrix, out_hw,
                                                 granularity=granularity))
        else:
            q.append(predictor.warp_dynamic_async(img, matrix, out_hw,
                                                  granularity=granularity))
        yield from _drain(q, depth)
    yield from _drain(q, 0)


def stream_upscale(predictor, requests, *, granularity: int = 0,
                   depth: int = 2):
    """Pipelined arbitrary-scale SR serving.

    Args:
      requests: iterable of ``(img_hwc, scale_h, scale_w)`` — any scale
        per frame; no recompile on a scale change (and none on a shape
        change either within a bucket when ``granularity>0``).
      depth: max in-flight frames.

    Yields the uint8 HR frame per request, in order.
    """
    q = deque()
    for img, scale_h, scale_w in requests:
        q.append(predictor.upscale_dynamic_async(img, scale_h, scale_w,
                                                 granularity=granularity))
        yield from _drain(q, depth)
    yield from _drain(q, 0)
