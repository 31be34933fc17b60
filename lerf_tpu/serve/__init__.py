"""Serving runtime: pipelined streaming over the dynamic (recompile-free)
deploy forms.  See :mod:`lerf_tpu.serve.engine`."""
from .engine import stream_upscale, stream_warp

__all__ = ["stream_warp", "stream_upscale"]
