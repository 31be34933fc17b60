"""Serving runtime: pipelined streaming over the dynamic (recompile-free)
deploy forms (:mod:`lerf_tpu.serve.engine`), plus the HTTP daemon
(:mod:`lerf_tpu.serve.httpd`, CLI ``python -m lerf_tpu.cli.serve``)."""
from .engine import stream_upscale, stream_warp
from .httpd import make_server

__all__ = ["stream_warp", "stream_upscale", "make_server"]
