"""Chained steady-state timing — the one benchmarking methodology.

Repeat-same-input loops on this stack can report physically impossible
times (below the HBM write time of the output — BASELINE.md
"Timing-methodology note").  ``chain_time`` makes every iteration's work
unavoidable: iteration k's input is derived from iteration k-1's output
inside ``step``.  Used by bench.py and every tools/exp_* script.
"""
import time

import jax


def chain_time(step, x0, warmup=3, iters=20):
    """Steady-state seconds/iter on a serial dependency chain."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters
