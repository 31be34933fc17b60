"""Shared chained steady-state timer for the experiment scripts.

Same methodology as bench.py::chain_time (see BASELINE.md
"Timing-methodology note"): iteration k's input derives from iteration
k-1's output, so repeat-same-input artifacts cannot occur.
"""
import time

import jax


def chain_time(step, x0, warmup=3, iters=20):
    x = x0
    for _ in range(warmup):
        x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters
