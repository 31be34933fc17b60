"""Chained steady-state timing — the one benchmarking methodology.

Repeat-same-input loops on this stack can report physically impossible
times (below the HBM write time of the output — BASELINE.md
"Timing-methodology note").  ``chain_time`` makes every iteration's work
unavoidable: iteration k's input is derived from iteration k-1's output
inside ``step``.  Used by bench.py and every tools/exp_* script.
"""
import time

import jax


def _spec(x):
    return jax.tree.map(lambda a: (getattr(a, "shape", None),
                                   getattr(a, "dtype", None)), x)


def chain_time(step, x0, warmup=3, iters=20):
    """Steady-state seconds/iter on a serial dependency chain.

    Asserts the chain is SHAPE-STABLE: ``step`` must return the input
    spec, or every iteration silently re-traces a new program and the
    "steady state" is a compile loop (the round-4 shrinking-downscale
    artifact, BASELINE.md round-4 notes — downscale chains must tile
    their smaller output back up to the input shape)."""
    want = _spec(x0)
    x = x0
    for _ in range(warmup):
        x = step(x)
        got = _spec(x)
        assert got == want, (
            f"chain not shape-stable: step({want}) -> {got}; a shrinking/"
            f"growing chain re-traces every iteration (see BASELINE.md "
            f"timing-methodology note)")
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters
