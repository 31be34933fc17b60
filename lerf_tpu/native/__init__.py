"""Native (C) host-precompute kernels, compiled on demand.

The dynamic serving forms ship their geometry as traced data, which moves
the per-call cost to a host-side float64 precompute; numpy's per-op
dispatch caps that at ~25 elementwise passes per frame.  These single-pass
C loops remove that ceiling while keeping the float64 arithmetic
bit-identical to the numpy path (see warp_precompute.c header).

Build model: one `cc -O3 -march=native -shared` invocation at first use,
cached under ``~/.cache/lerf_tpu_native/`` keyed by the source hash — no
build system, no install step.  Anything failing (no compiler, sandbox,
exotic platform) degrades to the numpy fused path; correctness never
depends on the native library (tests assert bit-equality when it IS
available).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "warp_precompute.c")
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "lerf_tpu_native")
_lib = None
_tried = False


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = os.path.join(_CACHE, f"warp_precompute_{tag}.so")
    if os.path.exists(so):
        return so
    os.makedirs(_CACHE, exist_ok=True)
    cc = os.environ.get("CC", "cc")
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "out.so")
        subprocess.run(
            [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp,
             _SRC, "-lm", "-pthread"],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


def get_warp_lib():
    """ctypes handle with argtypes set, or None when no toolchain exists
    (callers fall back to the numpy fused path)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LERF_TPU_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_build())
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        fn = lib.warp_operands_fused
        fn.restype = ctypes.c_int
        fn.argtypes = [f64p] + [ctypes.c_int64] * 9 + [ctypes.c_int] * 2 + \
            [i32p, f32p, f32p, u8p,
             ctypes.c_void_p, ctypes.c_void_p,
             ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_threads() -> int:
    """Worker count for the row-parallel kernels: ``LERF_NATIVE_THREADS``
    if set, else one per visible CPU.  Rows partition disjointly, so the
    result is bit-equal for every thread count (asserted in
    tests/test_dynamic_warp.py::test_native_threaded_bit_equal)."""
    env = os.environ.get("LERF_NATIVE_THREADS", "")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 1)
