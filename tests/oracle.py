"""Test oracle: run the (read-only) reference implementation for parity checks.

The reference tree at /root/reference is imported in-place — never copied.
Tests that need it are skipped when it is absent.
"""
import sys

import pytest

from conftest import REFERENCE_ROOT, has_reference

requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not available")


def _ensure_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def ref_resize_numpy():
    _ensure_path()
    import resize_right.resize_right2d_numpy as m
    return m


def ref_interp_methods():
    _ensure_path()
    import resize_right.interp_methods as m
    return m


def ref_four_simplex():
    _ensure_path()
    from resample.eval_lut_sr import FourSimplexInterpFaster
    return FourSimplexInterpFaster


def ref_utils():
    _ensure_path()
    import common.utils as m
    return m
