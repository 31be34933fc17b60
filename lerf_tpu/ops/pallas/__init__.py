"""Pallas TPU kernels for the resampling hot paths."""

from .resize_kernel import steering_gaussian_resize_pallas

__all__ = ["steering_gaussian_resize_pallas"]
