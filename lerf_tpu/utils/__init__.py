"""Metrics, color conversion, logging and image I/O utilities."""
