"""Shared chained steady-state timer — re-export of the package helper
(lerf_tpu/utils/timing.py; methodology in BASELINE.md
"Timing-methodology note")."""
from lerf_tpu.utils.timing import chain_time  # noqa: F401
