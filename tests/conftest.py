import os
import sys

# Tests run on a virtual 8-device CPU mesh for determinism and to exercise
# multi-chip sharding without TPU hardware.  Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin registers itself from sitecustomize and overrides
# JAX_PLATFORMS; forcing the config after import wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# CPU compiles dominate suite wall-clock (shard_map pipelines and the
# per-geometry resample graphs take minutes each); the persistent cache
# makes re-runs compile-free.
from lerf_tpu.config import enable_jit_cache  # noqa: E402

enable_jit_cache()

REFERENCE_ROOT = "/root/reference"


def require_tpu():
    """For LERF_TPU_TESTS-gated hardware tests: undo the CPU force and skip
    unless a real TPU is visible."""
    import pytest
    try:
        jax.config.update("jax_platforms", "")
        if jax.devices()[0].platform == "cpu":
            pytest.skip("no TPU visible")
    except RuntimeError as e:
        pytest.skip(f"cannot switch backend mid-session: {e}")


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "resample"))
