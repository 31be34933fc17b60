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


# ---------------------------------------------------------------------------
# Process-wide shared predictors (fast-tier trace budget)
# ---------------------------------------------------------------------------
# With XLA compiles persistently cached, the fast tier's remaining cost is
# JAX *trace* time, and each fresh predictor instance re-traces every
# serving program it touches (the jit caches are per-instance closures).
# Value-comparison tests therefore share ONE canonical predictor per form:
# identical banks/params => identical expected values, and programs traced
# by one test are free for the next — across files, since pytest runs the
# whole tier in one process.  Rules: (1) never mutate a shared predictor
# (fallback/monkeypatch tests build their own); (2) cache-count pins must
# be key-scoped, not len() — other tests' programs live in the same caches.

_SHARED = {}


def shared_lut_predictor(linear=False):
    """Canonical seed-7 random-bank LutPredictor (the bank the dynamic
    warp/resize/serving-engine suites already used)."""
    key = ("lut", linear)
    if key not in _SHARED:
        import numpy as np

        from lerf_tpu.lut.io import LUTBank
        from lerf_tpu.pipeline import LutPredictor

        rng = np.random.RandomState(7)
        l4 = 17 ** 4
        oc = 1 if linear else 3
        bank = LUTBank(
            stage1={m: rng.randint(-127, 128, (l4, 1)).astype(np.int8)
                    for m in "sct"},
            stage2={f"{m}r{r}": rng.randint(-127, 128, (l4, oc))
                    .astype(np.int8) for m in "sct" for r in (0, 1)},
            out_c=oc)
        _SHARED[key] = LutPredictor(bank, linear=linear)
    return _SHARED[key]


def shared_net_predictor():
    """Canonical micro-net (SRNet-form) predictor: nf=8, PRNGKey(0)."""
    if "net" not in _SHARED:
        from lerf_tpu.models import srnet
        from lerf_tpu.pipeline import NetPredictor

        params = srnet.init_lerf_nets(jax.random.PRNGKey(0), nf=8, out_c=3)
        _SHARED["net"] = NetPredictor.from_srnets(params)
    return _SHARED["net"]


def shared_imdn_predictor():
    """Canonical IMDN-form predictor: nf=12 (the reference's), PRNGKey(0)."""
    if "imdn" not in _SHARED:
        import jax.numpy as jnp

        from lerf_tpu.models.imdn import IMDN2
        from lerf_tpu.pipeline import NetPredictor

        model = IMDN2(in_c=3, out_c=3, nf=12)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 3)), 0)
        _SHARED["imdn"] = NetPredictor.from_imdn(model, variables, out_c=3)
    return _SHARED["imdn"]
