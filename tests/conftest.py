"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device sharding paths (DP/TP/SP) are exercised in CI without TPU pods via
XLA host-platform device emulation, per SURVEY.md §4.
"""

import os

# Force CPU: the machine env pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so the env var alone is
# captured too early to override here — use jax.config.update instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# rbg PRNG compiles ~8x faster than threefry on CPU (dropout sites dominated
# the suite's jit time); randomness quality is ample for dropout/sampling
jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-executable memory at module boundaries.

    The full suite compiles thousands of XLA-CPU programs in one process;
    past ~135 tests the accumulated executables pushed RSS to where XLA's
    compiler segfaulted (reproducibly at test_builtin_grid_run in-sequence,
    never standalone). Dropping jit caches between modules bounds the
    resident set; within-module reuse (per-fold compiled-step cache etc.)
    is unaffected, cross-module shapes just retrace.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
