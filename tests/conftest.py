"""Test configuration: run on a virtual 8-device CPU mesh so sharding tests
work without TPU hardware, with deterministic seeds. Must set XLA flags
before jax initializes."""

import os

# Hard-set (not setdefault): the surrounding environment pins
# JAX_PLATFORMS=axon (remote TPU tunnel), which would make unit tests both
# slow (RPC per dispatch) and imprecise (bf16 default matmul).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") during registration, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Work around an in-process jaxlib 0.9.0 CPU-backend crash: after many
    hundreds of compiled programs accumulate in one process, the NEXT
    interpret-mode Pallas compile segfaults inside XLA
    (reproduced deterministically at tests/test_pallas_ops.py::
    test_matches_dense_reference when run after the 12 preceding test
    files; each file passes in isolation). Dropping compiled-program
    caches at module boundaries keeps the per-process executable count
    bounded. Costs recompiles of the handful of programs shared across
    modules.

    The eval harnesses track which programs they already compiled+warmed
    (module-level _WARMED sets) so recompiles never land inside their
    timed regions — clearing the compiled caches without clearing those
    sets would silently put a recompile back into time_s/pairs_per_s."""
    jax.clear_caches()
    from psulvsb_tpu.eval import batch_harness, realdata

    batch_harness._WARMED.clear()
    realdata._WARMED.clear()
    yield
