"""Test harness config: run on a faked 8-device CPU mesh (SURVEY.md §4).

Must run before anything imports jax.
"""

import os

# NOTE: the environment's sitecustomize pre-imports jax and pins
# JAX_PLATFORMS=axon (the TPU tunnel). Backends initialize lazily, so
# overriding the config + XLA_FLAGS here (before first device use) still
# redirects the whole test session onto a faked 8-device CPU mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound live compiled-executable state across the (200+ test) suite.

    With the full suite's accumulated executables, XLA's CPU backend
    segfaults inside backend_compile on a later module's (individually
    healthy) jit — reproducibly at the same suite position, never in
    isolation. Clearing jax's caches at module boundaries bounds that
    state; cross-module cache reuse is minimal anyway (different shapes).
    """
    yield
    jax.clear_caches()
