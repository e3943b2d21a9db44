"""Test harness: force an 8-device virtual CPU mesh before any JAX use.

This replaces the reference's single-process _AllToAll→identity monkey-patch
trick (reference: utils/UniMoE_Audio_utils.py:332-335,426-429) with JAX's
standard fake-multichip mechanism, so EP/DP sharding paths are exercised for
real in CI without TPU hardware.

Note: the environment pins jax_platforms via plugin config, so the env var
alone is not enough — we must call jax.config.update before first device use.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) >= 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated compiled-program state across the (large) suite.

    With ~180 tests in one process the retained XLA executables/compile
    caches eventually destabilize the CPU client (observed: segfault
    during vjp tracing at ~the 170th test; every file passes in
    isolation).  Dropping caches at module boundaries keeps intra-file
    jit reuse while bounding native state.
    """
    yield
    jax.clear_caches()
