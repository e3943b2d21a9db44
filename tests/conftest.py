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

# Persistent compilation cache: the per-module jax.clear_caches() below
# (segfault workaround) makes the suite recompile the same programs many
# times; a disk cache cuts a warm full run roughly in half (measured
# 83 s -> 33 s on tests/test_kv_int8.py).  Opt out: UNIMOE_NO_COMPILE_CACHE=1.
if not os.environ.get("UNIMOE_NO_COMPILE_CACHE"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unimoe_jax_cache")
    # The XLA:CPU AOT loader logs a benign machine-feature-mismatch ERROR
    # (+prefer-no-scatter/gather pseudo-features) for every cache hit —
    # silence the C++ log; Python exceptions still surface normally.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

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
