"""Test harness: CPU backend with 8 virtual devices + x64 for f64 golden refs.

Multi-chip paths run on a virtual CPU mesh (SURVEY.md §4 item 4) so
distributed code is exercised without TPU pods.
"""
import os

# The image pins JAX_PLATFORMS=axon (tunneled TPU); env overrides alone do
# not stick, so force the CPU backend through the config API below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent XLA compile cache: the suite is COMPILE-dominated (the top
# slab/molecular parity tests each spend 30-80 s compiling 8-device
# programs); caching compiled executables across runs cuts repeat full
# suites several-fold.  Keyed by HLO hash — safe across code changes.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_dir():
    return "/root/reference"
