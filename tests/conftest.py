"""Test harness: run every test on a virtual 8-device CPU mesh.

Mirrors the reference's oracle-based test strategy (SURVEY.md §4): kernels are
validated against NumPy oracles; sharding is validated on a CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count (no TPU required).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The hosted TPU plugin ignores JAX_PLATFORMS; force CPU via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # oracle parity at float64

assert jax.devices()[0].platform == "cpu", jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Long single-process runs accumulate tracing/executable caches that
    pathologically slow late XLA compiles (a fresh process compiles the
    same trainer program in ~80 s; at the tail of the full suite the same
    compile exceeded 35 min).  Dropping caches at module boundaries keeps
    compile times flat; each module re-pays only its own compiles."""
    yield
    import jax
    jax.clear_caches()
