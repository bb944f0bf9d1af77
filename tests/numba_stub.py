"""Minimal `numba` stand-in so the REFERENCE simulator's pure-Python paths
import in this image (numba is not installed; the reference decorates its
NumPy code with @njit but the un-jitted functions are plain Python).

Installing this makes /root/reference/gym_art importable with
`use_numba=False`, enabling TRUE seed-matched parity tests of our JAX
kernels against the actual reference implementation (not a re-stated
oracle).  Only the API surface the reference imports is provided
(numba_utils.py:3-6, quad_utils.py:3-4, sensor_noise.py:6).
"""
from __future__ import annotations

import sys
import types as _types


class _NumbaType:
    """Stands in for numba scalar types: supports float32[:], calls, etc."""

    def __getitem__(self, item):
        return self

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _NumbaType()


def _passthrough_decorator(*args, **kwargs):
    """@njit / @njit("sig") / njit()(fn) / @vectorize(...) -> identity."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


def install() -> None:
    if "numba" in sys.modules:
        return

    numba = _types.ModuleType("numba")
    numba.njit = _passthrough_decorator
    numba.jit = _passthrough_decorator
    numba.vectorize = _passthrough_decorator
    numba.types = _NumbaType()
    for name in ("int32", "int64", "float32", "float64", "double", "boolean"):
        setattr(numba, name, _NumbaType())

    core = _types.ModuleType("numba.core")
    errors = _types.ModuleType("numba.core.errors")

    class TypingError(Exception):
        pass

    errors.TypingError = TypingError
    core.errors = errors

    extending = _types.ModuleType("numba.extending")
    # overload(target) always returns a decorator that swallows the impl
    # (the pure-python target itself is used at runtime)
    extending.overload = lambda *a, **k: (lambda fn: fn)

    experimental = _types.ModuleType("numba.experimental")
    experimental.jitclass = _passthrough_decorator

    numba.core = core
    numba.extending = extending
    numba.experimental = experimental

    sys.modules["numba"] = numba
    sys.modules["numba.core"] = core
    sys.modules["numba.core.errors"] = errors
    sys.modules["numba.extending"] = extending
    sys.modules["numba.experimental"] = experimental


def import_reference():
    """Install the stub, put /root/reference on sys.path, return gym_art's
    quadrotor_dynamics + quad_models modules (skip if absent)."""
    import os

    import pytest

    if not os.path.isdir("/root/reference/gym_art"):
        pytest.skip("reference checkout not available")
    install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from gym_art.quadrotor_multi import quad_models, quadrotor_dynamics
    return quadrotor_dynamics, quad_models
