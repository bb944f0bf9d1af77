"""Runtime sanitizers and profiling hooks (SURVEY.md §5).

The reference's only runtime sanitizer raises on a non-finite reward
(gym_art/quadrotor_multi/quadrotor_single.py:87-90: "Reward is not finite
... Debug this!").  Under jit we can't raise from traced code, so the
equivalents here are:

- `checked_env_step`: a `jax.experimental.checkify` wrapper of the env
  step that errors on non-finite rewards or positions; call
  `err.throw()` on the returned error to surface it host-side.
- `enable_debug_checks()`: turns on `jax_debug_nans` (XLA re-runs the
  offending op eagerly and raises at the op that produced the NaN) —
  the debug-mode used by `train.py --debug_checks=True`.
- `trace(dir)`: JAX profiler context; `train.py --profile_dir=...`
  wraps post-compile iterations in it and the trace is viewable in
  TensorBoard's profile plugin or Perfetto.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_env_step(cfg, params):
    """Returns a checkified (err, result) env step.

    Usage:
        step = checked_env_step(cfg, dyn)
        err, (state, obs, rew, done, info) = jax.jit(step)(state, actions, key)
        err.throw()   # raises ValueError host-side if a check failed
    """
    from quadswarm_tpu.env.multi import env_step

    def step(state, actions, key):
        out = env_step(cfg, params, state, actions, key)
        new_state, obs, rew, done, info = out
        checkify.check(jnp.all(jnp.isfinite(rew)),
                       "Reward is not finite. Debug this!")
        checkify.check(jnp.all(jnp.isfinite(new_state.dyn.pos)),
                       "Drone position is not finite. Debug this!")
        return out

    return checkify.checkify(step)


def enable_debug_checks() -> None:
    """Global NaN debugging: any NaN produced under jit raises with the
    producing op's traceback (replaces the reference's reward guard with
    coverage of every intermediate)."""
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX device profiler over the enclosed block (SURVEY §5: the
    reference has only ad-hoc time.time() probes; this captures a full
    per-op device timeline)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
