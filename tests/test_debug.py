"""Runtime sanitizers (SURVEY §5): the checkified env step catches
non-finite state like the reference's reward guard
(quadrotor_single.py:87-90) — but under jit, via checkify errors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.env.multi import EnvConfig, env_reset
from quadswarm_tpu.env.params import make_dynamics_params
from quadswarm_tpu.utils.debug import checked_env_step


def test_checked_step_passes_on_healthy_state():
    cfg = EnvConfig(num_agents=2, ep_time=1.0, quads_mode="static_same_goal",
                    dtype=jnp.float32)
    dyn = make_dynamics_params()
    state, obs = env_reset(cfg, dyn, jax.random.PRNGKey(0))
    step = jax.jit(checked_env_step(cfg, dyn))
    err, (state, obs, rew, done, info) = step(
        state, jnp.zeros((2, 4), jnp.float32), jax.random.PRNGKey(1))
    err.throw()  # no error
    assert np.all(np.isfinite(np.asarray(rew)))


def test_checked_step_raises_on_nan_position():
    cfg = EnvConfig(num_agents=2, ep_time=1.0, quads_mode="static_same_goal",
                    dtype=jnp.float32)
    dyn = make_dynamics_params()
    state, obs = env_reset(cfg, dyn, jax.random.PRNGKey(0))
    bad = state.replace(dyn=state.dyn.replace(
        pos=jnp.full_like(state.dyn.pos, jnp.nan)))
    step = jax.jit(checked_env_step(cfg, dyn))
    err, _ = step(bad, jnp.zeros((2, 4), jnp.float32), jax.random.PRNGKey(1))
    with pytest.raises(Exception, match="Debug this"):
        err.throw()
