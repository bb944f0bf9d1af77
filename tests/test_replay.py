"""Collision replay buffer tests (reference: TestReplayBuffer in
tests/test_multi_env.py:99-120 — wrapper self-consistency over many steps,
plus checkpoint/replay semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig, env_reset
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.env.replay import init_replay_state, replay_step


def test_replay_wrapper_runs_and_replays():
    """Force a mid-air collision after the grace period; the pre-collision
    checkpoint must land in the buffer and the next episode must replay it
    (sample_prob=1)."""
    cfg = EnvConfig(num_agents=2, ep_time=4.0, neighbor_obs_type="pos_vel",
                    neighbor_visible_num=1, quads_mode="static_same_goal",
                    dtype=jnp.float32)
    params = DynamicsParams.from_model(crazyflie_params(), dt=cfg.dt).astype(np.float32)
    key = jax.random.PRNGKey(0)
    key, rk = jax.random.split(key)
    state, obs = env_reset(cfg, params, rk)
    rstate = init_replay_state(state)
    # Force-activate the buffer so replay logic is exercised quickly
    rstate = rstate.replace(activated=jnp.asarray(True))

    step = jax.jit(lambda s, r, a, k: replay_step(cfg, params, 1.0, s, r, a, k))
    saw_buffer_entry = False
    saw_replay = False
    for t in range(440):  # ep_len = 400 ticks, so one full episode + reset
        key, ak, sk = jax.random.split(key, 3)
        actions = jax.random.uniform(ak, (2, 4), cfg.dtype, -1.0, 1.0)
        if t == 170 and not saw_buffer_entry:
            # Teleport the drones together mid-air -> guaranteed collision
            pos = jnp.asarray([[0.0, 0.0, 3.0], [0.05, 0.0, 3.0]], cfg.dtype)
            state = state.replace(dyn=state.dyn.replace(pos=pos))
        state, rstate, obs, rew, dones, info = step(state, rstate, actions, sk)
        assert jnp.all(jnp.isfinite(obs))
        if int(rstate.buffer_count) > 0:
            saw_buffer_entry = True
        if bool(rstate.saved_in_replay_buffer):
            saw_replay = True
    assert saw_buffer_entry, "no checkpoint was ever written to the buffer"
    assert saw_replay, "no episode was replayed despite sample_prob=1"


def test_can_fly_gate():
    cfg = EnvConfig(num_agents=1, ep_time=0.2, neighbor_obs_type="none",
                    quads_mode="static_same_goal", dtype=jnp.float32)
    params = DynamicsParams.from_model(crazyflie_params(), dt=cfg.dt).astype(np.float32)
    key = jax.random.PRNGKey(1)
    key, rk = jax.random.split(key)
    state, obs = env_reset(cfg, params, rk)
    rstate = init_replay_state(state)
    step = jax.jit(lambda s, r, a, k: replay_step(cfg, params, 0.75, s, r, a, k))
    # Hover-ish actions (zero -> mid thrust) keep the drone off the floor
    for t in range(300):
        key, sk = jax.random.split(key)
        actions = 0.25 * jnp.ones((1, 4), cfg.dtype)
        state, rstate, obs, rew, dones, info = step(state, rstate, actions, sk)
    assert int(rstate.episode_count) >= 10
    assert bool(rstate.activated), "gate should open after 10 low-crash episodes"
