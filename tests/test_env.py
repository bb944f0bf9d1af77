"""Integration tests for the batched multi-agent env.

Mirrors the reference's env integration test
(gym_art/quadrotor_multi/tests/test_multi_env.py): construct, step with
random actions, check shapes/dtypes/finiteness, exercise every scenario mode
and the auto-reset path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.env.multi import EnvConfig, env_reset, env_step
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.env.scenarios import MODES


def make_env(dtype=jnp.float64, **kwargs):
    cfg = EnvConfig(dtype=dtype, **kwargs)
    params = DynamicsParams.from_model(crazyflie_params(), dt=cfg.dt)
    if dtype == jnp.float64:
        params = params.astype(np.float64)
    else:
        params = params.astype(np.float32)
    return cfg, params


def rollout(cfg, params, steps, seed=0):
    key = jax.random.PRNGKey(seed)
    key, rk = jax.random.split(key)
    state, obs = env_reset(cfg, params, rk)
    step = jax.jit(lambda s, a, k: env_step(cfg, params, s, a, k))
    all_obs, all_rew = [], []
    for t in range(steps):
        key, ak, sk = jax.random.split(key, 3)
        actions = jax.random.uniform(ak, (cfg.num_agents, cfg.action_dim),
                                     cfg.dtype, -1.0, 1.0)
        state, obs, rew, done, info = step(state, actions, sk)
        all_obs.append(obs)
        all_rew.append(rew)
    return state, jnp.stack(all_obs), jnp.stack(all_rew), info


def test_basic_multi_env_100_steps():
    cfg, params = make_env(num_agents=8, quads_mode="static_same_goal")
    state, obs, rew, info = rollout(cfg, params, 100)
    assert obs.shape == (100, 8, cfg.obs_dim)
    assert cfg.obs_dim == 18 + 7 * 6
    assert jnp.all(jnp.isfinite(obs))
    assert jnp.all(jnp.isfinite(rew))
    assert int(state.tick) == 100


def test_single_agent_env():
    cfg, params = make_env(num_agents=1, neighbor_obs_type="none",
                           quads_mode="static_same_goal")
    state, obs, rew, info = rollout(cfg, params, 50)
    assert obs.shape == (50, 1, 18)
    assert jnp.all(jnp.isfinite(obs))


def test_obstacle_env():
    cfg, params = make_env(num_agents=4, use_obstacles=True,
                           obs_repr="xyz_vxyz_R_omega_wall",
                           quads_mode="o_random")
    state, obs, rew, info = rollout(cfg, params, 50)
    assert cfg.obs_dim == 24 + 3 * 6 + 9
    assert obs.shape == (50, 4, cfg.obs_dim)
    assert jnp.all(jnp.isfinite(obs))
    # some obstacles must be active at 0.2 density on a 6x6 grid
    assert int(jnp.sum(state.obst_active)) == int(0.2 * 36)


def _run_modes(cfg, params, mode_ids, steps=30, seed=3):
    """Exercise many scenario modes with ONE compiled reset/step pair — the
    mode id is runtime data, so all modes share the same XLA program."""
    from quadswarm_tpu.env.multi import env_reset
    reset = jax.jit(lambda k, m: env_reset(cfg, params, k, mode=m))
    step = jax.jit(lambda s, a, k: env_step(cfg, params, s, a, k))
    for mode_id in mode_ids:
        key = jax.random.PRNGKey(seed + mode_id)
        key, rk = jax.random.split(key)
        state, obs = reset(rk, jnp.int32(mode_id))
        for t in range(steps):
            key, ak, sk = jax.random.split(key, 3)
            actions = jax.random.uniform(
                ak, (cfg.num_agents, cfg.action_dim), cfg.dtype, -1.0, 1.0)
            state, obs, rew, done, info = step(state, actions, sk)
        assert jnp.all(jnp.isfinite(obs)), MODES[mode_id]
        assert jnp.all(jnp.isfinite(rew)), MODES[mode_id]
        assert int(state.scenario.mode) == mode_id


def test_all_free_space_modes():
    cfg, params = make_env(num_agents=4, quads_mode="mix")
    _run_modes(cfg, params,
               [i for i, m in enumerate(MODES) if not m.startswith("o_")])


def test_all_obstacle_modes():
    cfg, params = make_env(num_agents=4, use_obstacles=True, quads_mode="mix")
    _run_modes(cfg, params,
               [i for i, m in enumerate(MODES) if m.startswith("o_")], seed=4)


def test_mix_mode_and_downwash():
    cfg, params = make_env(num_agents=4, quads_mode="mix", use_downwash=True)
    state, obs, rew, info = rollout(cfg, params, 30, seed=5)
    assert jnp.all(jnp.isfinite(obs))


def test_auto_reset():
    cfg, params = make_env(num_agents=2, ep_time=0.25,
                           quads_mode="static_same_goal")
    # ep_len = 0.25 * 100 = 25 -> done at tick 26
    key = jax.random.PRNGKey(0)
    state, obs = env_reset(cfg, params, key)
    step = jax.jit(lambda s, a, k: env_step(cfg, params, s, a, k))
    done_seen = False
    for t in range(60):
        key, ak, sk = jax.random.split(key, 3)
        actions = jnp.zeros((2, 4), cfg.dtype)
        state, obs, rew, done, info = step(state, actions, sk)
        if bool(done[0]):
            done_seen = True
            assert int(state.tick) == 0  # auto-reset
    assert done_seen


def test_goal_distance_decreases_with_hover_oracle():
    """Mellinger oracle flies toward a static goal — sanity check that the
    whole closed loop (dynamics + controller + env) behaves physically."""
    from quadswarm_tpu.env.controls import mellinger_control, quadrotor_jacobian
    cfg, params = make_env(num_agents=1, neighbor_obs_type="none",
                           use_sensor_noise=False,
                           quads_mode="static_same_goal")
    j_inv = jnp.asarray(np.linalg.inv(quadrotor_jacobian(params)), cfg.dtype)
    key = jax.random.PRNGKey(7)
    state, obs = env_reset(cfg, params, key)
    goal = state.scenario.goals
    d0 = float(jnp.linalg.norm(state.dyn.pos - goal))

    def policy(state):
        return mellinger_control(
            j_inv, state.dyn.pos, state.dyn.vel, state.dyn.rot, state.dyn.omega,
            state.scenario.goals) * 2.0 - 1.0  # invert raw-control mapping

    step = jax.jit(lambda s, a, k: env_step(cfg, params, s, a, k))
    for t in range(300):
        key, sk = jax.random.split(key)
        state, obs, rew, done, info = step(state, policy(state), sk)
    d1 = float(jnp.linalg.norm(state.dyn.pos - state.scenario.goals))
    assert d1 < d0, (d0, d1)
    assert d1 < 0.5, d1


def test_per_drone_randomized_dynamics():
    """Domain-randomized fleet: stacked per-drone params drive the vmapped
    dynamics; different masses must produce different trajectories."""
    from quadswarm_tpu.env.params import make_dynamics_params
    cfg = EnvConfig(num_agents=4, neighbor_obs_type="pos_vel",
                    neighbor_visible_num=1, quads_mode="static_same_goal",
                    use_sensor_noise=False, dtype=jnp.float64)
    params = make_dynamics_params(
        quad="Crazyflie",
        dyn_sampler_1={"class": "RelativeSampler", "noise_ratio": 0.2,
                       "sampler": "normal"},
        num_agents=4, per_drone=True, dt=cfg.dt, seed=1, dtype=np.float64)
    assert np.asarray(params.mass).shape == (4,)
    assert len(np.unique(np.asarray(params.mass))) == 4

    key = jax.random.PRNGKey(0)
    key, rk = jax.random.split(key)
    state, obs = env_reset(cfg, params, rk)
    # identical spawn + identical actions -> different dynamics separate them
    pos0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (4, 3))
    state = state.replace(dyn=state.dyn.replace(
        pos=pos0, vel=jnp.zeros((4, 3)), omega=jnp.zeros((4, 3)),
        rot=jnp.broadcast_to(jnp.eye(3), (4, 3, 3))))
    step = jax.jit(lambda s, a, k: env_step(cfg, params, s, a, k))
    for t in range(20):
        key, sk = jax.random.split(key)
        state, obs, rew, done, info = step(state, 0.2 * jnp.ones((4, 4)), sk)
    z = np.asarray(state.dyn.pos[:, 2])
    assert len(np.unique(np.round(z, 6))) > 1, z
