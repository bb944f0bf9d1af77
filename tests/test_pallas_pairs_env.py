"""Integration parity: the Pallas pair-kernel env path vs the XLA path.

The large-swarm path (EnvConfig.use_pallas_pairs) swaps the O(N^2) collision
stage and the k-nearest neighbor obs for fused Pallas kernels
(ops/pallas/swarm_interactions.py) inside batched_env_step /
batched_replay_step, and stores the pair history packed.  These tests step
both configurations in lockstep (interpret-mode kernels on CPU) and require
matching trajectories, rewards and collision bookkeeping.

Reference semantics under test: collision stage
gym_art/quadrotor_multi/quadrotor_multi.py:427-446 + collisions/quadrotors.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.env.multi import EnvConfig, batched_env_step, env_reset, env_step
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.ops.pallas.swarm_interactions import pack_pairs, unpack_pairs

E, N, STEPS = 2, 8, 6


def _dyn(cfg):
    return DynamicsParams.from_model(crazyflie_params(),
                                     dt=cfg.dt).astype(np.float32)


def _run(cfg, steps=STEPS):
    dyn = _dyn(cfg)
    key = jax.random.PRNGKey(0)
    ek = jax.random.split(key, E)
    step = jax.jit(partial(batched_env_step, cfg, dyn))
    st, obs = jax.vmap(lambda k: env_reset(cfg, dyn, k))(ek)
    outs = []
    for t in range(steps):
        acts = jax.random.uniform(jax.random.fold_in(key, t), (E, N, 4),
                                  minval=-1.0, maxval=1.0)
        sk = jax.vmap(lambda k: jax.random.fold_in(k, t))(ek)
        st, obs, rew, dones, info = step(st, acts, sk)
        outs.append((np.asarray(obs), np.asarray(rew),
                     np.asarray(info["num_collisions"])))
    return st, outs


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(3)
    pairs = jax.random.bernoulli(key, 0.3, (17, 17))
    pairs = pairs & ~jnp.eye(17, dtype=bool)
    np.testing.assert_array_equal(unpack_pairs(pack_pairs(pairs), 17), pairs)


def test_batched_env_parity_pallas_pairs():
    kw = dict(num_agents=N, neighbor_visible_num=2, ep_time=4.0)
    st_x, outs_x = _run(EnvConfig(**kw))
    st_p, outs_p = _run(EnvConfig(**kw, use_pallas_pairs=True))
    for t, ((ox, rx, cx), (op_, rp, cp)) in enumerate(zip(outs_x, outs_p)):
        np.testing.assert_allclose(ox, op_, atol=2e-5, err_msg=f"obs tick {t}")
        np.testing.assert_allclose(rx, rp, atol=2e-5, err_msg=f"rew tick {t}")
        np.testing.assert_array_equal(cx, cp, err_msg=f"collisions tick {t}")
    np.testing.assert_allclose(np.asarray(st_x.dyn.pos),
                               np.asarray(st_p.dyn.pos), atol=1e-5)


def test_single_env_packed_fallback():
    """env_step without pairs_override on a use_pallas_pairs config (the
    gym_api / enjoy path) must match the plain config step-for-step."""
    kw = dict(num_agents=N, neighbor_visible_num=2, ep_time=4.0)
    cfg_x, cfg_p = EnvConfig(**kw), EnvConfig(**kw, use_pallas_pairs=True)
    dyn = _dyn(cfg_x)
    key = jax.random.PRNGKey(1)

    def roll(cfg):
        st, obs = env_reset(cfg, dyn, key)
        step = jax.jit(partial(env_step, cfg, dyn))
        for t in range(STEPS):
            acts = jax.random.uniform(jax.random.fold_in(key, t), (N, 4),
                                      minval=-1.0, maxval=1.0)
            st, obs, rew, dones, info = step(st, acts,
                                             jax.random.fold_in(key, 100 + t))
        return st, obs

    st_x, obs_x = roll(cfg_x)
    st_p, obs_p = roll(cfg_p)
    np.testing.assert_allclose(np.asarray(obs_x), np.asarray(obs_p), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(unpack_pairs(st_p.prev_coll_pairs, N)),
        np.asarray(st_x.prev_coll_pairs))
