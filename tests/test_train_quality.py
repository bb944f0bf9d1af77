"""Train-quality regression gate (VERDICT r1 #9).

A fixed-budget, fixed-seed PPO run on the single-drone hover task must
reach a distance-to-goal floor — so future perf work on the learner or env
cannot silently break learning.  Metric definitions mirror the reference's
episode stats (gym_art/quadrotor_multi/quadrotor_multi.py:625-718).

Calibration (CPU, jax 0.9, seed 0): random policy holds d5 ~= 2.4 m; the
curve dips to ~4.1 m around 1.8M steps, then collapses to 0.84-1.0 m by
2.7-3M steps with true_reward ~= -2.1.  The assertions below leave ~50%
margin on both.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer


@pytest.mark.slow
def test_ppo_learns_hover_to_goal():
    env_cfg = EnvConfig(num_agents=1, ep_time=5.0, neighbor_obs_type="none",
                        neighbor_visible_num=0, quads_mode="static_same_goal",
                        dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=64, batch_size=512, num_envs=32,
                        learning_rate=3e-4, num_epochs=4)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=0,
                        encoder_type="corl", neighbor_encoder_type="no_encoder",
                        rnn_size=64, neighbor_hidden=64)
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0)

    first_window, last_window = [], []
    for it in range(1, 1501):
        _, infos = trainer.iteration()
        infos = jax.device_get(infos)
        done = np.asarray(infos["episode_done"], bool)
        if not done.any():
            continue
        d5 = float(np.mean(np.asarray(infos["distance_to_goal_5s"])[done]))
        tr = float(np.mean(np.asarray(infos["true_reward"])[done]))
        if len(first_window) < 20:
            first_window.append(d5)
        last_window.append((d5, tr))
        del last_window[:-20]

    d5_start = float(np.mean(first_window))
    d5_end = float(np.mean([x[0] for x in last_window]))
    tr_end = float(np.mean([x[1] for x in last_window]))
    assert trainer.env_steps >= 3_000_000
    # Random policy: ~2.4 m.  Trained: ~0.9 m.  Gate at 1.5 m.
    assert d5_end < 1.5, (d5_start, d5_end, tr_end)
    assert d5_end < 0.75 * d5_start, (d5_start, d5_end)
    assert tr_end > -4.0, tr_end
