"""End-to-end PBT: a real (tiny) PBTRunner.train run that produces at least
one actual replacement + mutation event through the runner loop.

VERDICT round-1 gap: test_pbt_launcher covers mutation logic in isolation;
nothing proved a replacement fires end-to-end.  Here 3 policies train on a
short-episode env with the PBT period small enough that several rounds run;
replace_reward_gap=0 (+ tiny absolute floor, --pbt_replace_reward_gap_absolute)
makes any objective gap trigger replacement, and mutation_rate=1 makes the
adoption mutate every coefficient, so the event is observable in state.

Reference analogue: swarm_rl/runs/obstacles/pbt_quads_multi_obstacles.py:6-25
(SF PBT with pbt_period_env_steps / pbt_start_mutation / replace gap flags).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax


def test_pbt_replacement_event(tmp_path, capsys):
    import jax.numpy as jnp

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.pbt import PBTConfig, PBTRunner
    from quadswarm_tpu.parallel.ppo import PPOConfig

    env_cfg = EnvConfig(num_agents=2, ep_time=0.5, neighbor_visible_num=1,
                        quads_mode="static_same_goal", dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=8, batch_size=32, num_envs=2)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=1,
                        encoder_type="corl", neighbor_encoder_type="attention",
                        rnn_size=16, neighbor_hidden=16)
    pbt_cfg = PBTConfig(num_policies=3, period_env_steps=64, start_mutation=32,
                        replace_fraction=0.34, mutation_rate=1.0,
                        replace_reward_gap=0.0,
                        replace_reward_gap_absolute=1e-9)
    base = dict(quadcol_bin=5.0, quadcol_bin_smooth_max=10.0,
                quadcol_bin_obst=5.0)
    runner = PBTRunner(env_cfg, ppo_cfg, model, dyn, pbt_cfg, seed=0,
                       exp_dir=str(tmp_path), base_rew_coeff=dict(base))

    # each iteration = rollout * num_envs * num_agents = 32 env steps/policy;
    # ~20 iterations/policy => several episode boundaries (ep_len 51) and
    # multiple PBT rounds past start_mutation
    runner.train(3 * 640, log_every=5)

    out = capsys.readouterr().out
    assert "PBT: policy" in out, f"no replacement fired:\n{out[-2000:]}"

    # the replaced policy adopted a donor's params (bitwise) and mutated the
    # shaping coefficients away from the shared base (mutation_rate=1)
    mutated = [p for p in runner.policies
               if p.trainer.base_rew_coeff != base]
    assert mutated, "replacement must mutate the adoptee's reward shaping"

    # checkpoints for every policy written at the end of train()
    for p in range(3):
        cp_dir = os.path.join(str(tmp_path), f"checkpoint_p{p}")
        assert os.path.isdir(cp_dir) and os.listdir(cp_dir), cp_dir
        assert os.path.exists(os.path.join(str(tmp_path), f"p{p}",
                                           "metrics.jsonl"))
