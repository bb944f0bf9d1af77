"""PBT orchestration + experiment launcher tests.

Reference analogue: SF PBT config (runs/obstacles/pbt_quads_multi_obstacles.py)
and the SF launcher consumed by swarm_rl/runs/**.
"""
import numpy as np

from quadswarm_tpu.runs.launcher import Experiment, ParamGrid, RunDescription


def test_param_grid_expansion_and_commands():
    grid = ParamGrid([("seed", [0, 1]), ("quads_obst_density", [0.2, 0.4])])
    exp = Experiment("base", "python -m quadswarm_tpu.training.train",
                     grid.generate_params())
    rd = RunDescription("grid_run", [exp])
    cmds = list(rd.commands("td"))
    assert len(cmds) == 4
    names = [n for n, _ in cmds]
    assert len(set(names)) == 4          # unique experiment names
    assert all("--train_dir=td" in c for _, c in cmds)
    assert any("--seed=1" in c and "--quads_obst_density=0.4" in c
               for _, c in cmds)


def test_launcher_dry_backend(capsys):
    from quadswarm_tpu.runs.launcher import main
    rc = main(["--run=quadswarm_tpu.runs.quad_multi_mix_baseline",
               "--backend=dry", "--train_dir=/tmp/launcher_dry"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "experiments" in out and "--experiment=" in out


def test_pbt_replaces_weaker_policy(tmp_path):
    """Two-policy population: after a forced PBT round, the weaker policy
    adopts the stronger policy's params with (possibly mutated) coeffs."""
    import jax

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.pbt import PBTConfig, PBTRunner
    from quadswarm_tpu.parallel.ppo import PPOConfig

    env_cfg = EnvConfig(num_agents=2, ep_time=1.0)
    ppo_cfg = PPOConfig(num_envs=4, rollout=8, batch_size=16, num_epochs=1)
    model = ActorCritic(action_dim=4, self_obs_dim=18, neighbor_obs_dim=6,
                        num_neighbors=1, rnn_size=32, neighbor_hidden=16)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    runner = PBTRunner(env_cfg, ppo_cfg, model, dyn,
                       PBTConfig(num_policies=2, period_env_steps=1,
                                 start_mutation=0, replace_fraction=0.5,
                                 replace_reward_gap=0.0),
                       exp_dir=str(tmp_path))
    # Seed objectives manually: policy 0 strong, policy 1 weak
    runner.policies[0].recent_true_rewards = [100.0] * 10
    runner.policies[1].recent_true_rewards = [-100.0] * 10
    p0 = jax.device_get(runner.policies[0].trainer.train_state.params)
    runner._pbt_round()
    p1 = jax.device_get(runner.policies[1].trainer.train_state.params)
    chex_equal = jax.tree.map(lambda a, b: bool(np.allclose(a, b)), p0, p1)
    assert all(jax.tree.leaves(chex_equal)), "weak policy should copy strong"
    assert runner.policies[1].recent_true_rewards == []


def test_pbt_short_training_run(tmp_path):
    """End-to-end micro PBT training: 2 policies, a few iterations, writes
    per-policy metrics and checkpoints."""
    import os

    import numpy as np

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.pbt import PBTConfig, PBTRunner
    from quadswarm_tpu.parallel.ppo import PPOConfig

    env_cfg = EnvConfig(num_agents=2, ep_time=1.0)
    ppo_cfg = PPOConfig(num_envs=4, rollout=8, batch_size=16, num_epochs=1)
    model = ActorCritic(action_dim=4, self_obs_dim=18, neighbor_obs_dim=6,
                        num_neighbors=1, rnn_size=32, neighbor_hidden=16)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    runner = PBTRunner(env_cfg, ppo_cfg, model, dyn,
                       PBTConfig(num_policies=2, period_env_steps=10_000_000,
                                 start_mutation=10_000_000),
                       exp_dir=str(tmp_path))
    runner.train(total_env_steps=128, log_every=1)
    assert runner.total_env_steps >= 128
    assert os.path.exists(os.path.join(str(tmp_path), "p0", "metrics.jsonl"))
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoint_p0"))


RUN_MODULES = [
    "quad_multi_mix_baseline", "quad_multi_mix_baseline_attn_8",
    "single_quad_baseline", "single_quad", "pbt_quads_multi_obstacles",
    "obstacles.quads_multi_obstacles", "obstacles.obst_density_random",
    "obstacles.obst_size_random", "obstacles.obst_domain_random",
    "obstacles.quads_multi_obstacles_nei_encoder_search",
]


def test_all_run_descriptions_parse():
    """Every run description expands to commands whose flags are all
    accepted by the training CLI parser (reference run-file parity:
    swarm_rl/runs/** — SURVEY.md §2 #31)."""
    import importlib
    import shlex

    from quadswarm_tpu.training.config import parse_swarm_cfg

    for mod_name in RUN_MODULES:
        mod = importlib.import_module(f"quadswarm_tpu.runs.{mod_name}")
        rd = mod.RUN_DESCRIPTION
        cmds = list(rd.commands("/tmp/td"))
        assert cmds, mod_name
        for _name, cmd in cmds:
            argv = shlex.split(cmd)[3:]  # strip "python -m <module>"
            args = parse_swarm_cfg(argv)
            assert args.quads_num_agents >= 1, mod_name
