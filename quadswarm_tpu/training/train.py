"""Training CLI: `python -m quadswarm_tpu.training.train --env=quadrotor_multi ...`

Mirrors swarm_rl/train.py (register env + models, parse cfg, run RL) with the
Sample Factory runner replaced by the TPU-native Trainer / PBT runner.

Example (8-drone mix baseline, runs/quad_multi_mix_baseline.py equivalent):
    python -m quadswarm_tpu.training.train --env=quadrotor_multi \
        --train_for_env_steps=1000000000 --quads_num_agents=8 --quads_mode=mix \
        --quads_neighbor_encoder_type=attention --quads_neighbor_obs_type=pos_vel \
        --quads_neighbor_visible_num=6 --quads_collision_reward=5.0 \
        --quads_collision_falloff_radius=4.0 --replay_buffer_sample_prob=0.75 \
        --anneal_collision_steps=300000000 --num_envs=1024
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.training.config import (
        anneal_schedules_from_args, base_rew_coeff_from_args,
        env_config_from_args, model_from_args, parse_swarm_cfg,
        ppo_config_from_args, save_cfg,
    )
    from quadswarm_tpu.utils.checkpoint import (
        checkpoint_dir, latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from quadswarm_tpu.utils.metrics import MetricLogger

    args = parse_swarm_cfg(argv)
    mesh = None
    is_main = True   # rank 0: the only process that logs/prints/saves
    if args.multi_host:
        # One training job over every chip of the slice: jax.distributed
        # brings up the cross-host runtime BEFORE any backend use, the env
        # batch shards over the global device mesh, and the learner's
        # gradient all-reduce rides ICI/DCN (SURVEY.md §2.2; replaces the
        # reference's independent-Slurm-jobs story).
        from quadswarm_tpu.parallel.distributed import (
            global_data_mesh, init_distributed,
        )
        init_distributed()
        import jax as _jax
        mesh = global_data_mesh()
        is_main = _jax.process_index() == 0
        print(f"multi-host: process {_jax.process_index()}/"
              f"{_jax.process_count()}, {len(_jax.devices())} global devices")
    exp_dir = os.path.join(args.train_dir, args.experiment)
    if is_main:
        save_cfg(args, exp_dir)

    env_cfg = env_config_from_args(args)
    ppo_cfg = ppo_config_from_args(args)
    model = model_from_args(args, env_cfg)
    dyn = DynamicsParams.from_model(crazyflie_params(), dt=env_cfg.dt).astype(
        np.float32)
    anneal = anneal_schedules_from_args(args)
    base_coeff = base_rew_coeff_from_args(args)

    if args.with_pbt and args.num_policies > 1:
        from quadswarm_tpu.parallel.pbt import PBTConfig, PBTRunner
        pbt_cfg = PBTConfig(
            num_policies=args.num_policies,
            period_env_steps=args.pbt_period_env_steps,
            start_mutation=args.pbt_start_mutation,
            replace_fraction=args.pbt_replace_fraction,
            mutation_rate=args.pbt_mutation_rate,
            replace_reward_gap=args.pbt_replace_reward_gap,
            replace_reward_gap_absolute=args.pbt_replace_reward_gap_absolute,
            perturb_range=(1.0 / args.pbt_perturb_max, args.pbt_perturb_max),
            optimize_gamma=args.pbt_optimize_gamma,
        )
        if args.pbt_mix_policies_in_one_env:
            from quadswarm_tpu.parallel.pbt_mixed import MixedPBTRunner
            from quadswarm_tpu.utils.metrics import MetricLogger
            import jax as _jax
            runner = MixedPBTRunner(env_cfg, ppo_cfg, model, dyn, pbt_cfg,
                                    seed=args.seed, exp_dir=exp_dir,
                                    base_rew_coeff=base_coeff, mesh=mesh)
            if runner.restore(args.train_dir, args.experiment):
                print(f"resumed mixed PBT at {runner.env_steps} env steps")
            logger = MetricLogger(exp_dir) if is_main else None
            it, last_round = 0, 0
            last_save = time.time()
            try:
                while runner.env_steps < args.train_for_env_steps:
                    metrics, infos = runner.iteration()
                    it += 1
                    if it % args.log_every_iters == 0 and is_main:
                        m = {f"policy{p}/loss": float(v) for p, v in enumerate(
                            _jax.device_get(metrics["loss"]))}
                        m["reward_mean"] = float(metrics["reward_mean"])
                        for p, h in enumerate(runner.objective_hist):
                            if h:
                                m[f"policy{p}/pbt_objective"] = h[-1]
                        logger.log(runner.env_steps, m)
                    if (runner.env_steps >= pbt_cfg.start_mutation
                            and runner.env_steps - last_round
                            >= pbt_cfg.period_env_steps):
                        last_round = runner.env_steps
                        # identical decisions on all ranks: objectives come
                        # from replicated reductions, host RNG is same-seeded
                        runner.pbt_round()
                    if (time.time() - last_save > args.save_every_sec
                            and is_main):
                        runner.save(args.train_dir, args.experiment)
                        last_save = time.time()
            finally:
                if is_main:
                    runner.save(args.train_dir, args.experiment)
                    logger.close()
            return 0
        runner = PBTRunner(env_cfg, ppo_cfg, model, dyn, pbt_cfg,
                           seed=args.seed, anneal_schedules=anneal,
                           exp_dir=exp_dir, base_rew_coeff=base_coeff,
                           mesh=mesh)
        runner.train(args.train_for_env_steps)
        return 0

    if getattr(args, "async_rl", False):
        from quadswarm_tpu.parallel.appo import APPOTrainer
        split = (tuple(int(x) for x in args.appo_split_devices.split(","))
                 if args.appo_split_devices else None)
        trainer = APPOTrainer(env_cfg, ppo_cfg, model, dyn, seed=args.seed,
                              anneal_schedules=anneal,
                              policy_lag=args.policy_lag,
                              base_rew_coeff=base_coeff, mesh=mesh,
                              split_mesh=split)
    else:
        from quadswarm_tpu.parallel.ppo import Trainer
        trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=args.seed,
                          anneal_schedules=anneal, base_rew_coeff=base_coeff,
                          mesh=mesh)
    cp_dir = checkpoint_dir(args.train_dir, args.experiment)
    cp = latest_checkpoint(cp_dir)
    if cp is not None:
        (trainer.train_state, trainer.env_steps,
         trainer.norm_state) = load_checkpoint(
            cp, trainer.train_state, extra=trainer.norm_state)
        print(f"resumed from {cp} at {trainer.env_steps} env steps")

    logger = MetricLogger(
        exp_dir, use_wandb=args.with_wandb,
        wandb_kwargs=dict(project=getattr(args, "wandb_project", None),
                          entity=getattr(args, "wandb_user", None),
                          group=getattr(args, "wandb_group", None),
                          name=args.experiment)) if is_main else None
    if args.debug_checks:
        from quadswarm_tpu.utils.debug import enable_debug_checks
        enable_debug_checks()
    last_save = time.time()
    it = 0
    last_t, last_steps = time.time(), trainer.env_steps
    profiler = None
    # Best-checkpoint tracking (--load_checkpoint_kind=best in enjoy):
    # windowed mean of episode true_reward, like SF's best_* checkpoints.
    best_objective = -float("inf")
    recent_true_rewards: list[float] = []
    try:
        while trainer.env_steps < args.train_for_env_steps:
            metrics, infos = trainer.iteration()
            it += 1
            if args.profile_dir and it == 2:
                # start AFTER iteration 1 so compilation isn't in the trace
                import jax
                jax.profiler.start_trace(args.profile_dir)
                profiler = args.profile_dir
            if args.profile_dir and it == 2 + args.profile_iters:
                import jax
                jax.profiler.stop_trace()
                profiler = None
                print(f"profiler trace written to {args.profile_dir}",
                      flush=True)
            if it % args.log_every_iters == 0:
                import jax
                # Both fetches are multi-host-safe: `metrics` are replicated
                # scalars; episode stats reduce ON DEVICE to replicated sums
                # (a collective — every rank participates), so no rank ever
                # device_gets a mesh-sharded array (non-addressable under
                # multi-process jax.distributed).
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m.update(trainer.episode_stats(infos))
                if "true_reward" in m:
                    recent_true_rewards.append(m["true_reward"])
                    recent_true_rewards = recent_true_rewards[-10:]
                    objective = float(np.mean(recent_true_rewards))
                    if (len(recent_true_rewards) >= 3
                            and objective > best_objective):
                        best_objective = objective
                        if is_main:
                            save_checkpoint(cp_dir, trainer.train_state,
                                            trainer.env_steps, keep=1,
                                            tag="best",
                                            extra=trainer.norm_state)
                now = time.time()
                # windowed SPS (first window absorbs jit compilation)
                m["perf/sps"] = ((trainer.env_steps - last_steps)
                                 / max(now - last_t, 1e-9))
                last_t, last_steps = now, trainer.env_steps
                if is_main:
                    logger.log(trainer.env_steps, m)
                    print(f"steps={trainer.env_steps:,} "
                          f"sps={m['perf/sps']:,.0f} "
                          f"loss={m['loss']:.4f} rew={m['reward_mean']:.4f}",
                          flush=True)
            if (time.time() - last_save > args.save_every_sec and is_main):
                save_checkpoint(cp_dir, trainer.train_state,
                                trainer.env_steps, extra=trainer.norm_state)
                last_save = time.time()
    finally:
        if profiler is not None:
            import jax
            jax.profiler.stop_trace()
        if is_main:
            save_checkpoint(cp_dir, trainer.train_state, trainer.env_steps,
                            extra=trainer.norm_state)
            logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
