"""CLI flag surface.

Mirrors the reference's argparse extension (swarm_rl/env_wrappers/
quadrotor_params.py:15-121 `--quads_*` flags) plus the Sample Factory core
training flags its baselines set (runs/quad_multi_mix_baseline.py:8-18).
Worker-process knobs (--num_workers, --num_envs_per_worker) are replaced by
the on-device env batch (--num_envs).
"""
from __future__ import annotations

import argparse
import json
import os


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "1")


def add_quadrotors_env_args(p: argparse.ArgumentParser) -> None:
    # Quadrotor features
    p.add_argument("--quads_num_agents", default=8, type=int)
    p.add_argument("--quads_obs_repr", default="xyz_vxyz_R_omega",
                   choices=["xyz_vxyz_R_omega", "xyz_vxyz_R_omega_floor",
                            "xyz_vxyz_R_omega_wall"])
    p.add_argument("--quads_episode_duration", default=15.0, type=float)
    p.add_argument("--quads_encoder_type", default="corl", type=str)
    # Neighbor
    p.add_argument("--quads_neighbor_visible_num", default=-1, type=int)
    p.add_argument("--quads_neighbor_obs_type", default="none",
                   choices=["none", "pos_vel"])
    p.add_argument("--quads_neighbor_hidden_size", default=256, type=int)
    p.add_argument("--quads_neighbor_encoder_type", default="attention",
                   choices=["attention", "mean_embed", "mlp", "no_encoder"])
    p.add_argument("--quads_collision_reward", default=0.0, type=float)
    p.add_argument("--quads_collision_hitbox_radius", default=2.0, type=float)
    p.add_argument("--quads_collision_falloff_radius", default=-1.0, type=float)
    p.add_argument("--quads_collision_smooth_max_penalty", default=10.0, type=float)
    # Obstacle
    p.add_argument("--quads_use_obstacles", default=False, type=str2bool)
    p.add_argument("--quads_obstacle_obs_type", default="none",
                   choices=["none", "octomap"])
    p.add_argument("--quads_obst_density", default=0.2, type=float)
    p.add_argument("--quads_obst_size", default=1.0, type=float)
    p.add_argument("--quads_obst_spawn_area", nargs="+", default=[6.0, 6.0],
                   type=float)
    p.add_argument("--quads_domain_random", default=False, type=str2bool)
    p.add_argument("--quads_obst_density_random", default=False, type=str2bool)
    p.add_argument("--quads_obst_density_min", default=0.05, type=float)
    p.add_argument("--quads_obst_density_max", default=0.2, type=float)
    p.add_argument("--quads_obst_size_random", default=False, type=str2bool)
    p.add_argument("--quads_obst_size_min", default=0.3, type=float)
    p.add_argument("--quads_obst_size_max", default=0.6, type=float)
    p.add_argument("--quads_obst_hidden_size", default=256, type=int)
    p.add_argument("--quads_obst_encoder_type", default="mlp", type=str)
    p.add_argument("--quads_obst_collision_reward", default=0.0, type=float)
    # Aerodynamics
    p.add_argument("--quads_use_downwash", default=False, type=str2bool)
    p.add_argument("--quads_use_pallas", default="auto",
                   choices=["auto", "true", "false"],
                   help="fused Pallas dynamics kernel (auto: on for TPU)")
    p.add_argument("--quads_use_pallas_pairs", default="false",
                   choices=["true", "false"],
                   help="fused Pallas pair kernels + packed pair history. "
                        "Measured SLOWER than the XLA (N, N) path through "
                        "the env step at every supported N in 128..2048 on "
                        "v5e, and the O(N)-memory premise never "
                        "materializes (peak HBM of the XLA path is 11%% of "
                        "the chip even at N=4096) — retired to a "
                        "documented, opt-in reference implementation "
                        "(docs/PERF.md).")
    # Accepted-and-ignored for drop-in compatibility with reference training
    # commands (quadrotor_params.py:21 — numba has no meaning here; the
    # TPU analogue is --quads_use_pallas).
    p.add_argument("--quads_use_numba", default=False, type=str2bool,
                   help="ignored (reference compatibility); see "
                        "--quads_use_pallas")
    # Scenarios
    # Full scenario-mode surface (quadrotor_params.py:91-97) — including the
    # four obstacle modes the reference advertises but never implemented
    # (SURVEY.md §2.3); here they exist (env/scenarios.py MODES).
    p.add_argument("--quads_mode", default="static_same_goal",
                   choices=["static_same_goal", "static_diff_goal",
                            "dynamic_same_goal", "dynamic_diff_goal",
                            "ep_lissajous3D", "ep_rand_bezier", "swarm_vs_swarm",
                            "swap_goals", "dynamic_formations", "run_away", "mix",
                            "o_random", "o_dynamic_same_goal",
                            "o_static_same_goal", "o_swap_goals",
                            "o_ep_rand_bezier", "o_uniform_same_goal_spawn",
                            "o_diagonal", "o_static_diff_goal",
                            "o_dynamic_diff_goal", "o_test"])
    # Room
    p.add_argument("--quads_room_dims", nargs="+", default=[10.0, 10.0, 10.0],
                   type=float)
    # Replay buffer
    p.add_argument("--replay_buffer_sample_prob", default=0.0, type=float)
    # Annealing
    p.add_argument("--anneal_collision_steps", default=0.0, type=float)
    # Rendering
    p.add_argument("--quads_view_mode", nargs="+",
                   default=["topdown", "chase", "global"],
                   choices=["topdown", "chase", "side", "global", "corner0",
                            "corner1", "corner2", "corner3", "topdownfollow"])
    p.add_argument("--quads_render", default=False, type=str2bool)
    # nargs="?" so both SF-style `--visualize_v_value=True` and the bare
    # `--visualize_v_value` switch form parse (reference enjoy README usage).
    p.add_argument("--visualize_v_value", default=False, type=str2bool,
                   nargs="?", const=True)
    # Sim2Real
    p.add_argument("--quads_sim2real", default=False, type=str2bool)


def add_training_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--experiment", default="quad_swarm_tpu", type=str)
    p.add_argument("--train_dir", default="train_dir", type=str)
    p.add_argument("--multi_host", default=False, type=str2bool,
                   help="initialize jax.distributed and train one job over "
                        "every chip of a multi-host slice (coordinator from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID env vars, or TPU pod auto-detect); "
                        "--num_envs is the GLOBAL env batch")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--train_for_env_steps", default=1_000_000_000, type=int)
    p.add_argument("--num_envs", default=0, type=int,
                   help="on-device env batch (replaces num_workers x "
                        "num_envs_per_worker; 0 = derive from those, "
                        "default 1024)")
    # Sample Factory worker-grid flags, accepted for drop-in reuse of the
    # reference's command lines (runs/quad_multi_mix_baseline.py:8-18):
    # when --num_envs is not given, the env batch = workers x envs/worker.
    p.add_argument("--num_workers", default=0, type=int,
                   help="reference compat: rollout worker count; folded "
                        "into --num_envs")
    p.add_argument("--num_envs_per_worker", default=4, type=int,
                   help="reference compat: folded into --num_envs")
    # Accepted-and-checked reference model/trainer flags.  The built-in
    # model already implements the baseline's settings (actor_critic.py:
    # separate weights, xavier_uniform init, state-independent stddev,
    # feed-forward policy), so only the baseline values are supported.
    p.add_argument("--use_rnn", default=False, type=str2bool)
    p.add_argument("--recurrence", default=1, type=int)
    p.add_argument("--actor_critic_share_weights", default=False, type=str2bool)
    p.add_argument("--policy_initialization", default="xavier_uniform", type=str)
    p.add_argument("--adaptive_stddev", default=False, type=str2bool)
    p.add_argument("--max_policy_lag", default=100000000, type=int,
                   help="reference compat: accepted; APPO uses --policy_lag")
    p.add_argument("--normalize_input", default=False, type=str2bool,
                   help="running mean-std obs normalization "
                        "(parallel/normalize.py; baselines set False)")
    p.add_argument("--normalize_returns", default=False, type=str2bool,
                   help="critic learns running-normalized returns "
                        "(parallel/normalize.py; baselines set False)")
    p.add_argument("--save_milestones_sec", default=-1, type=int,
                   help="reference compat: alias for --save_every_sec when set")
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--gamma", default=0.99, type=float)
    p.add_argument("--gae_lambda", default=1.00, type=float)
    p.add_argument("--ppo_clip_ratio", default=0.1, type=float)
    p.add_argument("--ppo_clip_value", default=5.0, type=float)
    p.add_argument("--value_loss_coeff", default=0.5, type=float)
    p.add_argument("--exploration_loss_coeff", default=0.0, type=float)
    p.add_argument("--max_entropy_coeff", default=0.0, type=float,
                   help="max-entropy objective coefficient "
                        "(pbt_quads_multi_obstacles.py sets 0.0005)")
    p.add_argument("--max_grad_norm", default=5.0, type=float)
    p.add_argument("--rollout", default=128, type=int)
    p.add_argument("--batch_size", default=1024, type=int)
    p.add_argument("--num_epochs", default=1, type=int)
    p.add_argument("--reward_clip", default=10.0, type=float)
    p.add_argument("--sgd_unroll", default=8, type=int,
                   help="XLA unroll factor for the sequential minibatch-SGD "
                        "scan (TPU knob, no reference analogue)")
    # APPO (SF --async_rl / --with_vtrace; parallel/appo.py)
    p.add_argument("--appo_split_devices", default="", type=str,
                   help="APPO disjoint submeshes as 'R,L': rollout program "
                        "on the first R devices, learner on the next L "
                        "(parallel/appo.py split_mesh; placement validated "
                        "on the CPU mesh, overlap untested)")
    p.add_argument("--async_rl", default=False, type=str2bool,
                   help="policy-lag (two-program) APPO trainer")
    p.add_argument("--policy_lag", default=1, type=int)
    p.add_argument("--with_vtrace", default=False, type=str2bool)
    p.add_argument("--vtrace_rho", default=1.0, type=float)
    p.add_argument("--vtrace_c", default=1.0, type=float)
    p.add_argument("--rnn_size", default=256, type=int)
    p.add_argument("--nonlinearity", default="tanh", type=str)
    p.add_argument("--initial_stddev", default=1.0, type=float)
    p.add_argument("--save_every_sec", default=300, type=int)
    p.add_argument("--debug_checks", default=False, type=str2bool,
                   help="enable jax_debug_nans (raise at the op producing a "
                        "NaN; the jit equivalent of the reference's "
                        "non-finite-reward guard)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="write a JAX device-profiler trace of post-compile "
                        "iterations here (view in TensorBoard/Perfetto)")
    p.add_argument("--profile_iters", default=3, type=int)
    p.add_argument("--log_every_iters", default=10, type=int)
    p.add_argument("--with_wandb", default=False, type=str2bool)
    p.add_argument("--wandb_project", default="quadswarm-tpu", type=str)
    p.add_argument("--wandb_user", default=None, type=str)
    p.add_argument("--wandb_group", default=None, type=str)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--model_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="model COMPUTE dtype (params/optimizer stay f32; "
                        "loss/GAE math is f32). auto = bfloat16 on TPU "
                        "(4x MXU throughput), float32 elsewhere")
    # PBT
    p.add_argument("--with_pbt", default=False, type=str2bool)
    p.add_argument("--num_policies", default=1, type=int)
    p.add_argument("--pbt_period_env_steps", default=5_000_000, type=int)
    p.add_argument("--pbt_start_mutation", default=20_000_000, type=int)
    p.add_argument("--pbt_mix_policies_in_one_env", default=False, type=str2bool)
    p.add_argument("--pbt_replace_fraction", default=0.3, type=float)
    p.add_argument("--pbt_mutation_rate", default=0.15, type=float)
    p.add_argument("--pbt_replace_reward_gap", default=0.1, type=float)
    p.add_argument("--pbt_replace_reward_gap_absolute", default=1e-6, type=float)
    p.add_argument("--pbt_optimize_gamma", default=False, type=str2bool)
    p.add_argument("--pbt_perturb_max", default=1.2, type=float)


def parse_swarm_cfg(argv=None, evaluation: bool = False) -> argparse.Namespace:
    p = argparse.ArgumentParser("quadswarm_tpu")
    p.add_argument("--env", default="quadrotor_multi", type=str)
    p.add_argument("--algo", default="APPO", type=str)
    add_quadrotors_env_args(p)
    add_training_args(p)
    if evaluation:
        p.add_argument("--load_checkpoint_kind", default="latest",
                       choices=["latest", "best"])
        p.add_argument("--max_num_episodes", default=1, type=int)
        p.add_argument("--eval_envs", default=1, type=int,
                       help="vmapped eval batch: run this many envs in "
                            "parallel per round (episodes are fixed-length, "
                            "so each round yields eval_envs full episodes); "
                            "1 = the un-vmapped render-friendly path")
        p.add_argument("--render_mode", default="plot",
                       choices=["plot", "dump", "none", "human", "rgb_array",
                                "live"],
                       help="live = per-tick streaming while the episode "
                            "steps (interactive matplotlib window when "
                            "DISPLAY exists, else a growing PNG/mp4 stream "
                            "in render_out) — the realtime counterpart of "
                            "the reference's pyglet viewer")
        p.add_argument("--render_out", default="render_out", type=str)
        p.add_argument("--render_every_nth", default=5, type=int,
                       help="render every Nth control tick in live mode")
        p.add_argument("--realtime", default=False, type=str2bool,
                       nargs="?", const=True,
                       help="pace live rendering to wall-clock sim time "
                            "(the reference's render_speed pacing, "
                            "quadrotor_multi.py:726-812)")
    args = p.parse_args(argv)
    return _resolve_compat_flags(args)


def _resolve_compat_flags(args) -> argparse.Namespace:
    """Fold Sample-Factory-style flags into their native equivalents and
    reject settings whose semantics this build does not implement (rather
    than silently training something different)."""
    import warnings

    if args.num_envs <= 0:
        args.num_envs = (args.num_workers * args.num_envs_per_worker
                         if args.num_workers > 0 else 1024)
    if args.save_milestones_sec > 0:
        args.save_every_sec = min(args.save_every_sec, args.save_milestones_sec)
    if args.use_rnn or args.recurrence > 1:
        raise ValueError("recurrent policies are not implemented; the "
                         "reference baselines train with --use_rnn=False "
                         "--recurrence=1 (train.sh)")
    if args.actor_critic_share_weights:
        raise ValueError("shared actor/critic weights not implemented "
                         "(baselines use --actor_critic_share_weights=False)")
    if args.adaptive_stddev:
        raise ValueError("adaptive (state-dependent) stddev not implemented "
                         "(baselines use --adaptive_stddev=False)")
    if args.policy_initialization != "xavier_uniform":
        warnings.warn(f"policy_initialization={args.policy_initialization!r} "
                      "ignored; the model uses xavier_uniform")
    # --normalize_input/--normalize_returns compose with mixed-policy PBT:
    # MixedPBTRunner keeps a stacked per-policy NormalizerState, each
    # policy's stats fed only by its own agents (parallel/pbt_mixed.py).
    if (args.quads_obstacle_obs_type == "octomap"
            and not args.quads_use_obstacles):
        raise ValueError("--quads_obstacle_obs_type=octomap requires "
                         "--quads_use_obstacles=True (the env only emits the "
                         "SDF observation with obstacles enabled)")
    if args.quads_use_obstacles and args.quads_obstacle_obs_type == "none":
        warnings.warn("obstacles are enabled but "
                      "--quads_obstacle_obs_type=none: the model will ignore "
                      "the SDF observation (reference behavior; pass "
                      "--quads_obstacle_obs_type=octomap to consume it)")
    if ((args.quads_obst_density_random or args.quads_obst_size_random)
            and not args.quads_domain_random):
        warnings.warn("--quads_obst_density_random/--quads_obst_size_random "
                      "have no effect without --quads_domain_random=True "
                      "(reference gating, quad_experience_replay.py:76-87)")
    return args


def base_rew_coeff_from_args(args) -> dict:
    """Collision reward-shaping coefficients from the CLI, applied
    unconditionally like the reference (env_wrappers/quad_utils.py:74-77).
    With --anneal_collision_steps>0 these are overridden by the annealing
    schedule (start at 0, ramp to the flag value)."""
    return dict(
        quadcol_bin=args.quads_collision_reward,
        quadcol_bin_smooth_max=args.quads_collision_smooth_max_penalty,
        quadcol_bin_obst=args.quads_obst_collision_reward,
    )


def env_config_from_args(args) -> "EnvConfig":
    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.env.multi import EnvConfig

    falloff = args.quads_collision_falloff_radius
    return EnvConfig(
        num_agents=args.quads_num_agents,
        ep_time=args.quads_episode_duration,
        room_dims=tuple(args.quads_room_dims),
        obs_repr=args.quads_obs_repr,
        neighbor_obs_type=args.quads_neighbor_obs_type,
        neighbor_visible_num=args.quads_neighbor_visible_num,
        collision_hitbox_radius=args.quads_collision_hitbox_radius,
        collision_falloff_radius=falloff,
        use_obstacles=args.quads_use_obstacles,
        obst_density=args.quads_obst_density,
        obst_size=args.quads_obst_size,
        obst_spawn_area=tuple(args.quads_obst_spawn_area),
        # Obstacle domain randomization (reference gates the per-episode
        # resample on BOTH --quads_domain_random and the specific flag,
        # quad_experience_replay.py:76-87)
        obst_density_random=(args.quads_domain_random
                             and args.quads_obst_density_random),
        obst_density_min=args.quads_obst_density_min,
        obst_density_max=args.quads_obst_density_max,
        obst_size_random=(args.quads_domain_random
                          and args.quads_obst_size_random),
        obst_size_min=args.quads_obst_size_min,
        obst_size_max=args.quads_obst_size_max,
        use_downwash=args.quads_use_downwash,
        quads_mode=args.quads_mode,
        # Fused pair kernels (collision masks + k-nearest obs —
        # ops/pallas/swarm_interactions.py).  On-TPU measurements
        # (docs/PERF.md): the XLA (N, N) path is 1.3-1.4x FASTER through
        # the whole env step at every supported N in 128..2048 and pair
        # memory never presses HBM, so the kernels are a retired, opt-in
        # reference implementation, not an automatic gate.
        use_pallas_pairs=(jax.default_backend() == "tpu"
                          and args.quads_use_pallas_pairs == "true"),
        use_pallas_dynamics=(jax.default_backend() == "tpu"
                             if args.quads_use_pallas == "auto"
                             else args.quads_use_pallas == "true"),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )


def model_from_args(args, env_cfg) -> "ActorCritic":
    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.env.obs import NEIGHBOR_OBS_SIZES, OBS_REPR_SIZES
    from quadswarm_tpu.models.actor_critic import ActorCritic

    model_dtype = getattr(args, "model_dtype", "auto")
    if model_dtype == "auto":
        model_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                       else "float32")
    return ActorCritic(
        action_dim=4,
        self_obs_dim=OBS_REPR_SIZES[args.quads_obs_repr],
        neighbor_obs_dim=NEIGHBOR_OBS_SIZES[args.quads_neighbor_obs_type],
        num_neighbors=env_cfg.num_use_neighbor_obs,
        encoder_type=args.quads_encoder_type,
        neighbor_encoder_type=args.quads_neighbor_encoder_type,
        neighbor_hidden=args.quads_neighbor_hidden_size,
        # The MODEL consumes the obstacle (octomap SDF) slice of the obs only
        # when --quads_obstacle_obs_type=octomap; the env emits it whenever
        # use_obstacles=True (reference: quad_multi_model.py:161 vs
        # quadrotor_single.py:315).
        use_obstacles=(args.quads_obstacle_obs_type == "octomap"),
        obstacle_hidden=args.quads_obst_hidden_size,
        rnn_size=args.rnn_size,
        act=args.nonlinearity,
        sim2real=args.quads_sim2real,
        initial_stddev=args.initial_stddev,
        dtype=jnp.bfloat16 if model_dtype == "bfloat16" else jnp.float32,
    )


def ppo_config_from_args(args) -> "PPOConfig":
    from quadswarm_tpu.parallel.ppo import PPOConfig

    return PPOConfig(
        learning_rate=args.learning_rate,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        ppo_clip_ratio=args.ppo_clip_ratio,
        ppo_clip_value=args.ppo_clip_value,
        value_loss_coeff=args.value_loss_coeff,
        exploration_loss_coeff=args.exploration_loss_coeff,
        max_entropy_coeff=args.max_entropy_coeff,
        max_grad_norm=args.max_grad_norm,
        rollout=args.rollout,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        reward_clip=args.reward_clip,
        sgd_unroll=getattr(args, "sgd_unroll", 8),
        num_envs=args.num_envs,
        replay_sample_prob=args.replay_buffer_sample_prob,
        normalize_input=args.normalize_input,
        normalize_returns=args.normalize_returns,
        with_vtrace=getattr(args, "with_vtrace", False),
        vtrace_rho=getattr(args, "vtrace_rho", 1.0),
        vtrace_c=getattr(args, "vtrace_c", 1.0),
    )


def anneal_schedules_from_args(args) -> dict:
    """AnnealSchedule equivalents (env_wrappers/quad_utils.py:82-95)."""
    if args.anneal_collision_steps <= 0:
        return {}
    return {
        "quadcol_bin": (args.quads_collision_reward, args.anneal_collision_steps),
        "quadcol_bin_smooth_max": (args.quads_collision_smooth_max_penalty,
                                   args.anneal_collision_steps),
        "quadcol_bin_obst": (args.quads_obst_collision_reward,
                             args.anneal_collision_steps),
    }


def save_cfg(args, exp_dir: str) -> None:
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)


def load_cfg(exp_dir: str) -> argparse.Namespace:
    with open(os.path.join(exp_dir, "config.json")) as f:
        return argparse.Namespace(**json.load(f))
