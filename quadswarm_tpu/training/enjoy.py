"""Evaluation / replay CLI: `python -m quadswarm_tpu.training.enjoy ...`

Mirrors swarm_rl/enjoy.py: load the experiment config + latest checkpoint,
run the deterministic policy (action mean), report episode stats, and render
offline frames / dump trajectories (--render_mode=plot|dump|none).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def run_eval(args) -> dict:
    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.env.multi import env_reset, env_step
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.training.config import (
        env_config_from_args, model_from_args,
    )
    from quadswarm_tpu.utils.checkpoint import (
        checkpoint_dir, get_checkpoints, latest_checkpoint, load_checkpoint,
    )
    from quadswarm_tpu.utils.render import TrajectoryRecorder, render_trajectory

    env_cfg = env_config_from_args(args)
    model = model_from_args(args, env_cfg)
    dyn = DynamicsParams.from_model(crazyflie_params(), dt=env_cfg.dt).astype(
        np.float32)

    key = jax.random.PRNGKey(args.seed)
    key, ki = jax.random.split(key)
    params = model.init(ki, jnp.zeros((1, env_cfg.obs_dim)))
    cp_dir = checkpoint_dir(args.train_dir, args.experiment)
    # --load_checkpoint_kind=best loads the best_* checkpoint (highest
    # windowed true_reward, written by the train loop), like SF's
    # Learner.get_checkpoints("best_*") (env_wrappers/quad_utils.py:105-107);
    # falls back to latest if no best checkpoint was recorded.
    cp = None
    if getattr(args, "load_checkpoint_kind", "latest") == "best":
        best = get_checkpoints(cp_dir, tag="best")
        cp = best[-1] if best else None
        if cp is None:
            print("WARNING: no best_* checkpoint found, falling back to latest")
    if cp is None:
        cp = latest_checkpoint(cp_dir)
    obs_norm = None
    if cp is not None:
        from flax import serialization
        payload = load_checkpoint(cp)
        params = serialization.from_state_dict(params, payload["params"])
        # Runs trained with --normalize_input store the running obs stats in
        # the checkpoint's extra payload; the eval policy must standardize
        # the same way or the encoder sees out-of-distribution inputs.
        extra = payload.get("extra") or {}
        if isinstance(extra, dict) and extra.get("obs"):
            from quadswarm_tpu.parallel.normalize import RunningMeanStd
            o = extra["obs"]
            obs_norm = RunningMeanStd(mean=jnp.asarray(o["mean"]),
                                      var=jnp.asarray(o["var"]),
                                      count=jnp.asarray(o["count"]))
            print("input normalization active (stats from checkpoint)")
        print(f"loaded {cp}")
    else:
        print("WARNING: no checkpoint found, using random init")

    def apply_model(p, o_flat):
        return model.apply(
            p, obs_norm.normalize(o_flat) if obs_norm is not None else o_flat)

    if getattr(args, "eval_envs", 1) > 1:
        return _run_eval_batched(args, env_cfg, model, dyn, params, key,
                                 apply_model)

    step = jax.jit(lambda s, a, k: env_step(env_cfg, dyn, s, a, k))
    policy = jax.jit(lambda p, o: apply_model(p, o)[0])  # deterministic mean
    viz_v = getattr(args, "visualize_v_value", False)

    episode_stats = []
    for ep in range(args.max_num_episodes):
        key, rk = jax.random.split(key)
        state, obs = env_reset(env_cfg, dyn, rk)
        rec = TrajectoryRecorder()
        live = None
        if args.render_mode == "live":
            # Streaming per-tick rendering while the episode runs — the
            # counterpart of the reference's interactive pyglet viewer
            # (quadrotor_multi_visualization.py:114-610).
            from quadswarm_tpu.utils.render import LiveRenderer
            obstacles = None
            if env_cfg.use_obstacles:
                active = np.asarray(state.obst_active)
                obstacles = np.asarray(state.obst_pos)[active][:, :2]
            live = LiveRenderer(
                room_dims=env_cfg.room_dims,
                views=tuple(args.quads_view_mode),
                out_dir=os.path.join(args.render_out, f"ep{ep:03d}", "live"),
                every_nth=getattr(args, "render_every_nth", 5),
                realtime=getattr(args, "realtime", False),
                control_dt=env_cfg.control_dt,
                obstacles=obstacles, obst_size=float(state.obst_size))
        ep_reward = np.zeros(env_cfg.num_agents)
        done = False
        while not done:
            key, sk = jax.random.split(key)
            actions = policy(params, obs)
            state, obs, rew, dones, info = step(state, actions, sk)
            rec.record(state, rew, obs=obs[0] if viz_v else None)
            if live is not None:
                live.update(int(state.tick), state.dyn.pos,
                            state.scenario.goals, state.prev_coll_ids,
                            vel=state.dyn.vel, acc=state.dyn.acc)
            ep_reward += np.asarray(rew)
            done = bool(dones[0])
            if done:
                stats = {k: np.asarray(v).mean() for k, v in info.items()
                         if not k.startswith("rewards/")}
                stats["episode_reward"] = float(ep_reward.mean())
                episode_stats.append(stats)
        if live is not None:
            mp4 = live.close()
            print(f"live stream -> {live.out_dir}"
                  + (f" ({os.path.basename(mp4)} written)" if mp4 else ""))
        print(f"episode {ep}: reward={episode_stats[-1]['episode_reward']:.2f} "
              f"collisions={episode_stats[-1]['num_collisions']:.0f}")
        out_dir = os.path.join(args.render_out, f"ep{ep:03d}")
        if viz_v:
            # Critic-value heatmap around drone 0 at episode end
            # (swarm_rl/env_wrappers/v_value_map.py:47-62).
            from quadswarm_tpu.utils.render import v_value_map
            os.makedirs(out_dir, exist_ok=True)
            vmap2d = v_value_map(model, params, np.asarray(obs)[0],
                                 np.asarray(state.dyn.pos)[0, :2])
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                fig, ax = plt.subplots(figsize=(4, 4))
                im = ax.imshow(vmap2d, origin="lower", extent=[-2, 2, -2, 2],
                               cmap="viridis")
                fig.colorbar(im, ax=ax, label="V(s)")
                ax.set_title(f"critic value map, ep {ep}")
                fig.savefig(os.path.join(out_dir, "v_value_map.png"),
                            bbox_inches="tight")
                plt.close(fig)
                print(f"v-value map -> {out_dir}/v_value_map.png")
            except ImportError:
                np.save(os.path.join(out_dir, "v_value_map.npy"), vmap2d)
        if args.render_mode in ("plot", "human", "rgb_array"):
            obstacles = None
            if env_cfg.use_obstacles:
                active = np.asarray(state.obst_active)
                obstacles = np.asarray(state.obst_pos)[active][:, :2]
            v_maps = None
            if viz_v and rec.obs:
                # Live side panel: per-rendered-tick critic heatmaps
                # (reference V_ValueMapWrapper.render concatenates the map
                # beside the env frame every frame, v_value_map.py:28-37)
                from quadswarm_tpu.utils.render import v_value_maps
                every_nth = 10  # render_trajectory default
                ticks = list(range(0, len(rec.obs), every_nth))
                maps = v_value_maps(
                    model, params, np.stack([rec.obs[t] for t in ticks]))
                v_maps = {t: maps[i] for i, t in enumerate(ticks)}
            render_trajectory(rec, out_dir, room_dims=env_cfg.room_dims,
                              views=tuple(args.quads_view_mode),
                              obstacles=obstacles,
                              obst_size=float(state.obst_size),
                              v_maps=v_maps)
            print(f"frames -> {out_dir}")
        elif args.render_mode == "dump":
            os.makedirs(args.render_out, exist_ok=True)
            rec.dump(os.path.join(args.render_out, f"ep{ep:03d}.npz"))

    agg = {k: float(np.mean([s[k] for s in episode_stats]))
           for k in episode_stats[0]}
    print("=== mean over episodes ===")
    for k, v in sorted(agg.items()):
        print(f"  {k}: {v:.4f}")
    return agg


def _run_eval_batched(args, env_cfg, model, dyn, params, key,
                      apply_model=None) -> dict:
    """Many-episode eval without per-tick host sync: `--eval_envs` envs run
    under one jitted lax.scan per round (episodes are fixed-length, so a
    round of ep_len ticks from reset yields eval_envs complete episodes),
    and per-episode stats are read from the final tick's info.

    Replaces stepping the reference's enjoy loop thousands of times for the
    eval-protocol statistics (quadrotor_multi.py:625-718 metric definitions);
    the deterministic policy (action mean) matches the un-vmapped path."""
    import functools

    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.env.multi import batched_env_step, env_reset

    if apply_model is None:
        apply_model = model.apply
    e = args.eval_envs
    rounds = max(1, -(-args.max_num_episodes // e))  # ceil
    ep_len = env_cfg.ep_len + 1  # done fires at tick ep_len + 1 (env_step)

    @functools.partial(jax.jit, donate_argnums=())
    def eval_round(params, round_key):
        reset_keys = jax.random.split(jax.random.fold_in(round_key, 0), e)
        states, obs = jax.vmap(lambda k: env_reset(env_cfg, dyn, k))(reset_keys)
        tick_keys = jax.random.split(jax.random.fold_in(round_key, 1), ep_len)

        def tick(carry, k):
            states, obs, rew_sum = carry
            n = env_cfg.num_agents
            mean, _, _ = apply_model(params, obs.reshape(e * n, -1))
            actions = mean.astype(env_cfg.dtype).reshape(e, n, -1)
            states, obs, rew, dones, info = batched_env_step(
                env_cfg, dyn, states, actions, jax.random.split(k, e))
            return (states, obs, rew_sum + rew.astype(jnp.float32)), None

        carry = (states, obs, jnp.zeros((e, env_cfg.num_agents), jnp.float32))
        # ep_len - 1 ticks discard info; the final tick is the done tick and
        # its info carries the episode stats
        carry, _ = jax.lax.scan(tick, carry, tick_keys[:-1])
        states, obs, rew_sum = carry
        n = env_cfg.num_agents
        mean, _, _ = apply_model(params, obs.reshape(e * n, -1))
        actions = mean.astype(env_cfg.dtype).reshape(e, n, -1)
        _, _, rew, dones, info = batched_env_step(
            env_cfg, dyn, states, actions, jax.random.split(tick_keys[-1], e))
        rew_sum = rew_sum + rew.astype(jnp.float32)
        return rew_sum, dones, info

    episode_stats = []
    for rnd in range(rounds):
        key, rk = jax.random.split(key)
        rew_sum, dones, info = jax.device_get(eval_round(params, rk))
        assert dones.all(), "round length must equal the episode length"
        for i in range(e):
            stats = {k: np.asarray(v)[i].mean() for k, v in info.items()
                     if not k.startswith("rewards/")
                     and not k.startswith("replay/")}
            stats["episode_reward"] = float(rew_sum[i].mean())
            episode_stats.append(stats)
        print(f"round {rnd}: {e} episodes, "
              f"mean reward={float(rew_sum.mean()):.2f}")

    episode_stats = episode_stats[:max(args.max_num_episodes, e)]
    agg = {k: float(np.mean([s[k] for s in episode_stats]))
           for k in episode_stats[0]}
    print(f"=== mean over {len(episode_stats)} episodes ===")
    for k, v in sorted(agg.items()):
        print(f"  {k}: {v:.4f}")
    return agg


def main(argv=None) -> int:
    """Like the reference's enjoy (sample_factory load_from_checkpoint): the
    experiment's saved config.json is the base config; flags given explicitly
    on the command line override it."""
    from quadswarm_tpu.training.config import parse_swarm_cfg
    args = parse_swarm_cfg(argv, evaluation=True)
    cfg_path = os.path.join(args.train_dir, args.experiment, "config.json")
    if os.path.exists(cfg_path):
        import json
        with open(cfg_path) as f:
            saved = json.load(f)
        explicit = {a.split("=", 1)[0].lstrip("-")
                    for a in (argv if argv is not None else sys.argv[1:])
                    if a.startswith("--")}
        for k, v in saved.items():
            if k not in explicit and hasattr(args, k):
                setattr(args, k, v)
        print(f"config loaded from {cfg_path}")
    run_eval(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
