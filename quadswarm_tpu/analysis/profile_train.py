"""Per-phase timing of one training iteration (rollout vs GAE+SGD).

The end-to-end train throughput (bench.py --train) mixes the env rollout,
policy inference, GAE, and the minibatched PPO update into one jitted
program; this tool jits the halves separately and times each with the same
host-transfer + delta-method barrier bench.py uses, so perf work can see
where the iteration budget actually goes (VERDICT round-1: the learner half
dominated at 26x below sim-only throughput).

Usage:
    python -m quadswarm_tpu.analysis.profile_train \
        --num_envs 1024 --iters 5 [--model_f32] [--no_replay]

Prints one JSON line per phase: rollout-only, sgd-only (on a pre-collected
trajectory), and the fused full iteration.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import quadswarm_tpu  # noqa: F401


def _barrier(x):
    """Honest device barrier: a device->host transfer (the hosted-TPU tunnel
    returns from block_until_ready before the device finishes)."""
    float(jnp.sum(jax.tree.leaves(x)[0]))


def _timed(fn, n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _barrier(out)
    return time.perf_counter() - t0


def _delta(fn, iters):
    """Run 1 and 1+iters repetitions; the difference removes the fixed
    host<->device round-trip (~90 ms over the tunnel).  The warmup call
    absorbs jit compilation — without it t_short includes the compile and
    the delta goes negative (clamped), reporting nonsense."""
    _barrier(fn())
    t_short = _timed(fn, 1)
    t_long = _timed(fn, 1 + iters)
    return max(t_long - t_short, 1e-9) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--num_agents", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--model_f32", action="store_true")
    p.add_argument("--no_replay", action="store_true")
    p.add_argument("--rollout", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--sgd_unroll", type=int, default=1)
    args = p.parse_args()

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.ppo import (
        PPOConfig, Trainer, collect_rollout, compute_gae, sgd_epochs,
    )

    on_tpu = jax.default_backend() == "tpu"
    model_dtype = jnp.float32 if (args.model_f32 or not on_tpu) else jnp.bfloat16
    env_cfg = EnvConfig(
        num_agents=args.num_agents, neighbor_obs_type="pos_vel",
        neighbor_visible_num=min(6, args.num_agents - 1),
        quads_mode="mix", use_pallas_dynamics=on_tpu, dtype=jnp.float32)
    ppo_cfg = PPOConfig(
        rollout=args.rollout, batch_size=args.batch_size,
        num_envs=args.num_envs, sgd_unroll=args.sgd_unroll,
        replay_sample_prob=0.0 if args.no_replay else 0.75)
    model = ActorCritic(
        self_obs_dim=18, neighbor_obs_dim=6,
        num_neighbors=env_cfg.neighbor_visible_num,
        encoder_type="corl", neighbor_encoder_type="attention",
        rnn_size=256, neighbor_hidden=256, dtype=model_dtype)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0)
    steps_per_iter = ppo_cfg.rollout * args.num_envs * args.num_agents

    rew_coeff = jax.tree.map(lambda x: jnp.asarray(x, env_cfg.dtype),
                             trainer.current_rew_coeff())

    rollout_fn = jax.jit(lambda params, es, obs, key, rs: collect_rollout(
        env_cfg, dyn, model, ppo_cfg, params, es, obs, key, rew_coeff, rs))

    def sgd_fn_builder():
        def fn(train_state, traj, last_value, key):
            advantages, returns = compute_gae(
                traj, last_value, ppo_cfg.gamma, ppo_cfg.gae_lambda)
            return sgd_epochs(model, ppo_cfg, train_state, traj,
                              advantages, returns, key)
        # traj is NOT donated: every SGD minibatch reads it and no output
        # aliases its shape, so donation is unusable (it only triggered XLA
        # "donated buffers were not usable" warnings); the per-call copy is
        # freed by refcount when the call returns.
        return jax.jit(fn)

    key = jax.random.PRNGKey(1)
    # Pre-collect one trajectory for the sgd-only phase
    out = rollout_fn(trainer.train_state.params, trainer.env_states,
                     trainer.obs, key, trainer.replay_states)
    env_states, obs, replay_states, traj0, last_value, _ = out
    _barrier(traj0.reward)

    results = []

    def roll_once():
        nonlocal key
        key, k = jax.random.split(key)
        out = rollout_fn(trainer.train_state.params, env_states, obs, k,
                         replay_states)
        return out[3].reward

    t = _delta(roll_once, args.iters)
    results.append({"phase": "rollout", "ms_per_iter": round(t * 1e3, 2),
                    "agent_steps_per_s": round(steps_per_iter / t)})

    sgd_fn = sgd_fn_builder()

    def sgd_once():
        nonlocal key
        key, k = jax.random.split(key)
        traj = jax.tree.map(jnp.copy, traj0)
        ts, _ = sgd_fn(trainer.train_state, traj, last_value, k)
        return ts.params

    t = _delta(sgd_once, args.iters)
    results.append({"phase": "gae+sgd", "ms_per_iter": round(t * 1e3, 2),
                    "agent_steps_per_s": round(steps_per_iter / t)})

    def full_once():
        trainer.iteration()
        return trainer.train_state.params

    t = _delta(full_once, args.iters)
    results.append({"phase": "full_iteration", "ms_per_iter": round(t * 1e3, 2),
                    "agent_steps_per_s": round(steps_per_iter / t)})

    for r in results:
        r.update(num_envs=args.num_envs, rollout=args.rollout,
                 batch_size=args.batch_size,
                 model_dtype=str(model_dtype.__name__),
                 replay=not args.no_replay)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
