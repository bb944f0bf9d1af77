"""Multi-device scaling measurement for the flagship training step.

Replaces the reference's process-grid scaling story (Sample Factory worker
counts; the 4-GPU PBT schedule in
/root/reference/swarm_rl/runs/obstacles/pbt_quads_multi_obstacles.py:14-19)
with the JAX equivalent: the SAME jitted train iteration compiled over a
1/2/4/8-device `jax.sharding.Mesh`, timed per device count.

Two modes:

* ``fixed`` (default, and the only meaningful one on a single-core host with
  virtual devices): TOTAL work is constant and gets sharded over more
  devices.  On one physical core the wall time should stay FLAT as the
  device count grows — any superlinear growth means the compiled program
  serializes across the mesh or the collectives add real overhead.
  Efficiency_D = t_1 / t_D.

* ``weak`` (the real-slice recipe): envs-per-device constant, total work
  grows with D.  On real TPU chips ideal weak scaling keeps the per-step
  time flat; efficiency_D = t_1 / t_D.  Run on hardware with e.g.::

      python -m quadswarm_tpu.analysis.scaling --mode weak \
          --devices 1,4,8 --envs_per_dev 512 --rnn_size 256

Each device count runs in a SUBPROCESS because the virtual-device count
(``xla_force_host_platform_device_count``) must be set before JAX
initializes.  One JSON line per device count, then a summary line with the
efficiency table (the artifact recorded in docs/SCALING.md).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def worker(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer

    d = len(jax.devices())
    assert d == args.worker, f"expected {args.worker} devices, got {d}"
    num_envs = (args.envs_per_dev * d if args.mode == "weak"
                else args.total_envs)

    env_cfg = EnvConfig(num_agents=8, neighbor_obs_type="pos_vel",
                        neighbor_visible_num=6, quads_mode="mix",
                        use_pallas_dynamics=False, dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=args.rollout, batch_size=args.batch_size,
                        num_envs=num_envs, replay_sample_prob=0.75)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=6,
                        encoder_type="corl", neighbor_encoder_type="attention",
                        rnn_size=args.rnn_size, neighbor_hidden=args.rnn_size,
                        dtype=jnp.float32)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0)
    trainer.iteration()  # compile
    float(jnp.sum(jax.tree.leaves(trainer.train_state.params)[0]))

    # Compiled-program cost analysis: per-DEVICE flops of the train step.
    # On a single-core host with virtual devices, wall time measures thread
    # contention + collective busy-wait, not program quality; flops/device
    # scaling as 1/D is the property that proves the work is actually
    # sharded (no replicated compute) and transfers to real chips.
    flops = None
    try:
        rew_coeff = jax.tree.map(
            lambda x: jnp.asarray(x, env_cfg.dtype),
            trainer.current_rew_coeff())
        key = jax.random.PRNGKey(1)
        ca = trainer._iter_fn.lower(
            trainer.train_state, trainer.env_states, trainer.obs, key,
            rew_coeff, trainer.replay_states).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            flops = float(ca.get("flops", float("nan")))
    except Exception:
        pass

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            trainer.iteration()
        float(jnp.sum(jax.tree.leaves(trainer.train_state.params)[0]))
        return time.perf_counter() - t0

    runs = []
    for _ in range(args.repeats):
        t_short = timed(1)
        t_long = timed(1 + args.iters)
        runs.append(max(t_long - t_short, 1e-9) / args.iters)
    sec = float(np.median(runs))
    print(json.dumps({
        "devices": d, "num_envs": num_envs, "sec_per_iter": round(sec, 4),
        "agent_steps_per_s": round(ppo_cfg.rollout * num_envs * 8 / sec),
        "runs_sec": [round(r, 4) for r in runs],
        "flops_per_device": flops,
    }), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=0,
                   help="(internal) run as the measurement subprocess on "
                        "this many devices")
    p.add_argument("--devices", type=str, default="1,2,4,8")
    p.add_argument("--mode", choices=("fixed", "weak"), default="fixed")
    p.add_argument("--total_envs", type=int, default=128,
                   help="total env batch in fixed mode")
    p.add_argument("--envs_per_dev", type=int, default=64,
                   help="env batch per device in weak mode")
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--rnn_size", type=int, default=128)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform in workers (default: cpu with "
                        "virtual devices; pass 'tpu' on a real slice)")
    args = p.parse_args()

    if args.worker:
        worker(args)
        return

    results = []
    for d in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        if args.platform in (None, "cpu"):
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                                f" --xla_force_host_platform_device_count={d}")
        else:
            env["JAX_PLATFORMS"] = args.platform
        cmd = [sys.executable, "-m", "quadswarm_tpu.analysis.scaling",
               "--worker", str(d), "--mode", args.mode,
               "--total_envs", str(args.total_envs),
               "--envs_per_dev", str(args.envs_per_dev),
               "--rollout", str(args.rollout),
               "--batch_size", str(args.batch_size),
               "--rnn_size", str(args.rnn_size),
               "--iters", str(args.iters), "--repeats", str(args.repeats)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"devices": d, "error": out.stderr[-800:]}),
                  flush=True)
            continue
        r = json.loads(line[-1])
        results.append(r)
        print(json.dumps(r), flush=True)

    if results and results[0]["devices"] == 1:
        t1 = results[0]["sec_per_iter"]
        table = {str(r["devices"]): round(t1 / r["sec_per_iter"], 3)
                 for r in results}
        f1 = results[0].get("flops_per_device")
        flops_scaling = ({str(r["devices"]):
                          round(f1 / max(r["flops_per_device"], 1.0), 3)
                          for r in results if r.get("flops_per_device")}
                         if f1 else None)
        print(json.dumps({"metric": f"{args.mode}-scaling efficiency "
                                    "(t_1/t_D, flagship train step)",
                          "efficiency": table,
                          # flops_1 / flops_D: == D when the compiled step
                          # truly shards the work (no replicated compute);
                          # the property that transfers to real chips.
                          "flops_scaling": flops_scaling,
                          "mode": args.mode,
                          "num_envs": results[0]["num_envs"]}), flush=True)


if __name__ == "__main__":
    main()
