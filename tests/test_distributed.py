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
                   timeout: int = 900) -> list[str]:
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
