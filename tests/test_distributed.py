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


@pytest.mark.slow
def test_two_process_training(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    # JAX_PLATFORMS from the test env would fight the in-script config
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-u", str(script), str(port), str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert "proc 0 OK" in outs[0], outs[0]
    assert "proc 1 OK" in outs[1], outs[1]
