"""Sim2real C export parity tests.

Mirrors swarm_rl/sim2real/tests/unit_tests.py: generate C from trained
params, compile with g++, ctypes-call networkEvaluate, and assert
np.allclose against the flax forward over random inputs.
"""
import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.sim2real.codegen import flax_to_c_model


class ControlTN(ctypes.Structure):
    _fields_ = [("thrust_0", ctypes.c_float), ("thrust_1", ctypes.c_float),
                ("thrust_2", ctypes.c_float), ("thrust_3", ctypes.c_float)]


def compile_and_load(src_path, tmp_path):
    lib_path = os.path.join(tmp_path, "model.so")
    subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", lib_path, src_path],
                   check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.networkEvaluate.argtypes = [ctypes.POINTER(ControlTN),
                                    ctypes.POINTER(ctypes.c_float)]
    return lib


def c_forward(lib, obs: np.ndarray) -> np.ndarray:
    out = np.zeros((obs.shape[0], 4), np.float32)
    for i, row in enumerate(obs):
        ctrl = ControlTN()
        arr = (ctypes.c_float * row.size)(*row.astype(np.float32))
        lib.networkEvaluate(ctypes.byref(ctrl), arr)
        out[i] = [ctrl.thrust_0, ctrl.thrust_1, ctrl.thrust_2, ctrl.thrust_3]
    return out


@pytest.mark.skipif(os.system("which g++ > /dev/null 2>&1") != 0,
                    reason="g++ not available")
def test_single_drone_mlp_export(tmp_path):
    obs_dim = 18
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=0, num_neighbors=0,
                        encoder_type="corl", neighbor_encoder_type="no_encoder",
                        rnn_size=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    src_path = os.path.join(tmp_path, "network_evaluate.c")
    flax_to_c_model(jax.device_get(variables), src_path, encoder_type="corl",
                    testing=True)
    lib = compile_and_load(src_path, tmp_path)

    rng = np.random.default_rng(0)
    obs = rng.uniform(-1, 1, size=(1000, obs_dim)).astype(np.float32)
    mean, _, _ = model.apply(variables, jnp.asarray(obs))
    c_out = c_forward(lib, obs)
    np.testing.assert_allclose(np.asarray(mean), c_out, atol=1e-5)


@pytest.mark.skipif(os.system("which g++ > /dev/null 2>&1") != 0,
                    reason="g++ not available")
def test_attention_sim2real_export(tmp_path):
    self_dim, nb_dim, obst_dim = 18, 6 * 6, 9
    obs_dim = self_dim + nb_dim + obst_dim
    model = ActorCritic(self_obs_dim=self_dim, neighbor_obs_dim=6,
                        num_neighbors=6, encoder_type="attention",
                        sim2real=True, rnn_size=16, use_obstacles=True)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, obs_dim)))
    src_path = os.path.join(tmp_path, "network_evaluate_attn.c")
    flax_to_c_model(jax.device_get(variables), src_path,
                    encoder_type="attention", self_dim=self_dim,
                    neighbor_dim=nb_dim, obstacle_dim=obst_dim, testing=True)
    lib = compile_and_load(src_path, tmp_path)

    rng = np.random.default_rng(1)
    obs = rng.uniform(-1, 1, size=(500, obs_dim)).astype(np.float32)
    mean, _, _ = model.apply(variables, jnp.asarray(obs))
    c_out = c_forward(lib, obs)
    np.testing.assert_allclose(np.asarray(mean), c_out, atol=2e-5)


def test_sim2real_cli_from_trained_checkpoint(tmp_path):
    """Train a tiny experiment through the CLI, export the checkpoint to C
    via the sim2real CLI (reference sim2real.py:29-43 surface), and compile
    the result with g++."""
    import subprocess

    from quadswarm_tpu.sim2real.codegen import main as sim2real_main
    from quadswarm_tpu.training.train import main as train_main

    train_main([
        "--experiment", "s2r", "--train_dir", str(tmp_path),
        "--train_for_env_steps", "500", "--num_envs", "2",
        "--rollout", "4", "--batch_size", "8",
        "--quads_num_agents", "1", "--quads_episode_duration", "1.0",
        "--quads_neighbor_obs_type", "none",
        "--quads_neighbor_visible_num", "0",
        "--quads_neighbor_encoder_type", "no_encoder",
        "--rnn_size", "16",
    ])
    out_dir = tmp_path / "c"
    assert sim2real_main([
        "--model_dir", str(tmp_path / "s2r"),
        "--output_dir", str(out_dir), "--testing", "True"]) == 0
    c_path = out_dir / "model.c"
    assert c_path.exists()
    subprocess.run(["g++", "-c", str(c_path), "-o", str(out_dir / "m.o")],
                   check=True)
