"""Analysis plots (paper/* equivalents) + weight recycler unit tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.analysis.plots import extract_scalars, fps_compare, mean_std_plot
from quadswarm_tpu.models.weight_recycler import (
    dormant_mask, estimate_neuron_score, recycle_dense_pair,
)


def _write_metrics(d, seed, n=20):
    exp = os.path.join(d, f"exp_s{seed}")
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, "metrics.jsonl"), "w") as f:
        for i in range(n):
            f.write(json.dumps({"env_steps": i * 1000,
                                "metric/agent_success_rate":
                                    0.5 + 0.02 * i + 0.01 * seed}) + "\n")
    return exp


def test_extract_and_mean_std_plot(tmp_path):
    dirs = [_write_metrics(str(tmp_path), s) for s in range(3)]
    steps, vals = extract_scalars(dirs[0], "metric/agent_success_rate")
    assert len(steps) == 20 and vals[0] == 0.5
    out = str(tmp_path / "curves.png")
    mean_std_plot(dirs, ["metric/agent_success_rate"], out)
    assert os.path.getsize(out) > 0


def test_fps_compare_chart(tmp_path):
    out = str(tmp_path / "fps.png")
    fps_compare({1: 1e8, 8: 1e9, 32: 2e9, 128: 3e9}, out)
    assert os.path.getsize(out) > 0


def test_neuron_score_matches_reference_semantics():
    """estimate_neuron_score = mean |act| over batch axes
    (swarm_rl/models/weight_recycler.py:5-13)."""
    act = jnp.asarray(np.random.default_rng(0).normal(size=(32, 7, 16)))
    score = estimate_neuron_score(act)
    expected = np.abs(np.asarray(act)).mean(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(score), expected, rtol=1e-6)
    assert score.shape == (16,)


def test_recycle_dense_pair_zeroes_dormant_outputs():
    key = jax.random.PRNGKey(0)
    w_in = jnp.ones((4, 8))
    b_in = jnp.ones((8,))
    w_out = jnp.ones((8, 3))
    # unit 0 dormant (zero activations), others active
    act = jnp.ones((64, 8)).at[:, 0].set(0.0)
    mask = dormant_mask(act, tau=0.025)
    assert bool(mask[0]) and not bool(mask[1:].any())
    w_in2, b_in2, w_out2 = recycle_dense_pair(key, w_in, b_in, w_out, mask)
    assert bool((w_out2[0] == 0).all()) and float(b_in2[0]) == 0.0
    assert not bool(jnp.allclose(w_in2[:, 0], 1.0))       # re-initialized
    np.testing.assert_array_equal(np.asarray(w_out2[1:]), np.ones((7, 3)))


def test_episode_attention_heatmap(tmp_path):
    """Live attention extraction: row-stochastic (N, N) matrix with zero
    diagonal, and the plot writes a PNG (exceeds the reference's
    paper/attn_heatmap.py, which plots hardcoded constants)."""
    from quadswarm_tpu.analysis.attention import episode_attention, plot_heatmap
    from quadswarm_tpu.env.multi import EnvConfig
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.models.actor_critic import ActorCritic

    env_cfg = EnvConfig(num_agents=4, ep_time=2.0, neighbor_obs_type="pos_vel",
                        neighbor_visible_num=2, quads_mode="static_same_goal",
                        dtype=jnp.float32)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=2,
                        encoder_type="corl", neighbor_encoder_type="attention",
                        rnn_size=16, neighbor_hidden=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env_cfg.obs_dim)))
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    mat = episode_attention(env_cfg, dyn, model, params, jax.random.PRNGKey(1),
                            max_ticks=10)
    assert mat.shape == (4, 4)
    np.testing.assert_allclose(mat.sum(axis=1), np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(np.diag(mat), np.zeros(4), atol=1e-12)
    out = str(tmp_path / "attn.png")
    plot_heatmap(mat, out)
    assert (tmp_path / "attn.png").stat().st_size > 1000
