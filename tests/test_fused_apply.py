"""apply_fused (stacked actor/critic encoder forward) vs model.apply parity.

apply_fused halves the learner's per-minibatch op count by evaluating the two
structurally-identical encoders as one batched computation (docs/PERF.md);
it must be numerically indistinguishable from the reference forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadswarm_tpu.models.actor_critic import ActorCritic, apply_fused


CONFIGS = [
    dict(encoder_type="corl", neighbor_encoder_type="attention"),
    dict(encoder_type="corl", neighbor_encoder_type="mean_embed"),
    dict(encoder_type="corl", neighbor_encoder_type="mlp"),
    dict(encoder_type="corl", neighbor_encoder_type="attention",
         use_obstacles=True),
    dict(encoder_type="attention"),
    dict(encoder_type="attention", sim2real=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: "-".join(
    f"{k}={v}" for k, v in c.items()))
def test_fused_matches_apply(cfg):
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=6,
                        rnn_size=32, neighbor_hidden=32, obstacle_hidden=32,
                        **cfg)
    obs_dim = 18 + 6 * 6 + (9 if (cfg.get("use_obstacles")
                                  or cfg["encoder_type"] == "attention") else 0)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, obs_dim)))
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, obs_dim), jnp.float32)

    mean_r, log_std_r, value_r = model.apply(params, obs)
    mean_f, log_std_f, value_f = apply_fused(model, params, obs)

    np.testing.assert_allclose(mean_f, mean_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(log_std_f, log_std_r, rtol=0, atol=0)
    np.testing.assert_allclose(value_f, value_r, rtol=1e-5, atol=1e-5)


def test_fused_fallback_on_unknown_tree():
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=6,
                        rnn_size=16, neighbor_hidden=16)
    obs_dim = 18 + 36
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    obs = jnp.ones((4, obs_dim), jnp.float32)
    # Shared-weights-style tree without actor/critic split: must fall back
    # (and model.apply itself will fail on it, so just check dispatch).
    ref = model.apply(params, obs)
    out = apply_fused(model, params, obs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_grads_match():
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=6,
                        rnn_size=32, neighbor_hidden=32)
    obs_dim = 18 + 36
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    obs = jax.random.normal(jax.random.PRNGKey(1), (32, obs_dim), jnp.float32)

    def loss_ref(p):
        m, _, v = model.apply(p, obs)
        return jnp.mean(m ** 2) + jnp.mean(v ** 2)

    def loss_fused(p):
        m, _, v = apply_fused(model, p, obs)
        return jnp.mean(m ** 2) + jnp.mean(v ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-4, atol=1e-5), g_ref, g_fused)
