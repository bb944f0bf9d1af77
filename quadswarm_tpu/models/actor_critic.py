"""Actor-critic with the quad encoder zoo.

Mirrors Sample Factory's default continuous-action actor-critic as configured
by the reference training runs (runs/quad_multi_mix_baseline.py:8-18):
separate actor/critic weights (--actor_critic_share_weights=False), tanh
nonlinearity, xavier_uniform init, state-independent action stddev
(--adaptive_stddev=False), diagonal-Gaussian policy over motor thrusts.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from quadswarm_tpu.models.encoders import make_encoder


class ActorCritic(nn.Module):
    """Separate-weights actor-critic; `__call__` returns
    (action_mean, log_std, value)."""

    action_dim: int = 4
    self_obs_dim: int = 18
    neighbor_obs_dim: int = 6
    num_neighbors: int = 6
    encoder_type: str = "corl"
    neighbor_encoder_type: str = "attention"
    neighbor_hidden: int = 256
    use_obstacles: bool = False
    obstacle_hidden: int = 256
    rnn_size: int = 256
    act: str = "tanh"
    sim2real: bool = False
    initial_stddev: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        mean = self.actor(obs)
        log_std = self.param(
            "log_std", nn.initializers.constant(jnp.log(self.initial_stddev)),
            (self.action_dim,))
        value = self.critic(obs)
        return mean, jnp.broadcast_to(log_std, mean.shape), value

    @nn.compact
    def actor(self, obs):
        enc = make_encoder(
            self.encoder_type, self_obs_dim=self.self_obs_dim,
            neighbor_obs_dim=self.neighbor_obs_dim,
            num_neighbors=self.num_neighbors,
            neighbor_encoder_type=self.neighbor_encoder_type,
            neighbor_hidden=self.neighbor_hidden,
            use_obstacles=self.use_obstacles,
            obstacle_hidden=self.obstacle_hidden, rnn_size=self.rnn_size,
            act=self.act, sim2real=self.sim2real, dtype=self.dtype,
        )
        x = enc.copy(name="actor_encoder")(obs)
        return nn.Dense(self.action_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="action_head")(x)

    @nn.compact
    def critic(self, obs):
        enc = make_encoder(
            self.encoder_type, self_obs_dim=self.self_obs_dim,
            neighbor_obs_dim=self.neighbor_obs_dim,
            num_neighbors=self.num_neighbors,
            neighbor_encoder_type=self.neighbor_encoder_type,
            neighbor_hidden=self.neighbor_hidden,
            use_obstacles=self.use_obstacles,
            obstacle_hidden=self.obstacle_hidden, rnn_size=self.rnn_size,
            act=self.act, sim2real=self.sim2real, dtype=self.dtype,
        )
        x = enc.copy(name="critic_encoder")(obs)
        return nn.Dense(1, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="value_head")(x)[..., 0]


def apply_fused(model: ActorCritic, params, obs):
    """Forward pass evaluating the actor and critic encoders as ONE batched
    computation instead of two sequential ones.

    The two encoders are structurally identical (same constructor args, only
    the weights differ), so their param subtrees stack leaf-for-leaf; a vmap
    over the stacked tree turns every pair of (b, k)x(k, n) matmuls into one
    (2, b, k)x(2, k, n) batched matmul.  Same FLOPs, half the kernel count —
    the PPO minibatch step is op-overhead-bound at baseline shapes (1024-row
    minibatches, ~1-3 us per op on TPU), so halving the op count is a direct
    win for the learner (docs/PERF.md).  Numerically identical to
    `model.apply` up to matmul tiling order; falls back to `model.apply` for
    unexpected param trees (e.g. shared-weight variants).
    """
    p = params["params"] if isinstance(params, dict) and "params" in params \
        else params
    try:
        pa, pc = p["actor_encoder"], p["critic_encoder"]
        ah, vh, log_std = p["action_head"], p["value_head"], p["log_std"]
    except (KeyError, TypeError, IndexError):
        return model.apply(params, obs)
    # The stacking trick needs structurally identical encoder subtrees (same
    # layers, same shapes); asymmetric-variant checkpoints fall back cleanly
    # instead of raising from jnp.stack.
    if jax.tree.structure(pa) != jax.tree.structure(pc) or any(
            jnp.shape(a) != jnp.shape(c)
            for a, c in zip(jax.tree.leaves(pa), jax.tree.leaves(pc))):
        return model.apply(params, obs)

    enc = make_encoder(
        model.encoder_type, self_obs_dim=model.self_obs_dim,
        neighbor_obs_dim=model.neighbor_obs_dim,
        num_neighbors=model.num_neighbors,
        neighbor_encoder_type=model.neighbor_encoder_type,
        neighbor_hidden=model.neighbor_hidden,
        use_obstacles=model.use_obstacles,
        obstacle_hidden=model.obstacle_hidden, rnn_size=model.rnn_size,
        act=model.act, sim2real=model.sim2real, dtype=model.dtype)
    stacked = jax.tree.map(lambda a, c: jnp.stack([a, c]), pa, pc)
    feats = jax.vmap(lambda q: enc.apply({"params": q}, obs))(stacked)

    dt = model.dtype

    def dense(x, h):  # flax Dense with dtype=dt: promote inputs+params to dt
        return jnp.dot(x.astype(dt), h["kernel"].astype(dt)) + h["bias"].astype(dt)

    mean = dense(feats[0], ah)
    value = dense(feats[1], vh)[..., 0]
    return mean, jnp.broadcast_to(log_std, mean.shape), value


def gaussian_log_prob(mean, log_std, actions):
    """Diagonal Gaussian log-density, summed over action dims."""
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((actions - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def sample_actions(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)
