"""Policy/value network encoders (flax.linen).

Reference: swarm_rl/models/quad_multi_model.py + attention_layer.py (PyTorch,
Sample Factory Encoder subclasses).  Same architecture zoo, rebuilt for
flax/XLA: the observation layout is [self | k * (rel_pos, rel_vel) | sdf9]
and the encoder choice is static config.

  encoder_type='corl'   -> QuadMultiEncoder with neighbor encoder one of
                           {deepsets(mean_embed), attention, mlp, no_encoder}
  encoder_type='attention' -> QuadMultiHeadAttentionEncoder
                              (sim2real variant: single-head, shallower)

Batched matmuls map straight onto the MXU; prefer bfloat16 params via the
`param_dtype` argument when training at scale.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def nonlinearity(name: str) -> Callable:
    return {"tanh": nn.tanh, "relu": nn.relu, "elu": nn.elu}[name]


class MLP(nn.Module):
    sizes: tuple
    act: str = "tanh"
    act_last: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fn = nonlinearity(self.act)
        for i, size in enumerate(self.sizes):
            x = nn.Dense(size, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform())(x)
            if self.act_last or i < len(self.sizes) - 1:
                x = fn(x)
        return x


class MultiHeadAttention(nn.Module):
    """Transformer MHA block with residual + LayerNorm
    (attention_layer.py:10-54)."""

    n_head: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d_k = self.d_model
        residual = q
        b, lq = q.shape[0], q.shape[1]
        dense = lambda name: nn.Dense(self.n_head * d_k, use_bias=False,
                                      dtype=self.dtype, name=name)
        qh = dense("w_qs")(q).reshape(b, lq, self.n_head, d_k).transpose(0, 2, 1, 3)
        kh = dense("w_ks")(k).reshape(b, k.shape[1], self.n_head, d_k).transpose(0, 2, 1, 3)
        vh = dense("w_vs")(v).reshape(b, v.shape[1], self.n_head, d_k).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / jnp.sqrt(d_k).astype(self.dtype), kh)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.n_head * d_k)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="fc")(out)
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(out)
        return out, attn


class OneHeadAttention(nn.Module):
    """Single-head attention block (attention_layer.py:57-92)."""

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        residual = q
        dense = lambda name: nn.Dense(self.d_model, use_bias=False,
                                      dtype=self.dtype, name=name)
        qh, kh, vh = dense("w_qs")(q), dense("w_ks")(k), dense("w_vs")(v)
        attn = jnp.einsum("bqd,bkd->bqk", qh / jnp.sqrt(self.d_model).astype(self.dtype), kh)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", attn, vh)
        out = dense("fc")(out)
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(out)
        return out, attn


class NeighborEncoderDeepsets(nn.Module):
    """Mean-embedding over neighbors (quad_multi_model.py:24-41)."""

    neighbor_obs_dim: int
    hidden: int
    num_neighbors: int
    act: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, self_obs, neighbor_obs):
        b = neighbor_obs.shape[0]
        x = neighbor_obs.reshape(b, self.num_neighbors, self.neighbor_obs_dim)
        x = MLP((self.hidden, self.hidden), self.act, dtype=self.dtype)(x)
        return jnp.mean(x, axis=1)


class NeighborEncoderAttention(nn.Module):
    """CoRL-2021 attention neighborhood encoder (quad_multi_model.py:44-101):
    per-neighbor embeddings e_i conditioned on self obs, values h_i, scalar
    attention scores from (e_i, mean(e)) -> softmax-weighted sum."""

    neighbor_obs_dim: int
    hidden: int
    num_neighbors: int
    act: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, self_obs, neighbor_obs):
        b = neighbor_obs.shape[0]
        k = self.num_neighbors
        nb = neighbor_obs.reshape(b, k, self.neighbor_obs_dim)
        self_rep = jnp.broadcast_to(self_obs[:, None, :], (b, k, self_obs.shape[-1]))
        e = MLP((self.hidden, self.hidden), self.act, dtype=self.dtype,
                name="embedding_mlp")(jnp.concatenate([self_rep, nb], axis=-1))
        h = MLP((self.hidden, self.hidden), self.act, dtype=self.dtype,
                name="neighbor_value_mlp")(e)
        e_mean = jnp.mean(e, axis=1, keepdims=True)
        e_mean = jnp.broadcast_to(e_mean, e.shape)
        scores = MLP((self.hidden, self.hidden, 1), self.act, act_last=False,
                     dtype=self.dtype, name="attention_mlp")(
            jnp.concatenate([e, e_mean], axis=-1))
        alpha = jax.nn.softmax(scores[..., 0], axis=1)
        # Recorded only under apply(..., mutable=["intermediates"]) — the
        # attention heat-map tool (analysis/attention.py); no-op in training.
        self.sow("intermediates", "attn", alpha)
        return jnp.sum(alpha[..., None] * h, axis=1)


class NeighborEncoderMlp(nn.Module):
    """Flat MLP over all neighbor obs (quad_multi_model.py:104-122)."""

    neighbor_obs_dim: int
    hidden: int
    num_neighbors: int
    act: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, self_obs, neighbor_obs):
        return MLP((self.hidden, self.hidden, self.hidden), self.act,
                   dtype=self.dtype)(neighbor_obs)


class QuadMultiEncoder(nn.Module):
    """'corl' encoder (quad_multi_model.py:250-353): self MLP + optional
    neighbor encoder + optional obstacle MLP, fused by a tanh feed-forward to
    2*rnn_size features."""

    self_obs_dim: int
    neighbor_obs_dim: int
    num_neighbors: int
    neighbor_encoder_type: str = "attention"  # attention|mean_embed|mlp|no_encoder
    neighbor_hidden: int = 256
    use_obstacles: bool = False
    obstacle_obs_dim: int = 9
    obstacle_hidden: int = 256
    rnn_size: int = 256
    act: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        s = self.self_obs_dim
        nb_total = self.neighbor_obs_dim * self.num_neighbors
        self_obs = obs[..., :s]
        embeddings = [MLP((self.rnn_size, self.rnn_size), self.act,
                          dtype=self.dtype, name="self_encoder")(self_obs)]
        if self.num_neighbors > 0 and self.neighbor_encoder_type != "no_encoder":
            nb = obs[..., s:s + nb_total]
            enc = {"mean_embed": NeighborEncoderDeepsets,
                   "attention": NeighborEncoderAttention,
                   "mlp": NeighborEncoderMlp}[self.neighbor_encoder_type]
            embeddings.append(enc(self.neighbor_obs_dim, self.neighbor_hidden,
                                  self.num_neighbors, self.act, self.dtype,
                                  name="neighbor_encoder")(self_obs, nb))
        if self.use_obstacles:
            ob = obs[..., s + nb_total:]
            embeddings.append(MLP((self.obstacle_hidden, self.obstacle_hidden),
                                  self.act, dtype=self.dtype,
                                  name="obstacle_encoder")(ob))
        x = jnp.concatenate(embeddings, axis=-1)
        x = nn.Dense(2 * self.rnn_size, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="feed_forward")(x)
        return nn.tanh(x)

    @property
    def out_size(self) -> int:
        return 2 * self.rnn_size


class QuadMultiHeadAttentionEncoder(nn.Module):
    """'attention' encoder (quad_multi_model.py:125-200): self/neighbor/
    obstacle embeds, 4-head MHA over the 2 non-self tokens, tanh fuse.
    sim2real=True switches to the single-head shallow variant (:203-247)."""

    self_obs_dim: int
    neighbor_obs_dim: int
    num_neighbors: int
    obstacle_obs_dim: int = 9
    rnn_size: int = 256
    act: str = "tanh"
    sim2real: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        s = self.self_obs_dim
        nb_total = self.neighbor_obs_dim * self.num_neighbors
        self_obs = obs[..., :s]
        nb = obs[..., s:s + nb_total]
        ob = obs[..., s + nb_total:]
        depth = (self.rnn_size,) if self.sim2real else (self.rnn_size, self.rnn_size)
        self_embed = MLP(depth, self.act, dtype=self.dtype, name="self_embed")(self_obs)
        nb_embed = MLP(depth, self.act, dtype=self.dtype, name="neighbor_embed")(nb)
        ob_embed = MLP(depth, self.act, dtype=self.dtype, name="obstacle_embed")(ob)
        tokens = jnp.stack([nb_embed, ob_embed], axis=1)  # (b, 2, d)
        if self.sim2real:
            attn_out, attn_w = OneHeadAttention(
                self.rnn_size, dtype=self.dtype,
                name="attention")(tokens, tokens, tokens)
        else:
            attn_out, attn_w = MultiHeadAttention(
                4, self.rnn_size, dtype=self.dtype,
                name="attention")(tokens, tokens, tokens)
        self.sow("intermediates", "attn", attn_w)
        b = obs.shape[0]
        x = jnp.concatenate([self_embed, attn_out.reshape(b, -1)], axis=-1)
        out_size = self.rnn_size if self.sim2real else 2 * self.rnn_size
        x = nn.Dense(out_size, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="feed_forward")(x)
        return nn.tanh(x)

    @property
    def out_size(self) -> int:
        return self.rnn_size if self.sim2real else 2 * self.rnn_size


def make_encoder(cfg_encoder_type: str, *, self_obs_dim: int,
                 neighbor_obs_dim: int, num_neighbors: int,
                 neighbor_encoder_type: str = "attention",
                 neighbor_hidden: int = 256, use_obstacles: bool = False,
                 obstacle_hidden: int = 256, rnn_size: int = 256,
                 act: str = "tanh", sim2real: bool = False,
                 dtype=jnp.float32) -> nn.Module:
    """Encoder factory (quad_multi_model.py:356-364)."""
    if cfg_encoder_type == "attention":
        return QuadMultiHeadAttentionEncoder(
            self_obs_dim=self_obs_dim, neighbor_obs_dim=neighbor_obs_dim,
            num_neighbors=num_neighbors, rnn_size=rnn_size, act=act,
            sim2real=sim2real, dtype=dtype)
    return QuadMultiEncoder(
        self_obs_dim=self_obs_dim, neighbor_obs_dim=neighbor_obs_dim,
        num_neighbors=num_neighbors, neighbor_encoder_type=neighbor_encoder_type,
        neighbor_hidden=neighbor_hidden, use_obstacles=use_obstacles,
        obstacle_hidden=obstacle_hidden, rnn_size=rnn_size, act=act, dtype=dtype)
