"""Neighbor observation gather: k-nearest selection by the reference's
distance+radial-velocity metric.

Reference: quadrotor_multi.py:212-279 (get_rel_pos_vel_item,
neighborhood_indices, extend_obs_space).  The per-drone Python loops become a
single batched top-k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def neighbor_obs(pos: jax.Array, vel: jax.Array, num_use_neighbor_obs: int,
                 clip_lo: jax.Array | None = None,
                 clip_hi: jax.Array | None = None) -> jax.Array:
    """(N,3),(N,3) -> (N, k*6) relative [pos, vel] of the k closest neighbors.

    Closeness metric (quadrotor_multi.py:262-270):
        m(i,j) = max(|p_j - p_i|, 0.01) + unit(p_j - p_i) . (v_j - v_i)
    With k == N-1 the ordering is the reference's plain index order (all
    neighbors, no sort) — matched exactly.
    """
    n = pos.shape[0]
    k = num_use_neighbor_obs
    rel_pos = pos[None, :, :] - pos[:, None, :]   # (i, j) = p_j - p_i
    rel_vel = vel[None, :, :] - vel[:, None, :]
    rel = jnp.concatenate([rel_pos, rel_vel], axis=-1)  # (N, N, 6)
    idx = neighbor_indices(pos, vel, k)

    # Select rows via a one-hot mask + sum instead of a gather: XLA gathers
    # (take_along_axis / advanced indexing) are scalar-indexed loads that
    # measure ~20x slower than this fully-vectorized masked reduction on TPU
    # (exact — each output sums one value and n-1 zeros).
    onehot = idx[:, :, None] == jnp.arange(n)              # (N, k, N) bool
    obs = jnp.sum(jnp.where(onehot[..., None], rel[:, None, :, :], 0.0),
                  axis=2).reshape(n, -1)
    if clip_lo is not None:
        obs = jnp.clip(obs, clip_lo, clip_hi)
    return obs


def neighbor_indices(pos: jax.Array, vel: jax.Array, k: int) -> jax.Array:
    """(N, k) int32 — which agent fills each neighbor-obs slot of each drone
    (the ordering `neighbor_obs` uses; also consumed by the attention
    heat-map tool to map attention weights back to agent identities)."""
    n = pos.shape[0]
    if k >= n - 1:
        # All neighbors in index order, skipping self (reference indices
        # [[j for j != i]]); static one-hot selection matrix.
        return jnp.asarray(
            [[j for j in range(n) if j != i] for i in range(n)], jnp.int32
        )  # (N, N-1)
    rel_pos = pos[None, :, :] - pos[:, None, :]
    rel_vel = vel[None, :, :] - vel[:, None, :]
    dist = jnp.linalg.norm(rel_pos, axis=-1)
    dist_safe = jnp.maximum(dist, 0.01)
    unit = rel_pos / dist_safe[..., None]
    metric = dist_safe + jnp.sum(unit * rel_vel, axis=-1)
    metric = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, metric)
    # top_k on -metric == reference's ascending argsort[:k] (ties break
    # by index in both)
    _, idx = jax.lax.top_k(-metric, k)
    return idx


def neighbor_clip_bounds(num_use_neighbor_obs: int, room_dims, vxyz_max: float,
                         dtype=jnp.float32):
    """Observation-space clip box for neighbor obs (quadrotor_multi.py:109-115:
    rxyz in ±room_range, rvxyz in ±2*vxyz_max)."""
    room_range = jnp.asarray(room_dims, dtype)
    one = jnp.concatenate([room_range, 2.0 * vxyz_max * jnp.ones(3, dtype)])
    full = jnp.tile(one, (num_use_neighbor_obs,))
    return -full, full
