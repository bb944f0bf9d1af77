"""Per-drone reward terms (reference: quadrotor_single.py:34-92
compute_reward_weighted) and the swarm-level collision rewards
(quadrotor_multi.py:499-546), as pure batched functions.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RewardCoeffs:
    """Reward weights (quadrotor_multi.py:91-94 defaults, overridden by the
    reward-shaping wrapper defaults reward_shaping.py:7-16 at train time)."""

    pos: jax.Array = 1.0
    effort: jax.Array = 0.05
    crash: jax.Array = 1.0
    orient: jax.Array = 1.0
    spin: jax.Array = 0.1
    quadcol_bin: jax.Array = 0.0
    quadcol_bin_smooth_max: jax.Array = 0.0
    quadcol_bin_obst: jax.Array = 0.0
    # declared-but-unused coefficients kept for config parity
    action_change: jax.Array = 0.0
    yaw: jax.Array = 0.0
    rot: jax.Array = 0.0
    attitude: jax.Array = 0.0
    vel: jax.Array = 0.0

    def astuple_used(self):
        return (self.pos, self.effort, self.crash, self.orient, self.spin)


class RewardInfo(NamedTuple):
    """Raw (unweighted, dt-scaled) reward components for metrics parity with
    the reference's rew_info dict (quadrotor_single.py:68-85)."""

    rew_pos: jax.Array
    rew_action: jax.Array
    rew_crash: jax.Array
    rew_orient: jax.Array
    rew_spin: jax.Array
    rewraw_pos: jax.Array
    rewraw_action: jax.Array
    rewraw_crash: jax.Array
    rewraw_orient: jax.Array
    rewraw_spin: jax.Array


def compute_reward(coeffs: RewardCoeffs, pos: jax.Array, goal: jax.Array,
                   action: jax.Array, rot: jax.Array, omega: jax.Array,
                   on_floor: jax.Array, dt: float):
    """Weighted single-drone reward; returns (reward, RewardInfo).

    reward = -dt * (pos + effort + crash + orient + spin costs); crash/orient
    depend on the floor-contact flag (quadrotor_single.py:44-58).
    """
    dist = jnp.linalg.norm(goal - pos, axis=-1)
    cost_pos_raw = dist
    cost_effort_raw = jnp.linalg.norm(action, axis=-1)
    cost_orient_raw = jnp.where(on_floor, 1.0, -rot[..., 2, 2])
    cost_spin_raw = jnp.linalg.norm(omega, axis=-1)
    cost_crash_raw = on_floor.astype(pos.dtype)

    reward = -dt * (
        coeffs.pos * cost_pos_raw
        + coeffs.effort * cost_effort_raw
        + coeffs.crash * cost_crash_raw
        + coeffs.orient * cost_orient_raw
        + coeffs.spin * cost_spin_raw
    )
    info = RewardInfo(
        rew_pos=-dt * coeffs.pos * cost_pos_raw,
        rew_action=-dt * coeffs.effort * cost_effort_raw,
        rew_crash=-dt * coeffs.crash * cost_crash_raw,
        rew_orient=-dt * coeffs.orient * cost_orient_raw,
        rew_spin=-dt * coeffs.spin * cost_spin_raw,
        rewraw_pos=-dt * cost_pos_raw,
        rewraw_action=-dt * cost_effort_raw,
        rewraw_crash=-dt * cost_crash_raw,
        rewraw_orient=-dt * cost_orient_raw,
        rewraw_spin=-dt * cost_spin_raw,
    )
    return reward, info


def proximity_penalties(dist_matrix: jax.Array, pair_mask: jax.Array,
                        falloff_threshold: float | jax.Array,
                        max_penalty: jax.Array, dt: float) -> jax.Array:
    """Smooth proximity penalty, summed per drone
    (collisions/quadrotors.py:94-103).

    dist_matrix: (N, N) pairwise distances; pair_mask: (N, N) bool for pairs
    inside the falloff radius (and i < j semantics handled by symmetry: each
    unordered pair contributes once to BOTH drones, like the reference loop).
    """
    penalty = (-max_penalty / falloff_threshold) * dist_matrix + max_penalty
    penalty = jnp.where(pair_mask, penalty, 0.0)
    # Zero the diagonal; sum over the other axis gives per-drone totals.
    n = dist_matrix.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    penalty = jnp.where(eye, 0.0, penalty)
    return dt * jnp.sum(penalty, axis=-1)
