"""Self-observation construction (reference: gym_art/quadrotor_multi/get_state.py).

Each obs representation is a pure function of the (noisy) drone state and
goal; the choice is static config.  Sizes match QUADS_OBS_REPR
(quad_utils.py:30-34): 18 / 19 / 24 dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

OBS_REPR_SIZES = {
    "xyz_vxyz_R_omega": 18,
    "xyz_vxyz_R_omega_floor": 19,
    "xyz_vxyz_R_omega_wall": 24,
}

NEIGHBOR_OBS_SIZES = {"none": 0, "pos_vel": 6}
OBSTACLE_OBS_SIZES = {"none": 0, "octomap": 9}


def self_obs(obs_repr: str, pos: jax.Array, vel: jax.Array, rot: jax.Array,
             omega: jax.Array, goal: jax.Array, room_box) -> jax.Array:
    """Build the self-observation from (already noise-injected) state.

    xyz_vxyz_R_omega: [pos-goal, vel, R.flatten(), omega]    (get_state.py:6-25)
    ..._floor: + [pos_z]                                     (:28-47)
    ..._wall:  + clip(pos - room_lo, 0, 5), clip(room_hi - pos, 0, 5)  (:50-72)
    """
    base = [pos - goal, vel, rot.reshape(rot.shape[:-2] + (9,)), omega]
    if obs_repr == "xyz_vxyz_R_omega":
        parts = base
    elif obs_repr == "xyz_vxyz_R_omega_floor":
        parts = base + [pos[..., 2:3]]
    elif obs_repr == "xyz_vxyz_R_omega_wall":
        lo = jnp.asarray(room_box[0], pos.dtype)
        hi = jnp.asarray(room_box[1], pos.dtype)
        parts = base + [
            jnp.clip(pos - lo, 0.0, 5.0),
            jnp.clip(hi - pos, 0.0, 5.0),
        ]
    else:
        raise ValueError(f"unknown obs_repr: {obs_repr}")
    return jnp.concatenate(parts, axis=-1)


def obs_size(obs_repr: str, neighbor_obs_type: str, num_use_neighbor_obs: int,
             use_obstacles: bool) -> int:
    """Total per-drone observation width (quadrotor_single.py:278-335)."""
    size = OBS_REPR_SIZES[obs_repr]
    size += NEIGHBOR_OBS_SIZES[neighbor_obs_type] * num_use_neighbor_obs
    if use_obstacles:
        size += OBSTACLE_OBS_SIZES["octomap"]
    return size
