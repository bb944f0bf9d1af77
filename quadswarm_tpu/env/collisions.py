"""Collision detection + response for drone-drone / obstacle / room contacts.

Reference: gym_art/quadrotor_multi/collisions/{quadrotors,obstacles,room,utils}.py.
The per-pair Python loops become masked batched updates over an (N, N) pair
grid; the ragged "list of colliding pairs" becomes boolean masks.

Sequential-pair semantics: the reference mutates drone velocities pair by
pair, so a drone in several simultaneous collisions sees a chain of updates.
Here each drone takes the response of its lowest-index colliding partner in
the same (i, j), i<j order the reference iterates — identical whenever a
drone collides with at most one partner per tick (the overwhelmingly common
case; the reference itself assumes one obstacle collision per drone,
quadrotor_multi.py:465-466).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5
OMEGA_MAX_SCALE = 20.0 * jnp.pi


def pairwise_distances(pos: jax.Array) -> jax.Array:
    """(N,3) -> (N,N) Euclidean distances (collisions/quadrotors.py:62-91)."""
    diff = pos[..., :, None, :] - pos[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff**2, axis=-1) + 0.0)


def collision_matrix(pos: jax.Array, collision_threshold) -> tuple[jax.Array, jax.Array]:
    """Return (dist (N,N), collide (N,N) bool, diagonal False)."""
    dist = pairwise_distances(pos)
    n = pos.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    collide = (dist <= collision_threshold) & ~eye
    return dist, collide


def _rand_unit(key: jax.Array, shape, dtype) -> jax.Array:
    v = jax.random.uniform(key, shape, dtype, -1.0, 1.0)
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + EPS)


def _compute_new_vel(key, max_vel_magn, vel, vel_shift, low=0.2, high=0.8):
    """Post-collision speed-decayed velocity (collisions/utils.py:7-18)."""
    decay = jax.random.uniform(key, vel.shape[:-1], vel.dtype, low, high)
    vel_new = vel + vel_shift
    mag = jnp.linalg.norm(vel_new, axis=-1, keepdims=True)
    direction = vel_new / (mag + EPS)
    new_mag = jnp.minimum(mag[..., 0] * decay, max_vel_magn)
    return direction * new_mag[..., None]


def _compute_new_omega(key, shape, dtype, magn_scale=20.0):
    """Random omega kick (collisions/utils.py:21-33)."""
    k1, k2 = jax.random.split(key)
    omega_max = magn_scale * jnp.pi
    direction = _rand_unit(k1, shape + (3,), dtype)
    mag = jax.random.uniform(k2, shape, dtype, omega_max / 2, omega_max)
    return direction * mag[..., None]


def drone_collision_response(key: jax.Array, pos: jax.Array, vel: jax.Array,
                             omega: jax.Array, new_pair_mask: jax.Array):
    """Apply elastic-with-noise collision response for flagged pairs.

    pos/vel/omega: (N, 3); new_pair_mask: (N, N) bool, symmetric, True only
    for NEW collisions this tick (quadrotor_multi.py:437-438, 560-566).
    Returns updated (vel, omega).

    Per reference perform_collision_between_drones
    (collisions/quadrotors.py:23-59): exchange normal velocity components,
    add momentum-preserving (+c, -c) noise plus independent small noise,
    resampled up to 3 times until the post-collision normal velocities
    separate; then decay speed and kick omega.
    """
    n = pos.shape[0]
    dtype = vel.dtype
    diff = pos[:, None, :] - pos[None, :, :]              # pos_i - pos_j
    norm_mag = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    coll_norm = diff / jnp.where(norm_mag == 0.0, norm_mag + EPS, norm_mag)

    v_i_n = jnp.sum(vel[:, None, :] * coll_norm, axis=-1)  # (N,N)
    v_j_n = jnp.sum(vel[None, :, :] * coll_norm, axis=-1)
    vel_change = (v_j_n - v_i_n)[..., None] * coll_norm    # shift for drone i

    # 3-attempt noise resampling: keep the first valid candidate, else the
    # last one — fixed-trip version of the reference's `for _ in range(3)`
    # with break (collisions/quadrotors.py:35-47).
    k_noise, k_decay_i, k_decay_j, k_omega = jax.random.split(key, 4)
    shift_i = shift_j = None
    chosen = jnp.zeros((n, n), bool)
    for attempt in range(3):
        ka, kb = jax.random.split(jax.random.fold_in(k_noise, attempt))
        cons = 0.8 * jax.random.normal(ka, (n, n, 3), dtype)
        small = 0.15 * jax.random.normal(kb, (n, n, 2, 3), dtype)
        cand_i = vel_change + cons + small[..., 0, :]
        cand_j = -vel_change - cons + small[..., 1, :]
        if shift_i is None:
            shift_i, shift_j = cand_i, cand_j
        else:
            shift_i = jnp.where(chosen[..., None], shift_i, cand_i)
            shift_j = jnp.where(chosen[..., None], shift_j, cand_j)
        d_i = jnp.sum((vel[:, None, :] + cand_i) * coll_norm, axis=-1)
        d_j = jnp.sum((vel[None, :, :] + cand_j) * coll_norm, axis=-1)
        chosen = chosen | ((d_i > 0) & (d_j < 0))

    max_vel = jnp.maximum(
        jnp.linalg.norm(vel, axis=-1)[:, None], jnp.linalg.norm(vel, axis=-1)[None, :]
    )
    new_vel_i = _compute_new_vel(k_decay_i, max_vel, vel[:, None, :] + 0 * shift_i, shift_i)
    new_vel_j = _compute_new_vel(k_decay_j, max_vel, vel[None, :, :] + 0 * shift_j, shift_j)
    omega_kick = _compute_new_omega(k_omega, (n, n), dtype)

    # Each drone takes the response of its FIRST colliding partner.
    # For drone d: row d (d as i, partners j>d) and column d (d as j, partners i<d).
    as_i = new_pair_mask & (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
    any_row = jnp.any(as_i, axis=1)
    first_col = jnp.argmax(as_i, axis=1)
    as_j = new_pair_mask & (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
    any_col = jnp.any(as_j, axis=0)
    first_row = jnp.argmax(as_j, axis=0)

    idx = jnp.arange(n)
    vel_from_row = new_vel_i[idx, first_col]          # drone d as i
    omega_from_row = omega[idx] + omega_kick[idx, first_col]
    vel_from_col = new_vel_j[first_row, idx]          # drone d as j
    omega_from_col = omega[idx] - omega_kick[first_row, idx]

    # Row pairing (drone as lower index) takes priority, like iteration order.
    vel_out = jnp.where(any_row[:, None], vel_from_row,
                        jnp.where(any_col[:, None], vel_from_col, vel))
    omega_out = jnp.where(any_row[:, None], omega_from_row,
                          jnp.where(any_col[:, None], omega_from_col, omega))
    return vel_out, omega_out


def obstacle_collision_response(key: jax.Array, pos: jax.Array, vel: jax.Array,
                                omega: jax.Array, obstacle_pos: jax.Array,
                                obstacle_size, hit_mask: jax.Array):
    """Reflect velocity off a vertical cylinder obstacle
    (collisions/obstacles.py:8-50).

    obstacle_pos: (N, 3) = position of the obstacle each drone hit (gathered);
    hit_mask: (N,) bool.
    """
    n = pos.shape[0]
    dtype = vel.dtype
    coll_norm = pos - obstacle_pos
    coll_norm = coll_norm.at[..., 2].set(0.0)
    mag = jnp.linalg.norm(coll_norm, axis=-1, keepdims=True)
    coll_norm = coll_norm / jnp.where(mag == 0.0, mag + EPS, mag)

    vel_magn = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    new_vel = vel_magn * coll_norm

    # 3-attempt directional noise (reference loops i in range(3) w/ break)
    k_noise, k_decay, k_omega = jax.random.split(key, 3)
    noise = jnp.zeros_like(vel)
    chosen = jnp.zeros((n,), bool)
    for attempt in range(3):
        ka, kb = jax.random.split(jax.random.fold_in(k_noise, attempt))
        cand = (0.1 * jax.random.normal(ka, (n, 3), dtype)
                + 0.05 * jax.random.normal(kb, (n, 3), dtype))
        valid = jnp.sum((new_vel + cand) * coll_norm, axis=-1) > 0
        take = valid & ~chosen
        noise = jnp.where(take[:, None], cand, noise)
        chosen = chosen | valid

    inside = jnp.linalg.norm(pos - obstacle_pos, axis=-1) < obstacle_size / 2
    shift = new_vel - vel + noise
    vel_bounce = _compute_new_vel(k_decay, vel_magn[..., 0], vel, shift)
    vel_inside = _compute_new_vel(k_decay, vel_magn[..., 0], vel, shift, low=1.0, high=1.0)
    vel_new = jnp.where(inside[:, None], vel_inside, vel_bounce)
    omega_new = omega + _compute_new_omega(k_omega, (n,), dtype, magn_scale=1.0)

    vel_out = jnp.where(hit_mask[:, None], vel_new, vel)
    omega_out = jnp.where(hit_mask[:, None], omega_new, omega)
    return vel_out, omega_out


def wall_collision_response(key: jax.Array, pos: jax.Array, vel: jax.Array,
                            omega: jax.Array, room_box, hit_mask: jax.Array):
    """Randomized damped bounce off walls (collisions/room.py:6-44)."""
    n = pos.shape[0]
    dtype = vel.dtype
    lo = jnp.asarray(room_box[0], dtype)
    hi = jnp.asarray(room_box[1], dtype)
    k_speed, k_dir, k_dx, k_dy, k_dz, k_omega = jax.random.split(key, 6)

    speed = jnp.linalg.norm(vel, axis=-1)
    u = jax.random.uniform(k_speed, (n,), dtype)
    real_speed = jnp.clip((0.2 + 0.6 * u) * speed, 0.1, 6.0)

    direction = jax.random.uniform(k_dir, (n, 3), dtype, -1.0, 1.0)
    dx_pos = jax.random.uniform(k_dx, (n,), dtype, 0.1, 1.0)
    dy_pos = jax.random.uniform(k_dy, (n,), dtype, 0.1, 1.0)
    at_x_lo = pos[:, 0] == lo[0]
    at_x_hi = pos[:, 0] == hi[0]
    at_y_lo = pos[:, 1] == lo[1]
    at_y_hi = pos[:, 1] == hi[1]
    dirx = jnp.where(at_x_lo, dx_pos, jnp.where(at_x_hi, -dx_pos, direction[:, 0]))
    diry = jnp.where(at_y_lo, dy_pos, jnp.where(at_y_hi, -dy_pos, direction[:, 1]))
    dirz = jax.random.uniform(k_dz, (n,), dtype, -1.0, -0.5)
    direction = jnp.stack([dirx, diry, dirz], axis=-1)
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + EPS)

    vel_new = real_speed[:, None] * direction
    omega_new = omega + _compute_new_omega(k_omega, (n,), dtype)
    vel_out = jnp.where(hit_mask[:, None], vel_new, vel)
    omega_out = jnp.where(hit_mask[:, None], omega_new, omega)
    return vel_out, omega_out


def ceiling_collision_response(key: jax.Array, vel: jax.Array, omega: jax.Array,
                               hit_mask: jax.Array):
    """Randomized damped bounce off the ceiling (collisions/room.py:91-113)."""
    n = vel.shape[0]
    dtype = vel.dtype
    k_speed, k_dir, k_dz, k_omega = jax.random.split(key, 4)
    speed = jnp.linalg.norm(vel, axis=-1)
    u = jax.random.uniform(k_speed, (n,), dtype)
    real_speed = jnp.clip((0.2 + 0.6 * u) * speed, 0.1, 6.0)
    direction = jax.random.uniform(k_dir, (n, 3), dtype, -1.0, 1.0)
    dirz = jax.random.uniform(k_dz, (n,), dtype, -1.0, -0.5)
    direction = direction.at[:, 2].set(dirz)
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + EPS)
    vel_new = real_speed[:, None] * direction
    omega_new = omega + _compute_new_omega(k_omega, (n,), dtype)
    vel_out = jnp.where(hit_mask[:, None], vel_new, vel)
    omega_out = jnp.where(hit_mask[:, None], omega_new, omega)
    return vel_out, omega_out
