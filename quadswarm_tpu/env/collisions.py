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

    TPU shape: each drone resolves against its FIRST colliding partner (the
    reference iterates pairs sequentially; identical whenever a drone has at
    most one partner per tick).  All work is O(N): the partner's state comes
    from a one-hot select, and the pair's shared random draws (the reference
    draws once per pair, applying +noise to drone i and -noise to drone j)
    come from folding the unordered pair id into the key — both drones of a
    mutual pair derive identical draws, preserving the momentum-pairing.
    """
    n = pos.shape[0]
    dtype = vel.dtype
    idx = jnp.arange(n)

    # --- partner selection (reference pair iteration order: i<j pairs; a
    # drone's row pairing — drone as lower index — takes priority) ----------
    upper = new_pair_mask & (idx[:, None] < idx[None, :])
    any_row = jnp.any(upper, axis=1)           # d as i: partners j > d
    first_col = jnp.argmax(upper, axis=1)
    any_col = jnp.any(upper, axis=0)           # d as j: partners i < d
    first_row = jnp.argmax(upper, axis=0)
    active = any_row | any_col
    partner = jnp.where(any_row, first_col, first_row)

    # One-hot gather of partner state (vectorized select+reduce beats TPU
    # scalar-indexed gathers by ~an order of magnitude; exact — one nonzero).
    hot = (partner[:, None] == idx[None, :])[..., None]   # (N, N, 1)
    p_pos = jnp.sum(jnp.where(hot, pos[None], 0.0), axis=1)
    p_vel = jnp.sum(jnp.where(hot, vel[None], 0.0), axis=1)

    # --- pair frame: a = lower index, b = higher; norm points a <- b --------
    is_a = partner > idx                        # this drone is the pair's i
    lo = jnp.minimum(idx, partner)
    pair_id = lo * n + jnp.maximum(idx, partner)
    pos_a = jnp.where(is_a[:, None], pos, p_pos)
    pos_b = jnp.where(is_a[:, None], p_pos, pos)
    vel_a = jnp.where(is_a[:, None], vel, p_vel)
    vel_b = jnp.where(is_a[:, None], p_vel, vel)
    diff = pos_a - pos_b
    mag = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    coll_norm = diff / jnp.where(mag == 0.0, mag + EPS, mag)
    vn_a = jnp.sum(vel_a * coll_norm, axis=-1)
    vn_b = jnp.sum(vel_b * coll_norm, axis=-1)
    vel_change = (vn_b - vn_a)[..., None] * coll_norm      # shift for drone a

    k_noise, k_decay, k_omega = jax.random.split(key, 3)
    pair_noise_key = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(k_noise, (n,) + k_noise.shape), pair_id)

    # 3-attempt noise resampling: keep the first valid candidate, else the
    # last one — fixed-trip version of the reference's `for _ in range(3)`
    # with break (collisions/quadrotors.py:35-47).
    shift_a = shift_b = None
    chosen = jnp.zeros((n,), bool)
    for attempt in range(3):
        kab = jax.vmap(lambda k: jax.random.fold_in(k, attempt))(pair_noise_key)
        draw = jax.vmap(lambda k: jax.random.normal(k, (3, 3), dtype))(kab)
        cons, small_a, small_b = 0.8 * draw[:, 0], 0.15 * draw[:, 1], 0.15 * draw[:, 2]
        cand_a = vel_change + cons + small_a
        cand_b = -vel_change - cons + small_b
        if shift_a is None:
            shift_a, shift_b = cand_a, cand_b
        else:
            shift_a = jnp.where(chosen[:, None], shift_a, cand_a)
            shift_b = jnp.where(chosen[:, None], shift_b, cand_b)
        d_a = jnp.sum((vel_a + cand_a) * coll_norm, axis=-1)
        d_b = jnp.sum((vel_b + cand_b) * coll_norm, axis=-1)
        chosen = chosen | ((d_a > 0) & (d_b < 0))

    shift = jnp.where(is_a[:, None], shift_a, shift_b)
    max_vel = jnp.maximum(jnp.linalg.norm(vel_a, axis=-1),
                          jnp.linalg.norm(vel_b, axis=-1))
    pair_decay_key = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(k_decay, (n,) + k_decay.shape), pair_id)
    decay = jax.vmap(lambda k: jax.random.uniform(k, (2,), dtype, 0.2, 0.8))(
        pair_decay_key)
    decay = jnp.where(is_a, decay[:, 0], decay[:, 1])
    vel_hit = vel + shift
    hit_mag = jnp.linalg.norm(vel_hit, axis=-1, keepdims=True)
    direction = vel_hit / (hit_mag + EPS)
    new_speed = jnp.minimum(hit_mag[..., 0] * decay, max_vel)
    new_vel = direction * new_speed[..., None]

    pair_omega_key = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(k_omega, (n,) + k_omega.shape), pair_id)
    kick = jax.vmap(lambda k: _compute_new_omega(k, (), dtype))(pair_omega_key)
    omega_new = omega + jnp.where(is_a[:, None], kick, -kick)

    vel_out = jnp.where(active[:, None], new_vel, vel)
    omega_out = jnp.where(active[:, None], omega_new, omega)
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
