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

# --- parity-test tape injection ---------------------------------------------
# When set, the response kernels consume these pre-recorded draws instead of
# deriving them from jax.random — the lockstep parity harness records the
# reference's global-np.random consumption inside
# perform_collision_between_drones / perform_collision_with_obstacle
# (/root/reference/gym_art/quadrotor_multi/collisions/quadrotors.py:36-38,
# obstacles.py:31-36) and replays the identical values here, making the
# post-response trajectories comparable tick-for-tick
# (tests/test_reference_episode_parity.py).  Read at TRACE time: callers must
# run env_step eagerly (or re-trace) while a tape is set.  Never set in
# training/bench paths.
_RESPONSE_TAPE: dict | None = None


def set_response_tape(tape: dict | None) -> None:
    """Install (or clear, with None) the response-randomness tape.  Keys:
    'drone_normals' (N,3,3,3) + 'drone_uniforms' (N,6) feed
    drone_collision_response_indexed; 'obst_normals' (N,3,2,3) +
    'obst_uniforms' (N,5) feed obstacle_collision_response.  Unset keys fall
    back to jax.random draws."""
    global _RESPONSE_TAPE
    _RESPONSE_TAPE = tape


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
    return drone_collision_response_indexed(key, pos, vel, omega, active,
                                            partner)


def drone_collision_response_indexed(key: jax.Array, pos: jax.Array,
                                     vel: jax.Array, omega: jax.Array,
                                     active: jax.Array, partner: jax.Array):
    """Collision response given per-drone (active (N,) bool, partner (N,)
    int32) — the representation the Pallas pair kernel emits
    (ops/pallas/swarm_interactions.pair_collisions).  partner must follow the
    reference pair-iteration order: first new j > d, else first new i < d."""
    n = pos.shape[0]
    dtype = vel.dtype
    idx = jnp.arange(n)

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

    # ONE fold per drone (the pair id — both drones of a mutual pair derive
    # identical draws, preserving the momentum pairing), then all random
    # numbers in two batched calls.  The previous form used ~14 tiny RNG ops
    # (per-attempt fold_ins, separate noise/decay/omega key families) that
    # ran every tick at (E, N) shapes and were pure op-count overhead on TPU
    # (~20% of the whole env step).
    if _RESPONSE_TAPE is not None and "drone_normals" in _RESPONSE_TAPE:
        draw = jnp.asarray(_RESPONSE_TAPE["drone_normals"], dtype)
        uni = jnp.asarray(_RESPONSE_TAPE["drone_uniforms"], dtype)
    else:
        k_pair = jax.vmap(jax.random.fold_in)(
            jnp.broadcast_to(key, (n,) + key.shape), pair_id)
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(k_pair)
        # normals: 3 attempts x (conserved, small_a, small_b) x 3 components
        draw = jax.vmap(lambda k: jax.random.normal(k, (3, 3, 3), dtype))(
            ks[:, 0])
        # uniforms: decay_a, decay_b, omega direction (3), omega magnitude
        uni = jax.vmap(lambda k: jax.random.uniform(k, (6,), dtype))(ks[:, 1])

    # 3-attempt noise resampling vectorized over the attempt axis: pick the
    # first candidate whose post-collision normal velocities separate, else
    # the last — the reference's `for _ in range(3)` with break
    # (collisions/quadrotors.py:35-47).
    cons = 0.8 * draw[:, :, 0]
    small_a = 0.15 * draw[:, :, 1]
    small_b = 0.15 * draw[:, :, 2]
    cand_a = vel_change[:, None, :] + cons + small_a       # (N, 3, 3)
    cand_b = -vel_change[:, None, :] - cons + small_b
    d_a = jnp.sum((vel_a[:, None, :] + cand_a) * coll_norm[:, None, :], -1)
    d_b = jnp.sum((vel_b[:, None, :] + cand_b) * coll_norm[:, None, :], -1)
    valid = (d_a > 0) & (d_b < 0)                          # (N, 3)
    pick = jnp.where(jnp.any(valid, axis=1), jnp.argmax(valid, axis=1), 2)
    hot = jax.nn.one_hot(pick, 3, dtype=dtype)[..., None]  # (N, 3, 1)
    shift_a = jnp.sum(cand_a * hot, axis=1)
    shift_b = jnp.sum(cand_b * hot, axis=1)

    shift = jnp.where(is_a[:, None], shift_a, shift_b)
    max_vel = jnp.maximum(jnp.linalg.norm(vel_a, axis=-1),
                          jnp.linalg.norm(vel_b, axis=-1))
    decay = 0.2 + 0.6 * jnp.where(is_a, uni[:, 0], uni[:, 1])
    vel_hit = vel + shift
    hit_mag = jnp.linalg.norm(vel_hit, axis=-1, keepdims=True)
    # EPS only at exactly-zero magnitude (compute_new_vel, utils.py:11-13 —
    # the unconditional +EPS form costs ~1e-5 relative direction error,
    # which the through-response parity test resolves at 1e-8)
    direction = vel_hit / jnp.where(hit_mag == 0.0, hit_mag + EPS, hit_mag)
    new_speed = jnp.minimum(hit_mag[..., 0] * decay, max_vel)
    new_vel = direction * new_speed[..., None]

    # omega kick (collisions/utils.py:21-33): random unit direction scaled
    # by a magnitude in [omega_max/2, omega_max]
    kick_dir = 2.0 * uni[:, 2:5] - 1.0
    kick_mag0 = jnp.linalg.norm(kick_dir, axis=-1, keepdims=True)
    kick_dir = kick_dir / jnp.where(kick_mag0 == 0.0, kick_mag0 + EPS,
                                    kick_mag0)
    omega_max = jnp.asarray(20.0 * jnp.pi, dtype)  # magn_scale * pi
    kick_mag = omega_max * (0.5 + 0.5 * uni[:, 5])
    kick = kick_dir * kick_mag[:, None]
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

    # 3-attempt directional noise (reference loops i in range(3) w/ break),
    # vectorized over the attempt axis with all randomness in two batched
    # calls (see drone_collision_response for why).
    if _RESPONSE_TAPE is not None and "obst_normals" in _RESPONSE_TAPE:
        draw = jnp.asarray(_RESPONSE_TAPE["obst_normals"], dtype)
        uni_tape = jnp.asarray(_RESPONSE_TAPE["obst_uniforms"], dtype)
    else:
        k_noise, k_uni = jax.random.split(key)
        draw = jax.random.normal(k_noise, (n, 3, 2, 3), dtype)
        uni_tape = None
    cand = 0.1 * draw[:, :, 0] + 0.05 * draw[:, :, 1]      # (N, 3, 3)
    valid = jnp.sum((new_vel[:, None, :] + cand) * coll_norm[:, None, :],
                    axis=-1) > 0
    # noise stays zero when no attempt is valid (reference keeps none)
    pick_hot = jax.nn.one_hot(jnp.argmax(valid, axis=1), 3,
                              dtype=dtype)[..., None]
    noise = jnp.where(jnp.any(valid, axis=1)[:, None],
                      jnp.sum(cand * pick_hot, axis=1), 0.0)
    uni = (uni_tape if uni_tape is not None
           else jax.random.uniform(k_uni, (n, 5), dtype))

    inside = jnp.linalg.norm(pos - obstacle_pos, axis=-1) < obstacle_size / 2
    shift = new_vel - vel + noise
    decay = 0.2 + 0.6 * uni[:, 0]
    vel_hit = vel + shift
    hit_mag = jnp.linalg.norm(vel_hit, axis=-1, keepdims=True)
    # conditional EPS — see drone response note (compute_new_vel parity)
    hdir = vel_hit / jnp.where(hit_mag == 0.0, hit_mag + EPS, hit_mag)
    vel_bounce = hdir * jnp.minimum(hit_mag[..., 0] * decay,
                                    vel_magn[..., 0])[..., None]
    # inside the cylinder: no speed decay (low=high=1.0 in the reference)
    vel_inside = hdir * jnp.minimum(hit_mag[..., 0],
                                    vel_magn[..., 0])[..., None]
    vel_new = jnp.where(inside[:, None], vel_inside, vel_bounce)
    kick_dir = 2.0 * uni[:, 1:4] - 1.0
    kick_mag0 = jnp.linalg.norm(kick_dir, axis=-1, keepdims=True)
    kick_dir = kick_dir / jnp.where(kick_mag0 == 0.0, kick_mag0 + EPS,
                                    kick_mag0)
    omega_max = jnp.asarray(jnp.pi, dtype)                 # magn_scale=1.0
    omega_new = omega + kick_dir * (omega_max * (0.5 + 0.5 * uni[:, 4]))[:, None]

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
    # all randomness in one batched uniform call (op-count: was 6 splits +
    # 5 draws + the omega helper's 2 more, every tick)
    u = jax.random.uniform(key, (n, 11), dtype)

    speed = jnp.linalg.norm(vel, axis=-1)
    real_speed = jnp.clip((0.2 + 0.6 * u[:, 0]) * speed, 0.1, 6.0)

    direction = 2.0 * u[:, 1:4] - 1.0
    dx_pos = 0.1 + 0.9 * u[:, 4]
    dy_pos = 0.1 + 0.9 * u[:, 5]
    at_x_lo = pos[:, 0] == lo[0]
    at_x_hi = pos[:, 0] == hi[0]
    at_y_lo = pos[:, 1] == lo[1]
    at_y_hi = pos[:, 1] == hi[1]
    dirx = jnp.where(at_x_lo, dx_pos, jnp.where(at_x_hi, -dx_pos, direction[:, 0]))
    diry = jnp.where(at_y_lo, dy_pos, jnp.where(at_y_hi, -dy_pos, direction[:, 1]))
    dirz = -1.0 + 0.5 * u[:, 6]
    direction = jnp.stack([dirx, diry, dirz], axis=-1)
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + EPS)

    vel_new = real_speed[:, None] * direction
    kick_dir = 2.0 * u[:, 7:10] - 1.0
    kick_dir = kick_dir / (jnp.linalg.norm(kick_dir, axis=-1,
                                           keepdims=True) + EPS)
    omega_max = jnp.asarray(20.0 * jnp.pi, dtype)
    omega_new = omega + kick_dir * (omega_max * (0.5 + 0.5 * u[:, 10]))[:, None]
    vel_out = jnp.where(hit_mask[:, None], vel_new, vel)
    omega_out = jnp.where(hit_mask[:, None], omega_new, omega)
    return vel_out, omega_out


def ceiling_collision_response(key: jax.Array, vel: jax.Array, omega: jax.Array,
                               hit_mask: jax.Array):
    """Randomized damped bounce off the ceiling (collisions/room.py:91-113)."""
    n = vel.shape[0]
    dtype = vel.dtype
    u = jax.random.uniform(key, (n, 10), dtype)  # one batched draw
    speed = jnp.linalg.norm(vel, axis=-1)
    real_speed = jnp.clip((0.2 + 0.6 * u[:, 0]) * speed, 0.1, 6.0)
    dirxy = 2.0 * u[:, 1:3] - 1.0
    dirz = -1.0 + 0.5 * u[:, 4]
    direction = jnp.concatenate([dirxy, dirz[:, None]], axis=-1)
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + EPS)
    vel_new = real_speed[:, None] * direction
    kick_dir = 2.0 * u[:, 5:8] - 1.0
    kick_dir = kick_dir / (jnp.linalg.norm(kick_dir, axis=-1,
                                           keepdims=True) + EPS)
    omega_max = jnp.asarray(20.0 * jnp.pi, dtype)
    omega_new = omega + kick_dir * (omega_max * (0.5 + 0.5 * u[:, 8]))[:, None]
    vel_out = jnp.where(hit_mask[:, None], vel_new, vel)
    omega_out = jnp.where(hit_mask[:, None], omega_new, omega)
    return vel_out, omega_out
