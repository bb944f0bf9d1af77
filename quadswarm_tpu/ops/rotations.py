"""Rotation / quaternion math, fully batched and jit-friendly.

Functional equivalents of the reference's scalar NumPy helpers
(/root/reference/gym_art/quadrotor_multi/quad_utils.py:75-209 and
sensor_noise.py:11-63), redesigned so that every function broadcasts over
arbitrary leading batch dimensions and is safe under `jax.jit`/`vmap`
(no data-dependent Python control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product over the last axis (batched)."""
    return jnp.cross(a, b)


def normalize(x: jax.Array, eps: float = 1e-5) -> tuple[jax.Array, jax.Array]:
    """Return (unit vector, norm); zero vectors pass through unchanged.

    Mirrors quad_utils.py:80-86 (norm < 1e-5 -> return x unscaled, norm 0).
    """
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    small = n < eps
    unit = jnp.where(small, x, x / jnp.where(small, 1.0, n))
    norm = jnp.where(small[..., 0], 0.0, n[..., 0])
    return unit, norm


def clamp_norm(x: jax.Array, maxnorm: jax.Array) -> jax.Array:
    """Scale x down so its norm is at most maxnorm (quad_utils.py:112-116)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = jnp.where(n <= maxnorm, 1.0, maxnorm / jnp.maximum(n, EPS))
    return x * scale


def to_xyhat(v: jax.Array) -> jax.Array:
    """Project onto the xy plane and normalize (quad_utils.py:120-124)."""
    v = v.at[..., 2].set(0.0)
    unit, _ = normalize(v)
    return unit


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric (hat) operator: hat(w) @ v == w x v. Batched."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(omega_world: jax.Array, dt: float | jax.Array) -> jax.Array:
    """Incremental rotation exp(hat(omega_world) * dt) via Rodrigues' formula.

    Matches the reference integrator (quadrotor_dynamics.py:296-306): when the
    angular-velocity norm is zero the update is the identity.
    """
    norm = jnp.linalg.norm(omega_world, axis=-1)
    # Divide by the EXACT norm whenever nonzero (the reference's `if
    # omega_norm != 0`, :301) — clamping to EPS here would mis-scale the
    # rotation axis for tiny omega and break seed-matched parity.
    safe = jnp.where(norm > 0.0, norm, 1.0)
    k = hat(omega_world / safe[..., None])
    angle = (norm * dt)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega_world.dtype), k.shape)
    d_rot = eye + jnp.sin(angle) * k + (1.0 - jnp.cos(angle)) * (k @ k)
    return jnp.where((norm > 0.0)[..., None, None], d_rot, eye)


def reorthonormalize(rot: jax.Array, iters: int = 2) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3).

    The reference performs an SVD polar projection every 0.5 s of simulated
    time (quadrotor_dynamics.py:308-314).  On TPU we use the Newton iteration
    for the orthogonal polar factor, R <- 1.5 R - 0.5 R R^T R, which converges
    quadratically for matrices near orthogonality and contains only 3x3
    matmuls (MXU/VPU-friendly, no host sync).
    """
    for _ in range(iters):
        rot = 1.5 * rot - 0.5 * rot @ jnp.swapaxes(rot, -1, -2) @ rot
    return rot


def quat2rot(q: jax.Array) -> jax.Array:
    """Quaternion [w,x,y,z] -> rotation matrix (quad_utils.py:133-141)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2 * y**2 - 2 * z**2
    r01 = 2 * x * y - 2 * z * w
    r02 = 2 * x * z + 2 * y * w
    r10 = 2 * x * y + 2 * z * w
    r11 = 1.0 - 2 * x**2 - 2 * z**2
    r12 = 2 * y * z - 2 * x * w
    r20 = 2 * x * z - 2 * y * w
    r21 = 2 * y * z + 2 * x * w
    r22 = 1.0 - 2 * x**2 - 2 * y**2
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, [w,x,y,z] layout (quad_utils.py:148-162)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw - ay * bz + az * by,
            aw * by + ax * bz + ay * bw - az * bx,
            aw * bz - ax * by + ay * bx + az * bw,
        ],
        axis=-1,
    )


def rot2quat(rot: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion [w,x,y,z].

    Branchless reformulation of the classic 4-case algorithm used by the
    reference (sensor_noise.py:34-63): compute all four candidate solutions
    and select by the same predicate ladder with `jnp.where`.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    trace = m00 + m11 + m22

    # Case 0: trace > 0
    s0 = jnp.sqrt(jnp.maximum(trace + 1.0, EPS)) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Case 1: m00 largest
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, EPS)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Case 2: m11 largest
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, EPS)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Case 3: m22 largest
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, EPS)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    c0 = (trace > 0)[..., None]
    c1 = ((m00 > m11) & (m00 > m22))[..., None]
    c2 = (m11 > m22)[..., None]
    return jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))


def quat_from_small_angle(theta: jax.Array) -> jax.Array:
    """Small-angle rotation vector -> unit quaternion (sensor_noise.py:11-26)."""
    q_squared = jnp.sum(theta**2, axis=-1, keepdims=True) / 4.0
    small = q_squared < 1.0
    w_small = jnp.sqrt(jnp.maximum(1.0 - q_squared, 0.0))
    q_small = jnp.concatenate([w_small, theta * 0.5], axis=-1)
    w_big = 1.0 / jnp.sqrt(1.0 + q_squared)
    q_big = jnp.concatenate([w_big, theta * (0.5 * w_big)], axis=-1)
    q = jnp.where(small, q_small, q_big)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rpy2rot(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Roll/pitch/yaw -> rotation matrix, Rz @ Ry @ Rx (quad_utils.py:188-204)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def yaw_rot(theta: jax.Array) -> jax.Array:
    """Yaw-only rotation matrix (quad_utils.py:176-185, rotZ)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def rand_yaw_rot(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Uniform random yaw-only rotation (quad_utils.py:207-209)."""
    theta = jax.random.uniform(key, shape, minval=-jnp.pi, maxval=jnp.pi)
    return yaw_rot(theta)


def rand_uniform_rot3d(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Approximately-uniform random rotation matrices, rejection-free.

    The reference builds a frame from two random unit vectors with rejection
    when they are nearly parallel (quad_utils.py:93-104).  For jit we draw the
    two vectors once and blend the fallback direction in smoothly; the
    distribution over SO(3) is indistinguishable for simulation purposes.
    """
    k1, k2 = jax.random.split(key)
    up, _ = normalize(jax.random.normal(k1, shape + (3,)))
    fwd_raw, _ = normalize(jax.random.normal(k2, shape + (3,)))
    # If fwd is nearly parallel to up, nudge it with a perpendicular-ish vector.
    dot = jnp.sum(fwd_raw * up, axis=-1, keepdims=True)
    fwd_perp = fwd_raw - dot * up
    fwd, _ = normalize(jnp.where(jnp.abs(dot) > 0.95, fwd_perp + 1e-3, fwd_raw))
    left, _ = normalize(cross(up, fwd))
    up2 = cross(fwd, left)
    return jnp.stack([fwd, left, up2], axis=-1)
