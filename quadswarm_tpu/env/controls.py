"""Controllers: policy action -> normalized motor thrusts.

Reference: gym_art/quadrotor_multi/quadrotor_control.py.  The OO controller
objects become pure functions that map an action to a [0,1]^4 thrust command
vector (the dynamics kernel applies them); controller choice is static config.

Training always uses `raw` with zero_action_middle=True
(swarm_rl/env_wrappers/quad_utils.py:24-26).  The Mellinger nonlinear position
controller (:253-490) is provided as an oracle for evaluation / tests.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.ops.rotations import normalize

GRAV = 9.81


def raw_control(action: jax.Array, zero_action_middle: bool = True) -> jax.Array:
    """RawControl (quadrotor_control.py:30-57): clip to the action box and
    affinely map to [0,1] thrusts."""
    if zero_action_middle:
        action = jnp.clip(action, -1.0, 1.0)
        return 0.5 * (action + 1.0)
    return jnp.clip(action, 0.0, 1.0)


def vertical_control(action: jax.Array, zero_action_middle: bool = True) -> jax.Array:
    """VerticalControl 1D mode (quadrotor_control.py:68-109): one action
    replicated to all four motors.  NOTE the reference scales BEFORE clipping
    (:99-101), so with zero_action_middle the effective range is [0, 1] after
    clip of the scaled value to [-1, 1]."""
    if zero_action_middle:
        action = jnp.clip(0.5 * (action + 1.0), -1.0, 1.0)
    else:
        action = jnp.clip(action, 0.0, 1.0)
    return jnp.repeat(action[..., :1], 4, axis=-1)


def vert_plane_control(action: jax.Array, zero_action_middle: bool = True) -> jax.Array:
    """VertPlaneControl 2D mode (quadrotor_control.py:112-153): two actions
    drive motor pairs (0,1) and (2,3)."""
    if zero_action_middle:
        action = jnp.clip(0.5 * (action + 1.0), -1.0, 1.0)
    else:
        action = jnp.clip(action, 0.0, 1.0)
    a0 = action[..., 0:1]
    a1 = action[..., 1:2]
    return jnp.concatenate([a0, a0, a1, a1], axis=-1)


def quadrotor_jacobian(params: Any) -> np.ndarray:
    """Jacobian of (thrust acc, angular acc) wrt normalized motor thrusts
    (quadrotor_control.py:158-169).  Host-side; used to build J^-1 for the
    omega/Mellinger controllers."""
    torque = np.asarray(params.thrust_max) * np.asarray(params.prop_crossproducts).T
    torque[2, :] = np.asarray(params.torque_max) * np.asarray(params.prop_ccw)
    thrust = np.asarray(params.thrust_max) * np.ones((1, 4))
    dw = (1.0 / np.asarray(params.inertia))[:, None] * torque
    dv = thrust / float(params.mass)
    return np.vstack([dv, dw])


def jacobian_inv(params: Any) -> jax.Array:
    """Traceable J^-1 for a single parameter set (jnp twin of
    quadrotor_jacobian + inverse); vmap for per-drone-randomized fleets."""
    cross = jnp.asarray(params.prop_crossproducts)          # (4, 3)
    torque = jnp.asarray(params.thrust_max) * cross.T        # (3, 4)
    torque = torque.at[2, :].set(
        jnp.asarray(params.torque_max) * jnp.asarray(params.prop_ccw))
    thrust = jnp.asarray(params.thrust_max) * jnp.ones((1, 4), torque.dtype)
    dw = (1.0 / jnp.asarray(params.inertia))[:, None] * torque
    dv = thrust / jnp.asarray(params.mass)
    return jnp.linalg.inv(jnp.concatenate([dv, dw], axis=0))


def omega_thrust_control(j_inv: jax.Array, omega: jax.Array,
                         action: jax.Array) -> jax.Array:
    """OmegaThrustControl (quadrotor_control.py:174-200): P control on omega
    plus direct thrust magnitude."""
    kp = 5.0
    dw_des = -kp * (omega - action[..., 1:])
    acc_des = GRAV * (action[..., 0:1] + 1.0)
    des = jnp.concatenate([acc_des, dw_des], axis=-1)
    thrusts = jnp.einsum("...ij,...j->...i", j_inv, des)
    return jnp.clip(thrusts, 0.0, 1.0)


def _vee(m: jax.Array) -> jax.Array:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def mellinger_control(j_inv: jax.Array, pos: jax.Array, vel: jax.Array,
                      rot: jax.Array, omega: jax.Array, goal: jax.Array,
                      kp_p: float = 4.5, kd_p: float = 3.5,
                      kp_a: float = 200.0, kd_a: float = 50.0) -> jax.Array:
    """NonlinearPositionController oracle (quadrotor_control.py:253-354,
    numpy branch): geometric tracking controller from Mellinger & Kumar 2011.

    Returns normalized thrusts in [0,1].
    """
    to_goal = goal - pos
    # clamp_norm (quad_utils.py:112-116): scale the whole vector so its NORM
    # is <= 4 (not a per-component clip)
    gnorm = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
    e_p = -jnp.where(gnorm <= 4.0, to_goal, to_goal * (4.0 / gnorm))
    e_v = vel
    acc_des = -kp_p * e_p - kd_p * e_v + jnp.array([0.0, 0.0, GRAV], pos.dtype)

    # Desired frame: z along acc_des, x along the (fixed) reference heading
    zb_des, _ = normalize(acc_des)
    xc_des = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], pos.dtype), pos.shape)
    yb_des, _ = normalize(jnp.cross(zb_des, xc_des))
    xb_des = jnp.cross(yb_des, zb_des)
    rot_des = jnp.stack([xb_des, yb_des, zb_des], axis=-1)

    e_r = 0.5 * _vee(jnp.swapaxes(rot_des, -1, -2) @ rot - jnp.swapaxes(rot, -1, -2) @ rot_des)
    e_r = e_r.at[..., 2].multiply(0.2)  # slow down yaw dynamics (:315)
    dw_des = -kp_a * e_r - kd_a * omega
    thrust_mag = jnp.sum(acc_des * rot[..., :, 2], axis=-1, keepdims=True)
    des = jnp.concatenate([thrust_mag, dw_des], axis=-1)
    thrusts = jnp.einsum("...ij,...j->...i", j_inv, des)
    return jnp.clip(thrusts, 0.0, 1.0)


def velocity_yaw_control(j_inv: jax.Array, pos: jax.Array, vel: jax.Array,
                         rot: jax.Array, omega: jax.Array, action: jax.Array,
                         kp_v: float = 5.0, kp_a: float = 100.0,
                         kd_a: float = 50.0) -> jax.Array:
    """VelocityYawControl (quadrotor_control.py:204-248): P control on velocity
    (action[:3]) + desired yaw rate (action[3]), geometric attitude loop.

    The reference computes thrust_mag via a stray `get_blas_funcs` call (:243
    — a bug, it returns a BLAS function object, and the class is marked
    untested); here thrust_mag is the intended dot(acc_des, R[:, 2]).
    """
    e_v = vel - action[..., :3]
    acc_des = -kp_v * e_v + jnp.array([0.0, 0.0, GRAV], pos.dtype)

    zb_des, _ = normalize(acc_des)
    yb_des, _ = normalize(jnp.cross(zb_des, rot[..., :, 0]))
    xb_des = jnp.cross(yb_des, zb_des)
    rot_des = jnp.stack([xb_des, yb_des, zb_des], axis=-1)

    e_r = 0.5 * _vee(jnp.swapaxes(rot_des, -1, -2) @ rot
                     - jnp.swapaxes(rot, -1, -2) @ rot_des)
    omega_des = jnp.concatenate(
        [jnp.zeros_like(action[..., :2]), action[..., 3:4]], axis=-1)
    dw_des = -kp_a * e_r - kd_a * (omega - omega_des)
    thrust_mag = jnp.sum(acc_des * rot[..., :, 2], axis=-1, keepdims=True)
    des = jnp.concatenate([thrust_mag, dw_des], axis=-1)
    thrusts = jnp.einsum("...ij,...j->...i", j_inv, des)
    return jnp.clip(thrusts, 0.0, 1.0)


CONTROL_MODES = ("raw", "vertical", "vert_plane", "omega", "velocity_yaw",
                 "mellinger")


def apply_control(mode: str, action: jax.Array, *, j_inv=None, state=None,
                  goal=None, zero_action_middle: bool = True) -> jax.Array:
    """Static dispatch over controller modes (mode is config, not data)."""
    if mode == "raw":
        return raw_control(action, zero_action_middle)
    if mode == "vertical":
        return vertical_control(action, zero_action_middle)
    if mode == "vert_plane":
        return vert_plane_control(action, zero_action_middle)
    if mode == "omega":
        return omega_thrust_control(j_inv, state.omega, action)
    if mode == "velocity_yaw":
        return velocity_yaw_control(j_inv, state.pos, state.vel, state.rot,
                                    state.omega, action)
    if mode == "mellinger":
        return mellinger_control(j_inv, state.pos, state.vel, state.rot, state.omega, goal)
    raise ValueError(f"unknown control mode: {mode}")


def action_dim(mode: str) -> int:
    return {"raw": 4, "vertical": 1, "vert_plane": 2, "omega": 4,
            "velocity_yaw": 4, "mellinger": 4}[mode]
