"""Batched, branchless quadrotor rigid-body dynamics.

TPU-native redesign of the reference integrator
(gym_art/quadrotor_multi/quadrotor_dynamics.py:225-346 `step1` and its numba
twins :497-649): the per-drone Python object becomes a pure function
`dynamics_step(params, cfg, state, thrust_cmds, thrust_noise)` over a state
pytree with arbitrary leading batch dims (agents, envs).  All data-dependent
branches (motor up/down tau, floor contact state machine, wall/ceiling
clipping) are `jnp.where` selects, so one fused XLA program integrates the
whole fleet.

Deviations from the reference (documented, tolerance-tested):
  * SVD re-orthonormalization on a 0.5 s timer -> Newton polar iteration on
    the same step schedule (see ops/rotations.reorthonormalize).
  * The on-floor "upside-down -> random yaw with rejection" reset
    (quadrotor_dynamics.py:434-438) uses a single random yaw draw, like the
    reference's own numba path (:616-619).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from quadswarm_tpu.ops.rotations import reorthonormalize, rodrigues, yaw_rot

GRAV = 9.81
EPS = 1e-6


@struct.dataclass
class DynamicsConfig:
    """Static integrator configuration (hashable; baked into the jit)."""

    dt: float = 1.0 / 200.0
    sim_steps: int = 2
    room_box: tuple = ((-5.0, -5.0, 0.0), (5.0, 5.0, 10.0))
    floor_threshold: float = 0.05   # quadrotor_dynamics.py:75
    mu: float = 0.6                 # floor friction, :77
    omega_max: float = 40.0         # :49
    vxyz_max: float = 3.0           # :50
    acc_max: float = 3.0 * GRAV     # :52
    gravity: float = GRAV
    # Re-orthonormalize every ceil(0.5/dt)+1 sub-steps == the reference's
    # `since_last_svd > 0.5` timer with dt accumulation (:308-314).
    orthonormalize_every: int = 101
    use_rotor_drag: bool = False    # C_drag/C_roll path (:260-289); presets use 0

    def __hash__(self):
        return hash((self.dt, self.sim_steps, self.room_box, self.floor_threshold,
                     self.mu, self.omega_max, self.gravity, self.orthonormalize_every,
                     self.use_rotor_drag))

    def __eq__(self, other):
        return isinstance(other, DynamicsConfig) and hash(self) == hash(other)


@struct.dataclass
class DroneState:
    """Per-drone dynamic state; every field broadcasts over leading batch dims."""

    pos: jax.Array              # (..., 3) world frame
    vel: jax.Array              # (..., 3) world frame
    rot: jax.Array              # (..., 3, 3) body->world
    omega: jax.Array            # (..., 3) body frame
    thrust_cmds_damp: jax.Array  # (..., 4) motor first-order filter state
    thrust_rot_damp: jax.Array   # (..., 4) filter state in sqrt (rot-vel) domain
    acc: jax.Array              # (..., 3)
    accelerometer: jax.Array    # (..., 3) proper acceleration, body frame
    omega_dot: jax.Array        # (..., 3)
    torque: jax.Array           # (..., 3)
    on_floor: jax.Array         # (...,) bool
    crashed_floor: jax.Array    # (...,) bool — new floor contact this step
    crashed_wall: jax.Array     # (...,) bool
    crashed_ceiling: jax.Array  # (...,) bool
    step_count: jax.Array       # (...,) int32 sub-step counter (orthonormalization)
    ou_state: jax.Array         # (..., 4) Ornstein-Uhlenbeck thrust-noise state


def init_state(batch_shape: tuple, dtype=jnp.float32) -> DroneState:
    """All-zero state with identity rotation and gravity-only accelerometer."""
    z3 = jnp.zeros(batch_shape + (3,), dtype)
    z4 = jnp.zeros(batch_shape + (4,), dtype)
    return DroneState(
        pos=z3,
        vel=z3,
        rot=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
        omega=z3,
        thrust_cmds_damp=z4,
        thrust_rot_damp=z4,
        acc=z3,
        accelerometer=z3.at[..., 2].set(GRAV),
        omega_dot=z3,
        torque=z3,
        on_floor=jnp.zeros(batch_shape, bool),
        crashed_floor=jnp.zeros(batch_shape, bool),
        crashed_wall=jnp.zeros(batch_shape, bool),
        crashed_ceiling=jnp.zeros(batch_shape, bool),
        step_count=jnp.zeros(batch_shape, jnp.int32),
        ou_state=z4,
    )


def ou_noise_step(ou_state: jax.Array, key: jax.Array,
                  thrust_noise_ratio: jax.Array,
                  theta: float = 0.15) -> jax.Array:
    """Ornstein-Uhlenbeck motor-noise process (quad_utils.py:253-279).

    sigma = 0.2 * thrust_noise_ratio (quadrotor_dynamics.py:168-173); mu = 0.
    Drawn ONCE per control step and shared by all sub-steps, exactly like the
    reference (quadrotor_dynamics.py:208-214).
    """
    sigma = 0.2 * thrust_noise_ratio
    dx = theta * (0.0 - ou_state) + sigma * jax.random.normal(
        key, ou_state.shape, ou_state.dtype
    )
    # keep the carried dtype: f32 params would otherwise promote a bf16
    # state to f32 and break the scan carry under dtype=bfloat16
    return (ou_state + dx).astype(ou_state.dtype)


def _motor_filter(params: Any, thrust_cmds: jax.Array, thrust_noise: jax.Array,
                  cmds_damp: jax.Array, rot_damp: jax.Array):
    """First-order motor filter in the sqrt (rotational-velocity) domain with
    asymmetric up/down time constants (quadrotor_dynamics.py:226-246)."""
    thrust_cmds = jnp.clip(thrust_cmds, 0.0, 1.0)
    tau = jnp.where(thrust_cmds < cmds_damp, params.motor_tau_down, params.motor_tau_up)
    tau = jnp.minimum(tau, 1.0)
    thrust_rot = jnp.sqrt(thrust_cmds)
    rot_damp = tau * (thrust_rot - rot_damp) + rot_damp
    cmds_damp = rot_damp**2
    cmds_damp = jnp.clip(cmds_damp + thrust_cmds * thrust_noise, 0.0, 1.0)
    return cmds_damp, rot_damp


def _angvel2thrust(w: jax.Array, linearity: jax.Array) -> jax.Array:
    """Normalized rot-vel -> normalized thrust (quadrotor_dynamics.py:94-102)."""
    return (1.0 - linearity) * w**2 + linearity * w


def _rotor_drag(params: Any, cfg: DynamicsConfig, state: DroneState,
                cmds_damp: jax.Array, dt: float):
    """Rotor drag / rolling moments (quadrotor_dynamics.py:260-289).

    Zero for every shipped preset (C_drag=C_roll=0); gated statically by
    cfg.use_rotor_drag so the compiled program pays nothing by default.
    """
    vel_body = jnp.einsum("...ji,...j->...i", state.rot, state.vel)
    v_rotor = vel_body[..., None, :] + jnp.cross(
        jnp.broadcast_to(state.omega[..., None, :], params.prop_pos.shape), params.prop_pos
    )
    v_rotor = v_rotor.at[..., 2].set(0.0)
    sqrt_cmd = jnp.sqrt(cmds_damp)[..., None]
    drag_fi = -params.c_drag * sqrt_cmd * v_rotor
    drag_force = jnp.sum(drag_fi, axis=-2)
    drag_torque = jnp.sum(jnp.cross(drag_fi, params.prop_pos), axis=-2)
    roll_torque = jnp.sum(
        -params.c_roll * params.prop_ccw[..., None] * sqrt_cmd * v_rotor, axis=-2
    )
    visc_torque = drag_torque + roll_torque

    vel_norm = jnp.linalg.norm(vel_body, axis=-1, keepdims=True)
    rdf_norm = jnp.linalg.norm(drag_force, axis=-1, keepdims=True)
    rdf_clip = jnp.minimum(rdf_norm, vel_norm * params.mass[..., None] / (2 * dt))
    drag_force = jnp.where(rdf_norm > EPS, drag_force / jnp.maximum(rdf_norm, EPS) * rdf_clip,
                           drag_force)
    rvt_norm = jnp.linalg.norm(visc_torque, axis=-1, keepdims=True)
    rvt_cap = jnp.linalg.norm(state.omega * params.inertia, axis=-1, keepdims=True) / (2 * dt)
    rvt_clip = jnp.minimum(rvt_norm, rvt_cap)
    visc_torque = jnp.where(rvt_norm > EPS, visc_torque / jnp.maximum(rvt_norm, EPS) * rvt_clip,
                            visc_torque)
    return drag_force, visc_torque


def _floor_interaction(params: Any, cfg: DynamicsConfig, pos, vel, rot, omega,
                       cmds_damp, rot_damp, on_floor, sum_thr_drag, rand_yaw_theta):
    """Branchless floor contact state machine (quadrotor_dynamics.py:389-457).

    Three cases selected by masks:
      A below & on_floor : yaw-flatten rot, apply Coulomb friction to xy force
      B below & !on_floor: crash landing — zero vel/omega, yaw-flatten (or
                           random yaw if inverted), reset motor filters
      C above            : free flight, acc = -g + R f / m
    """
    below = pos[..., 2] <= cfg.floor_threshold
    case_a = below & on_floor
    case_b = below & ~on_floor

    pos = jnp.where(below[..., None], pos.at[..., 2].set(cfg.floor_threshold), pos)
    force = jnp.einsum("...ij,...j->...i", rot, sum_thr_drag)

    # Yaw-flattened rotation, shared by cases A and B (theta from current rot).
    theta = jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0] + EPS)
    flat_rot = yaw_rot(theta)
    # Case B with inverted drone (rot[2,2] < 0): random yaw instead.
    inverted = rot[..., 2, 2] < 0.0
    crash_rot = jnp.where((case_b & inverted)[..., None, None],
                          yaw_rot(rand_yaw_theta), flat_rot)

    # --- Case A: friction ---------------------------------------------------
    friction_mag = cfg.mu * (params.mass * GRAV - force[..., 2])
    vel_norm = jnp.linalg.norm(vel, axis=-1)
    # Static-ish branch (reference numba path: norm(vel) < EPS, :586-597).
    # NOTE the reference does NOT clamp friction_mag at 0: with thrust >
    # weight on the floor, friction_mag < 0 so static_mag > 0 even for a
    # zero xy force, and arctan2(0, 0) = 0 aims the resulting phantom force
    # along +x.  Replicated exactly for seed-matched parity.
    force_xy_mag = jnp.linalg.norm(force[..., :2], axis=-1)
    static_mag = jnp.maximum(force_xy_mag - friction_mag, 0.0)
    force_angle = jnp.arctan2(force[..., 1], force[..., 0])
    static_dir = jnp.stack([jnp.cos(force_angle), jnp.sin(force_angle)], axis=-1)
    static_xy = jnp.where((static_mag == 0.0)[..., None], 0.0,
                          static_mag[..., None] * static_dir)
    force_static = jnp.concatenate([static_xy, force[..., 2:]], axis=-1)
    # Kinetic branch: friction opposes velocity direction.
    fr_angle = jnp.arctan2(-vel[..., 1], -vel[..., 0])
    fr_dir = jnp.stack([jnp.cos(fr_angle), jnp.sin(fr_angle)], axis=-1)
    force_kinetic = force.at[..., :2].add(fr_dir * friction_mag[..., None])
    force_floor = jnp.where((vel_norm < EPS)[..., None], force_static, force_kinetic)

    force = jnp.where(case_a[..., None], force_floor, force)
    rot = jnp.where(case_a[..., None, None], flat_rot, rot)

    # --- Case B: crash landing ----------------------------------------------
    zero3 = jnp.zeros_like(vel)
    vel = jnp.where(case_b[..., None], zero3, vel)
    omega = jnp.where(case_b[..., None], zero3, omega)
    rot = jnp.where(case_b[..., None, None], crash_rot, rot)
    cmds_damp = jnp.where(case_b[..., None], jnp.zeros_like(cmds_damp), cmds_damp)
    rot_damp = jnp.where(case_b[..., None], jnp.zeros_like(rot_damp), rot_damp)
    # Case B recomputes force with the crash rotation before acc
    # (reference calls set_state then uses `force` from the OLD rot — it
    # computed force before mutating rot, so force stays from old rot).

    # --- Acceleration ---------------------------------------------------------
    acc = jnp.concatenate(
        [jnp.zeros_like(force[..., :2]), -GRAV * jnp.ones_like(force[..., 2:])], axis=-1
    ) + force / params.mass[..., None]
    acc_floor = acc.at[..., 2].set(jnp.maximum(acc[..., 2], 0.0))
    acc = jnp.where(below[..., None], acc_floor, acc)

    on_floor = below  # A/B set True; C clears the flag (:451-453)
    crashed_floor = case_b
    return pos, vel, rot, omega, cmds_damp, rot_damp, on_floor, crashed_floor, acc


def dynamics_substep(params: Any, cfg: DynamicsConfig, state: DroneState,
                     thrust_cmds: jax.Array, thrust_noise: jax.Array,
                     rand_yaw_theta: jax.Array) -> DroneState:
    """One physics sub-step at cfg.dt (the reference's `step1`)."""
    dt = cfg.dt
    cmds_damp, rot_damp = _motor_filter(
        params, thrust_cmds, thrust_noise, state.thrust_cmds_damp, state.thrust_rot_damp
    )
    thrusts = params.thrust_max * _angvel2thrust(cmds_damp, params.motor_linearity)

    # Torques: prop cross-products plus reaction torque about z (:249-256).
    torques = params.prop_crossproducts * thrusts[..., None]
    torques = torques.at[..., 2].add(params.torque_max * params.prop_ccw * cmds_damp)
    thrust_torque = jnp.sum(torques, axis=-2)

    if cfg.use_rotor_drag:
        drag_force, visc_torque = _rotor_drag(params, cfg, state, cmds_damp, dt)
    else:
        drag_force = jnp.zeros_like(state.vel)
        visc_torque = jnp.zeros_like(state.vel)
    torque = thrust_torque + visc_torque
    thrust_total = jnp.sum(thrusts, axis=-1)
    sum_thr_drag = drag_force.at[..., 2].add(thrust_total)

    # Rotational integration: Rodrigues about the world-frame omega (:296-306).
    omega_world = jnp.einsum("...ij,...j->...i", state.rot, state.omega)
    rot = rodrigues(omega_world, dt) @ state.rot

    # Periodic re-orthonormalization on the sub-step schedule (:308-314).
    step_count = state.step_count + 1
    do_ortho = step_count >= cfg.orthonormalize_every
    rot = jnp.where(do_ortho[..., None, None], reorthonormalize(rot), rot)
    step_count = jnp.where(do_ortho, 0, step_count)

    # Omega update: Euler with quadratic damping (:316-325).
    inv_inertia = 1.0 / params.inertia
    omega_dot = inv_inertia * (
        jnp.cross(-state.omega, params.inertia * state.omega) + torque
    )
    damp_quad = jnp.clip(params.damp_omega_quadratic * state.omega**2, 0.0, 1.0)
    omega = state.omega + (1.0 - damp_quad) * dt * omega_dot
    omega = jnp.clip(omega, -cfg.omega_max, cfg.omega_max)

    # Position integration + room clipping (:327-336).
    room_lo = jnp.asarray(cfg.room_box[0], state.pos.dtype)
    room_hi = jnp.asarray(cfg.room_box[1], state.pos.dtype)
    pos_raw = state.pos + dt * state.vel
    pos = jnp.clip(pos_raw, room_lo, room_hi)
    crashed_wall = jnp.any(pos_raw[..., :2] != pos[..., :2], axis=-1)
    crashed_ceiling = pos_raw[..., 2] > pos[..., 2]

    vel = state.vel
    (pos, vel, rot, omega, cmds_damp, rot_damp, on_floor, crashed_floor, acc) = (
        _floor_interaction(params, cfg, pos, vel, rot, omega, cmds_damp, rot_damp,
                           state.on_floor, sum_thr_drag, rand_yaw_theta)
    )

    # Velocity + accelerometer (:342-346).
    vel = (1.0 - params.vel_damp) * vel + dt * acc
    grav = jnp.zeros_like(acc).at[..., 2].set(cfg.gravity)
    accelerometer = jnp.einsum("...ji,...j->...i", rot, acc + grav)

    return state.replace(
        pos=pos, vel=vel, rot=rot, omega=omega,
        thrust_cmds_damp=cmds_damp, thrust_rot_damp=rot_damp,
        acc=acc, accelerometer=accelerometer, omega_dot=omega_dot, torque=torque,
        on_floor=on_floor, crashed_floor=crashed_floor,
        crashed_wall=crashed_wall, crashed_ceiling=crashed_ceiling,
        step_count=step_count,
    )


def dynamics_step(params: Any, cfg: DynamicsConfig, state: DroneState,
                  thrust_cmds: jax.Array, key: jax.Array) -> DroneState:
    """One control step = cfg.sim_steps physics sub-steps.

    Matches QuadrotorDynamics.step (:208-214): the OU thrust noise is drawn
    once per control step and reused by all sub-steps.  Like the reference,
    crash flags are overwritten each sub-step, so the multi-env logic sees
    only the final sub-step's flags.
    """
    noise_key, yaw_key = jax.random.split(key)
    ou_state = ou_noise_step(state.ou_state, noise_key, params.thrust_noise_ratio)
    rand_yaw_theta = jax.random.uniform(
        yaw_key, state.pos.shape[:-1], state.pos.dtype, -jnp.pi, jnp.pi
    )
    state = state.replace(ou_state=ou_state)
    for _ in range(cfg.sim_steps):
        state = dynamics_substep(params, cfg, state, thrust_cmds, ou_state, rand_yaw_theta)
    return state


def set_state(state: DroneState, pos, vel, rot, omega) -> DroneState:
    """Reset kinematic state (reference set_state, :178-189)."""
    zero = jnp.zeros_like(pos)
    return state.replace(
        pos=pos, vel=vel, rot=rot, omega=omega,
        acc=zero,
        accelerometer=zero.at[..., 2].set(GRAV),
        thrust_cmds_damp=jnp.zeros_like(state.thrust_cmds_damp),
        thrust_rot_damp=jnp.zeros_like(state.thrust_rot_damp),
        on_floor=jnp.zeros_like(state.on_floor),
        crashed_floor=jnp.zeros_like(state.crashed_floor),
        crashed_wall=jnp.zeros_like(state.crashed_wall),
        crashed_ceiling=jnp.zeros_like(state.crashed_ceiling),
    )
