"""Seed-matched parity tests: batched JAX dynamics kernel vs NumPy oracle.

Mirrors the reference's numba-vs-python harness
(gym_art/quadrotor_multi/tests/test_numba_opt.py:59-119): identical injected
noise, step both implementations, assert allclose on the full state.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadswarm_tpu.env.dynamics import (
    DroneState, DynamicsConfig, dynamics_substep, init_state,
)
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params

from .oracle_dynamics import oracle_init_state, oracle_params, oracle_substep

ROOM_LO = np.array([-5.0, -5.0, 0.0])
ROOM_HI = np.array([5.0, 5.0, 10.0])


@pytest.fixture(scope="module")
def dyn():
    params = DynamicsParams.from_model(crazyflie_params())
    cfg = DynamicsConfig(room_box=(tuple(ROOM_LO), tuple(ROOM_HI)))
    return params, cfg


def to_jax_params(params):
    import dataclasses
    return jax.tree.map(jnp.asarray, dataclasses.asdict(params))


class _P:  # attribute view over a dict of jnp arrays
    def __init__(self, d):
        self.__dict__.update(d)


def state_from_oracle(o, batch=()):
    s = init_state(batch, dtype=jnp.float64)

    def bc(x):
        x = jnp.asarray(x, dtype=jnp.float64)
        return jnp.broadcast_to(x, batch + x.shape)

    return s.replace(
        pos=bc(o["pos"]), vel=bc(o["vel"]), rot=bc(o["rot"]), omega=bc(o["omega"]),
        thrust_cmds_damp=bc(o["cmds_damp"]), thrust_rot_damp=bc(o["rot_damp"]),
        on_floor=jnp.broadcast_to(jnp.asarray(o["on_floor"]), batch),
        step_count=jnp.broadcast_to(jnp.asarray(o["step_count"], jnp.int32), batch),
    )


def assert_state_close(jax_state: DroneState, o: dict, atol=1e-10):
    np.testing.assert_allclose(np.asarray(jax_state.pos), o["pos"], atol=atol)
    np.testing.assert_allclose(np.asarray(jax_state.vel), o["vel"], atol=atol)
    np.testing.assert_allclose(np.asarray(jax_state.rot), o["rot"], atol=atol)
    np.testing.assert_allclose(np.asarray(jax_state.omega), o["omega"], atol=atol)
    np.testing.assert_allclose(
        np.asarray(jax_state.thrust_cmds_damp), o["cmds_damp"], atol=atol)
    np.testing.assert_allclose(np.asarray(jax_state.acc), o["acc"], atol=atol)
    np.testing.assert_allclose(
        np.asarray(jax_state.accelerometer), o["accelerometer"], atol=atol)
    assert bool(jax_state.on_floor) == o["on_floor"]
    assert bool(jax_state.crashed_floor) == o["crashed_floor"]
    assert bool(jax_state.crashed_wall) == o["crashed_wall"]
    assert bool(jax_state.crashed_ceiling) == o["crashed_ceiling"]


def run_pair(dyn, o_state, cmds_seq, noise_seq, steps, yaw=0.3):
    """Step oracle and kernel in lockstep with identical injected noise."""
    params, cfg = dyn
    op = oracle_params(params)
    jp = _P(to_jax_params(params))
    j_state = state_from_oracle(o_state)
    sub = jax.jit(lambda s, c, n: dynamics_substep(
        jp, cfg, s, c, n, jnp.asarray(yaw, jnp.float64)))
    for t in range(steps):
        o_state = oracle_substep(
            op, o_state, cmds_seq[t], noise_seq[t], cfg.dt, ROOM_LO, ROOM_HI,
            floor_threshold=cfg.floor_threshold, mu=cfg.mu,
            omega_max=cfg.omega_max, ortho_every=cfg.orthonormalize_every,
            rand_yaw_theta=yaw)
        j_state = sub(j_state, jnp.asarray(cmds_seq[t]), jnp.asarray(noise_seq[t]))
    return j_state, o_state


def test_hover_flight_parity(dyn):
    """60 sub-steps of noisy near-hover flight starting airborne."""
    rng = np.random.default_rng(0)
    o = oracle_init_state()
    o["pos"] = np.array([0.5, -0.3, 2.0])
    o["vel"] = np.array([0.1, 0.2, -0.1])
    o["omega"] = np.array([0.3, -0.2, 0.1])
    cmds = rng.uniform(0.4, 0.8, size=(60, 4))
    noise = 0.01 * rng.standard_normal((60, 4))
    j, o = run_pair(dyn, o, cmds, noise, 60)
    assert_state_close(j, o)


def test_orthonormalization_schedule_parity(dyn):
    """Run past the 101-substep orthonormalization boundary.

    The kernel uses a Newton polar iteration instead of SVD; after small
    drift both project to (nearly) the same rotation — tolerance is loose
    only on rot.
    """
    rng = np.random.default_rng(1)
    o = oracle_init_state()
    o["pos"] = np.array([0.0, 0.0, 3.0])
    o["omega"] = np.array([2.0, -1.0, 0.5])
    cmds = rng.uniform(0.5, 0.7, size=(120, 4))
    noise = np.zeros((120, 4))
    j, o = run_pair(dyn, o, cmds, noise, 120)
    np.testing.assert_allclose(np.asarray(j.rot), o["rot"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(j.pos), o["pos"], atol=1e-7)
    # Both must be orthonormal
    r = np.asarray(j.rot)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)


def test_floor_crash_parity(dyn):
    """Drone starting just above the floor with no thrust crash-lands."""
    o = oracle_init_state()
    o["pos"] = np.array([1.0, 1.0, 0.2])
    o["vel"] = np.array([0.5, 0.0, -2.0])
    cmds = np.zeros((40, 4))
    noise = np.zeros((40, 4))
    j, o = run_pair(dyn, o, cmds, noise, 40)
    assert o["on_floor"], "oracle should land"
    assert_state_close(j, o)


def test_floor_friction_parity(dyn):
    """On-floor drone with sideways thrust exercises the friction branch."""
    o = oracle_init_state()
    o["pos"] = np.array([0.0, 0.0, 0.05])
    o["on_floor"] = True
    # Tilted rotation: thrust has an xy component
    th = 0.4
    o["rot"] = np.array([
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)],
    ])
    # Asymmetric motors: with exactly symmetric thrusts the on-floor xy
    # force is zero up to FP crumbs and the reference's unclamped-friction
    # direction arctan2(f_y, f_x) is ill-conditioned at (0, 0) (see
    # test_reference_parity.py takeoff test).
    cmds = 0.9 * np.ones((30, 4)) + np.array([0.02, -0.02, 0.01, -0.01])
    noise = np.zeros((30, 4))
    j, o = run_pair(dyn, o, cmds, noise, 30)
    assert_state_close(j, o)


def test_wall_and_ceiling_clip_parity(dyn):
    """Fast drone clips against walls and ceiling; flags must match."""
    o = oracle_init_state()
    o["pos"] = np.array([4.9, 0.0, 9.9])
    o["vel"] = np.array([5.0, 0.0, 5.0])
    cmds = np.ones((5, 4))
    noise = np.zeros((5, 4))
    j, o = run_pair(dyn, o, cmds, noise, 5)
    assert o["crashed_wall"] or o["crashed_ceiling"]
    assert_state_close(j, o)


def test_batched_consistency(dyn):
    """A batch of identical drones must evolve identically to the scalar path."""
    params, cfg = dyn
    jp = _P(to_jax_params(params))
    o = oracle_init_state()
    o["pos"] = np.array([0.0, 0.0, 2.0])
    base = state_from_oracle(o)
    batched = state_from_oracle(o, batch=(4, 8))
    cmds = jnp.asarray(np.random.default_rng(3).uniform(0.3, 0.9, size=4))
    noise = jnp.zeros(4, jnp.float64)
    yaw = jnp.asarray(0.0, jnp.float64)
    s1 = dynamics_substep(jp, cfg, base, cmds, noise, yaw)
    sb = dynamics_substep(
        jp, cfg, batched, jnp.broadcast_to(cmds, (4, 8, 4)),
        jnp.broadcast_to(noise, (4, 8, 4)), jnp.zeros((4, 8), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(sb.pos), np.broadcast_to(np.asarray(s1.pos), (4, 8, 3)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sb.rot), np.broadcast_to(np.asarray(s1.rot), (4, 8, 3, 3)), atol=1e-12)


def test_crazyflie_derived_params():
    """Derived physical constants for the Crazyflie preset are sane."""
    p = DynamicsParams.from_model(crazyflie_params())
    assert 0.02 < float(p.mass) < 0.05          # CF2 ≈ 33 g
    assert abs(float(p.arm) - 0.0460) < 1e-3    # |[0.0325, 0.0325]|
    t2w = float(np.sum(p.thrust_max)) / (float(p.mass) * 9.81)
    assert abs(t2w - 1.9) < 1e-9
    assert np.all(np.asarray(p.inertia) > 0)
