"""TRUE seed-matched parity: JAX dynamics kernel vs the ACTUAL reference
simulator (/root/reference gym_art, pure-Python path via the numba stub).

Stronger than the NumPy-oracle tests in test_dynamics.py: here the oracle is
the reference's own `QuadrotorDynamics.step1` (quadrotor_dynamics.py:225-346)
with identical injected thrust noise, per the BASELINE.json seed-matched
trajectory requirement.  Randomness notes: step1's only internal RNG use is
`randyaw()` on an upside-down floor crash (:432-435) — scenarios here stay
right-side-up; OU thrust noise enters via `step()` which we bypass by calling
step1 directly.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadswarm_tpu.env.dynamics import DynamicsConfig, dynamics_substep, init_state
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params

from .numba_stub import import_reference

ROOM_LO = np.array([-5.0, -5.0, 0.0])
ROOM_HI = np.array([5.0, 5.0, 10.0])
DT = 1.0 / 200.0


class _P:
    def __init__(self, d):
        self.__dict__.update(d)


@pytest.fixture(scope="module")
def ref():
    quadrotor_dynamics, quad_models = import_reference()
    return quadrotor_dynamics, quad_models


def make_ref_dynamics(ref, use_numba=False):
    quadrotor_dynamics, quad_models = ref
    return quadrotor_dynamics.QuadrotorDynamics(
        model_params=quad_models.crazyflie_params(),
        room_box=[ROOM_LO, ROOM_HI], dynamics_steps_num=2,
        use_numba=use_numba, dt=DT)


def make_jax_side(floor_threshold=0.05):
    params = DynamicsParams.from_model(crazyflie_params(), dt=DT)
    cfg = DynamicsConfig(room_box=(tuple(ROOM_LO), tuple(ROOM_HI)),
                         floor_threshold=floor_threshold)
    jp = _P(jax.tree.map(jnp.asarray, dataclasses.asdict(params)))
    return params, cfg, jp


def run_lockstep(ref, pos, vel, rot, omega, cmds_seq, noise_seq, yaw=0.3,
                 use_numba=False):
    """Step the reference and the JAX kernel with identical injected noise.

    With use_numba=True this exercises the reference's TRAINING path (the
    @njit twins run as plain Python under the stub): step1_numba +
    floor_interaction_numba with floor_threshold = arm length (:378).  The
    two reference paths genuinely disagree on floor contact — the pure-Python
    `floor_interaction` applies kinetic friction ALONG the velocity
    (arctan2(-vel) then subtract, :420-425) and uses an exact `vel == 0`
    static test (:408), while the numba twin opposes velocity (:600-604) and
    tests `norm(vel) < EPS` (:586).  Our kernel follows the numba/training
    semantics (env/dynamics.py floor notes), so floor-contact scenarios are
    validated against the numba path and free-flight against both.
    """
    d = make_ref_dynamics(ref, use_numba=use_numba)
    omega32 = np.float64(np.float32(omega))  # set_state casts omega to f32 (:188)
    d.set_state(np.asarray(pos, float), np.asarray(vel, float),
                np.asarray(rot, float), np.asarray(omega, float))
    d.reset()  # zero thrust filter state

    _, cfg, jp = make_jax_side(
        floor_threshold=float(d.arm) if use_numba else 0.05)
    s = init_state((), dtype=jnp.float64)
    s = s.replace(pos=jnp.asarray(pos, jnp.float64),
                  vel=jnp.asarray(vel, jnp.float64),
                  rot=jnp.asarray(rot, jnp.float64),
                  omega=jnp.asarray(omega32, jnp.float64))
    sub = jax.jit(lambda s, c, n: dynamics_substep(
        jp, cfg, s, c, n, jnp.asarray(yaw, jnp.float64)))

    step1 = d.step1_numba if use_numba else d.step1
    for t in range(len(cmds_seq)):
        step1(np.asarray(cmds_seq[t]), DT, np.asarray(noise_seq[t]))
        s = sub(s, jnp.asarray(cmds_seq[t]), jnp.asarray(noise_seq[t]))
    return d, s


def assert_matches_reference(d, s, atol=1e-10):
    np.testing.assert_allclose(np.asarray(s.pos), d.pos, atol=atol)
    np.testing.assert_allclose(np.asarray(s.vel), d.vel, atol=atol)
    np.testing.assert_allclose(np.asarray(s.rot), d.rot, atol=atol)
    np.testing.assert_allclose(np.asarray(s.omega), d.omega, atol=atol)
    np.testing.assert_allclose(np.asarray(s.thrust_cmds_damp),
                               d.thrust_cmds_damp, atol=atol)
    np.testing.assert_allclose(np.asarray(s.acc), np.asarray(d.acc, float),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(s.accelerometer), d.accelerometer,
                               atol=atol)
    assert bool(s.on_floor) == d.on_floor
    assert bool(s.crashed_wall) == d.crashed_wall
    assert bool(s.crashed_ceiling) == d.crashed_ceiling


def test_param_pipeline_matches_reference(ref):
    """Our from_model (inertia composition, thrust/torque/motor-tau derivation)
    equals the reference's update_model + QuadLink (inertia.py)."""
    d = make_ref_dynamics(ref)
    p, _, _ = make_jax_side()
    np.testing.assert_allclose(np.asarray(p.mass), d.mass, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.inertia), d.inertia, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.thrust_max), d.thrust_max, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.torque_max), d.torque_max, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.prop_crossproducts),
                               d.prop_crossproducts, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.prop_ccw), d.prop_ccw, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.motor_tau_up), d.motor_tau_up,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.motor_tau_down), d.motor_tau_down,
                               rtol=1e-12)


def test_airborne_flight_matches_reference(ref):
    rng = np.random.default_rng(0)
    cmds = rng.uniform(0.4, 0.8, size=(60, 4))
    noise = 0.01 * rng.standard_normal((60, 4))
    d, s = run_lockstep(ref, pos=[0.5, -0.3, 2.0], vel=[0.1, 0.2, -0.1],
                        rot=np.eye(3), omega=[0.3, -0.2, 0.1],
                        cmds_seq=cmds, noise_seq=noise)
    assert not d.on_floor
    assert_matches_reference(d, s)


def test_floor_landing_matches_reference_training_path(ref):
    """Low thrust from low altitude: crash onto the floor then slide with
    friction — against the reference's numba/training floor semantics."""
    rng = np.random.default_rng(1)
    cmds = rng.uniform(0.0, 0.2, size=(120, 4))
    noise = 0.005 * rng.standard_normal((120, 4))
    d, s = run_lockstep(ref, pos=[0.0, 0.0, 0.3], vel=[0.5, 0.0, -1.0],
                        rot=np.eye(3), omega=[0.0, 0.0, 0.0],
                        cmds_seq=cmds, noise_seq=noise, use_numba=True)
    assert d.on_floor, "scenario must actually land"
    assert_matches_reference(d, s)


def test_takeoff_from_floor_matches_reference_training_path(ref):
    """Start resting on the floor, high thrust: friction release + takeoff.

    Thrusts are slightly asymmetric on purpose: with EXACTLY symmetric
    motors the xy force on the floor is zero up to float crumbs, and the
    reference's unclamped-friction direction arctan2(f_y, f_x) (:595) is
    ill-conditioned at (0, 0) — the "phantom" force direction then depends
    on the last ulp of the FP schedule, which legitimately differs between
    any two implementations (including the reference's own python vs numba
    paths)."""
    cmds = np.full((80, 4), 0.95) + np.array([0.01, -0.01, 0.005, -0.005])
    noise = np.zeros((80, 4))
    d0 = make_ref_dynamics(ref, use_numba=True)
    d, s = run_lockstep(ref, pos=[0.0, 0.0, float(d0.arm)],
                        vel=[0.0, 0.0, 0.0], rot=np.eye(3),
                        omega=[0.0, 0.0, 0.0], cmds_seq=cmds, noise_seq=noise,
                        use_numba=True)
    assert not d.on_floor, "drone should have taken off"
    assert d.pos[2] > 0.3
    assert_matches_reference(d, s)


def test_airborne_flight_matches_reference_training_path(ref):
    """Same airborne scenario through the numba/training kernel twins."""
    rng = np.random.default_rng(0)
    cmds = rng.uniform(0.4, 0.8, size=(60, 4))
    noise = 0.01 * rng.standard_normal((60, 4))
    d, s = run_lockstep(ref, pos=[0.5, -0.3, 2.0], vel=[0.1, 0.2, -0.1],
                        rot=np.eye(3), omega=[0.3, -0.2, 0.1],
                        cmds_seq=cmds, noise_seq=noise, use_numba=True)
    assert not d.on_floor
    assert_matches_reference(d, s)


def test_ceiling_crash_flag_matches_reference(ref):
    """High thrust straight up into the ceiling sets crashed_ceiling."""
    cmds = np.full((400, 4), 1.0)
    noise = np.zeros((400, 4))
    d, s = run_lockstep(ref, pos=[0.0, 0.0, 8.0], vel=[0.0, 0.0, 2.0],
                        rot=np.eye(3), omega=[0.0, 0.0, 0.0],
                        cmds_seq=cmds, noise_seq=noise)
    assert d.crashed_ceiling
    # long horizon crosses the re-orthonormalization event (:308-314):
    # reference uses SVD, we use a Newton polar iteration — equal to ~1e-9
    assert_matches_reference(d, s, atol=1e-8)


def _random_rotation(rng):
    from scipy.spatial.transform import Rotation
    return Rotation.random(random_state=rng).as_matrix()


@pytest.fixture(scope="module")
def ref_controls(ref):
    """Reference controller module (stub tensorflow: NonlinearPositionController
    unconditionally imports it in __init__ even for the numpy branch, :256)."""
    import sys
    import types as _t
    sys.modules.setdefault("tensorflow", _t.ModuleType("tensorflow"))
    from gym_art.quadrotor_multi import quadrotor_control
    return quadrotor_control


def test_mellinger_controller_matches_reference(ref, ref_controls):
    """Mellinger oracle (NonlinearPositionController numpy branch, :281-331)
    vs our mellinger_control on random states: thrusts must match."""
    from quadswarm_tpu.env.controls import jacobian_inv, mellinger_control

    rng = np.random.default_rng(7)
    d = make_ref_dynamics(ref)
    ctrl = ref_controls.NonlinearPositionController(d, tf_control=False)
    params, _, jp = make_jax_side()
    j_inv = jacobian_inv(jp)
    np.testing.assert_allclose(np.asarray(j_inv), ctrl.Jinv, rtol=1e-9,
                               atol=1e-12)

    for _ in range(10):
        pos = rng.uniform(-3, 3, size=3)
        vel = rng.uniform(-2, 2, size=3)
        rot = _random_rotation(rng)
        omega = np.float64(np.float32(rng.uniform(-3, 3, size=3)))
        goal = rng.uniform(-3, 3, size=3)
        d.set_state(pos, vel, rot, omega)
        ctrl.step(d, goal, 1.0 / 100.0)
        ours = mellinger_control(j_inv, jnp.asarray(pos), jnp.asarray(vel),
                                 jnp.asarray(rot), jnp.asarray(omega),
                                 jnp.asarray(goal))
        # small EPS-guard differences in normalize() leave ~1e-8 residuals
        np.testing.assert_allclose(np.asarray(ours), ctrl.action,
                                   rtol=1e-6, atol=5e-8)


def test_omega_thrust_controller_matches_reference(ref, ref_controls):
    from quadswarm_tpu.env.controls import jacobian_inv, omega_thrust_control

    rng = np.random.default_rng(8)
    d = make_ref_dynamics(ref)
    ctrl = ref_controls.OmegaThrustControl(d)
    _, _, jp = make_jax_side()
    j_inv = jacobian_inv(jp)
    for _ in range(10):
        omega = np.float64(np.float32(rng.uniform(-5, 5, size=3)))
        action = rng.uniform(-1, 1, size=4)
        d.set_state(np.zeros(3) + [0, 0, 2.0], np.zeros(3), np.eye(3), omega)
        ctrl.step(d, action.copy(), 1.0 / 100.0)
        # reference mutates dynamics but stores no action; recompute its
        # closed form directly (:191-199)
        dw_des = -5.0 * (omega - action[1:])
        des = np.append(GRAV_REF * (action[0] + 1.0), dw_des)
        expect = np.clip(ctrl.Jinv @ des, 0.0, 1.0)
        ours = omega_thrust_control(j_inv, jnp.asarray(omega), jnp.asarray(action))
        np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-7,
                                   atol=1e-10)


GRAV_REF = 9.81


def test_sensor_noise_matches_reference(ref):
    """SensorNoise.add_noise (sensor_noise.py:112-170) vs our apply_noise
    with the reference's recorded noise tape injected: the deterministic
    transform (additive noise + small-angle quaternion rotation perturbation
    via rot2quat/quatXquat/quat2R) must match."""
    import gym_art.quadrotor_multi.sensor_noise as sn_mod

    from quadswarm_tpu.env.sensor import SensorNoiseParams, apply_noise

    rng = np.random.default_rng(11)
    tape = []

    def fake_normal(loc=0.0, scale=1.0, size=None):
        out = loc + scale * rng.standard_normal(size)
        tape.append(np.asarray(out, float))
        return out

    def fake_uniform(low=0.0, high=1.0, size=None):
        out = rng.uniform(low, high, size)
        tape.append(np.asarray(out, float))
        return out

    sn = sn_mod.SensorNoise(quat_norm_std=0.05, quat_unif_range=0.02)
    params = SensorNoiseParams(quat_norm_std=0.05, quat_unif_range=0.02)

    orig = (sn_mod.normal, sn_mod.uniform)
    sn_mod.normal, sn_mod.uniform = fake_normal, fake_uniform
    try:
        for _ in range(5):
            tape.clear()
            pos = rng.uniform(-3, 3, size=3)
            vel = rng.uniform(-2, 2, size=3)
            rot = _random_rotation(rng)
            omega = rng.uniform(-3, 3, size=3)
            acc = rng.uniform(-5, 5, size=3)
            r_pos, r_vel, r_rot, r_omega, r_acc = sn.add_noise(
                pos, vel, rot, omega, acc, DT)
            # draw order: pos_g, pos_u, vel_g, vel_u, omega_g, theta_g,
            # theta_u, acc_static_g, acc_dynamic_g      (:126-169)
            assert len(tape) == 9, len(tape)
            o_pos, o_vel, o_rot, o_omega, o_acc = apply_noise(
                params, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rot),
                jnp.asarray(omega), jnp.asarray(acc),
                pos_noise=jnp.asarray(tape[0] + tape[1]),
                vel_noise=jnp.asarray(tape[2] + tape[3]),
                omega_noise=jnp.asarray(tape[4]),
                theta=jnp.asarray(tape[5] + tape[6]),
                acc_noise=jnp.asarray(tape[7] + acc * tape[8]))
            np.testing.assert_allclose(np.asarray(o_pos), r_pos, atol=1e-12)
            np.testing.assert_allclose(np.asarray(o_vel), r_vel, atol=1e-12)
            np.testing.assert_allclose(np.asarray(o_rot), r_rot, atol=1e-10)
            np.testing.assert_allclose(np.asarray(o_omega), r_omega, atol=1e-12)
            np.testing.assert_allclose(np.asarray(o_acc), r_acc, atol=1e-12)
    finally:
        sn_mod.normal, sn_mod.uniform = orig


def test_ou_thrust_noise_matches_reference(ref):
    """OUNoise (quad_utils.py:253-279, sigma = 0.2 * thrust_noise_ratio per
    quadrotor_dynamics.py:168-173) vs ou_noise_step with injected normals."""
    import numpy.random as nr

    import gym_art.quadrotor_multi.quad_utils as qu_mod

    from quadswarm_tpu.env.dynamics import ou_noise_step

    rng = np.random.default_rng(13)
    tape = []

    def fake_randn(n):
        out = rng.standard_normal(n)
        tape.append(out)
        return out

    ratio = 0.05
    ou = qu_mod.OUNoise(4, sigma=0.2 * ratio)
    orig = qu_mod.nr.randn
    qu_mod.nr.randn = fake_randn
    try:
        state = jnp.zeros(4, jnp.float64)
        for _ in range(20):
            ref_out = ou.noise()
            draws = tape[-1]
            # re-derive with the injected draw: dx = theta*(mu-x)+sigma*z
            sigma = 0.2 * ratio
            state = state + 0.15 * (0.0 - state) + sigma * jnp.asarray(draws)
            np.testing.assert_allclose(np.asarray(state), ref_out, atol=1e-14)
    finally:
        qu_mod.nr.randn = orig
    # and the jitted kernel computes the same recursion for a fixed draw
    z = jnp.asarray(tape[0])
    s0 = jnp.zeros(4, jnp.float64)
    import unittest.mock as mock
    with mock.patch("jax.random.normal", return_value=z):
        out = ou_noise_step(s0, jax.random.PRNGKey(0), jnp.asarray(ratio))
    np.testing.assert_allclose(np.asarray(out),
                               0.15 * (0.0 - np.zeros(4)) + 0.2 * ratio * np.asarray(z),
                               atol=1e-14)
