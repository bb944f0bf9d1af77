"""Parity: fused Pallas dynamics kernel vs the XLA reference path.

The Pallas kernel (ops/pallas/dynamics_kernel.py) re-implements one control
tick of the rigid-body integrator (reference quadrotor_dynamics.py:225-346 +
floor_interaction_numba:569-639) as a single VMEM-resident program; the XLA
path (env/dynamics.py) is the oracle, itself parity-tested against the
reference NumPy code in tests/test_reference_parity.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.dynamics import (
    DroneState, DynamicsConfig, dynamics_step, dynamics_substep, init_state,
)
from quadswarm_tpu.env.params import make_dynamics_params
from quadswarm_tpu.ops.pallas.dynamics_kernel import (
    dynamics_step_flat, dynamics_step_planes,
)


def _random_state(rng, b, cfg):
    state = init_state((b,))
    # Rotations: random small perturbations of identity, renormalized via QR
    # (right-handed, near-orthogonal like real integrator state).
    a = np.eye(3) + 0.3 * rng.standard_normal((b, 3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r, axis1=-2, axis2=-1))[:, None, :]
    pos = rng.uniform(-4, 4, (b, 3))
    # Mix of flight / on-floor / near-floor drones to hit every branch of the
    # floor state machine.
    pos[:, 2] = np.abs(pos[:, 2])
    pos[: b // 4, 2] = cfg.floor_threshold * 0.5          # below, crash case
    pos[b // 4 : b // 2, 2] = cfg.floor_threshold * 0.9   # below, settled case
    on_floor = np.zeros(b, bool)
    on_floor[b // 4 : b // 2] = True
    # Some step counts just below the orthonormalization trigger.
    step_count = rng.integers(0, cfg.orthonormalize_every + 1, b)
    return state.replace(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.asarray(rng.uniform(-2, 2, (b, 3)), jnp.float32),
        rot=jnp.asarray(q, jnp.float32),
        omega=jnp.asarray(rng.uniform(-5, 5, (b, 3)), jnp.float32),
        thrust_cmds_damp=jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32),
        thrust_rot_damp=jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32),
        on_floor=jnp.asarray(on_floor),
        step_count=jnp.asarray(step_count, jnp.int32),
        ou_state=jnp.asarray(0.02 * rng.standard_normal((b, 4)), jnp.float32),
    )


def _xla_tick(params, cfg, state, cmds, noise, yaw):
    """cfg.sim_steps XLA sub-steps with injected noise/yaw (= dynamics_step
    minus the internal OU/yaw draws)."""
    for _ in range(cfg.sim_steps):
        state = dynamics_substep(params, cfg, state, cmds, noise, yaw)
    return state


FIELDS = ["pos", "vel", "rot", "omega", "thrust_cmds_damp", "thrust_rot_damp",
          "acc", "accelerometer", "on_floor", "step_count", "crashed_floor",
          "crashed_wall", "crashed_ceiling"]


def _assert_state_close(got: DroneState, want: DroneState, **tol):
    for f in FIELDS:
        g, w = np.asarray(getattr(got, f)), np.asarray(getattr(want, f))
        if g.dtype == bool or np.issubdtype(g.dtype, np.integer):
            np.testing.assert_array_equal(g, w, err_msg=f)
        else:
            np.testing.assert_allclose(g, w, err_msg=f, **tol)


def test_pallas_dynamics_one_tick():
    rng = np.random.default_rng(0)
    cfg = DynamicsConfig()
    params = make_dynamics_params()
    b = 300  # not a multiple of 128 -> exercises lane padding
    state = _random_state(rng, b, cfg)
    cmds = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)
    noise = jnp.asarray(0.01 * rng.standard_normal((b, 4)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, b), jnp.float32)

    want = _xla_tick(params, cfg, state, cmds, noise, yaw)
    got = dynamics_step_planes(params, cfg, state, cmds, noise, yaw,
                               interpret=True)
    _assert_state_close(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_dynamics_trajectory():
    """Tick-by-tick parity along a real trajectory: each control tick the
    kernel starts from the XLA state (re-synced — the dynamics are chaotic,
    so free-running f32 trajectories inevitably drift apart; what must match
    is every single-step transition, including floor/ortho events firing
    mid-trajectory)."""
    rng = np.random.default_rng(1)
    cfg = DynamicsConfig(orthonormalize_every=7)  # trigger ortho often
    params = make_dynamics_params()
    b = 64
    xla = _random_state(rng, b, cfg)
    for t in range(30):
        cmds = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)
        noise = jnp.asarray(0.01 * rng.standard_normal((b, 4)), jnp.float32)
        yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, b), jnp.float32)
        pal = dynamics_step_planes(params, cfg, xla, cmds, noise, yaw,
                                   interpret=True)
        xla = _xla_tick(params, cfg, xla, cmds, noise, yaw)
        _assert_state_close(pal, xla, rtol=1e-3, atol=1e-4)


def test_batched_env_step_pallas_path():
    """use_pallas_dynamics=True routes batched_env_step through the fused
    kernel; obs/rewards/dones must match the XLA path (same PRNG keys ->
    identical noise; only kernel FP rounding differs)."""
    from quadswarm_tpu.env.multi import EnvConfig, batched_env_step, env_reset

    params = make_dynamics_params()
    e, steps = 4, 5
    key = jax.random.PRNGKey(3)
    cfgs = {
        False: EnvConfig(num_agents=4, use_pallas_dynamics=False),
        True: EnvConfig(num_agents=4, use_pallas_dynamics=True),
    }
    outs = {}
    for flag, cfg in cfgs.items():
        reset_keys = jax.random.split(key, e)
        states, obs = jax.vmap(lambda k: env_reset(cfg, params, k))(reset_keys)
        traj = []
        k = key
        for t in range(steps):
            k, ka, ke = jax.random.split(k, 3)
            actions = jax.random.uniform(ka, (e, cfg.num_agents, 4),
                                         jnp.float32, -1.0, 1.0)
            env_keys = jax.random.split(ke, e)
            states, obs, rew, dones, _ = batched_env_step(
                cfg, params, states, actions, env_keys)
            traj.append((np.asarray(obs), np.asarray(rew), np.asarray(dones),
                         np.asarray(states.dyn.pos)))
        outs[flag] = traj
    for (o0, r0, d0, p0), (o1, r1, d1, p1) in zip(outs[False], outs[True]):
        np.testing.assert_allclose(p1, p0, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(o1, o0, rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(r1, r0, rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(d1, d0)


def test_pallas_dynamics_flat_matches_dynamics_step():
    """dynamics_step_flat consumes PRNG keys exactly like dynamics_step, so
    OU noise / crash yaw draws are bit-identical to the XLA path."""
    rng = np.random.default_rng(2)
    cfg = DynamicsConfig()
    params = make_dynamics_params()
    b = 96
    state = _random_state(rng, b, cfg)
    cmds = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), b)

    want = jax.vmap(lambda s, t, k: dynamics_step(params, cfg, s, t, k))(
        state, cmds, keys)
    got = dynamics_step_flat(params, cfg, state, cmds, keys, interpret=True)
    np.testing.assert_allclose(np.asarray(got.ou_state),
                               np.asarray(want.ou_state), rtol=1e-6)
    _assert_state_close(got, want, rtol=2e-4, atol=2e-5)
