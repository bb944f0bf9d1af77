"""FULL-EPISODE seed-matched parity: our env_step vs the ACTUAL reference
QuadrotorEnvMulti (/root/reference gym_art) stepped in lockstep.

This is BASELINE.md's literal bar: not per-subsystem parity (dynamics,
controllers, kernels — covered elsewhere) but whole-env trajectories through
QuadrotorEnvMulti.step (quadrotor_multi.py:413-724): control -> dynamics ->
reward -> collision detection -> collision rewards -> scenario -> obs.

Noise is removed identically on both sides (sense_noise bypassed, OU thrust
noise ratio = 0), initial states are injected, and both sims consume the
same action tape.  The one remaining RNG — the randomized collision-response
velocities, drawn from GLOBAL np.random in the reference
(collisions/quadrotors.py:36-38, obstacles.py:31-36) — is handled by a
RECORD/REPLAY tape: the harness wraps np.random.normal/uniform around the
reference step, parses the recorded draws into the layout our batched
response kernels consume, and injects them via
env.collisions.set_response_tape.  Free-flight, collision, and obstacle
episodes are therefore compared tick-for-tick (pos/vel/omega/obs/reward)
THROUGH and PAST the collision events at 1e-8 — BASELINE.md's seed-matched
bar with no event-tick exclusions.

Both sides build obs from POST-response state (the reference re-collects
`state_vector` after applying interaction forces — `self_state_update_flag`,
quadrotor_multi.py:548-600), so obs match on event ticks too.
"""
from __future__ import annotations

import os
import sys
import types
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadswarm_tpu.env.multi import EnvConfig, env_reset, env_step
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.env.reward import RewardCoeffs

from .numba_stub import install

EP_TIME = 15.0
REW_COEFF = dict(pos=1.0, effort=0.05, action_change=0.0, crash=1.0,
                 orient=1.0, yaw=0.0, rot=0.0, attitude=0.0, spin=0.1,
                 vel=0.0, quadcol_bin=5.0, quadcol_bin_smooth_max=4.0,
                 quadcol_bin_obst=5.0)


@pytest.fixture(scope="module")
def ref_multi():
    """Import the reference QuadrotorEnvMulti (numba stub + headless stubs
    for the pyglet/bezier imports the module pulls in at top level)."""
    if not os.path.isdir("/root/reference/gym_art"):
        pytest.skip("reference checkout not available")
    install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    for name in ("pyglet", "pyglet.window", "pyglet.gl", "bezier",
                 "OpenGL", "OpenGL.GL", "OpenGL.GLU"):
        sys.modules.setdefault(name, types.ModuleType(name))
    import gym_art.quadrotor_multi.quadrotor_multi as qm
    return qm


REF_DEFAULTS = dict(num_agents=2, neighbor_visible_num=-1,
                    use_obstacles=False, use_downwash=False,
                    quads_mode="static_same_goal",
                    obs_repr="xyz_vxyz_R_omega",
                    obst_density=0.2, obst_size=1.0)


def make_ref_env(qm, **over):
    kw = dict(REF_DEFAULTS, **over)
    return qm.QuadrotorEnvMulti(
        num_agents=kw["num_agents"], ep_time=EP_TIME, rew_coeff=None,
        obs_repr=kw["obs_repr"],
        neighbor_visible_num=kw["neighbor_visible_num"],
        neighbor_obs_type="pos_vel",
        collision_hitbox_radius=2.0, collision_falloff_radius=4.0,
        use_obstacles=kw["use_obstacles"], obst_density=kw["obst_density"],
        obst_size=kw["obst_size"],
        obst_spawn_area=[6, 6],
        use_downwash=kw["use_downwash"], use_numba=True,
        quads_mode=kw["quads_mode"],
        room_dims=(10, 10, 10), use_replay_buffer=False,
        quads_view_mode=["topdown"], quads_render=False,
        dynamics_params="Crazyflie", raw_control=True,
        raw_control_zero_middle=True,
        dynamics_randomize_every=None,
        dynamics_change={"noise": {"thrust_noise_ratio": 0.0}},
        dyn_sampler_1=None, sense_noise=None, init_random_state=False)


def make_our_side(**over):
    kw = dict(REF_DEFAULTS, **over)
    cfg = EnvConfig(num_agents=kw["num_agents"], ep_time=EP_TIME,
                    obs_repr=kw["obs_repr"],
                    neighbor_obs_type="pos_vel",
                    neighbor_visible_num=kw["neighbor_visible_num"],
                    collision_hitbox_radius=2.0, collision_falloff_radius=4.0,
                    room_dims=(10.0, 10.0, 10.0), quads_mode=kw["quads_mode"],
                    control_mode="raw", zero_action_middle=True,
                    use_sensor_noise=False,
                    use_obstacles=kw["use_obstacles"],
                    obst_density=kw["obst_density"],
                    obst_size=kw["obst_size"],
                    use_downwash=kw["use_downwash"], dtype=jnp.float64)
    model = crazyflie_params()
    model["noise"]["thrust_noise_ratio"] = 0.0
    params = DynamicsParams.from_model(model, dt=cfg.dt)
    return cfg, params


def _inject_ref_obstacles(env, state):
    """Copy the reference env's sampled obstacle layout (obstacles.pos_arr —
    free-cell grid placement, quadrotor_multi.py:304-325) into our
    fixed-capacity masked obstacle state."""
    ref_pos = np.asarray(env.obstacles.pos_arr, float)       # (M, 3)
    ours = np.asarray(state.obst_pos, float)                 # (C, 3)
    active = np.zeros(ours.shape[0], bool)
    for p in ref_pos:
        d = np.linalg.norm(ours[:, :2] - p[None, :2], axis=1)
        idx = int(np.argmin(d))
        assert d[idx] < 1e-9, "reference obstacle not on our cell grid"
        active[idx] = True
    assert active.sum() == len(ref_pos)
    return state.replace(
        obst_active=jnp.asarray(active),
        obst_size=jnp.asarray(float(env.obst_size), jnp.float64))


OMEGA_MAX_DRONE = 20.0 * np.pi   # compute_new_omega magn_scale=20 (utils.py:22)
OMEGA_MAX_OBST = np.pi           # perform_collision_with_obstacle magn_scale=1


def _drone_tape(records, env, n):
    """Parse ONE reference drone-drone response's np.random record stream
    (perform_collision_between_drones, collisions/quadrotors.py:23-59) into
    the (N,3,3,3)/(N,6) arrays drone_collision_response_indexed consumes.
    The reference stops drawing attempts at the first separating candidate;
    unrecorded attempts stay zero (never selected — argmax picks the same
    first-valid index on both sides)."""
    normals = [r for r in records if r[0] == "normal"]
    unis = [r for r in records if r[0] == "uniform"]
    assert len(normals) in (3, 6, 9), [r[:4] for r in records]
    assert len(unis) == 4, [r[:4] for r in records]
    pairs = np.asarray(env.prev_drone_collisions, int)
    assert pairs.shape[0] == 1, f"expected one colliding pair, got {pairs}"
    pair = tuple(pairs[0])
    draw = np.zeros((n, 3, 3, 3))
    for k in range(len(normals) // 3):
        cons = np.asarray(normals[3 * k][4]) / 0.8
        n_a = np.asarray(normals[3 * k + 1][4]) / 0.15
        n_b = np.asarray(normals[3 * k + 2][4]) / 0.15
        for d in pair:
            draw[d, k] = [cons, n_a, n_b]
    uni = np.zeros((n, 6))
    for d in pair:
        uni[d, 0] = (unis[0][4] - 0.2) / 0.6          # decay vel1 (drone a)
        uni[d, 1] = (unis[1][4] - 0.2) / 0.6          # decay vel2 (drone b)
        uni[d, 2:5] = (np.asarray(unis[2][4]) + 1.0) / 2.0   # omega dir
        uni[d, 5] = (unis[3][4] / OMEGA_MAX_DRONE - 0.5) / 0.5
    return {"drone_normals": draw, "drone_uniforms": uni}


def _obst_tape(records, env, n):
    """Parse ONE reference obstacle response (perform_collision_with_obstacle,
    collisions/obstacles.py:23-50) into obstacle_collision_response's
    (N,3,2,3)/(N,5) tape arrays."""
    normals = [r for r in records if r[0] == "normal"]
    unis = [r for r in records if r[0] == "uniform"]
    assert len(normals) in (2, 4, 6), [r[:4] for r in records]
    assert len(unis) == 3, [r[:4] for r in records]
    hit = np.asarray(env.curr_quad_col, int)
    assert hit.shape[0] == 1, f"expected one hit drone, got {hit}"
    d = int(hit[0])
    draw = np.zeros((n, 3, 2, 3))
    for k in range(len(normals) // 2):
        draw[d, k, 0] = np.asarray(normals[2 * k][4]) / 0.1
        draw[d, k, 1] = np.asarray(normals[2 * k + 1][4]) / 0.05
    uni = np.zeros((n, 5))
    uni[d, 0] = (unis[0][4] - 0.2) / 0.6              # decay (1.0 if inside)
    uni[d, 1:4] = (np.asarray(unis[1][4]) + 1.0) / 2.0
    uni[d, 4] = (unis[2][4] / OMEGA_MAX_OBST - 0.5) / 0.5
    return {"obst_normals": draw, "obst_uniforms": uni}


def lockstep(qm, poss, vels, n_ticks, action_fn, stop_on_collision=False,
             stop_on_obst_collision=False, zero_uniform_noise=False,
             replay_response_rng=False, post_event_ticks=0, tape_builder=None,
             **over):
    """Step both sims from injected initial states with a shared action tape.
    Returns the per-tick comparison records.

    poss/vels may be callables receiving the (already reset) reference env —
    used by the obstacle test to place drones relative to the sampled
    obstacle layout.  zero_uniform_noise replaces np.random.uniform /
    jax.random.uniform with their midpoint DURING STEPPING on both sides
    (all per-tick uniform draws in this config are symmetric around their
    midpoint — downwash noise — so this zeroes them identically)."""
    env = make_ref_env(qm, **over)
    env.reset()
    if callable(poss):
        poss = poss(env)
    if callable(vels):
        vels = vels(env)
    n = len(poss)
    for i, e in enumerate(env.envs):
        e.dynamics.set_state(np.asarray(poss[i], float),
                             np.asarray(vels[i], float), np.eye(3),
                             np.zeros(3))
        e.dynamics.reset()

    cfg, params = make_our_side(**over)
    state, _ = env_reset(cfg, params, jax.random.PRNGKey(0),
                         rew_coeff=RewardCoeffs(**REW_COEFF))
    if over.get("use_obstacles"):
        state = _inject_ref_obstacles(env, state)
    goals = np.asarray([e.goal for e in env.envs], float)
    dyn = state.dyn.replace(
        pos=jnp.asarray(poss, jnp.float64),
        vel=jnp.asarray(vels, jnp.float64),
        rot=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (n, 3, 3)),
        omega=jnp.zeros((n, 3), jnp.float64),
        thrust_cmds_damp=jnp.asarray([e.dynamics.thrust_cmds_damp
                                      for e in env.envs], jnp.float64),
        thrust_rot_damp=jnp.asarray([e.dynamics.thrust_rot_damp
                                     for e in env.envs], jnp.float64),
        acc=jnp.asarray([e.dynamics.acc for e in env.envs], jnp.float64),
        accelerometer=jnp.asarray([e.dynamics.accelerometer
                                   for e in env.envs], jnp.float64),
        on_floor=jnp.asarray([e.dynamics.on_floor for e in env.envs]),
        ou_state=jnp.zeros((n, 4), jnp.float64),
    )
    state = state.replace(
        dyn=dyn, scenario=state.scenario.replace(
            goals=jnp.asarray(goals, jnp.float64)))

    step = jax.jit(partial(env_step, cfg, params, auto_reset=False))
    key = jax.random.PRNGKey(42)

    np_uniform = np.random.uniform
    jax_uniform = jax.random.uniform

    def mid_np_uniform(low=0.0, high=1.0, size=None):
        mid = (np.asarray(low) + np.asarray(high)) / 2.0
        return mid if size is None else np.full(size, mid)

    def mid_jax_uniform(k, shape=(), dtype=float, minval=0.0, maxval=1.0):
        mid = (jnp.asarray(minval, dtype) + jnp.asarray(maxval, dtype)) / 2.0
        return jnp.full(shape, mid, dtype)

    if zero_uniform_noise:
        np.random.uniform = mid_np_uniform
        jax.random.uniform = mid_jax_uniform

    from quadswarm_tpu.env import collisions as coll_mod

    def recorded_ref_step(acts):
        """Reference step with np.random.normal/uniform RECORDED — the only
        global-RNG consumers in these configs are the collision responses
        (OU noise ratio 0, sense noise off, static scenario)."""
        rec: list = []
        on, ou = np.random.normal, np.random.uniform

        def rn(loc=0.0, scale=1.0, size=None):
            v = on(loc, scale, size)
            rec.append(("normal", loc, scale, size, v))
            return v

        def ru(low=0.0, high=1.0, size=None):
            v = ou(low, high, size)
            rec.append(("uniform", low, high, size, v))
            return v

        np.random.normal, np.random.uniform = rn, ru
        try:
            out = env.step([np.asarray(a, float) for a in acts])
        finally:
            np.random.normal, np.random.uniform = on, ou
        return out, rec

    try:
        records = []
        event_tick = None
        for t in range(n_ticks):
            acts = action_fn(t)
            if replay_response_rng:
                (ref_obs, ref_rew, ref_done, ref_info), rng_rec = \
                    recorded_ref_step(acts)
                tape = tape_builder(rng_rec, env, n) if rng_rec else None
                if tape is not None:
                    # fresh jit: tape values embed as constants at trace
                    coll_mod.set_response_tape(tape)
                    try:
                        state, obs, rew, dones, info = jax.jit(
                            partial(env_step, cfg, params, auto_reset=False))(
                            state, jnp.asarray(acts, jnp.float64),
                            jax.random.fold_in(key, t))
                    finally:
                        coll_mod.set_response_tape(None)
                else:
                    state, obs, rew, dones, info = step(
                        state, jnp.asarray(acts, jnp.float64),
                        jax.random.fold_in(key, t))
            else:
                ref_obs, ref_rew, ref_done, ref_info = env.step(
                    [np.asarray(a, float) for a in acts])
                state, obs, rew, dones, info = step(
                    state, jnp.asarray(acts, jnp.float64),
                    jax.random.fold_in(key, t))
            rec = dict(
                t=t,
                ref_pos=np.asarray([e.dynamics.pos for e in env.envs]),
                our_pos=np.asarray(state.dyn.pos),
                ref_vel=np.asarray([e.dynamics.vel for e in env.envs]),
                our_vel=np.asarray(state.dyn.vel),
                ref_omega=np.asarray([e.dynamics.omega for e in env.envs]),
                our_omega=np.asarray(state.dyn.omega),
                ref_obs=np.asarray(ref_obs), our_obs=np.asarray(obs),
                ref_rew=np.asarray(ref_rew), our_rew=np.asarray(rew),
                ref_colls=env.collisions_per_episode,
                our_colls=int(np.asarray(info["num_collisions"]).reshape(-1)[0]),
                ref_obst_colls=(env.obst_quad_collisions_per_episode
                                if over.get("use_obstacles") else 0),
                our_obst_colls=int(np.asarray(
                    info["num_collisions_obst_quad"]).reshape(-1)[0]),
            )
            records.append(rec)
            hit = ((stop_on_collision and env.collisions_per_episode > 0)
                   or (stop_on_obst_collision
                       and env.obst_quad_collisions_per_episode > 0))
            if hit and event_tick is None:
                event_tick = t
            if event_tick is not None and t >= event_tick + post_event_ticks:
                break
    finally:
        np.random.uniform = np_uniform
        jax.random.uniform = jax_uniform
    return records


def test_free_flight_episode_matches_reference(ref_multi):
    """100 control ticks (2 s) of 2-drone free flight: pos/vel/obs/reward
    match the reference env tick-for-tick."""
    rng = np.random.default_rng(5)
    # biased toward hover thrust so nobody hits the floor: a floor crash
    # while inverted draws a RANDOM yaw on both sides (per-sim RNG,
    # quadrotor_dynamics.py:617-621) and trajectories legitimately fork
    tape = rng.uniform(-0.1, 0.3, size=(100, 2, 4))
    recs = lockstep(ref_multi,
                    poss=[[-1.0, -1.0, 4.0], [1.0, 1.0, 4.5]],
                    vels=[[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]],
                    n_ticks=100, action_fn=lambda t: tape[t])
    assert min(r["ref_pos"][:, 2].min() for r in recs) > 0.06, \
        "scenario must stay airborne (floor crash forks the RNG)"
    for r in recs:
        t = r["t"]
        np.testing.assert_allclose(r["our_pos"], r["ref_pos"], atol=1e-8,
                                   err_msg=f"pos tick {t}")
        np.testing.assert_allclose(r["our_vel"], r["ref_vel"], atol=1e-8,
                                   err_msg=f"vel tick {t}")
        np.testing.assert_allclose(r["our_obs"], r["ref_obs"], atol=1e-7,
                                   err_msg=f"obs tick {t}")
        np.testing.assert_allclose(r["our_rew"], r["ref_rew"], atol=1e-8,
                                   err_msg=f"rew tick {t}")
        assert r["our_colls"] == r["ref_colls"] == 0


def test_collision_episode_matches_reference_through_response(ref_multi):
    """Head-on approach compared tick-for-tick THROUGH and PAST the collision:
    the reference's response np.random draws (perform_collision_between_drones)
    are recorded and replayed into our response kernel, so pos/vel/omega/obs/
    reward must match on every tick — including the collision tick (obs are
    rebuilt from post-response state on both sides) and 15 ticks after it
    (VERDICT r3 #4: the last asterisk on BASELINE.md's seed-matched bar)."""
    hover = np.zeros((2, 4))
    post = 15
    recs = lockstep(ref_multi,
                    poss=[[-0.15, 0.0, 2.0], [0.15, 0.0, 2.0]],
                    vels=[[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]],
                    n_ticks=40, action_fn=lambda t: hover,
                    stop_on_collision=True, replay_response_rng=True,
                    post_event_ticks=post, tape_builder=_drone_tape)
    assert recs[-1]["ref_colls"] == 1, "episode must contain a collision"
    assert recs[-1]["our_colls"] == 1, "our env must flag the same collision"
    assert len(recs) >= post, "must have compared past the event"
    assert min(r["ref_pos"][:, 2].min() for r in recs) > 0.06, \
        "post-response drones must stay off the floor (floor RNG not taped)"
    for r in recs:
        t = r["t"]
        np.testing.assert_allclose(r["our_pos"], r["ref_pos"], atol=1e-8,
                                   err_msg=f"pos tick {t}")
        np.testing.assert_allclose(r["our_vel"], r["ref_vel"], atol=1e-8,
                                   err_msg=f"vel tick {t}")
        np.testing.assert_allclose(r["our_omega"], r["ref_omega"], atol=1e-7,
                                   err_msg=f"omega tick {t}")
        np.testing.assert_allclose(r["our_obs"], r["ref_obs"], atol=1e-6,
                                   err_msg=f"obs tick {t}")
        np.testing.assert_allclose(r["our_rew"], r["ref_rew"], atol=1e-8,
                                   err_msg=f"rew tick {t}")
        assert r["our_colls"] == r["ref_colls"]


def test_obstacle_episode_matches_reference(ref_multi):
    """Obstacle family through the whole-env lockstep harness: SDF obs
    (obstacles/utils.py:4-27) compared every tick, free-cell obstacle layout
    injected from the reference's sampled grid, and an obstacle-collision
    tick where both sides flag the same hit with the same -quadcol_bin_obst
    reward (quadrotor_multi.py:441-478,566-578)."""
    np.random.seed(7)  # reproducible reference obstacle layout
    approach = 1.2

    def poss(env):
        opos = np.asarray(env.obstacles.pos_arr, float)
        # pick an obstacle whose western approach lane is clear of the others
        for cand in opos:
            start = cand.copy()
            start[0] -= approach
            start[2] = 2.0
            d = np.linalg.norm(opos[:, :2] - start[None, :2], axis=1)
            d[np.argmin(np.linalg.norm(opos[:, :2] - cand[None, :2],
                                       axis=1))] = np.inf
            if d.min() > 0.8:
                far = np.array([-4.5, -4.5, 2.0])
                return np.stack([start, far])
        pytest.skip("no obstacle with a clear approach lane in this layout")

    rng = np.random.default_rng(3)
    tape = rng.uniform(-0.05, 0.25, size=(150, 2, 4))
    post = 12
    recs = lockstep(ref_multi, poss, vels=[[1.5, 0.0, 0.0], [0.0, 0.0, 0.0]],
                    n_ticks=150, action_fn=lambda t: tape[t],
                    stop_on_obst_collision=True,
                    replay_response_rng=True, post_event_ticks=post,
                    tape_builder=_obst_tape,
                    use_obstacles=True, quads_mode="o_static_same_goal")
    assert recs[-1]["ref_obst_colls"] >= 1, "episode must hit an obstacle"
    assert recs[-1]["our_obst_colls"] == recs[-1]["ref_obst_colls"], \
        "our env must flag the same hit(s)"
    hit_tick = next(r["t"] for r in recs if r["ref_obst_colls"] > 0)
    assert hit_tick > 10, "approach must take >10 ticks to be meaningful"
    assert recs[-1]["t"] >= hit_tick + post, "must have compared past the hit"
    for r in recs:
        t = r["t"]
        np.testing.assert_allclose(r["our_pos"], r["ref_pos"], atol=1e-8,
                                   err_msg=f"pos tick {t}")
        np.testing.assert_allclose(r["our_vel"], r["ref_vel"], atol=1e-8,
                                   err_msg=f"vel tick {t}")
        np.testing.assert_allclose(r["our_omega"], r["ref_omega"], atol=1e-7,
                                   err_msg=f"omega tick {t}")
        # obs include the 9-point SDF patch — compared on EVERY tick,
        # including the hit tick and the post-response aftermath
        np.testing.assert_allclose(r["our_obs"], r["ref_obs"], atol=1e-6,
                                   err_msg=f"obs tick {t}")
        np.testing.assert_allclose(r["our_rew"], r["ref_rew"], atol=1e-8,
                                   err_msg=f"rew tick {t}")


def test_downwash_episode_matches_reference(ref_multi):
    """Two stacked drones with downwash on, uniform noise zeroed identically
    on both sides (all downwash noise terms are symmetric uniforms —
    aerodynamics/downwash.py:30-36,54-66): the cylinder force law must then
    match tick-for-tick, including the victim's altitude loss."""
    n_ticks = 40
    tape = np.broadcast_to(
        np.asarray([0.12, 0.12, 0.12, 0.12]), (2, 4)).copy()
    recs = lockstep(ref_multi,
                    poss=[[0.0, 0.0, 3.0], [0.02, 0.0, 2.6]],
                    vels=[[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
                    n_ticks=n_ticks, action_fn=lambda t: tape,
                    zero_uniform_noise=True, use_downwash=True)
    assert len(recs) == n_ticks
    for r in recs:
        t = r["t"]
        np.testing.assert_allclose(r["our_pos"], r["ref_pos"], atol=1e-8,
                                   err_msg=f"pos tick {t}")
        np.testing.assert_allclose(r["our_vel"], r["ref_vel"], atol=1e-8,
                                   err_msg=f"vel tick {t}")
        np.testing.assert_allclose(r["our_omega"], r["ref_omega"], atol=1e-8,
                                   err_msg=f"omega tick {t}")
        np.testing.assert_allclose(r["our_obs"], r["ref_obs"], atol=1e-7,
                                   err_msg=f"obs tick {t}")
        assert r["our_colls"] == r["ref_colls"] == 0
    # the downwash must actually have acted: identical thrusts, so any extra
    # altitude loss of the lower drone beyond the initial 0.4 m separation
    # is the cylinder force
    sep0 = recs[0]["ref_pos"][0, 2] - recs[0]["ref_pos"][1, 2]
    sep_end = recs[-1]["ref_pos"][0, 2] - recs[-1]["ref_pos"][1, 2]
    assert sep_end > sep0 + 1e-3, \
        "downwash never separated the stacked drones — force path inert?"


def test_n8_knearest_neighbor_obs_matches_reference(ref_multi):
    """8-drone free flight with neighbor_visible_num=6: the k-nearest
    neighbor selection AND ordering in the obs must match the reference's
    add_neighborhood_obs (quadrotor_multi.py:247-279) tick-for-tick."""
    n = 8
    rng = np.random.default_rng(11)
    tape = rng.uniform(-0.1, 0.3, size=(60, n, 4))
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    poss = np.stack([2.5 * np.cos(ang), 2.5 * np.sin(ang),
                     3.0 + 0.25 * np.arange(n)], axis=1)
    vels = rng.uniform(-0.2, 0.2, size=(n, 3))
    recs = lockstep(ref_multi, poss, vels, n_ticks=60,
                    action_fn=lambda t: tape[t],
                    num_agents=n, neighbor_visible_num=6)
    for r in recs:
        t = r["t"]
        np.testing.assert_allclose(r["our_pos"], r["ref_pos"], atol=1e-8,
                                   err_msg=f"pos tick {t}")
        # obs carry the 6 nearest neighbors sorted by distance: any
        # selection or ordering mismatch shows up as a large obs diff
        np.testing.assert_allclose(r["our_obs"], r["ref_obs"], atol=1e-7,
                                   err_msg=f"neighbor obs tick {t}")
        np.testing.assert_allclose(r["our_rew"], r["ref_rew"], atol=1e-8,
                                   err_msg=f"rew tick {t}")
        assert r["our_colls"] == r["ref_colls"] == 0
