"""Presampled event-table playback == naive vmapped scenario_step.

batched_scenario_step runs the continuous "fast" phase fused for every env
and plays sparse event outcomes back from the per-episode EventTable filled
at reset (scenarios.presample_events).  For any state REACHABLE FROM RESET
the result must be BIT-IDENTICAL to the full vmapped scenario_step at every
tick of the episode — the tests below step whole episodes through both paths
in lockstep, covering every event mode family (interval teleports/swaps,
formation resamples, swarm-vs-swarm, run_away's 1 s cadence, Bezier node
resample chains, and the obstacle modes incl. the max-free-square DP and
the o_test one-shot trigger).
"""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.scenarios import (
    MIX_MODES_MULTI, MODE_IDS, batched_scenario_step, scenario_event,
    scenario_reset, scenario_step,
)


def _lockstep_episode(scfg, modes, obst_active, obst_centers, seed,
                      num_ticks=None, dtype=jnp.float32):
    """Reset a batch, then advance it tick-by-tick through (a) the vmapped
    full-switch oracle and (b) the fused+table playback path; return both
    final states and per-tick (goals, formation_size, bezier_nodes)
    trajectories."""
    e = modes.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), e)
    st0 = jax.vmap(
        lambda k, m, oa, oc: scenario_reset(scfg, k, m, oa, oc, dtype)
    )(keys, modes, obst_active, obst_centers)
    ep_len = int(scfg.ep_time * scfg.control_freq)
    ticks = jnp.arange(1, (num_ticks or ep_len) + 1, dtype=jnp.int32)

    def full_step(st, t):
        new = jax.vmap(
            lambda s, oa, oc: scenario_step(scfg, s, t, None, oa, oc)
        )(st, obst_active, obst_centers)
        return new, (new.goals, new.formation_size, new.bezier_nodes)

    def play_step(st, t):
        new = batched_scenario_step(scfg, st, jnp.full((e,), t, jnp.int32),
                                    None)
        return new, (new.goals, new.formation_size, new.bezier_nodes)

    full_fin, full_traj = jax.jit(
        lambda s: jax.lax.scan(full_step, s, ticks))(st0)
    play_fin, play_traj = jax.jit(
        lambda s: jax.lax.scan(play_step, s, ticks))(st0)
    return full_fin, full_traj, play_fin, play_traj


def _assert_lockstep(scfg, modes, obst_active, obst_centers, seed,
                     num_ticks=None, exact=True, dtype=jnp.float32):
    """exact=True: bit-identical (the event-playback guarantee).  exact=False
    allows ULP-scale drift on float leaves: the fused continuous phase and
    the vmapped switch are different XLA programs, and FMA contraction is
    fusion-context-dependent — measured 7.5e-9 (1 ULP) per tick on the
    ep_lissajous3D integration, which accumulates over an episode.  Event
    outcomes themselves are exact in both cases (table rows are selected, not
    recomputed)."""
    full_fin, full_traj, play_fin, play_traj = _lockstep_episode(
        scfg, modes, obst_active, obst_centers, seed, num_ticks, dtype)

    def cmp(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        if exact or not np.issubdtype(a.dtype, np.floating):
            np.testing.assert_array_equal(a, b, err_msg=msg)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                       err_msg=msg)

    names = ("goals", "formation_size", "bezier_nodes")
    for name, a, b in zip(names, full_traj, play_traj):
        cmp(a, b, f"trajectory leaf {name} diverged")
    fa = jax.tree_util.tree_flatten_with_path(full_fin)[0]
    fb = jax.tree.leaves(play_fin)
    for (path, a), b in zip(fa, fb):
        cmp(a, b, f"final state leaf {jax.tree_util.keystr(path)}")


def _free_space_args(e):
    scfg = EnvConfig(num_agents=4, quads_mode="mix").scenario_config()
    n_cells = scfg.obst_area[0] * scfg.obst_area[1]
    oa = jnp.zeros((e, n_cells), bool)
    oc = jnp.zeros((e, n_cells, 2), jnp.float32)
    return scfg, oa, oc


def test_playback_matches_full_episode_free_space():
    """Free-space EVENT modes (+ static controls) through a whole episode:
    these modes have no per-tick continuous arithmetic — state only changes
    by selecting presampled table rows — so table playback must match the
    oracle bit-for-bit."""
    mode_names = ("dynamic_same_goal", "dynamic_diff_goal", "swap_goals",
                  "swarm_vs_swarm", "run_away", "static_same_goal",
                  "static_diff_goal")
    e = 2 * len(mode_names)  # two seeds' worth of envs per mode
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.asarray([MODE_IDS[m] for m in mode_names] * 2, jnp.int32)
    _assert_lockstep(scfg, modes, oa, oc, seed=0)


def test_event_table_exact_under_bfloat16_env_dtype():
    """ADVICE r4 (medium): with a bfloat16 env dtype the packed event table
    must NOT round int leaves through bf16 — 122 of the 201 possible
    interval values (400-600 ticks) corrupt on a bf16 float round-trip,
    silently diverging all event timing after the first playback merge.
    The table is stored float32 always (scenarios._pack_event_rows); a
    bf16-dtype episode through interval-event modes must stay bit-lockstep
    with the int32 oracle path."""
    mode_names = ("dynamic_same_goal", "swap_goals", "run_away",
                  "dynamic_diff_goal")
    e = 2 * len(mode_names)
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.asarray([MODE_IDS[m] for m in mode_names] * 2, jnp.int32)
    _assert_lockstep(scfg, modes, oa, oc, seed=3, dtype=jnp.bfloat16)
    # and the table dtype itself is pinned to f32
    st = scenario_reset(scfg, jax.random.PRNGKey(0),
                        jnp.int32(MODE_IDS["dynamic_same_goal"]),
                        oa[0], oc[0], jnp.bfloat16)
    assert st.events.dtype == jnp.float32
    assert st.goals.dtype == jnp.bfloat16


def test_playback_continuous_modes_ulp_drift_only():
    """Continuous-motion modes (lissajous offset integration, Bezier curve
    eval, dynamic_formations size walk) recompute float arithmetic every
    tick; the fused phase and the switch branch compile with different FMA
    contraction (and differently again under lax.scan), so agreement is to
    ULP-scale drift (see _assert_lockstep docstring), not bit-exact.  Event
    outcomes inside these episodes (Bezier node resamples) are still
    selected, not recomputed."""
    mode_names = ("ep_lissajous3D", "ep_rand_bezier", "dynamic_formations")
    e = 2 * len(mode_names)
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.asarray([MODE_IDS[m] for m in mode_names] * 2, jnp.int32)
    _assert_lockstep(scfg, modes, oa, oc, seed=6, exact=False)


def test_playback_matches_full_episode_obstacles():
    """Obstacle event modes (free-cell rejection sampling, max-free-square
    DP, o_test one-shot, obstacle Bezier) on random obstacle maps."""
    # o_ep_rand_bezier is continuous (curve eval) -> covered by the ULP test
    # family above; every mode here only changes state via table rows.
    mode_names = ("o_dynamic_same_goal", "o_swap_goals",
                  "o_dynamic_diff_goal", "o_test", "o_random",
                  "o_static_same_goal")
    e = 2 * len(mode_names)
    cfg = EnvConfig(num_agents=4, quads_mode="o_dynamic_same_goal",
                    use_obstacles=True)
    scfg = cfg.scenario_config()
    from quadswarm_tpu.env import obstacles as obst

    n_cells = scfg.obst_area[0] * scfg.obst_area[1]
    centers = jnp.asarray(obst.cell_centers(
        scfg.obst_area[0], scfg.obst_area[1]), jnp.float32)
    oa = jax.random.bernoulli(jax.random.PRNGKey(5), 0.2, (e, n_cells))
    oc = jnp.broadcast_to(centers, (e, n_cells, 2))
    modes = jnp.asarray([MODE_IDS[m] for m in mode_names] * 2, jnp.int32)
    _assert_lockstep(scfg, modes, oa, oc, seed=1)

    # the obstacle Bezier variant (continuous curve eval -> ULP tolerance)
    bez = jnp.full((e,), MODE_IDS["o_ep_rand_bezier"], jnp.int32)
    _assert_lockstep(scfg, bez, oa, oc, seed=7, exact=False)


def test_playback_mix_sampled_modes():
    """A batch of envs with mix-sampled modes (the training configuration):
    lockstep over the first third of an episode (covers tick-1 Bezier
    resamples and the first interval events)."""
    e = 18
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.asarray([MIX_MODES_MULTI[i % len(MIX_MODES_MULTI)]
                         for i in range(e)], jnp.int32)
    # mix includes ep_lissajous3D -> ULP tolerance (see _assert_lockstep)
    _assert_lockstep(scfg, modes, oa, oc, seed=2, num_ticks=620, exact=False)


def test_zero_event_tick_is_fast_identity():
    """Static modes never fire events: playback output == fast phase output,
    and event_count stays 0 for the whole episode."""
    e = 8
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.full((e,), MODE_IDS["static_same_goal"], jnp.int32)
    full_fin, _, play_fin, _ = _lockstep_episode(scfg, modes, oa, oc, seed=3,
                                                 num_ticks=50)
    assert np.all(np.asarray(play_fin.event_count) == 0)
    assert np.all(np.asarray(full_fin.event_count) == 0)


def test_event_count_matches_event_ticks():
    """event_count after T ticks == number of ticks the event predicate
    fired (run_away's fixed 1 s interval makes the count exact: one event
    per 100 ticks)."""
    e = 4
    scfg, oa, oc = _free_space_args(e)
    modes = jnp.full((e,), MODE_IDS["run_away"], jnp.int32)
    _, _, play_fin, _ = _lockstep_episode(scfg, modes, oa, oc, seed=4)
    ep_len = int(scfg.ep_time * scfg.control_freq)
    assert np.all(np.asarray(play_fin.event_count) == ep_len // 100)


def test_bezier_nodes_initialized_at_reset():
    """Reset must leave bezier envs with a non-degenerate initial curve
    (previously zeros -> goals at the floor origin if the tick-1 resample
    was missed)."""
    scfg = EnvConfig(num_agents=4, quads_mode="ep_rand_bezier"
                     ).scenario_config()
    mode = jnp.asarray(MODE_IDS["ep_rand_bezier"], jnp.int32)
    st = scenario_reset(scfg, jax.random.PRNGKey(0), mode)
    nodes = np.asarray(st.bezier_nodes)
    assert np.any(nodes != 0.0)
    # first control point == current goal (curve starts where the goal is)
    np.testing.assert_allclose(nodes[:, 0], np.asarray(st.goals[0]),
                               rtol=1e-6)


def test_dynamic_formations_affine_cache():
    """goals_base + size*goals_slope == generate_goals(...) for every
    formation family (the generator is affine in formation_size)."""
    from quadswarm_tpu.env.formations import generate_goals

    scfg = EnvConfig(num_agents=7, quads_mode="dynamic_formations"
                     ).scenario_config()
    mode = jnp.asarray(MODE_IDS["dynamic_formations"], jnp.int32)
    for seed in range(12):  # samples across all 8 formation ids
        st = scenario_reset(scfg, jax.random.PRNGKey(seed), mode)
        for size in [-0.7, 0.0, 0.33, 1.9]:
            s = jnp.asarray(size, st.goals.dtype)
            want = generate_goals(7, st.formation, st.formation_center, s,
                                  st.layer_dist, st.num_agents_per_layer,
                                  st.goals.dtype)
            got = st.goals_base + s * st.goals_slope
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_goal_affine_tables_match_generator():
    """generate_goals_affine == generate_goals for every formation id and a
    grid of sizes/layer_dists (the hot path uses the affine tables; the
    reference-faithful generator remains the oracle)."""
    from quadswarm_tpu.env.formations import (
        NUM_FORMATIONS, generate_goals, generate_goals_affine,
    )

    for n in (4, 7, 8):
        for fid in range(NUM_FORMATIONS):
            npl = jnp.asarray(50 if 4 <= fid <= 6 else 8, jnp.int32)
            for size in (0.0, 0.37, 1.9):
                for ld in (0.0, 0.25):
                    center = jnp.asarray([0.3, -1.2, 2.0], jnp.float32)
                    want = generate_goals(n, fid, center,
                                          jnp.asarray(size, jnp.float32),
                                          jnp.asarray(ld, jnp.float32),
                                          npl, jnp.float32)
                    got = generate_goals_affine(n, jnp.asarray(fid), center,
                                                size, ld, jnp.float32)
                    np.testing.assert_allclose(np.asarray(got),
                                               np.asarray(want),
                                               rtol=1e-5, atol=1e-5,
                                               err_msg=f"n={n} fid={fid} "
                                                       f"size={size} ld={ld}")


def test_event_predicate_superset():
    """scenario_event must flag every tick where the full step changes state
    beyond the continuous fast phase (predicate ⊇ internal triggers) — this
    is what guarantees the playback path never misses a table row."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    scfg = cfg.scenario_config()
    e = 18
    _, oa, oc = _free_space_args(e)
    modes = jnp.asarray([MIX_MODES_MULTI[i % len(MIX_MODES_MULTI)]
                         for i in range(e)], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(4), e)
    scen = jax.vmap(
        lambda k, m, a, c: scenario_reset(scfg, k, m, a, c, jnp.float32)
    )(keys, modes, oa, oc)

    full_fn = jax.jit(jax.vmap(lambda st, tt, a, c: scenario_step(
        scfg, st, tt, None, a, c, allowed_modes=cfg.mode_list())))
    fast_fn = jax.jit(jax.vmap(lambda st, tt, a, c: scenario_step(
        scfg, st, tt, None, a, c, allowed_modes=cfg.mode_list(),
        phase="fast")))
    rng = np.random.default_rng(0)
    for t in rng.integers(1, 1500, 12):
        ticks = jnp.full((e,), int(t), jnp.int32)
        full = full_fn(scen, ticks, oa, oc)
        fast = fast_fn(scen, ticks, oa, oc)
        event = np.asarray(scenario_event(scfg, scen, ticks))
        differs = np.zeros(e, bool)
        fa = jax.tree_util.tree_flatten_with_path(full)[0]
        fb = jax.tree.leaves(fast)
        for (path, a), b in zip(fa, fb):
            if "event_count" in jax.tree_util.keystr(path):
                continue  # maintained by the full phase itself
            d = (np.asarray(a) != np.asarray(b)).reshape(e, -1).any(axis=1)
            differs |= d
        # anywhere full != fast, the event flag must be set
        assert not np.any(differs & ~event), (t, differs, event)
