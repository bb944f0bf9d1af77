"""Event-compacted batched scenario stepping == naive vmapped scenario_step.

batched_scenario_step runs the continuous "fast" phase for every env and
gathers only event-flagged envs through the expensive "slow" branches; for
any tick where events fit the capacity the result must be BIT-IDENTICAL to
the full vmapped step (same per-env keys reach the same branch math).
"""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig, env_reset
from quadswarm_tpu.env.params import make_dynamics_params
from quadswarm_tpu.env.scenarios import (
    MIX_MODES_MULTI, MODE_IDS, batched_scenario_step, scenario_event,
    scenario_step,
)


def _make_batch(cfg, e, key):
    params = make_dynamics_params()
    states, _ = jax.vmap(lambda k: env_reset(cfg, params, k))(
        jax.random.split(key, e))
    return states


import functools


@functools.lru_cache(maxsize=None)
def _jitted_pair(scfg, allowed, capacity):
    """Jit once per (config, modes, capacity): the eager path re-traces every
    lax.cond branch on every call, which makes the tick loops minutes-slow."""
    full_fn = jax.jit(jax.vmap(
        lambda st, t, k, oa, oc: scenario_step(scfg, st, t, k, oa, oc,
                                               allowed_modes=allowed)))
    compact_fn = jax.jit(lambda sts, t, k, oa, oc: batched_scenario_step(
        scfg, sts, t, k, oa, oc, allowed, capacity=capacity))
    return full_fn, compact_fn


def _compare(cfg, states, ticks, keys, allowed, capacity):
    scfg = cfg.scenario_config()
    centers = states.obst_pos[:, :, :2]
    full_fn, compact_fn = _jitted_pair(scfg, tuple(allowed), capacity)
    full = full_fn(states.scenario, ticks, keys, states.obst_active, centers)
    compact = compact_fn(states.scenario, ticks, keys,
                         states.obst_active, centers)
    for name in full.__dataclass_fields__:
        a, b = getattr(full, name), getattr(compact, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_compaction_matches_full_mix():
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    e = 32
    key = jax.random.PRNGKey(0)
    states = _make_batch(cfg, e, key)
    allowed = cfg.mode_list()
    # Force diverse modes + ticks so several envs hit events per tick:
    # intervals are 400-600 ticks; pick ticks spanning event boundaries.
    modes = jnp.asarray([MIX_MODES_MULTI[i % len(MIX_MODES_MULTI)]
                         for i in range(e)], jnp.int32)
    states = states.replace(
        scenario=states.scenario.replace(mode=modes),
        tick=jnp.zeros((e,), jnp.int32))
    for t in [1, 2, 100, 400, 480, 500, 501]:
        ticks = jnp.full((e,), t, jnp.int32)
        # Make some envs' interval divide the tick -> at_interval fires.
        interval = jnp.where(jnp.arange(e) % 3 == 0, t if t > 1 else 500,
                             states.scenario.interval)
        states = states.replace(
            scenario=states.scenario.replace(interval=interval.astype(jnp.int32)))
        keys = jax.random.split(jax.random.PRNGKey(1000 + t), e)
        _compare(cfg, states, ticks, keys, allowed, capacity=8)


def test_compaction_capacity_equals_batch():
    """capacity >= E falls back to the all-envs slow path — still identical."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    e = 8
    states = _make_batch(cfg, e, jax.random.PRNGKey(2))
    ticks = jnp.full((e,), 500, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(3), e)
    _compare(cfg, states, ticks, keys, cfg.mode_list(), capacity=e)


def test_compaction_overflow_falls_back_exact():
    """Every env fires its bezier node resample on the same tick (the
    tick-synchronized case): more events than the small cap, so the dispatch
    escalates to the big-cap / uncompacted tiers — no event may be dropped,
    and the result must stay bit-identical to the vmapped full step."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    e = 32
    states = _make_batch(cfg, e, jax.random.PRNGKey(7))
    # All envs in ep_rand_bezier at a resample tick -> 32 events, capacity 4.
    modes = jnp.full((e,), MODE_IDS["ep_rand_bezier"], jnp.int32)
    states = states.replace(scenario=states.scenario.replace(mode=modes))
    ticks = jnp.full((e,), 500, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(11), e)
    _compare(cfg, states, ticks, keys, cfg.mode_list(), capacity=4)


HEAVY_ALLOWED = (MODE_IDS["o_static_same_goal"],
                 MODE_IDS["o_dynamic_same_goal"],
                 MODE_IDS["o_dynamic_diff_goal"])


def test_heavy_mode_compaction_exact():
    """Heavy obstacle event modes (rejection sampling / max-free-square DP)
    through the compaction tiers with sparse events (<= cap): must be
    bit-identical to the vmapped full step."""
    cfg = EnvConfig(num_agents=4, quads_mode="o_dynamic_same_goal",
                    use_obstacles=True)
    e = 16
    states = _make_batch(cfg, e, jax.random.PRNGKey(31))
    modes = jnp.where(jnp.arange(e) % 4 == 0,
                      MODE_IDS["o_dynamic_same_goal"],
                      MODE_IDS["o_static_same_goal"]).astype(jnp.int32)
    # two of the o_dynamic envs at their interval tick -> 2 events, cap 4
    interval = jnp.where(jnp.arange(e) < 8, 300,
                         500 + jnp.arange(e)).astype(jnp.int32)
    states = states.replace(scenario=states.scenario.replace(
        mode=modes, interval=interval))
    ticks = jnp.full((e,), 300, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(37), e)
    _compare(cfg, states, ticks, keys, HEAVY_ALLOWED, capacity=4)


def test_heavy_mode_compaction_overflow_exact():
    """All envs in a heavy mode fire on the same tick (> cap_big) -> the
    uncompacted fallback must run and stay bit-identical."""
    cfg = EnvConfig(num_agents=4, quads_mode="o_dynamic_same_goal",
                    use_obstacles=True)
    e = 16
    states = _make_batch(cfg, e, jax.random.PRNGKey(41))
    modes = jnp.full((e,), MODE_IDS["o_dynamic_same_goal"], jnp.int32)
    states = states.replace(scenario=states.scenario.replace(
        mode=modes, interval=jnp.full((e,), 200, jnp.int32)))
    ticks = jnp.full((e,), 400, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(43), e)
    _compare(cfg, states, ticks, keys, HEAVY_ALLOWED, capacity=2)


def test_compaction_mid_tier_burst_exact():
    """A tick-synchronized run_away burst (fixed 1 s interval): event count
    between cap and cap_big takes the BIG-CAP compaction tier; must stay
    bit-identical to the vmapped full step."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    e = 64
    states = _make_batch(cfg, e, jax.random.PRNGKey(9))
    # 16 run_away envs all at their fixed-interval tick -> 16 events;
    # capacity=4 < 16 <= cap_big=min(64, max(32, 8))=32 -> middle tier.
    modes = jnp.where(jnp.arange(e) < 16, MODE_IDS["run_away"],
                      MODE_IDS["static_same_goal"]).astype(jnp.int32)
    states = states.replace(scenario=states.scenario.replace(
        mode=modes, interval=jnp.full((e,), 100, jnp.int32)))
    ticks = jnp.full((e,), 300, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(13), e)
    _compare(cfg, states, ticks, keys, cfg.mode_list(), capacity=4)


def test_compaction_zero_event_tick_identity():
    """A tick with no events anywhere must return the fast phase unchanged
    (the identity tier — no slow work)."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    e = 16
    states = _make_batch(cfg, e, jax.random.PRNGKey(21))
    modes = jnp.full((e,), MODE_IDS["static_same_goal"], jnp.int32)
    states = states.replace(scenario=states.scenario.replace(mode=modes))
    ticks = jnp.full((e,), 37, jnp.int32)  # not an interval tick for anyone
    keys = jax.random.split(jax.random.PRNGKey(23), e)
    _compare(cfg, states, ticks, keys, cfg.mode_list(), capacity=4)


def test_bezier_nodes_initialized_at_reset():
    """Reset must leave bezier envs with a non-degenerate initial curve
    (previously zeros -> goals at the floor origin if the tick-1 resample
    was missed)."""
    from quadswarm_tpu.env.scenarios import scenario_reset

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
    from quadswarm_tpu.env.scenarios import scenario_reset

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
    beyond the continuous fast phase (predicate ⊇ internal triggers)."""
    cfg = EnvConfig(num_agents=4, quads_mode="mix")
    scfg = cfg.scenario_config()
    e = 16
    states = _make_batch(cfg, e, jax.random.PRNGKey(4))
    modes = jnp.asarray([MIX_MODES_MULTI[i % len(MIX_MODES_MULTI)]
                         for i in range(e)], jnp.int32)
    scen = states.scenario.replace(mode=modes)
    centers = states.obst_pos[:, :, :2]
    rng = np.random.default_rng(0)
    for t in rng.integers(1, 1500, 12):
        ticks = jnp.full((e,), int(t), jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(int(t)), e)
        full = jax.vmap(
            lambda st, tt, k, oa, oc: scenario_step(
                scfg, st, tt, k, oa, oc, allowed_modes=cfg.mode_list())
        )(scen, ticks, keys, states.obst_active, centers)
        fast = jax.vmap(
            lambda st, tt, k, oa, oc: scenario_step(
                scfg, st, tt, k, oa, oc, allowed_modes=cfg.mode_list(),
                phase="fast")
        )(scen, ticks, keys, states.obst_active, centers)
        event = np.asarray(scenario_event(scfg, scen, ticks))
        differs = np.zeros(e, bool)
        for name in full.__dataclass_fields__:
            a = np.asarray(getattr(full, name))
            b = np.asarray(getattr(fast, name))
            d = (a != b).reshape(e, -1).any(axis=1)
            differs |= d
        # anywhere full != fast, the event flag must be set
        assert not np.any(differs & ~event), (t, differs, event)
