"""Device-resident goal/task scenarios.

Reference: gym_art/quadrotor_multi/scenarios/* (9 free-space + 5 obstacle
scenarios + o_test + mix).  The reference's per-episode `eval('Scenario_'+
mode)` object factory (mix.py:31-34) becomes an integer mode id in the env
state pytree and a `lax.switch` over pure step/reset branches; scenario
variables (formation params, goal arrays, Bezier control points, swap
timers) live in `ScenarioState`.

Known reference quirks reproduced on purpose:
  * Formation sampling draws an index bounded by the per-mode choice-list
    length but indexes the GLOBAL formation list (scenarios/utils.py:55-56) —
    so `o_swap_goals` can select circle_horizontal and never cube.
  * ep_lissajous3D accumulates the curve offset onto the previous goal
    (ep_lissajous3D.py:14-23), producing an integrated drift.
Deviations:
  * Rejection-sampling loops (Bezier goal placement, free-cell sampling with
    surroundings checks) use fixed-trip masked retries.
  * `o_test` is not constructible in the reference (missing QUADS_PARAMS_DICT
    entry -> KeyError); here it uses the o_static_same_goal range.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from quadswarm_tpu.env.formations import (
    formation_size_range, generate_goals, generate_goals_affine, get_z_value,
    is_circle, is_grid,
)

MODES = (
    "static_same_goal",     # 0
    "static_diff_goal",     # 1
    "dynamic_same_goal",    # 2
    "dynamic_diff_goal",    # 3
    "swap_goals",           # 4
    "dynamic_formations",   # 5
    "ep_lissajous3D",       # 6
    "ep_rand_bezier",       # 7
    "swarm_vs_swarm",       # 8
    "run_away",             # 9
    "o_random",             # 10
    "o_static_same_goal",   # 11
    "o_dynamic_same_goal",  # 12
    "o_swap_goals",         # 13
    "o_ep_rand_bezier",     # 14
    # The reference CLI advertises the next four (quadrotor_params.py:94-96)
    # but never implemented them (its eval factory raises NameError —
    # SURVEY.md §2.3); implemented here from their evident semantics.
    "o_uniform_same_goal_spawn",  # 15 per-drone uniform spawn over free cells
    "o_diagonal",                 # 16 corner-to-corner traverse
    "o_static_diff_goal",         # 17 static per-drone formation goals
    "o_dynamic_diff_goal",        # 18 formation teleports across free squares
    "o_test",               # 19
)
MODE_IDS = {m: i for i, m in enumerate(MODES)}

# Mix-mode candidate lists (scenarios/utils.py:7-22)
MIX_MODES_MULTI = tuple(MODE_IDS[m] for m in (
    "static_same_goal", "static_diff_goal", "ep_lissajous3D", "ep_rand_bezier",
    "dynamic_same_goal", "dynamic_diff_goal", "dynamic_formations", "swap_goals",
    "swarm_vs_swarm"))
MIX_MODES_SINGLE = tuple(MODE_IDS[m] for m in (
    "static_same_goal", "static_diff_goal", "ep_lissajous3D", "ep_rand_bezier",
    "dynamic_same_goal"))
MIX_MODES_OBSTACLES = (MODE_IDS["o_random"], MODE_IDS["o_static_same_goal"])
MIX_MODES_OBSTACLES_SINGLE = (MODE_IDS["o_random"],)

# Per-mode (num formation choices, dist_low, dist_high) from QUADS_PARAMS_DICT
# (scenarios/utils.py:33-51); quad_arm_size = 0.05.
_ARM = 0.05
MODE_TABLE = {
    "static_same_goal": (1, 0.0, 0.0),
    "static_diff_goal": (8, 5 * _ARM, 10 * _ARM),
    "dynamic_same_goal": (1, 0.0, 0.0),
    "dynamic_diff_goal": (8, 5 * _ARM, 10 * _ARM),
    "swap_goals": (8, 8 * _ARM, 16 * _ARM),
    "dynamic_formations": (8, 0.0, 20 * _ARM),
    "ep_lissajous3D": (1, 0.0, 0.0),
    "ep_rand_bezier": (1, 0.0, 0.0),
    "swarm_vs_swarm": (8, 5 * _ARM, 10 * _ARM),
    "run_away": (8, 5 * _ARM, 10 * _ARM),
    "o_random": (1, 0.0, 0.0),
    "o_static_same_goal": (1, 0.0, 0.0),
    "o_dynamic_same_goal": (1, 0.0, 0.0),
    "o_swap_goals": (7, 8 * _ARM, 16 * _ARM),
    "o_ep_rand_bezier": (1, 0.0, 0.0),
    "o_uniform_same_goal_spawn": (1, 0.0, 0.0),
    "o_diagonal": (1, 0.0, 0.0),
    "o_static_diff_goal": (8, 5 * _ARM, 10 * _ARM),
    "o_dynamic_diff_goal": (8, 5 * _ARM, 10 * _ARM),
    "o_test": (1, 0.0, 0.0),
}
MODE_NUM_CHOICES = np.array([MODE_TABLE[m][0] for m in MODES], np.int32)
MODE_DIST_LOW = np.array([MODE_TABLE[m][1] for m in MODES], np.float64)
MODE_DIST_HIGH = np.array([MODE_TABLE[m][2] for m in MODES], np.float64)
# approach_goal_metric per mode (base=0.5; o_base=1.0; o_random overrides 0.5)
MODE_APPROACH_METRIC = np.array(
    [1.0 if (m.startswith("o_") and m != "o_random") else 0.5 for m in MODES],
    np.float64,
)

BEZIER_ATTEMPTS = 20  # fixed-trip replacement for the reference's while loop


@struct.dataclass
class ScenarioConfig:
    """Static scenario parameters."""

    num_agents: int = struct.field(pytree_node=False, default=8)
    control_freq: float = struct.field(pytree_node=False, default=100.0)
    ep_time: float = struct.field(pytree_node=False, default=15.0)
    room_dims: tuple = struct.field(pytree_node=False, default=(10.0, 10.0, 10.0))
    box: float = struct.field(pytree_node=False, default=2.0)  # spawn box (quadrotor_single.py:215-218)
    # obstacle grid (only used by o_* modes)
    obst_area: tuple = struct.field(pytree_node=False, default=(6, 6))
    grid_size: float = struct.field(pytree_node=False, default=1.0)


# The scenario leaves an event (slow-phase) branch can write, with their
# per-agent shapes; everything else passes through events untouched.
# Order defines the packed EventTable layout (see _pack_event_rows).
# Kind "i" marks int32 leaves, stored as exact floats.  The packed table is
# ALWAYS float32 — it is internal playback state, never observation data —
# because the int leaves are only losslessly representable at f32 precision
# (< 2^24): with a bfloat16 env dtype, 122 of the 201 possible interval
# values (400-600 ticks) would corrupt on a bf16 round-trip and silently
# diverge event timing from the int32 oracle path.  Float leaves are cast
# back to the env dtype at unpack.
_EVENT_SPEC = (
    ("goals", ("n", 3), "f"),
    ("formation", (), "i"),
    ("num_agents_per_layer", (), "i"),
    ("lowest_size", (), "f"),
    ("highest_size", (), "f"),
    ("formation_size", (), "f"),
    ("layer_dist", (), "f"),
    ("formation_center", (3,), "f"),
    ("goal_center_1", (3,), "f"),
    ("goal_center_2", (3,), "f"),
    ("bezier_nodes", (3, 3), "f"),
    ("interval", (), "i"),
    ("end_point", (3,), "f"),
)
EVENT_WRITABLE = tuple(name for name, _, _ in _EVENT_SPEC)


def _event_leaf_shape(shape_spec: tuple, n: int) -> tuple:
    return tuple(n if s == "n" else s for s in shape_spec)


def event_table_width(n: int) -> int:
    """Packed floats per event slot: 3n (goals) + 28 scalars/vectors."""
    total = 0
    for _, shape_spec, _ in _EVENT_SPEC:
        sz = 1
        for s in _event_leaf_shape(shape_spec, n):
            sz *= s
        total += sz
    return total


def _pack_event_rows(rows: dict, num_slots: int) -> jax.Array:
    """Pack per-slot event outcomes into ONE flat (num_slots * D,) f32 vector.

    Why packed: the natural per-leaf tables ((K, N, 3) goals, (K, 3, 3)
    Bezier nodes, ...) have tiny minor dimensions, which TPU tiling pads to
    (8, 128) — the batched goals table alone inflates 42x and its per-tick
    playback read measured ~8M SPS (~95 us) on the 8-drone mix.  One flat
    float vector per env keeps the whole table in dense lanes: the playback
    select chain reads each (E, K*D) tile once.

    Always float32 regardless of env dtype (see _EVENT_SPEC comment).
    """
    parts = []
    for name, shape_spec, _ in _EVENT_SPEC:
        parts.append(rows[name].reshape(num_slots, -1).astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1).reshape(-1)


def _unpack_event_row(sel: jax.Array, n: int, dtype):
    """Split a selected (..., D) packed f32 row back into typed leaves
    ("i" → int32, "f" → the env dtype)."""
    out = {}
    off = 0
    for name, shape_spec, kind in _EVENT_SPEC:
        shape = _event_leaf_shape(shape_spec, n)
        sz = 1
        for s in shape:
            sz *= s
        val = sel[..., off:off + sz].reshape(sel.shape[:-1] + shape)
        out[name] = val.astype(jnp.int32 if kind == "i" else dtype)
        off += sz
    return out


@struct.dataclass
class ScenarioState:
    """Per-env scenario variables, all fixed-shape."""

    mode: jax.Array                 # int32
    formation: jax.Array            # int32
    formation_size: jax.Array       # f
    lowest_size: jax.Array          # f
    highest_size: jax.Array         # f
    layer_dist: jax.Array           # f
    num_agents_per_layer: jax.Array  # int32
    formation_center: jax.Array     # (3,)
    goals: jax.Array                # (N, 3)
    spawn_points: jax.Array         # (N, 3)
    interval: jax.Array             # int32 ticks between scenario events
    increase_formation: jax.Array   # bool (dynamic_formations)
    control_speed: jax.Array        # f    (dynamic_formations)
    bezier_nodes: jax.Array         # (3 dims, 3 points)
    goal_center_1: jax.Array        # (3,) (swarm_vs_swarm)
    goal_center_2: jax.Array        # (3,)
    end_point: jax.Array            # (3,) (o_* single-goal modes)
    approach_goal_metric: jax.Array  # f
    # Affine goal cache: generate_goals is affine in formation_size for every
    # formation (circle/sphere/grid/cube positions all scale linearly), so
    # goals(size) == goals_base + size * goals_slope for the episode's fixed
    # (formation, center, layer_dist).  Lets dynamic_formations — the one
    # mode that rescales EVERY tick — skip the full formation generator
    # (lax.switch + trig + grid math) in the per-tick fast path.
    goals_base: jax.Array           # (N, 3) = goals at size 0
    goals_slope: jax.Array          # (N, 3) = d goals / d size
    # Event presampling (see presample_events): the per-episode scenario PRNG
    # root (event randomness is fold_in(scen_key, tick) so reset can reproduce
    # the key of any future tick), the number of events consumed so far (the
    # next table row to play back), and the presampled outcome table packed
    # into one flat (num_slots * event_table_width(N),) vector — packed so
    # TPU tiling doesn't pad the tiny per-leaf minor dims (see
    # _pack_event_rows).
    scen_key: jax.Array             # PRNG key
    event_count: jax.Array          # int32
    events: jax.Array               # (K * D,) packed float


def _npl_for_formation(fid):
    """circle -> 8/layer, grid -> 50/layer, else 8 (scenarios/utils.py:54-66)."""
    return jnp.where(is_grid(fid), 50, 8).astype(jnp.int32)


def _sample_formation_params(key, cfg: ScenarioConfig, mode, dtype):
    """update_formation_and_relate_param (scenarios/base.py:131-143)."""
    k_fid, k_size, k_layer = jax.random.split(key, 3)
    num_choices = jnp.asarray(MODE_NUM_CHOICES)[mode]
    fid = jax.random.randint(k_fid, (), 0, num_choices).astype(jnp.int32)
    npl = _npl_for_formation(fid)
    low = jnp.asarray(MODE_DIST_LOW, dtype)[mode]
    high = jnp.asarray(MODE_DIST_HIGH, dtype)[mode]
    lo, hi = formation_size_range(
        mode == MODE_IDS["swarm_vs_swarm"], fid, cfg.num_agents, low, high, npl)
    size = jax.random.uniform(k_size, (), dtype, lo, hi)
    layer_dist = jax.random.uniform(k_layer, (), dtype, lo, hi)
    return fid, npl, lo, hi, size, layer_dist


def _center_xy_z(key, cfg, box, dtype, z_simple: bool):
    """Random formation center; z either the simple clamp (dynamic_same_goal)
    or the formation-aware bound is applied by the caller."""
    kx, kz = jax.random.split(key)
    xy = jax.random.uniform(kx, (2,), dtype, -box, box)
    z = jax.random.uniform(kz, (), dtype, -0.5 * box, 0.5 * box) + 2.0
    z = jnp.maximum(z, 0.25)
    return xy, z


# ---------------------------------------------------------------------------
# Bezier helpers (ep_rand_bezier.py / o_ep_rand_bezier.py)
# ---------------------------------------------------------------------------

def _sample_bezier_nodes(key, goal0, room_dims, formation_size, dtype,
                         max_dist_cap, z_lo, z_hi, obstacle_mode: bool):
    """Sample degree-2 Bezier control points with the reference's bounds
    check, via fixed-trip masked retries (replaces the while loop at
    ep_rand_bezier.py:22-34)."""
    room = jnp.asarray(room_dims, dtype) - formation_size
    if obstacle_mode:
        low = jnp.stack([-room[0] / 2, -room[1] / 2, jnp.asarray(z_lo, dtype)])
        high = jnp.stack([room[0] / 2, room[1] / 2, jnp.asarray(z_hi, dtype)])
    else:
        low = jnp.stack([-room[0] / 2, -room[1] / 2, jnp.zeros((), dtype)])
        high = jnp.stack([room[0] / 2, room[1] / 2, room[2]])
    max_dist = jnp.minimum(jnp.asarray(max_dist_cap, dtype), jnp.max(room))
    min_dist = max_dist / 2

    def attempt(k):
        ku, kd = jax.random.split(k)
        # Reference quirk: uniform (2,3) with per-dim bounds then reshape (3,2)
        raw = jax.random.uniform(ku, (2, 3), dtype, -high, high).reshape(3, 2)
        dist = jnp.floor(
            jax.random.uniform(kd, (), dtype, min_dist, max_dist + 1.0))
        pts = raw * dist / jnp.linalg.norm(raw, axis=0)
        pts = goal0[:, None] + pts
        ok = jnp.all(pts > low[:, None] + 0.5) & jnp.all(pts < high[:, None] - 0.5)
        return pts, ok

    keys = jax.random.split(key, BEZIER_ATTEMPTS)
    all_pts, all_ok = jax.vmap(attempt)(keys)
    first = jnp.argmax(all_ok)
    found = jnp.any(all_ok)
    pts = jnp.where(found, all_pts[first],
                    jnp.clip(goal0[:, None] + 0.0, low[:, None] + 0.5, high[:, None] - 0.5))
    return jnp.concatenate([goal0[:, None], pts], axis=1)  # (3 dims, 3 points)


def _bezier_eval(nodes, t):
    """Quadratic Bezier B(t) for nodes (3 dims, 3 points)."""
    p0, p1, p2 = nodes[:, 0], nodes[:, 1], nodes[:, 2]
    return (1 - t) ** 2 * p0 + 2 * (1 - t) * t * p1 + t**2 * p2


# ---------------------------------------------------------------------------
# Obstacle-map helpers (scenarios/obstacles/o_base.py)
# ---------------------------------------------------------------------------

def sample_free_cells(key, obst_active, centers, num: int, z_lo, z_hi, dtype):
    """Sample `num` distinct free grid cells, return (num, 3) points with
    random z (o_base.py:generate_pos_obst_map_2:70-83).  Ranking random
    scores with occupied cells pushed to -inf keeps shapes static."""
    kc, kz = jax.random.split(key)
    scores = jax.random.uniform(kc, obst_active.shape)
    scores = jnp.where(obst_active, -jnp.inf, scores)
    # Cells are distinct while num <= grid size; beyond that (huge swarms on
    # a small grid) wrap around, reusing the freest cells cyclically.
    take = jnp.arange(num) % obst_active.shape[0]
    idx = jnp.argsort(-scores)[take]
    xy = centers[idx]
    z = jax.random.uniform(kz, (num,), dtype, z_lo, z_hi)
    return jnp.concatenate([xy.astype(dtype), z[:, None]], axis=-1)


def max_free_square_center(key, obst_map2d, centers, dtype):
    """Center cell of the largest all-free square (o_base DP,
    o_base.py:124-153), with the reference's index mapping
    `index = cx + m * cy` into the cell-centers array.  Grid dims are static
    so the DP unrolls at trace time."""
    free = (obst_map2d == 0).astype(jnp.int32)
    n, m = obst_map2d.shape
    dp = jnp.zeros((n, m), jnp.int32)
    dp = dp.at[0, :].set(obst_map2d[0, :].astype(jnp.int32))
    dp = dp.at[:, 0].set(obst_map2d[:, 0].astype(jnp.int32))
    # NOTE: faithful to the reference, which seeds dp with the OBSTACLE map's
    # first row/col (a quirk: dp[i][j] counts squares of 0s but the border is
    # seeded with the raw map values) and only fills i,j >= 1.
    best = jnp.zeros((), jnp.int32)
    cx = jnp.zeros((), jnp.int32)
    cy = jnp.zeros((), jnp.int32)

    def row_body(i, carry):
        dp, best, cx, cy = carry

        def col_body(j, carry2):
            dp, best, cx, cy = carry2
            val = jnp.where(
                free[i, j] == 1,
                jnp.minimum(jnp.minimum(dp[i - 1, j], dp[i, j - 1]), dp[i - 1, j - 1]) + 1,
                0,
            )
            dp = dp.at[i, j].set(val)
            improved = val > best
            best = jnp.where(improved, val, best)
            cx = jnp.where(improved, i - (val - 1) // 2, cx)
            cy = jnp.where(improved, j - (val - 1) // 2, cy)
            return dp, best, cx, cy

        return jax.lax.fori_loop(1, m, col_body, (dp, best, cx, cy))

    dp, best, cx, cy = jax.lax.fori_loop(1, n, row_body, (dp, best, cx, cy))
    index = cx + m * cy
    xy = centers[index]
    z = jax.random.uniform(key, (), dtype, 1.5, 3.0)
    return jnp.concatenate([xy.astype(dtype), z[None]])


# ---------------------------------------------------------------------------
# Reset
# ---------------------------------------------------------------------------

def scenario_reset(cfg: ScenarioConfig, key: jax.Array, mode: jax.Array,
                   obst_active: jax.Array | None = None,
                   obst_centers: jax.Array | None = None,
                   dtype=jnp.float32,
                   allowed_modes: tuple | None = None,
                   num_slots: int | None = None) -> ScenarioState:
    """Per-episode scenario reset for runtime mode id `mode`.

    Free-space modes follow QuadrotorScenario.reset / standard_reset
    (scenarios/base.py:145-167); obstacle modes sample spawn/goal cells from
    the free cells of the obstacle map (o_base.py).

    allowed_modes (static) sizes the presampled event table
    (`num_event_slots`); pass None when `mode` might be outside the config's
    mode list (sizes for the worst case over all modes).  `num_slots`
    overrides the computed size — auto-reset uses it to keep the table shape
    identical to the episode being replaced (state shapes must be stable
    across resets).
    """
    n = cfg.num_agents
    keys = jax.random.split(key, 12)
    fid, npl, lo, hi, size, layer_dist = _sample_formation_params(
        keys[0], cfg, mode, dtype)

    default_center = jnp.asarray([0.0, 0.0, 2.0], dtype)
    box = jnp.asarray(cfg.box, dtype)

    # Base goals around the default center, shuffled (base.py reset)
    base_goals = generate_goals(n, fid, default_center, size, layer_dist, npl, dtype)
    base_goals = jax.random.permutation(keys[1], base_goals, axis=0)

    g_at_0 = generate_goals(n, fid, default_center, jnp.zeros((), dtype),
                            layer_dist, npl, dtype)
    g_at_1 = generate_goals(n, fid, default_center, jnp.ones((), dtype),
                            layer_dist, npl, dtype)

    interval_sec = jax.random.uniform(keys[2], (), dtype, 4.0, 6.0)
    interval = (interval_sec * cfg.control_freq).astype(jnp.int32)

    st = ScenarioState(
        mode=mode.astype(jnp.int32),
        formation=fid.astype(jnp.int32),
        formation_size=size,
        lowest_size=lo,
        highest_size=hi,
        layer_dist=layer_dist,
        num_agents_per_layer=npl,
        formation_center=default_center,
        goals=base_goals,
        spawn_points=base_goals,
        interval=interval,
        increase_formation=jax.random.uniform(keys[3], ()) < 0.5,
        control_speed=jax.random.uniform(keys[4], (), dtype, 1.0, 3.0),
        bezier_nodes=jnp.zeros((3, 3), dtype),
        goal_center_1=default_center,
        goal_center_2=default_center,
        end_point=default_center,
        approach_goal_metric=jnp.asarray(MODE_APPROACH_METRIC, dtype)[mode],
        goals_base=g_at_0,
        goals_slope=g_at_1 - g_at_0,
        scen_key=jax.random.fold_in(key, 0x5CE9),
        event_count=jnp.zeros((), jnp.int32),
        events=jnp.zeros(
            ((num_slots or num_event_slots(cfg, allowed_modes))
             * event_table_width(n),),
            jnp.float32),   # always f32 — see _EVENT_SPEC comment
    )

    def reset_lissajous(st):
        # formation center [-2, 0, 2] (ep_lissajous3D.py:31-38), no shuffle
        center = jnp.asarray([-2.0, 0.0, 2.0], dtype)
        goals = generate_goals(n, fid, center, size, jnp.zeros((), dtype), npl, dtype)
        return st.replace(formation_center=center, goals=goals, spawn_points=goals)

    def reset_svs(st):
        # swarm_vs_swarm.py:22-50 formation_centers + create_formations
        kc, kz, kd, kphi, kth, kg1, kg2 = jax.random.split(keys[5], 7)
        xy = jax.random.uniform(kc, (2,), dtype, -box, box)
        z = get_z_value(kz, fid, n, npl, box, size)
        c1 = jnp.concatenate([xy, z[None]])
        gc_dist = jax.random.uniform(kd, (), dtype, box / 4, box)
        phi = jax.random.uniform(kphi, (), dtype, -jnp.pi, jnp.pi)
        theta = jax.random.uniform(kth, (), dtype, -0.5 * jnp.pi, 0.5 * jnp.pi)
        c2 = c1 + gc_dist * jnp.stack([
            jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)])
        diff = c2 - c1
        # Keep the separating axis at least lowest_size apart (svs.py:40-49)
        axis = jnp.where(fid == 0, 2, jnp.where((fid == 1) | (fid == 5), 1, 0))
        planar = is_circle(fid) | is_grid(fid)
        d_ax = diff[axis]
        adj = jnp.sign(d_ax) * lo + c1[axis]
        c2 = jnp.where(planar & (jnp.abs(d_ax) < lo), c2.at[axis].set(adj), c2)
        g1 = generate_goals_affine(n // 2, fid, c1, size, layer_dist, dtype)
        g2 = generate_goals_affine(n - n // 2, fid, c2, size, layer_dist, dtype)
        goals = jnp.concatenate([g1, g2], axis=0)
        return st.replace(goals=goals, spawn_points=goals,
                          goal_center_1=c1, goal_center_2=c2,
                          formation_center=(c1 + c2) / 2)

    def reset_obstacle(st):
        # o_base-family resets: spawn in free cells, goals per sub-mode
        active = obst_active if obst_active is not None else jnp.zeros(
            cfg.obst_area[0] * cfg.obst_area[1], bool)
        centers = obst_centers if obst_centers is not None else jnp.zeros(
            (cfg.obst_area[0] * cfg.obst_area[1], 2), dtype)
        m = cfg.obst_area[1]
        obst_map2d = active.reshape(cfg.obst_area[0], cfg.obst_area[1])

        spawn = sample_free_cells(keys[6], active, centers, n, 1.0, 3.0, dtype)
        # o_random: per-agent end points; same-goal modes: max-square center
        per_agent_end = sample_free_cells(keys[7], active, centers, n, 1.0, 3.0, dtype)
        square_end = max_free_square_center(keys[8], obst_map2d, centers, dtype)

        is_random = mode == MODE_IDS["o_random"]
        is_swap = mode == MODE_IDS["o_swap_goals"]
        is_bezier = mode == MODE_IDS["o_ep_rand_bezier"]
        is_uniform = mode == MODE_IDS["o_uniform_same_goal_spawn"]
        is_diag = mode == MODE_IDS["o_diagonal"]
        is_diff = ((mode == MODE_IDS["o_static_diff_goal"])
                   | (mode == MODE_IDS["o_dynamic_diff_goal"]))
        swap_center = max_free_square_center(keys[9], obst_map2d, centers, dtype)
        swap_goals = generate_goals(n, fid, swap_center, size, layer_dist, npl, dtype)
        swap_goals = jax.random.permutation(keys[10], swap_goals, axis=0)
        # o_ep_rand_bezier starts from a single random free cell (o_ep_rand_bezier.py:66)
        bezier_end = sample_free_cells(keys[11], active, centers, 1, 0.75, 3.0, dtype)[0]

        # o_uniform_same_goal_spawn: each drone an independent uniform free
        # cell (with replacement), shared goal at the freest square.
        ku_cell, ku_z, kd_sign, kd_noise = jax.random.split(keys[7], 4)
        logits = jnp.where(active, -jnp.inf, 0.0)
        u_idx = jax.random.categorical(ku_cell, logits, shape=(n,))
        u_z = jax.random.uniform(ku_z, (n,), dtype, 1.0, 3.0)
        uniform_spawn = jnp.concatenate(
            [centers[u_idx].astype(dtype), u_z[:, None]], axis=-1)

        # o_diagonal: swarm spawns near a random corner of the grid, shared
        # goal at the free cell nearest the opposite corner.
        sign = jnp.where(jax.random.bernoulli(kd_sign, shape=(2,)), 1.0, -1.0)
        corner_score = centers[:, 0] * sign[0] + centers[:, 1] * sign[1]
        noise = 1e-3 * jax.random.uniform(kd_noise, corner_score.shape)
        near = jnp.where(active, -jnp.inf, corner_score + noise)
        take = jnp.arange(n) % active.shape[0]
        diag_idx = jnp.argsort(-near)[take]
        diag_spawn = jnp.concatenate(
            [centers[diag_idx].astype(dtype),
             jnp.full((n, 1), 2.0, dtype)], axis=-1)
        far = jnp.where(active, jnp.inf, corner_score - noise)
        goal_idx = jnp.argmin(far)
        diag_goal = jnp.concatenate(
            [centers[goal_idx].astype(dtype), jnp.full((1,), 2.0, dtype)])

        # o_{static,dynamic}_diff_goal: per-drone formation goals around the
        # freest square center.
        diff_goals = jax.random.permutation(keys[10], generate_goals(
            n, fid, square_end, size, layer_dist, npl, dtype), axis=0)

        end = jnp.where(is_bezier, bezier_end,
                        jnp.where(is_diag, diag_goal, square_end))
        goals = jnp.where(
            is_random, per_agent_end,
            jnp.where(is_swap, swap_goals,
                      jnp.where(is_diff, diff_goals,
                                jnp.broadcast_to(end, (n, 3)))))
        spawn = jnp.where(is_uniform, uniform_spawn,
                          jnp.where(is_diag, diag_spawn, spawn))
        center = jnp.where(is_swap, swap_center,
                           jnp.where(is_diff, square_end,
                                     jnp.asarray([0.0, 0.0, 2.0], dtype)))
        return st.replace(goals=goals, spawn_points=spawn, end_point=end,
                          formation_center=center)

    def reset_o_test(st):
        start = jnp.asarray([0.0, 3.0, 2.0], dtype)
        end = jnp.asarray([0.0, -3.0, 2.0], dtype)
        goals = generate_goals(n, fid, start, size, layer_dist, npl, dtype)
        goals = jax.random.permutation(keys[6], goals, axis=0)
        dur = (jax.random.uniform(keys[7], (), dtype, 2.0, 4.0) * cfg.control_freq)
        return st.replace(goals=goals, spawn_points=goals, end_point=end,
                          formation_center=start, interval=dur.astype(jnp.int32))

    is_obstacle_mode = (mode >= MODE_IDS["o_random"]) & (mode < MODE_IDS["o_test"])
    st = jax.lax.cond(mode == MODE_IDS["ep_lissajous3D"], reset_lissajous,
                      lambda s: s, st)
    st = jax.lax.cond(mode == MODE_IDS["swarm_vs_swarm"], reset_svs,
                      lambda s: s, st)
    st = jax.lax.cond(is_obstacle_mode, reset_obstacle, lambda s: s, st)
    st = jax.lax.cond(mode == MODE_IDS["o_test"], reset_o_test, lambda s: s, st)
    # run_away duration is fixed 1 s (run_away.py:17)
    st = st.replace(interval=jnp.where(
        mode == MODE_IDS["run_away"], jnp.int32(cfg.control_freq), st.interval))

    # Bezier modes: sample an initial curve at reset so the goals are never
    # the zero-node degenerate curve (origin at floor level) even if the
    # tick-1 resample event is somehow missed.  The reference samples lazily
    # at tick 1 (ep_rand_bezier.py:20-39); sampling here too is invisible to
    # parity (the tick-1 event overwrites these nodes with the tick key).
    is_bez_free = mode == MODE_IDS["ep_rand_bezier"]
    is_bez_obst = mode == MODE_IDS["o_ep_rand_bezier"]
    kbez = jax.random.fold_in(key, 99)
    free_nodes = _sample_bezier_nodes(kbez, st.goals[0], cfg.room_dims,
                                      st.formation_size, dtype, 30.0,
                                      0.0, 0.0, False)
    obst_nodes = _sample_bezier_nodes(kbez, st.goals[0], cfg.room_dims,
                                      st.formation_size, dtype, 5.0,
                                      1.5, 3.0, True)
    nodes = jnp.where(is_bez_obst, obst_nodes, free_nodes)
    st = st.replace(bezier_nodes=jnp.where(is_bez_free | is_bez_obst,
                                           nodes, st.bezier_nodes))

    # Walk the episode's event chain once, filling the playback table.
    oa = obst_active if obst_active is not None else jnp.zeros(
        cfg.obst_area[0] * cfg.obst_area[1], bool)
    oc = obst_centers if obst_centers is not None else jnp.zeros(
        (oa.shape[0], 2), dtype)
    return st.replace(events=presample_events(cfg, st, oa, oc))


# ---------------------------------------------------------------------------
# Event presampling
# ---------------------------------------------------------------------------

def num_event_slots(cfg: ScenarioConfig, allowed_modes: tuple | None = None
                    ) -> int:
    """Upper bound (plus one spare) on scenario events in one episode, over
    the modes this config can sample.  Event cadences: per-env interval is
    U(4,6) s for the interval modes (base.py update_goals cadence), fixed
    1 s for run_away (run_away.py:17), 5 s/6 s for the Bezier node resamples
    (+ the tick-1 resample), tick-1 + interval for o_dynamic_same_goal, and
    one-shot for o_test."""
    ep_len = int(cfg.ep_time * cfg.control_freq)
    allowed = (set(range(len(MODES))) if allowed_modes is None
               else set(int(m) for m in allowed_modes))
    f = cfg.control_freq
    k = 1
    if MODE_IDS["run_away"] in allowed:
        k = max(k, ep_len // max(int(1 * f), 1))
    if allowed & _INTERVAL_MODES:
        k = max(k, ep_len // max(int(4 * f), 1))
    if MODE_IDS["o_dynamic_same_goal"] in allowed:
        k = max(k, 1 + ep_len // max(int(4 * f), 1))
    if MODE_IDS["ep_rand_bezier"] in allowed:
        k = max(k, 1 + ep_len // max(int(5 * f), 1))
    if MODE_IDS["o_ep_rand_bezier"] in allowed:
        k = max(k, 1 + ep_len // max(int(6 * f), 1))
    return k + 1


def presample_events(cfg: ScenarioConfig, st: ScenarioState,
                     obst_active: jax.Array, obst_centers: jax.Array
                     ) -> jax.Array:
    """Fill the episode's packed event table by walking the chain at reset.

    Slot k replays the (k+1)-th event exactly as the per-tick path would run
    it: the event's tick is computed from the mode's cadence (episodes are
    fixed-length, so every event tick is known at reset), the event's PRNG
    key is `fold_in(scen_key, tick)` — identical to what scenario_step
    derives at that tick — and the branch runs on the chained state (event k
    sees event k-1's outcome).  The one piece of between-event evolution an
    event branch can observe is the Bezier goal position: at a resample tick
    the goals sit at the previous curve's endpoint (`_bezier_eval(nodes, 1.0)
    == nodes[:, 2]` exactly, since `t == 1.0` is exact), so the chain
    advances goals to `nodes[:, 2]` after each Bezier slot.

    Rows past an env's actual event count are never consumed (event_count
    playback stops at the last fired event); their values are arbitrary but
    well-defined (the chain keeps stepping).
    """
    mode = st.mode
    f = cfg.control_freq
    interval0 = jnp.maximum(st.interval, 1)
    is_bez = ((mode == MODE_IDS["ep_rand_bezier"])
              | (mode == MODE_IDS["o_ep_rand_bezier"]))
    cs = jnp.where(mode == MODE_IDS["o_ep_rand_bezier"],
                   jnp.int32(6 * f), jnp.int32(5 * f))
    # Modes whose first event is at tick 1 (Bezier tick-1 resample,
    # o_dynamic_same_goal's tick-1 goal draw).
    has_tick1 = is_bez | (mode == MODE_IDS["o_dynamic_same_goal"])

    def slot(carry, k):
        cadence = jnp.where(is_bez, cs, interval0)
        t_k = jnp.where(has_tick1,
                        jnp.where(k == 0, 1, k * cadence),
                        (k + 1) * interval0)
        # o_test fires once at interval+1; after slot 0 the bumped interval
        # pushes the trigger past the episode, so later rows are unused.
        t_k = jnp.where(mode == MODE_IDS["o_test"],
                        jnp.maximum(carry.interval, 1) + 1, t_k)
        new = scenario_step(cfg, carry, t_k.astype(jnp.int32), None,
                            obst_active, obst_centers,
                            allowed_modes=None, phase="slow")
        row = {name: getattr(new, name) for name in EVENT_WRITABLE}
        goals = jnp.where(
            is_bez,
            jnp.broadcast_to(new.bezier_nodes[:, 2], new.goals.shape),
            new.goals)
        return new.replace(goals=goals), row

    num_slots = st.events.shape[0] // event_table_width(cfg.num_agents)
    _, rows = jax.lax.scan(slot, st, jnp.arange(num_slots, dtype=jnp.int32))
    return _pack_event_rows(rows, num_slots)


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------

# Modes whose step logic must run EVERY control tick (continuous goal
# motion).  Every other mode only changes state at sparse event ticks
# (interval teleports/swaps, Bezier node resampling, o_test trigger) —
# see scenario_event / batched_scenario_step.
CONTINUOUS_MODES = frozenset((
    MODE_IDS["dynamic_formations"], MODE_IDS["ep_lissajous3D"],
    MODE_IDS["ep_rand_bezier"], MODE_IDS["o_ep_rand_bezier"],
))
_INTERVAL_MODES = frozenset((2, 3, 4, 8, 9, 12, 13, 18))

def scenario_event(cfg: ScenarioConfig, st: ScenarioState,
                   tick: jax.Array,
                   modes: frozenset | None = None) -> jax.Array:
    """True iff this tick's scenario_step does anything beyond the
    continuous fast path (superset of every slow branch's internal trigger).

    Vectorizes over leading batch dims (mode/interval/tick arrays).
    `modes` restricts the predicate to a subset of mode ids (used by
    batched_scenario_step to compact only the non-fused heavy modes).
    """
    mode = st.mode
    at_interval = (tick % jnp.maximum(st.interval, 1) == 0) & (tick > 0)
    ivm = _INTERVAL_MODES if modes is None else (_INTERVAL_MODES & modes)
    sel = lambda m: modes is None or m in modes
    event = jnp.zeros(jnp.shape(mode), bool)
    if ivm:
        event |= jnp.isin(mode, jnp.asarray(sorted(ivm))) & at_interval
    # o_dynamic_same_goal also fires at tick 1 (o_dynamic_same_goal.py:17)
    if sel(MODE_IDS["o_dynamic_same_goal"]):
        event |= (mode == MODE_IDS["o_dynamic_same_goal"]) & (tick == 1)
    # Bezier node resampling cadence (ep_rand_bezier.py:22; o_: 6 s)
    cs_free = jnp.int32(5 * cfg.control_freq)
    cs_obst = jnp.int32(6 * cfg.control_freq)
    if sel(MODE_IDS["ep_rand_bezier"]):
        event |= (mode == MODE_IDS["ep_rand_bezier"]) & (
            (tick % cs_free == 0) | (tick == 1))
    if sel(MODE_IDS["o_ep_rand_bezier"]):
        event |= (mode == MODE_IDS["o_ep_rand_bezier"]) & (
            (tick % cs_obst == 0) | (tick == 1))
    # o_test one-shot trigger (test/o_test.py:31-43)
    if sel(MODE_IDS["o_test"]):
        event |= (mode == MODE_IDS["o_test"]) & (tick > st.interval)
    return event


def scenario_step(cfg: ScenarioConfig, st: ScenarioState, tick: jax.Array,
                  key: jax.Array,
                  obst_active: jax.Array | None = None,
                  obst_centers: jax.Array | None = None,
                  allowed_modes: tuple | None = None,
                  phase: str = "full") -> ScenarioState:
    """Advance scenario state by one control tick (goal motion, swaps, ...).

    Dispatches on st.mode via lax.switch; every branch is fixed-shape.

    All scenario randomness derives from `fold_in(st.scen_key, tick)`, NOT
    from the passed `key` (kept for signature compatibility, ignored): a
    tick's scenario key is therefore known at reset, which is what makes the
    event-outcome presampling (`presample_events`) bit-exact.

    allowed_modes (static): the mode ids this env config can actually sample
    (EnvConfig.mode_list()).  Under vmap over a batched mode, lax.switch
    lowers to "compute every branch, select one" — so restricting the branch
    set to the reachable modes (and skipping the switch entirely for a
    single-mode config) removes most of the per-step scenario cost: unused
    branches like the obstacle max-free-square DP would otherwise be
    evaluated for every env every tick.

    phase (static): "full" runs everything (the reference semantics, used by
    the single-env path); "fast" runs only the continuous per-tick motion
    (event branches become no-ops, Bezier applies eval only); "slow" runs
    only the sparse event updates (continuous branches become no-ops, Bezier
    applies node resampling only).  fast∘slow == full for any single tick —
    batched_scenario_step exploits this to run the slow phase on a small
    gathered subset of envs.
    """
    n = cfg.num_agents
    dtype = st.goals.dtype
    box = jnp.asarray(cfg.box, dtype)
    del key  # see docstring: scenario randomness is fold_in(scen_key, tick)
    keys = jax.random.split(jax.random.fold_in(st.scen_key, tick), 8)
    at_interval = (tick % jnp.maximum(st.interval, 1) == 0) & (tick > 0)

    def no_op(st):
        return st

    def dynamic_same_goal(st):
        # dynamic_same_goal.py:17-29: teleport the shared goal
        xy, z = _center_xy_z(keys[0], cfg, box, dtype, True)
        center = jnp.concatenate([xy, z[None]])
        goals = generate_goals_affine(n, st.formation, center,
                                      st.formation_size, 0.0, dtype)
        new = st.replace(formation_center=center, goals=goals)
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def dynamic_diff_goal(st):
        # dynamic_diff_goal.py:23-41: resample formation, teleport, shuffle
        fid, npl, lo, hi, size, layer_dist = _sample_formation_params(
            keys[1], cfg, st.mode, dtype)
        kxy, kz, kshuf = jax.random.split(keys[0], 3)
        xy = jax.random.uniform(kxy, (2,), dtype, -box, box)
        z = get_z_value(kz, st.formation, n, st.num_agents_per_layer, box,
                        st.formation_size)
        center = jnp.concatenate([xy, z[None]])
        goals = generate_goals_affine(n, fid, center, size, layer_dist, dtype)
        goals = jax.random.permutation(kshuf, goals, axis=0)
        new = st.replace(formation=fid, num_agents_per_layer=npl, lowest_size=lo,
                         highest_size=hi, formation_size=size, layer_dist=layer_dist,
                         formation_center=center, goals=goals)
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def swap_goals(st):
        goals = jax.random.permutation(keys[0], st.goals, axis=0)
        new = st.replace(goals=goals)
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def dynamic_formations(st):
        # dynamic_formations.py:22-38: grow/shrink size every tick
        at_low = st.formation_size <= -st.highest_size
        at_high = st.formation_size >= st.highest_size
        flip = at_low | at_high
        inc = jnp.where(at_low, True, jnp.where(at_high, False, st.increase_formation))
        speed = jnp.where(flip, jax.random.uniform(keys[0], (), dtype, 1.0, 3.0),
                          st.control_speed)
        size = st.formation_size + jnp.where(inc, 1.0, -1.0) * 0.001 * speed
        # Affine goal cache (see ScenarioState.goals_base): equals
        # generate_goals(n, formation, center, size, layer_dist, npl) to
        # float rounding, without the per-tick formation generator.
        goals = st.goals_base + size * st.goals_slope
        return st.replace(formation_size=size, increase_formation=inc,
                          control_speed=speed, goals=goals)

    def lissajous(st):
        # ep_lissajous3D.py:9-27 (a=0.03, b=c=0.01, n=m=2, phi=psi=90)
        t = tick.astype(dtype) / cfg.control_freq
        off = jnp.stack([
            0.03 * jnp.sin(t), 0.01 * jnp.sin(2 * t + 90.0), 0.01 * jnp.cos(2 * t + 90.0)])
        goal0 = st.goals[0] + off
        return st.replace(goals=jnp.broadcast_to(goal0, (n, 3)))

    def _bezier(st, num_secs, max_cap, z_lo, z_hi, obstacle_mode):
        control_steps = int(num_secs * cfg.control_freq)
        t_idx = tick % control_steps
        if phase != "fast":
            resample = (t_idx == 0) | (tick == 1)
            nodes = _sample_bezier_nodes(keys[0], st.goals[0], cfg.room_dims,
                                         st.formation_size, dtype, max_cap,
                                         z_lo, z_hi, obstacle_mode)
            nodes = jnp.where(resample, nodes, st.bezier_nodes)
        else:
            nodes = st.bezier_nodes
        if phase == "slow":
            # Goal motion already ran in the fast phase (at resample ticks
            # move=False, so eval order does not matter).
            return st.replace(bezier_nodes=nodes)
        # linspace(0,1,control_steps)[t] == t/(control_steps-1)
        t = t_idx.astype(dtype) / (control_steps - 1)
        goal0 = _bezier_eval(nodes, t)
        move = (t_idx != 0) & (tick > 1)
        goals = jnp.where(move, jnp.broadcast_to(goal0, (n, 3)), st.goals)
        return st.replace(bezier_nodes=nodes, goals=goals)

    def bezier_free(st):
        return _bezier(st, 5, 30.0, 0.0, 0.0, False)

    def bezier_obst(st):
        return _bezier(st, 6, 5.0, 1.5, 3.0, True)

    def svs(st):
        # swarm_vs_swarm.py:61-80: swap centers, resample, regenerate, shuffle halves
        c1, c2 = st.goal_center_2, st.goal_center_1
        fid, npl, lo, hi, size, layer_dist = _sample_formation_params(
            keys[1], cfg, st.mode, dtype)
        g1 = generate_goals_affine(n // 2, fid, c1, size, layer_dist, dtype)
        g2 = generate_goals_affine(n - n // 2, fid, c2, size, layer_dist, dtype)
        g1 = jax.random.permutation(keys[2], g1, axis=0)
        g2 = jax.random.permutation(keys[3], g2, axis=0)
        new = st.replace(goal_center_1=c1, goal_center_2=c2, formation=fid,
                         num_agents_per_layer=npl, lowest_size=lo, highest_size=hi,
                         formation_size=size, layer_dist=layer_dist,
                         goals=jnp.concatenate([g1, g2], axis=0))
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def run_away(st):
        # run_away.py:16-27: drones 0 and 1 chase random others' goals
        g_idx = jax.random.randint(keys[0], (2,), 1, n) if n > 1 else jnp.zeros(2, jnp.int32)
        goals = st.goals.at[0].set(st.goals[g_idx[0]]).at[1].set(st.goals[g_idx[1]])
        new = st.replace(goals=goals)
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def o_dynamic_same_goal(st):
        # o_dynamic_same_goal.py:17-28: new free-cell goal within max_dist=4
        active = obst_active if obst_active is not None else jnp.zeros(1, bool)
        centers = obst_centers if obst_centers is not None else jnp.zeros((1, 2), dtype)
        trigger = at_interval | (tick == 1)

        def attempt(k):
            pt = sample_free_cells(k, active, centers, 1, 0.75, 3.0, dtype)[0]
            ok = jnp.linalg.norm(st.end_point - pt) <= 4.0
            return pt, ok

        ks = jax.random.split(keys[0], BEZIER_ATTEMPTS)
        pts, oks = jax.vmap(attempt)(ks)
        first = jnp.argmax(oks)
        new_goal = jnp.where(jnp.any(oks), pts[first], pts[0])
        new = st.replace(end_point=new_goal,
                         goals=jnp.broadcast_to(new_goal, (n, 3)))
        return jax.tree.map(lambda a, b: jnp.where(trigger, a, b), new, st)

    def o_dynamic_diff_goal(st):
        # Formation teleports to the freest square at each interval, with
        # resampled formation parameters (diff-goal analogue of
        # o_dynamic_same_goal).
        active = obst_active if obst_active is not None else jnp.zeros(1, bool)
        centers = obst_centers if obst_centers is not None else jnp.zeros((1, 2), dtype)
        obst_map2d = active.reshape(cfg.obst_area[0], -1) if active.shape[0] > 1 \
            else active.reshape(1, 1)
        fid, npl, lo, hi, size, layer_dist = _sample_formation_params(
            keys[1], cfg, st.mode, dtype)
        center = max_free_square_center(keys[2], obst_map2d, centers, dtype)
        goals = generate_goals_affine(n, fid, center, size, layer_dist, dtype)
        goals = jax.random.permutation(keys[3], goals, axis=0)
        new = st.replace(formation=fid, num_agents_per_layer=npl,
                         lowest_size=lo, highest_size=hi, formation_size=size,
                         layer_dist=layer_dist, formation_center=center,
                         end_point=center, goals=goals)
        return jax.tree.map(lambda a, b: jnp.where(at_interval, a, b), new, st)

    def o_test(st):
        # test/o_test.py:31-43: after duration, move goals to end_point
        trigger = tick > st.interval
        goals = generate_goals_affine(n, st.formation, st.end_point,
                                      st.formation_size, 0.0, dtype)
        new = st.replace(goals=goals, interval=st.interval + jnp.int32(
            (cfg.ep_time + 1) * cfg.control_freq))
        return jax.tree.map(lambda a, b: jnp.where(trigger, a, b), new, st)

    branches = [
        no_op,                 # static_same_goal
        no_op,                 # static_diff_goal
        dynamic_same_goal,
        dynamic_diff_goal,
        swap_goals,
        dynamic_formations,
        lissajous,
        bezier_free,
        svs,
        run_away,
        no_op,                 # o_random (goals fixed at reset)
        no_op,                 # o_static_same_goal
        o_dynamic_same_goal,
        swap_goals,            # o_swap_goals (same swap logic)
        bezier_obst,
        no_op,                 # o_uniform_same_goal_spawn
        no_op,                 # o_diagonal
        no_op,                 # o_static_diff_goal
        o_dynamic_diff_goal,
        o_test,
    ]
    if phase == "fast":
        branches = [b if (i in CONTINUOUS_MODES) else no_op
                    for i, b in enumerate(branches)]
    elif phase == "slow":
        # Bezier branches stay live (node resampling); other continuous
        # branches already ran in the fast phase.
        keep_slow = (set(range(len(branches))) - CONTINUOUS_MODES) | {
            MODE_IDS["ep_rand_bezier"], MODE_IDS["o_ep_rand_bezier"]}
        branches = [b if (i in keep_slow) else no_op
                    for i, b in enumerate(branches)]
    if allowed_modes is not None:
        allowed = tuple(sorted(set(int(m) for m in allowed_modes)))
        if len(allowed) == 1:
            out = branches[allowed[0]](st)
        else:
            sub = [branches[i] for i in allowed]
            lut = np.zeros(len(branches), np.int32)
            for pos, mid in enumerate(allowed):
                lut[mid] = pos
            out = jax.lax.switch(
                jnp.asarray(lut)[jnp.clip(st.mode, 0, len(branches) - 1)],
                sub, st)
    else:
        out = jax.lax.switch(jnp.clip(st.mode, 0, len(branches) - 1),
                             branches, st)
    if phase == "full":
        # Track consumed events so the table-playback path (which advances
        # event_count itself) stays pytree-identical to this oracle path.
        ev = scenario_event(cfg, st, tick)
        out = out.replace(event_count=st.event_count + ev.astype(jnp.int32))
    return out


def _fast_step_fused(cfg: ScenarioConfig, sts: ScenarioState,
                     ticks: jax.Array,
                     allowed_modes: tuple | None) -> ScenarioState:
    """Batched fast (continuous-motion) phase without the vmapped switch.

    Bit-identical to `jax.vmap(scenario_step(..., phase="fast"))`: the
    CONTINUOUS_MODES branch math is replicated exactly (same per-env key
    derivation for the dynamic_formations speed resample, `_bezier_eval`
    vmapped as-is).  The win is that the vmapped `lax.switch` materializes
    a full per-branch copy of ScenarioState and selects EVERY leaf for
    every env, while the continuous branches can only ever change four
    leaves (goals + the three dynamic_formations scalars) — so this fused
    form only touches those.
    """
    cont = CONTINUOUS_MODES if allowed_modes is None else (
        CONTINUOUS_MODES & set(int(m) for m in allowed_modes))
    if not cont:
        return sts
    dtype = sts.goals.dtype
    mode = sts.mode
    goals = sts.goals
    size_out = sts.formation_size
    inc_out = sts.increase_formation
    speed_out = sts.control_speed

    if MODE_IDS["dynamic_formations"] in cont:
        is_df = mode == MODE_IDS["dynamic_formations"]
        at_low = sts.formation_size <= -sts.highest_size
        at_high = sts.formation_size >= sts.highest_size
        flip = at_low | at_high
        inc = jnp.where(at_low, True,
                        jnp.where(at_high, False, sts.increase_formation))
        u = jax.vmap(lambda sk, t: jax.random.uniform(
            jax.random.split(jax.random.fold_in(sk, t), 8)[0],
            (), dtype, 1.0, 3.0))(sts.scen_key, ticks)
        speed = jnp.where(flip, u, sts.control_speed)
        size = sts.formation_size + jnp.where(inc, 1.0, -1.0) * 0.001 * speed
        df_goals = sts.goals_base + size[:, None, None] * sts.goals_slope
        goals = jnp.where(is_df[:, None, None], df_goals, goals)
        size_out = jnp.where(is_df, size, size_out)
        inc_out = jnp.where(is_df, inc, inc_out)
        speed_out = jnp.where(is_df, speed, speed_out)

    if MODE_IDS["ep_lissajous3D"] in cont:
        is_liss = mode == MODE_IDS["ep_lissajous3D"]
        t = ticks.astype(dtype) / cfg.control_freq
        off = jnp.stack([0.03 * jnp.sin(t),
                         0.01 * jnp.sin(2 * t + 90.0),
                         0.01 * jnp.cos(2 * t + 90.0)], axis=-1)
        goal0 = sts.goals[:, 0] + off
        goals = jnp.where(is_liss[:, None, None],
                          jnp.broadcast_to(goal0[:, None, :], goals.shape),
                          goals)

    for mname, num_secs in (("ep_rand_bezier", 5), ("o_ep_rand_bezier", 6)):
        if MODE_IDS[mname] in cont:
            is_bez = mode == MODE_IDS[mname]
            control_steps = int(num_secs * cfg.control_freq)
            t_idx = ticks % control_steps
            t = t_idx.astype(dtype) / (control_steps - 1)
            goal0 = jax.vmap(_bezier_eval)(sts.bezier_nodes, t)
            move = (t_idx != 0) & (ticks > 1)
            bgoals = jnp.where(move[:, None, None],
                               jnp.broadcast_to(goal0[:, None, :], goals.shape),
                               sts.goals)
            goals = jnp.where(is_bez[:, None, None], bgoals, goals)

    return sts.replace(goals=goals, formation_size=size_out,
                       increase_formation=inc_out, control_speed=speed_out)


def batched_scenario_step(cfg: ScenarioConfig, sts: ScenarioState,
                          ticks: jax.Array,
                          allowed_modes: tuple | None) -> ScenarioState:
    """scenario_step over a batch of E envs — bit-identical to the naive
    `jax.vmap(scenario_step)` for any state reachable from scenario_reset,
    restructured for the TPU cost model (kernel COUNT dominates, not element
    count):

      1. the continuous per-tick motion runs fused for all envs
         (`_fast_step_fused` — straight-line masked code, no switch);
      2. the sparse event branches never run per tick at all: their outcomes
         were presampled at reset into the per-episode packed event table
         (see presample_events), so an event tick is one unrolled row select
         + masked merge of the 13 event-writable leaves.

    History: round 2 ran the full vmapped switch per tick; round 3 compacted
    event envs through gather/compact/scatter tiers, which measured ~8M SPS
    below the fast-phase-only ceiling on the 8-drone mix (the tier dispatch +
    einsum scatter-back dominated); round 4 moved the event work to reset,
    where it amortizes over the episode's ~1500 ticks.
    """
    fast = _fast_step_fused(cfg, sts, ticks, allowed_modes)

    allowed_set = (set(int(m) for m in allowed_modes)
                   if allowed_modes is not None else set(range(len(MODES))))
    event_modes = (allowed_set - CONTINUOUS_MODES) - {0, 1, 10, 11, 15, 16, 17}
    bezier_ids = {MODE_IDS["ep_rand_bezier"], MODE_IDS["o_ep_rand_bezier"]}
    event_modes |= bezier_ids & allowed_set
    if not event_modes:
        return fast

    e = ticks.shape[0]
    event = scenario_event(cfg, sts, ticks)
    d = event_table_width(cfg.num_agents)
    k_slots = sts.events.shape[-1] // d
    row = jnp.minimum(sts.event_count, k_slots - 1)

    # Static unrolled select over the K (small, static) packed table rows —
    # a take_along_axis here is a batched dynamic gather, which TPU
    # serializes per env; K-1 masked selects over static lane slices of the
    # packed (E, K*D) table vectorize fully, read each tile once, and stay
    # bit-exact (no arithmetic on the selected values).
    sel = sts.events[:, :d]
    for j in range(1, k_slots):
        m = (row == j)[:, None]
        sel = jnp.where(m, sts.events[:, j * d:(j + 1) * d], sel)
    row_leaves = _unpack_event_row(sel, cfg.num_agents, sts.goals.dtype)

    bmask = lambda m, a: m.reshape(m.shape + (1,) * (a.ndim - 1))
    merged = fast.replace(**{
        name: jnp.where(bmask(event, getattr(fast, name)),
                        row_leaves[name], getattr(fast, name))
        for name in EVENT_WRITABLE})
    return merged.replace(event_count=sts.event_count + event.astype(jnp.int32))
