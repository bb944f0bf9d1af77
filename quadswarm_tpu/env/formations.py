"""Goal-formation generation, device-resident.

Reference: gym_art/quadrotor_multi/scenarios/base.py:39-113 (generate_goals)
and scenarios/utils.py (fibonacci sphere, circle/sphere radius, grid dims).
The formation id is runtime data (scenarios re-sample it per episode), so the
eight formation generators are `lax.switch` branches producing a fixed-shape
(N, 3) goal array; all integer layout arithmetic is elementwise jnp (divisors
via a vectorized search, no Python loops over data).
"""
from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

FORMATIONS = (
    "circle_horizontal",      # 0
    "circle_vertical_xz",     # 1
    "circle_vertical_yz",     # 2
    "sphere",                 # 3
    "grid_horizontal",        # 4
    "grid_vertical_xz",       # 5
    "grid_vertical_yz",       # 6
    "cube",                   # 7
)
FORMATION_IDS = {name: i for i, name in enumerate(FORMATIONS)}
NUM_FORMATIONS = len(FORMATIONS)


def is_circle(fid):
    return fid <= 2


def is_grid(fid):
    return (fid >= 4) & (fid <= 6)


def place_in_plane(fid, pos_0, pos_1, layer_pos):
    """Axis placement by formation plane (scenarios/utils.py:156-167):
    *_horizontal -> (p0, p1, layer); *_vertical_xz -> (p0, layer, p1);
    *_vertical_yz -> (layer, p0, p1).  Non-planar formations (sphere, cube)
    never call this."""
    plane = jnp.where((fid == 0) | (fid == 4), 0,
                      jnp.where((fid == 1) | (fid == 5), 1, 2))
    xyz_h = jnp.stack([pos_0, pos_1, layer_pos], axis=-1)
    xyz_xz = jnp.stack([pos_0, layer_pos, pos_1], axis=-1)
    xyz_yz = jnp.stack([layer_pos, pos_0, pos_1], axis=-1)
    return jnp.where(plane == 0, xyz_h, jnp.where(plane == 1, xyz_xz, xyz_yz))


def grid_dims(n):
    """Largest divisor pair (d1, d2) with d1 <= sqrt(n) <= d2
    (scenarios/utils.py:117-128), for runtime n.  Vectorized divisor search
    over a static candidate range."""
    n = jnp.maximum(n.astype(jnp.int32), 1)
    cand = jnp.arange(1, 64, dtype=jnp.int32)  # supports n < 64**2 agents/layer
    ok = (cand * cand <= n) & (n % cand == 0)
    d1 = jnp.max(jnp.where(ok, cand, 1))
    return d1, n // d1


def circle_radius(num, dist):
    """Radius so adjacent drones on the circle sit `dist` apart
    (scenarios/utils.py:99-104)."""
    theta = 2.0 * jnp.pi / num
    return (0.5 * dist) / jnp.sin(theta / 2.0)


def sphere_radius(num, dist):
    """Empirical fit for fibonacci-sphere packing (scenarios/utils.py:107-113)."""
    a, b, c, d = 1.75388487222762, 0.860487305801679, 10.3632729642351, 0.0920858134405214
    ratio = (a - d) / (1.0 + (num / c) ** b) + d
    return dist / ratio


def fibonacci_sphere(n_static: int, dtype=jnp.float32) -> jax.Array:
    """Unit fibonacci-spiral points (scenarios/utils.py:79-95).  n is static
    (the agent count); the reference clamps n < 3 up to 3."""
    n = max(n_static, 3)
    x = 0.1 + 1.2 * n
    j = jnp.arange(n, dtype=dtype)
    start = -1.0 + 1.0 / (n - 1.0)
    inc = (2.0 - 2.0 / (n - 1.0)) / (n - 1.0)
    s = start + j * inc
    ang_a = s * x
    ang_b = jnp.pi / 2.0 * jnp.sign(s) * (1.0 - jnp.sqrt(1.0 - jnp.abs(s)))
    pts = jnp.stack(
        [jnp.cos(ang_a) * jnp.cos(ang_b), jnp.sin(ang_a) * jnp.cos(ang_b), jnp.sin(ang_b)],
        axis=-1,
    )
    return pts[:n_static] if n_static >= 3 else pts[:n_static]


def generate_goals(num_agents: int, fid, formation_center, formation_size,
                   layer_dist, num_agents_per_layer, dtype=jnp.float32) -> jax.Array:
    """(N, 3) goal layout for formation id `fid` (data) centered at
    formation_center.  Faithful to QuadrotorScenario.generate_goals
    (scenarios/base.py:39-113) including multi-layer circle/grid layout and
    mean-centering of grid/cube."""
    n = num_agents
    i = jnp.arange(n, dtype=jnp.int32)
    npl = jnp.maximum(num_agents_per_layer.astype(jnp.int32), 1)
    center = jnp.asarray(formation_center, dtype)
    size = jnp.asarray(formation_size, dtype)

    def circle_goals():
        layer = i // npl
        # Per-layer agent count: full layers have npl, the last partial layer
        # has n % npl (scenarios/base.py:44-53).
        rest = jnp.asarray(n, jnp.int32) % npl
        whole_layers = jnp.asarray(n, jnp.int32) // npl
        cur = jnp.where(n <= npl, n, jnp.where(layer < whole_layers, npl, rest))
        cur = jnp.maximum(cur, 1)
        degree = 2.0 * jnp.pi * (i % cur).astype(dtype) / cur.astype(dtype)
        pos_0 = size * jnp.cos(degree)
        pos_1 = size * jnp.sin(degree)
        layer_pos = layer.astype(dtype) * layer_dist
        return place_in_plane(fid, pos_0, pos_1, layer_pos) + center

    def sphere_goals():
        pts = fibonacci_sphere(n, dtype)
        return size * pts + center

    def grid_goals():
        layer = i // npl
        whole_layers = jnp.asarray(n, jnp.int32) // npl
        rest = jnp.asarray(n, jnp.int32) % npl
        cur = jnp.where(n <= npl, n, jnp.where(layer < whole_layers, npl, rest))
        cur = jnp.maximum(cur, 1)
        d1, d2 = jax.vmap(grid_dims)(cur)
        pos_0 = size * (i % d2).astype(dtype)
        pos_1 = size * ((i // d2) % d1).astype(dtype)
        layer_pos = layer.astype(dtype) * layer_dist
        goals = place_in_plane(fid, pos_0, pos_1, layer_pos)
        return goals - jnp.mean(goals, axis=0) + center

    def cube_goals():
        # scenarios/base.py:99-110: x from layer index, (y, z) in-plane.
        # floor_dim_size = int(n ** (1/3)) with static n.
        fdim = max(int(n ** (1.0 / 3.0)), 1)
        pos_0 = size * ((i // fdim) % fdim).astype(dtype)
        pos_1 = size * (i % fdim).astype(dtype)
        x = center[2] + size * (i // (fdim * fdim)).astype(dtype)
        goals = jnp.stack([x, pos_0, pos_1], axis=-1)
        return goals - jnp.mean(goals, axis=0) + center

    return jax.lax.switch(
        jnp.clip(fid, 0, 7),
        [circle_goals, circle_goals, circle_goals, sphere_goals,
         grid_goals, grid_goals, grid_goals, cube_goals],
    )


@_functools.lru_cache(maxsize=None)
def goal_affine_tables(num_agents: int, dtype_name: str):
    """Per-formation affine pattern tables: for every formation family,
    generate_goals is JOINTLY AFFINE in (formation_size, layer_dist) with a
    zero constant term —
        goals(fid, center, size, ld) == center + size * A[fid] + ld * B[fid]
    (circle/sphere scale positions by size and stack layers by ld; grid/cube
    mean-centering is linear, and cube's center[2] seed cancels in it) — and
    num_agents_per_layer is itself a function of fid (50 for grids, 8
    otherwise; scenarios/utils.py:54-66), so A/B are constants given
    (num_agents, fid).

    Computed once per (n, dtype) by evaluating the reference-faithful
    generator at (size=1, ld=0) and (size=0, ld=1) with concrete fids (the
    lax.switch shortcuts to one branch), then reused as embedded constants:
    the hot scenario path replaces the vmapped 8-branch formation switch
    (trig + divisor searches, evaluated for EVERY branch under vmap) with a
    one-hot select over (8, N, 3) tables + one FMA.
    """
    import numpy as np

    dtype = jnp.dtype(dtype_name)
    a_rows, b_rows = [], []
    # ensure_compile_time_eval: this is often first called INSIDE a jit
    # trace — without it the generator's outputs would be tracers, which the
    # lru_cache would leak into later traces.
    with jax.ensure_compile_time_eval():
        zero3 = jnp.zeros((3,), dtype)
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)
        for fid in range(NUM_FORMATIONS):
            npl = jnp.asarray(50 if 4 <= fid <= 6 else 8, jnp.int32)
            a_rows.append(np.asarray(generate_goals(
                num_agents, fid, zero3, one, zero, npl, dtype)))
            b_rows.append(np.asarray(generate_goals(
                num_agents, fid, zero3, zero, one, npl, dtype)))
    return np.stack(a_rows), np.stack(b_rows)


def generate_goals_affine(num_agents: int, fid, formation_center,
                          formation_size, layer_dist, dtype) -> jax.Array:
    """Drop-in replacement for generate_goals on the hot path (same result
    up to float addition order; num_agents_per_layer implied by fid).

    Batch-polymorphic: fid/center/size/layer_dist may carry a shared leading
    batch dim — returns (..., N, 3).  One-hot row selection keeps the result
    exact (a single nonzero term per contraction)."""
    a_tab, b_tab = goal_affine_tables(num_agents, jnp.dtype(dtype).name)
    fid = jnp.asarray(fid)
    sel = (fid[..., None] == jnp.arange(NUM_FORMATIONS)).astype(dtype)
    a = jnp.tensordot(sel, jnp.asarray(a_tab, dtype), axes=1)  # (..., N, 3)
    b = jnp.tensordot(sel, jnp.asarray(b_tab, dtype), axes=1)
    center = jnp.asarray(formation_center, dtype)[..., None, :]
    size = jnp.asarray(formation_size, dtype)[..., None, None]
    ld = jnp.asarray(layer_dist, dtype)[..., None, None]
    return center + size * a + ld * b


def formation_size_range(mode_is_svs, fid, num_agents: int, low, high,
                         num_agents_per_layer):
    """Formation-size bounds from inter-drone distance bounds
    (scenarios/utils.py:131-153 get_formation_range).  swarm_vs_swarm halves
    the per-swarm agent count."""
    n = jnp.where(mode_is_svs, num_agents // 2, num_agents)
    circ_lo = circle_radius(num_agents_per_layer.astype(low.dtype), low)
    circ_hi = circle_radius(num_agents_per_layer.astype(low.dtype), high)
    sph_lo = sphere_radius(n.astype(low.dtype), low)
    sph_hi = sphere_radius(n.astype(low.dtype), high)
    lo = jnp.where(is_circle(fid), circ_lo, jnp.where(fid == 3, sph_lo, low))
    hi = jnp.where(is_circle(fid), circ_hi, jnp.where(fid == 3, sph_hi, high))
    return lo, hi


def get_z_value(key, fid, num_agents: int, num_agents_per_layer, box_size,
                formation_size):
    """Random goal-center z with formation-dependent lower bound
    (scenarios/utils.py:170-181)."""
    z = jax.random.uniform(key, (), box_size.dtype, -0.5 * box_size, 0.5 * box_size) + 2.0
    real_npl = jnp.minimum(num_agents, num_agents_per_layer)
    d1, _ = grid_dims(real_npl)
    z_lb = jnp.where(
        (fid == 3) | (fid == 1) | (fid == 2),
        formation_size + 0.25,
        jnp.where((fid == 5) | (fid == 6), d1.astype(z.dtype) * formation_size + 0.25, 0.25),
    )
    return jnp.maximum(z_lb, z)
