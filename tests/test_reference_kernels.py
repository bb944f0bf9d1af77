"""Seed-matched parity for the SWARM kernels vs the actual reference code
(deterministic numba kernels run as plain Python under tests/numba_stub.py).

Covers the interaction tier of SURVEY.md §2.1: pairwise collision matrix,
proximity penalties, obstacle SDF observation, obstacle collision detection,
cell centers, and formation math — each validated against the reference
function itself on random inputs.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from .numba_stub import install

install()
import sys  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

pytest.importorskip("gym_art.quadrotor_multi.collisions.quadrotors")

from gym_art.quadrotor_multi.collisions.quadrotors import (  # noqa: E402
    calculate_collision_matrix, calculate_drone_proximity_penalties,
)
from gym_art.quadrotor_multi.obstacles.utils import (  # noqa: E402
    collision_detection, get_cell_centers, get_surround_sdfs,
)
from gym_art.quadrotor_multi.scenarios.utils import (  # noqa: E402
    generate_points, get_circle_radius, get_grid_dim_number, get_sphere_radius,
)

from quadswarm_tpu.env.collisions import collision_matrix  # noqa: E402
from quadswarm_tpu.env.formations import (  # noqa: E402
    circle_radius, fibonacci_sphere, grid_dims, sphere_radius,
)
from quadswarm_tpu.env.obstacles import (  # noqa: E402
    cell_centers, obstacle_collisions, surround_sdf_obs,
)
from quadswarm_tpu.env.reward import proximity_penalties  # noqa: E402


def test_collision_matrix_matches_reference():
    rng = np.random.default_rng(0)
    for n in (2, 4, 8):
        pos = rng.uniform(-2, 2, size=(n, 3))
        threshold = 0.35
        ref_col, ref_pairs, ref_dist = calculate_collision_matrix(pos, threshold)
        dist, collide = collision_matrix(jnp.asarray(pos), threshold)
        dist, collide = np.asarray(dist), np.asarray(collide)
        # per-drone collided flag
        ours_col = collide.any(axis=1)
        np.testing.assert_array_equal(ours_col, ref_col == 1)
        # pair distances (i < j)
        for row in ref_dist:
            i, j, dd = int(row[0]), int(row[1]), row[2]
            np.testing.assert_allclose(dist[i, j], dd, rtol=1e-12)
        # colliding pair sets
        ref_set = {(int(i), int(j)) for i, j in ref_pairs if i >= 0}
        ours_set = {(i, j) for i in range(n) for j in range(i + 1, n)
                    if collide[i, j]}
        assert ref_set == ours_set


def test_proximity_penalties_match_reference():
    rng = np.random.default_rng(1)
    n, falloff, max_pen, dt = 8, 4.0, 10.0, 0.01
    pos = rng.uniform(-3, 3, size=(n, 3))
    _, _, ref_dist_mat = calculate_collision_matrix(pos, 0.35)
    # reference filters pairs to dist <= falloff before the penalty kernel
    # (quadrotor_multi.py:442-444)
    near = ref_dist_mat[ref_dist_mat[:, 2] <= falloff]
    ref_pen = calculate_drone_proximity_penalties(near, falloff, dt, max_pen, n)

    dist, _ = collision_matrix(jnp.asarray(pos), 0.35)
    pair_mask = np.asarray(dist) <= falloff
    ours = proximity_penalties(dist, jnp.asarray(pair_mask), falloff,
                               jnp.asarray(max_pen), dt)
    np.testing.assert_allclose(np.asarray(ours), ref_pen, rtol=1e-10)


def test_surround_sdf_matches_reference():
    rng = np.random.default_rng(2)
    n, c = 6, 9
    quads = rng.uniform(-3, 3, size=(n, 2))
    obsts = rng.uniform(-3, 3, size=(c, 2))
    obst_radius = 0.3
    ref_out = get_surround_sdfs(quads, obsts, np.zeros((n, 9)), obst_radius,
                                resolution=0.1)
    ours = surround_sdf_obs(jnp.asarray(quads), jnp.asarray(obsts),
                            jnp.ones(c, bool), obst_radius, resolution=0.1)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-10)


def test_obstacle_collision_detection_matches_reference():
    rng = np.random.default_rng(3)
    n = 12
    # obstacles on a grid (non-overlapping), like the env uses
    obsts = get_cell_centers(8, 8, 1.0)[:16]
    quads = rng.uniform(-4, 4, size=(n, 2))
    obst_radius, quad_radius = 0.3, 0.046
    ref_hits = collision_detection(quads, obsts, obst_radius, quad_radius)
    hit, idx = obstacle_collisions(jnp.asarray(quads), jnp.asarray(obsts),
                                   jnp.ones(len(obsts), bool), obst_radius,
                                   quad_radius)
    hit, idx = np.asarray(hit), np.asarray(idx)
    np.testing.assert_array_equal(hit, ref_hits >= 0)
    np.testing.assert_array_equal(idx[hit], ref_hits[hit].astype(np.int32))


def test_cell_centers_match_reference():
    for (length, width, gs) in [(8, 8, 1.0), (6, 6, 1.0), (4, 6, 1.0)]:
        ref = get_cell_centers(length, width, gs)
        ours = cell_centers(length, width, gs)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_formation_math_matches_reference():
    for n in (3, 4, 7, 16):
        np.testing.assert_allclose(np.asarray(fibonacci_sphere(n, jnp.float64)),
                                   generate_points(n), rtol=1e-8, atol=1e-10)
    for num, dist in [(4, 0.3), (8, 0.5), (15, 0.25)]:
        np.testing.assert_allclose(float(circle_radius(num, dist)),
                                   get_circle_radius(num, dist), rtol=1e-12)
        np.testing.assert_allclose(float(sphere_radius(num, dist)),
                                   get_sphere_radius(num, dist), rtol=1e-12)
    for num in (2, 4, 6, 8, 9, 12, 17):
        d1, d2 = grid_dims(jnp.asarray(num))
        r1, r2 = get_grid_dim_number(num)
        assert (int(d1), int(d2)) == (int(r1), int(r2)), num
