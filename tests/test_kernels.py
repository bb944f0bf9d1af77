"""Kernel-vs-NumPy-oracle unit tests.

Mirrors the reference's kernel unit tests: collision matrix vs naive double
loop (collisions/test/unit_test/quadrotor.py), SDF patch and obstacle
collision vs naive loops (obstacles/test/unit_test.py), neighbor selection vs
the reference metric, and formation layouts vs scalar recomputation.
"""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env import collisions as coll
from quadswarm_tpu.env import obstacles as obst
from quadswarm_tpu.env.formations import (
    FORMATION_IDS, circle_radius, generate_goals, grid_dims, sphere_radius,
)
from quadswarm_tpu.env.neighbors import neighbor_obs
from quadswarm_tpu.env.reward import proximity_penalties


def test_collision_matrix_vs_naive():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-2, 2, size=(16, 3))
    thr = 0.5
    dist, collide = coll.collision_matrix(jnp.asarray(pos), thr)
    for i in range(16):
        for j in range(16):
            d = np.linalg.norm(pos[i] - pos[j])
            np.testing.assert_allclose(float(dist[i, j]), d, atol=1e-12)
            expected = (d <= thr) and i != j
            assert bool(collide[i, j]) == expected


def test_proximity_penalty_vs_naive():
    rng = np.random.default_rng(1)
    pos = rng.uniform(-0.3, 0.3, size=(8, 3))
    falloff, max_pen, dt = 0.4, 10.0, 0.01
    dist, _ = coll.collision_matrix(jnp.asarray(pos), 0.1)
    pen = proximity_penalties(dist, dist <= falloff, falloff, max_pen, dt)
    # naive: iterate unordered pairs with dist <= falloff, add to both drones
    expected = np.zeros(8)
    for i in range(8):
        for j in range(i + 1, 8):
            d = np.linalg.norm(pos[i] - pos[j])
            if d <= falloff:
                p = -max_pen / falloff * d + max_pen
                expected[i] += p
                expected[j] += p
    np.testing.assert_allclose(np.asarray(pen), dt * expected, atol=1e-10)


def test_sdf_patch_vs_naive():
    rng = np.random.default_rng(2)
    quads = rng.uniform(-3, 3, size=(5, 2))
    centers = rng.uniform(-3, 3, size=(12, 2))
    active = rng.random(12) < 0.5
    radius, res = 0.3, 0.1
    out = obst.surround_sdf_obs(jnp.asarray(quads), jnp.asarray(centers),
                                jnp.asarray(active), radius, res)
    for q in range(5):
        g = 0
        for dx in (-res, 0.0, res):
            for dy in (-res, 0.0, res):
                pt = quads[q] + np.array([dx, dy])
                md = 100.0
                for c in range(12):
                    if active[c]:
                        md = min(md, np.linalg.norm(pt - centers[c]))
                np.testing.assert_allclose(float(out[q, g]), md - radius, atol=1e-6)
                g += 1


def test_obstacle_collision_vs_naive():
    rng = np.random.default_rng(3)
    quads = rng.uniform(-3, 3, size=(6, 2))
    centers = rng.uniform(-3, 3, size=(10, 2))
    active = rng.random(10) < 0.7
    obst_r, quad_r = 0.5, 0.046
    hit, idx = obst.obstacle_collisions(jnp.asarray(quads), jnp.asarray(centers),
                                        jnp.asarray(active), obst_r, quad_r)
    for q in range(6):
        dists = [np.linalg.norm(quads[q] - centers[c]) if active[c] else np.inf
                 for c in range(10)]
        expected_hit = min(dists) <= obst_r + quad_r
        assert bool(hit[q]) == expected_hit
        if expected_hit:
            assert int(idx[q]) == int(np.argmin(dists))


def test_neighbor_selection_vs_reference_metric():
    rng = np.random.default_rng(4)
    pos = rng.uniform(-2, 2, size=(8, 3))
    vel = rng.uniform(-1, 1, size=(8, 3))
    k = 3
    out = np.asarray(neighbor_obs(jnp.asarray(pos), jnp.asarray(vel), k))
    assert out.shape == (8, k * 6)
    for i in range(8):
        others = [j for j in range(8) if j != i]
        rel_pos = pos[others] - pos[i]
        rel_vel = vel[others] - vel[i]
        d = np.maximum(np.linalg.norm(rel_pos, axis=1), 0.01)
        metric = d + np.sum(rel_pos / d[:, None] * rel_vel, axis=1)
        order = np.argsort(metric)[:k]
        expected = np.concatenate(
            [np.concatenate([rel_pos[o], rel_vel[o]]) for o in order])
        np.testing.assert_allclose(out[i], expected, atol=1e-10)


def test_neighbor_all_in_index_order():
    rng = np.random.default_rng(5)
    pos = rng.uniform(-2, 2, size=(4, 3))
    vel = rng.uniform(-1, 1, size=(4, 3))
    out = np.asarray(neighbor_obs(jnp.asarray(pos), jnp.asarray(vel), 3))
    for i in range(4):
        others = [j for j in range(4) if j != i]
        expected = np.concatenate(
            [np.concatenate([pos[o] - pos[i], vel[o] - vel[i]]) for o in others])
        np.testing.assert_allclose(out[i], expected, atol=1e-12)


def test_circle_formation_layout():
    """8 drones on a horizontal circle: radius, plane, and center must match
    the scalar formulas (scenarios/base.py:44-66)."""
    n = 8
    center = jnp.asarray([1.0, -1.0, 2.0])
    size = 0.7
    goals = np.asarray(generate_goals(
        n, jnp.int32(FORMATION_IDS["circle_horizontal"]), center, size,
        jnp.float64(0.0), jnp.int32(8), jnp.float64))
    for i in range(n):
        deg = 2 * np.pi * i / n
        expected = np.array([1.0 + size * np.cos(deg), -1.0 + size * np.sin(deg), 2.0])
        np.testing.assert_allclose(goals[i], expected, atol=1e-9)


def test_multilayer_circle():
    """17 drones, 8 per layer -> 3 layers (8, 8, 1) at layer_dist spacing."""
    goals = np.asarray(generate_goals(
        17, jnp.int32(0), jnp.zeros(3), jnp.float64(1.0), jnp.float64(0.5),
        jnp.int32(8), jnp.float64))
    np.testing.assert_allclose(goals[:8, 2], 0.0, atol=1e-9)
    np.testing.assert_allclose(goals[8:16, 2], 0.5, atol=1e-9)
    np.testing.assert_allclose(goals[16, 2], 1.0, atol=1e-9)
    # last layer has a single agent at angle 0
    np.testing.assert_allclose(goals[16, :2], [1.0, 0.0], atol=1e-9)


def test_grid_formation_mean_centered():
    goals = np.asarray(generate_goals(
        6, jnp.int32(FORMATION_IDS["grid_horizontal"]), jnp.zeros(3),
        jnp.float64(0.5), jnp.float64(0.0), jnp.int32(50), jnp.float64))
    np.testing.assert_allclose(goals.mean(axis=0), np.zeros(3), atol=1e-9)
    # 6 -> 2x3 grid
    assert len(np.unique(np.round(goals[:, 0], 6))) == 3
    assert len(np.unique(np.round(goals[:, 1], 6))) == 2


def test_sphere_formation_radius():
    size = 1.3
    goals = np.asarray(generate_goals(
        8, jnp.int32(FORMATION_IDS["sphere"]), jnp.zeros(3), jnp.float64(size),
        jnp.float64(0.0), jnp.int32(8), jnp.float64))
    np.testing.assert_allclose(np.linalg.norm(goals, axis=1), size, atol=1e-9)


def test_grid_dims_matches_reference():
    def ref_grid_dim(num):
        d1 = int(np.floor(np.sqrt(num)))
        while d1 > 1 and num % d1 != 0:
            d1 -= 1
        return d1, num // d1

    for num in range(1, 60):
        d1, d2 = grid_dims(jnp.int32(num))
        e1, e2 = ref_grid_dim(num)
        assert (int(d1), int(d2)) == (e1, e2), num


def test_radius_helpers():
    np.testing.assert_allclose(
        float(circle_radius(jnp.float64(8.0), jnp.float64(1.1))),
        (0.5 * 1.1) / np.sin(2 * np.pi / 8 / 2), atol=1e-12)
    assert float(sphere_radius(jnp.float64(8.0), jnp.float64(1.0))) > 0


def test_drone_collision_response_separates():
    """After a head-on collision the drones' normal velocities separate and
    speed never exceeds the pre-collision max."""
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray([[0.0, 0.0, 2.0], [0.08, 0.0, 2.0]])
    vel = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    omega = jnp.zeros((2, 3))
    mask = jnp.asarray([[False, True], [True, False]])
    new_vel, new_omega = coll.drone_collision_response(key, pos, vel, omega, mask)
    assert not np.allclose(np.asarray(new_vel), np.asarray(vel))
    max_before = float(jnp.max(jnp.linalg.norm(vel, axis=-1)))
    assert float(jnp.max(jnp.linalg.norm(new_vel, axis=-1))) <= max_before + 1e-9
    # omega kick is momentum-preserving: omega1 + omega2 == 0
    np.testing.assert_allclose(
        np.asarray(new_omega[0] + new_omega[1]), np.zeros(3), atol=1e-9)


def test_wall_response_pushes_inward():
    key = jax.random.PRNGKey(1)
    room = ((-5.0, -5.0, 0.0), (5.0, 5.0, 10.0))
    pos = jnp.asarray([[-5.0, 0.0, 3.0]])  # at the x-low wall
    vel = jnp.asarray([[-2.0, 0.0, 0.0]])
    omega = jnp.zeros((1, 3))
    mask = jnp.asarray([True])
    for seed in range(5):
        new_vel, _ = coll.wall_collision_response(
            jax.random.PRNGKey(seed), pos, vel, omega, room, mask)
        assert float(new_vel[0, 0]) > 0    # pushed away from the wall
        assert float(new_vel[0, 2]) < 0    # downward component (ref :28)
