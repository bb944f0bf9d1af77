"""Static cylinder obstacles: grid generation, SDF observations, collision
detection.

Reference: gym_art/quadrotor_multi/obstacles/{obstacles,utils}.py.  The
variable-count obstacle list becomes a fixed-capacity array + active mask so
episode-to-episode density changes never change shapes: capacity = number of
grid cells, inactive obstacles are parked at +inf distance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cell_centers(obst_area_length: int, obst_area_width: int,
                 grid_size: float = 1.0) -> np.ndarray:
    """Grid cell centers in the reference's column-major-with-flipped-y order
    (obstacles/utils.py:46-58).  Host-side (static per config)."""
    xs = np.arange(0, obst_area_length, grid_size)
    ys = np.arange(obst_area_width - grid_size, -grid_size, -grid_size)
    out = np.zeros((len(xs) * len(ys), 2))
    k = 0
    for i in xs:
        for j in ys:
            out[k, 0] = i + grid_size / 2 - obst_area_length // 2
            out[k, 1] = j + grid_size / 2 - obst_area_width // 2
            k += 1
    return out


def generate_obstacle_grid(key: jax.Array, num_cells: int, density,
                           centers: jax.Array, room_height: float):
    """Sample obstacle placement by density (quadrotor_multi.py:304-325).

    Returns (active (C,) bool mask over cells, obst_pos (C, 3)).  The number
    of obstacles is round-to-int(density * cells); sampling without
    replacement is done by ranking random scores (top-k trick), which keeps
    shapes static under jit.
    """
    num_cells_arr = jnp.asarray(num_cells)
    num_obst = (density * num_cells_arr).astype(jnp.int32)
    scores = jax.random.uniform(key, (num_cells,))
    order = jnp.argsort(-scores)
    rank = jnp.argsort(order)
    active = rank < num_obst
    pos = jnp.concatenate(
        [centers, jnp.full((num_cells, 1), room_height / 2.0, centers.dtype)], axis=-1
    )
    return active, pos


def surround_sdf_obs(quad_pos_xy: jax.Array, obst_pos_xy: jax.Array,
                     active: jax.Array, obst_radius,
                     resolution: float = 0.1) -> jax.Array:
    """9-point local SDF patch per drone (obstacles/utils.py:4-27).

    quad_pos_xy: (N, 2); obst_pos_xy: (C, 2); active: (C,) bool.
    Returns (N, 9): min over active obstacles of dist(grid_pt, obst) - radius,
    100 - radius... note: the reference initializes to 100 then always
    overwrites with min_dist - obst_radius where min_dist starts at 100, so
    the empty-grid value is 100 - obst_radius.
    """
    offs = jnp.asarray(
        [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 0], [0, 1], [1, -1], [1, 0], [1, 1]],
        quad_pos_xy.dtype,
    ) * resolution
    # Reference index order: g_id = g_i * 3 + g_j with g_i over x offsets and
    # g_j over y offsets -> offs rows are (dx, dy) pairs in that order.
    grid = quad_pos_xy[:, None, :] + offs[None, :, :]          # (N, 9, 2)
    d = jnp.linalg.norm(grid[:, :, None, :] - obst_pos_xy[None, None, :, :], axis=-1)
    d = jnp.where(active[None, None, :], d, jnp.inf)
    min_dist = jnp.minimum(jnp.min(d, axis=-1), 100.0)
    return min_dist - obst_radius


def obstacle_collisions(quad_pos_xy: jax.Array, obst_pos_xy: jax.Array,
                        active: jax.Array, obst_radius, quad_radius):
    """Per-drone obstacle hit: (hit (N,) bool, obstacle index (N,) int32).

    Reference collision_detection (obstacles/utils.py:30-43) takes the FIRST
    obstacle within range per drone (break) — with non-overlapping grid
    obstacles at most one can be in range, so argmin distance is equivalent.
    """
    d = jnp.linalg.norm(
        quad_pos_xy[:, None, :] - obst_pos_xy[None, :, :], axis=-1
    )
    d = jnp.where(active[None, :], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)
    hit = jnp.min(d, axis=-1) <= (quad_radius + obst_radius)
    return hit, nearest.astype(jnp.int32)
