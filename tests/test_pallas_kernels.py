"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.collisions import collision_matrix
from quadswarm_tpu.env.reward import proximity_penalties
from quadswarm_tpu.ops.pallas.swarm_interactions import swarm_interactions


def test_swarm_interactions_vs_xla():
    rng = np.random.default_rng(0)
    n = 200  # not a multiple of the 128 tile -> exercises padding/masking
    pos = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    hitbox, falloff, max_pen = 0.5, 1.5, 10.0

    col, partner, penalty, min_dist = swarm_interactions(
        jnp.asarray(pos), hitbox, falloff, max_pen, interpret=True)

    dist, collide = collision_matrix(jnp.asarray(pos), hitbox)
    expected_col = np.asarray(jnp.any(collide, axis=1))
    np.testing.assert_array_equal(np.asarray(col), expected_col)

    dist_np = np.asarray(dist) + np.eye(n) * 1e9
    np.testing.assert_array_equal(np.asarray(partner), dist_np.argmin(axis=1))
    np.testing.assert_allclose(np.asarray(min_dist), dist_np.min(axis=1),
                               rtol=1e-4, atol=1e-4)

    expected_pen = np.asarray(proximity_penalties(
        dist, dist <= falloff, falloff, max_pen, 1.0))
    np.testing.assert_allclose(np.asarray(penalty), expected_pen,
                               rtol=1e-3, atol=1e-3)


def test_swarm_interactions_small_padded():
    rng = np.random.default_rng(1)
    pos = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    col, partner, penalty, min_dist = swarm_interactions(
        jnp.asarray(pos), 2.0, 4.0, 10.0, interpret=True)
    assert col.shape == (8,)
    # everyone within 2.0 of someone in a +-1 box
    assert bool(jnp.all(col))
    assert np.all(np.asarray(partner) < 8)
