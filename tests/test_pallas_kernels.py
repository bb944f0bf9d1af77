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


def _xla_new_pair_response_inputs(pos, prev_pairs, hitbox):
    """Reference partner selection (collisions.py:61-74) from dense masks."""
    n = pos.shape[0]
    dist, curr = collision_matrix(jnp.asarray(pos), hitbox)
    curr = np.asarray(curr)
    new = curr & ~prev_pairs
    idx = np.arange(n)
    upper = new & (idx[:, None] < idx[None, :])
    any_row = upper.any(axis=1)
    first_col = np.argmax(upper, axis=1)
    any_col = upper.any(axis=0)
    first_row = np.argmax(upper, axis=0)
    active = any_row | any_col
    partner = np.where(any_row, first_col, first_row)
    return curr, active, np.where(active, partner, 0)


def test_pair_collisions_vs_xla():
    """pair_collisions (packed history) matches the dense new-pair logic:
    masks bit-for-bit, penalties to fp tolerance."""
    from quadswarm_tpu.ops.pallas.swarm_interactions import (
        PACK_BITS, PACK_LANES, pair_collisions,
    )

    rng = np.random.default_rng(2)
    e, n = 2, 150
    # Dense cloud so collisions + repeat collisions happen
    pos = rng.uniform(-1.2, 1.2, size=(e, n, 3)).astype(np.float32)
    hitbox, falloff, max_pen = 0.35, 1.0, 10.0

    # Build a prev-pair state by running the kernel once on jittered positions
    pos0 = pos + rng.normal(0, 0.05, pos.shape).astype(np.float32)
    zeros = jnp.zeros((e, n, PACK_LANES), jnp.int32)
    _, _, _, _, prev_packed = pair_collisions(
        jnp.asarray(pos0), zeros, hitbox, falloff, max_pen, interpret=True)
    col, penalty, rany, rpartner, curr_packed = pair_collisions(
        jnp.asarray(pos), prev_packed, hitbox, falloff, max_pen,
        interpret=True)

    for env in range(e):
        # reconstruct prev dense mask from pos0 (kernel packing round-trip)
        _, prev_dense = collision_matrix(jnp.asarray(pos0[env]), hitbox)
        prev_dense = np.asarray(prev_dense)
        # packed bits decode to the same dense matrix
        pk = np.asarray(prev_packed[env])
        decoded = np.zeros((n, n), bool)
        for j in range(n):
            decoded[:, j] = (pk[:, j // PACK_BITS] >> (j % PACK_BITS)) & 1
        np.testing.assert_array_equal(decoded, prev_dense)

        curr, active, partner = _xla_new_pair_response_inputs(
            pos[env], prev_dense, hitbox)
        assert curr.any(), "test cloud produced no collisions"
        np.testing.assert_array_equal(np.asarray(col[env]), curr.any(axis=1))
        np.testing.assert_array_equal(np.asarray(rany[env]), active)
        np.testing.assert_array_equal(np.asarray(rpartner[env]), partner)

        dist, _ = collision_matrix(jnp.asarray(pos[env]), hitbox)
        expected_pen = np.asarray(proximity_penalties(
            dist, dist <= falloff, falloff, max_pen, 1.0))
        np.testing.assert_allclose(np.asarray(penalty[env]), expected_pen,
                                   rtol=1e-3, atol=1e-3)


def test_neighbor_topk_obs_vs_xla():
    """Fused top-k neighbor obs matches env/neighbors.py neighbor_obs."""
    from quadswarm_tpu.env.neighbors import neighbor_obs
    from quadswarm_tpu.ops.pallas.swarm_interactions import neighbor_topk_obs

    rng = np.random.default_rng(3)
    e, n, k = 2, 140, 6
    pos = rng.uniform(-4, 4, size=(e, n, 3)).astype(np.float32)
    vel = rng.uniform(-2, 2, size=(e, n, 3)).astype(np.float32)

    got = neighbor_topk_obs(jnp.asarray(pos), jnp.asarray(vel), k,
                            interpret=True)
    want = jax.vmap(lambda p, v: neighbor_obs(p, v, k))(
        jnp.asarray(pos), jnp.asarray(vel))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
