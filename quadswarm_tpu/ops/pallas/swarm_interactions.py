"""Pallas TPU kernel: fused pairwise swarm-interaction reduction.

The O(N^2) drone-drone work (collision matrix, proximity penalties, nearest
partner — collisions/quadrotors.py:62-103 in the reference) is the scaling
bottleneck for large swarms (SURVEY.md §5: agent count N is this domain's
"long context" axis).  This kernel tiles the N x N pair grid blockwise, like
blockwise attention: distances for one (row_tile x col_tile) block come from
an MXU matmul (|a-b|^2 = |a|^2 + |b|^2 - 2 a.b) and reduce to per-drone
outputs in VMEM — the N x N matrix never touches HBM.

Layout: positions are stored coordinate-major, (E, 8, N_pad) with xyz in
sublanes 0..2 (zero elsewhere), so each (row x col) tile is a
(TILE, 8) @ (8, TILE) MXU contraction.  The env batch is a grid dimension
(vmap over pallas_call would break output tiling), sized for swarms where
N is large and E moderate.

Outputs per drone:
  col_any  (E, N) int32 — collides with anyone (dist <= hitbox)
  partner  (E, N) int32 — index of the nearest other drone
  penalty  (E, N) f32   — sum of proximity penalties over pairs within falloff
  min_dist (E, N) f32   — distance to nearest other drone
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
PALLAS_MIN_AGENTS = 128


def _interaction_kernel(pos_ref, params_ref, col_ref, partner_ref,
                        penalty_ref, mindist_ref):
    """Grid (E, n_tiles): one row-tile of drones in one env vs all col tiles.

    pos_ref: (1, 8, N_pad) block (this env's positions, xyz in sublanes 0..2);
    params_ref: SMEM (4,) = [hitbox, falloff, max_penalty, n];
    out refs: (1, 8, TILE) blocks — results replicated over sublanes for
    aligned vector stores (lane i of sublane 0 is drone i*TILE+i... callers
    read sublane 0).
    """
    i = pl.program_id(1)
    n_tiles = pos_ref.shape[2] // TILE  # static -> column loop unrolls
    hitbox = params_ref[0]
    falloff = params_ref[1]
    max_penalty = params_ref[2]
    n = params_ref[3].astype(jnp.int32)

    rows = pos_ref[0, :, pl.ds(i * TILE, TILE)]               # (8, TILE)
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
               + i * TILE)
    row_sq = jnp.sum(rows * rows, axis=0)                     # (TILE,)

    def col_tile(j, carry):
        col_any, partner, penalty, min_dist = carry
        j = jnp.int32(j)
        cols = pos_ref[0, :, pl.ds(j * TILE, TILE)]           # (8, TILE)
        col_sq = jnp.sum(cols * cols, axis=0)                 # (TILE,)
        # (TILE, TILE) squared distances via one MXU matmul.  HIGHEST
        # precision (full f32 passes): the |a|^2+|b|^2-2ab form cancels
        # catastrophically under the MXU's default bf16-pass f32 emulation.
        cross = jax.lax.dot_general(
            rows.T, cols, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(row_sq[:, None] + col_sq[None, :] - 2.0 * cross, 0.0)
        dist = jnp.sqrt(d2)

        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
                   + j * TILE)
        valid = (col_ids != row_ids[:, None]) & (col_ids < n) & (
            row_ids[:, None] < n)
        big = jnp.float32(1e30)
        dist_masked = jnp.where(valid, dist, big)

        col_any = col_any | jnp.any(dist_masked <= hitbox, axis=1)
        pen = jnp.where(valid & (dist <= falloff),
                        (-max_penalty / falloff) * dist + max_penalty, 0.0)
        penalty = penalty + jnp.sum(pen, axis=1)
        tile_min = jnp.min(dist_masked, axis=1)
        tile_arg = (jnp.argmin(dist_masked, axis=1) + j * TILE).astype(jnp.int32)
        better = tile_min < min_dist
        partner = jnp.where(better, tile_arg, partner)
        min_dist = jnp.minimum(min_dist, tile_min)
        return col_any, partner, penalty, min_dist

    carry = (
        jnp.zeros((TILE,), jnp.bool_),
        jnp.zeros((TILE,), jnp.int32),
        jnp.zeros((TILE,), jnp.float32),
        jnp.full((TILE,), 1e30, jnp.float32),
    )
    for j in range(n_tiles):  # static trip count — fully unrolled
        carry = col_tile(j, carry)
    col_any, partner, penalty, min_dist = carry
    col_ref[0] = jnp.broadcast_to(col_any.astype(jnp.int32), (8, TILE))
    partner_ref[0] = jnp.broadcast_to(partner, (8, TILE))
    penalty_ref[0] = jnp.broadcast_to(penalty, (8, TILE))
    mindist_ref[0] = jnp.broadcast_to(min_dist, (8, TILE))


@functools.partial(jax.jit, static_argnames=("interpret",))
def swarm_interactions(pos: jax.Array, hitbox, falloff, max_penalty,
                       interpret: bool = False):
    """Fused pairwise reduction.  pos: (N, 3) or (E, N, 3) float32.

    Returns (col_any bool, partner int32, penalty f32, min_dist f32), each
    (N,) / (E, N); `penalty` is the UNSCALED sum (caller applies dt).
    """
    single = pos.ndim == 2
    if single:
        pos = pos[None]
    e, n = pos.shape[0], pos.shape[1]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    # Coordinate-major layout: (E, 8, N_pad), xyz in sublanes 0..2.
    pos_t = jnp.zeros((e, 8, n_pad), jnp.float32)
    pos_t = pos_t.at[:, :3, :n].set(
        jnp.swapaxes(pos.astype(jnp.float32), 1, 2))
    params = jnp.asarray([hitbox, falloff, max_penalty, float(n)], jnp.float32)

    n_tiles = n_pad // TILE
    out_spec = pl.BlockSpec((1, 8, TILE), lambda ei, ti: (ei, 0, ti),
                            memory_space=pltpu.VMEM)
    col, partner, penalty, min_dist = pl.pallas_call(
        _interaction_kernel,
        grid=(e, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, n_pad), lambda ei, ti: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(pos_t, params)
    col = col[:, 0, :n].astype(bool)
    partner = partner[:, 0, :n]
    penalty = penalty[:, 0, :n]
    min_dist = min_dist[:, 0, :n]
    if single:
        return col[0], partner[0], penalty[0], min_dist[0]
    return col, partner, penalty, min_dist
