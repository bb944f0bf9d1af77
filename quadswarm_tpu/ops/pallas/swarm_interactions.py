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
import numpy as np
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


# ---------------------------------------------------------------------------
# Env-integrated kernels (large-N path of env_step, gated on
# EnvConfig.use_pallas_pairs): pair collisions with EXACT new-pair history
# (packed bitmask state) + fused k-nearest neighbor observations.
# ---------------------------------------------------------------------------

# Packed pair-history layout: row d of the (N, PACK_LANES) int32 matrix holds
# N bits, 16 bits per word (16 so pack/unpack stay exact in f32 matmuls:
# weights up to 2^15 < 2^24), word w covering columns 16w..16w+15.
PACK_BITS = 16
PACK_LANES = 128          # supports N_pad <= 16 * 128 = 2048 drones
_BIGF = np.float32(1e30)
_BIGI = np.int32(2**30)


def _pack_weights():
    """(TILE, TILE // PACK_BITS) 0/1*2^b matrix: packs TILE bools (lanes)
    into TILE/16 words via one f32 matmul (exact: word values < 2^16)."""
    j = np.arange(TILE)
    w = np.arange(TILE // PACK_BITS)
    out = np.where(j[:, None] // PACK_BITS == w[None, :],
                   2.0 ** (j[:, None] % PACK_BITS), 0.0)
    return out.astype(np.float32)


def _expand_weights():
    """(TILE // PACK_BITS, TILE) 0/1 matrix: broadcasts word w to its 16
    lanes (the inverse layout of _pack_weights)."""
    w = np.arange(TILE // PACK_BITS)
    j = np.arange(TILE)
    return (j[None, :] // PACK_BITS == w[:, None]).astype(np.float32)


def _pair_collision_kernel(pos_ref, prev_ref, pack_w_ref, expand_w_ref,
                           params_ref, col_ref, penalty_ref, rany_ref,
                           rpartner_ref, packed_ref):
    """Grid (E, n_tiles): pair collisions for one row tile of one env.

    pos_ref: (1, 8, N_pad) positions, xyz in sublanes 0..2;
    prev_ref: (1, TILE, PACK_LANES) int32 — prev-tick colliding-pair bits for
      this row tile (row-major packed);
    pack_w_ref/expand_w_ref: bit pack/unpack weight matrices (passed as
      inputs — Pallas kernels may not capture array constants);
    params_ref: SMEM (4,) = [hitbox, falloff, max_penalty, n].
    Outputs (blocks over the row tile):
      col_ref     (1, 8, TILE) int32  — collides with anyone this tick
      penalty_ref (1, 8, TILE) f32    — proximity penalty sum (undt'd)
      rany_ref    (1, 8, TILE) int32  — has a NEW collision pair this tick
      rpartner_ref(1, 8, TILE) int32  — response partner: first new j>d,
                                        else first new i<d (reference pair
                                        iteration order, collisions.py:61-74)
      packed_ref  (1, TILE, PACK_LANES) int32 — THIS tick's pair bits
    """
    i = pl.program_id(1)
    n_tiles = pos_ref.shape[2] // TILE
    hitbox = params_ref[0]
    falloff = params_ref[1]
    max_penalty = params_ref[2]
    n = params_ref[3].astype(jnp.int32)

    rows = pos_ref[0, :, pl.ds(i * TILE, TILE)]               # (8, TILE)
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
               + i * TILE)
    row_sq = jnp.sum(rows * rows, axis=0)
    pack_w = pack_w_ref[...]
    expand_w = expand_w_ref[...]
    lane_pow = jnp.asarray(2.0, jnp.float32) ** (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) % PACK_BITS
    ).astype(jnp.float32)                                      # (1, TILE)

    col_any = jnp.zeros((TILE,), jnp.bool_)
    penalty = jnp.zeros((TILE,), jnp.float32)
    first_above = jnp.full((TILE,), _BIGI, jnp.int32)
    first_below = jnp.full((TILE,), _BIGI, jnp.int32)
    word_parts = []
    prev_all = prev_ref[0].astype(jnp.float32)     # (TILE, PACK_LANES)

    for j in range(n_tiles):  # static trip count
        cols = pos_ref[0, :, pl.ds(j * TILE, TILE)]
        col_sq = jnp.sum(cols * cols, axis=0)
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
        curr = valid & (dist <= hitbox)
        col_any = col_any | jnp.any(curr, axis=1)
        pen = jnp.where(valid & (dist <= falloff),
                        (-max_penalty / falloff) * dist + max_penalty, 0.0)
        penalty = penalty + jnp.sum(pen, axis=1)

        # pack this col tile's pair bits -> words j*W..(j+1)*W
        w = TILE // PACK_BITS
        words = jax.lax.dot_general(
            curr.astype(jnp.float32), pack_w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (TILE, W)
        word_parts.append(words.astype(jnp.int32))

        # unpack prev bits for this block: words -> lanes -> f32 bit math
        prev_words = prev_all[:, j * w:(j + 1) * w]
        expanded = jax.lax.dot_general(
            prev_words, expand_w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (TILE, TILE)
        prev_bit = jnp.floor(expanded / lane_pow) % 2.0
        new = curr & (prev_bit < 0.5)

        above = jnp.where(new & (col_ids > row_ids[:, None]), col_ids, _BIGI)
        below = jnp.where(new & (col_ids < row_ids[:, None]), col_ids, _BIGI)
        first_above = jnp.minimum(first_above, jnp.min(above, axis=1))
        first_below = jnp.minimum(first_below, jnp.min(below, axis=1))

    resp_any = (first_above < _BIGI) | (first_below < _BIGI)
    resp_partner = jnp.where(first_above < _BIGI, first_above, first_below)
    resp_partner = jnp.where(resp_any, resp_partner, 0)
    used = len(word_parts) * (TILE // PACK_BITS)
    if used < PACK_LANES:
        word_parts.append(jnp.zeros((TILE, PACK_LANES - used), jnp.int32))
    packed_ref[0] = jnp.concatenate(word_parts, axis=1)
    col_ref[0] = jnp.broadcast_to(col_any.astype(jnp.int32), (8, TILE))
    penalty_ref[0] = jnp.broadcast_to(penalty, (8, TILE))
    rany_ref[0] = jnp.broadcast_to(resp_any.astype(jnp.int32), (8, TILE))
    rpartner_ref[0] = jnp.broadcast_to(resp_partner, (8, TILE))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pair_collisions(pos: jax.Array, prev_packed: jax.Array, hitbox, falloff,
                    max_penalty, interpret: bool = False):
    """Collision stage of env_step for large swarms, O(N) memory.

    pos: (E, N, 3); prev_packed: (E, N, PACK_LANES) int32 pair bits from the
    previous tick (zeros after reset).  Returns
      col_any  (E, N) bool — collides with anyone (== any(curr_pairs, -1))
      penalty  (E, N) f32  — proximity penalty sum (caller applies dt)
      resp_any (E, N) bool — has a new pair this tick (drives the response)
      resp_partner (E, N) int32 — reference-ordered response partner
      curr_packed  (E, N, PACK_LANES) int32 — this tick's pair bits
    Matches the XLA path (collision_matrix + new-pair logic +
    drone_collision_response partner selection) bit-for-bit in the masks;
    distances use the MXU |a|^2+|b|^2-2ab form (f32 HIGHEST), so pairs
    within an ulp of the thresholds may differ from the XLA path.
    """
    e, n = pos.shape[0], pos.shape[1]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    assert n_pad <= PACK_BITS * PACK_LANES, "pair kernel supports N <= 2048"
    pos_t = jnp.zeros((e, 8, n_pad), jnp.float32)
    pos_t = pos_t.at[:, :3, :n].set(
        jnp.swapaxes(pos.astype(jnp.float32), 1, 2))
    prev_pad = jnp.zeros((e, n_pad, PACK_LANES), jnp.int32)
    prev_pad = prev_pad.at[:, :n].set(prev_packed)
    params = jnp.asarray([hitbox, falloff, max_penalty, float(n)], jnp.float32)

    n_tiles = n_pad // TILE
    out_spec = pl.BlockSpec((1, 8, TILE), lambda ei, ti: (ei, 0, ti),
                            memory_space=pltpu.VMEM)
    packed_spec = pl.BlockSpec((1, TILE, PACK_LANES), lambda ei, ti: (ei, ti, 0),
                               memory_space=pltpu.VMEM)
    col, penalty, rany, rpartner, packed = pl.pallas_call(
        _pair_collision_kernel,
        grid=(e, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, n_pad), lambda ei, ti: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            packed_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec, packed_spec),
        out_shape=(
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((e, 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((e, n_pad, PACK_LANES), jnp.int32),
        ),
        interpret=interpret,
    )(pos_t, prev_pad, jnp.asarray(_pack_weights()),
      jnp.asarray(_expand_weights()), params)
    return (col[:, 0, :n].astype(bool), penalty[:, 0, :n],
            rany[:, 0, :n].astype(bool), rpartner[:, 0, :n],
            packed[:, :n])


def pack_pairs(pairs: jax.Array) -> jax.Array:
    """Pack a (..., N, N) bool pair matrix into the kernel's (..., N,
    PACK_LANES) int32 bit layout (16 bits/word).  Pure jnp — used by the
    XLA env_step path and tests to interoperate with `pair_collisions`."""
    n = pairs.shape[-1]
    n_words = (n + PACK_BITS - 1) // PACK_BITS
    pad = n_words * PACK_BITS - n
    p = jnp.pad(pairs.astype(jnp.int32), [(0, 0)] * (pairs.ndim - 1) + [(0, pad)])
    p = p.reshape(p.shape[:-1] + (n_words, PACK_BITS))
    words = jnp.sum(p << jnp.arange(PACK_BITS, dtype=jnp.int32), axis=-1)
    out_pad = PACK_LANES - n_words
    return jnp.pad(words, [(0, 0)] * (pairs.ndim - 1) + [(0, out_pad)])


def unpack_pairs(packed: jax.Array, n: int) -> jax.Array:
    """(..., N, PACK_LANES) int32 -> (..., N, N) bool (inverse of pack_pairs)."""
    n_words = (n + PACK_BITS - 1) // PACK_BITS
    words = packed[..., :n_words, None]
    bits = (words >> jnp.arange(PACK_BITS, dtype=jnp.int32)) & 1
    flat = bits.reshape(bits.shape[:-2] + (n_words * PACK_BITS,))
    return flat[..., :n].astype(bool)


def _neighbor_topk_kernel(k, pos_ref, vel_ref, params_ref, obs_ref, scratch):
    """Grid (E, n_tiles): fused k-nearest neighbor obs for one row tile.

    Metric (quadrotor_multi.py:262-270): m = max(dist, 0.01) + unit . relvel.
    The (TILE, N_pad) metric block lives only in VMEM scratch; selected
    neighbors' relative pos/vel come from one-hot MXU matmuls, so the
    (N, N, 6) relative-state tensor of the XLA path never exists.

    obs_ref: (1, TILE, 128) — neighbor m in lanes 8m..8m+5 as
    [relpos xyz, relvel xyz]; caller re-slices to (TILE, k*6).
    """
    i = pl.program_id(1)
    n_pad = pos_ref.shape[2]
    n_tiles = n_pad // TILE
    n = params_ref[0].astype(jnp.int32)

    rows_p = pos_ref[0, :, pl.ds(i * TILE, TILE)]             # (8, TILE)
    rows_v = vel_ref[0, :, pl.ds(i * TILE, TILE)]
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
               + i * TILE)
    row_sq = jnp.sum(rows_p * rows_p, axis=0)
    row_pv = jnp.sum(rows_p * rows_v, axis=0)                 # p_i . v_i

    hp = jax.lax.Precision.HIGHEST
    for j in range(n_tiles):
        cols_p = pos_ref[0, :, pl.ds(j * TILE, TILE)]
        cols_v = vel_ref[0, :, pl.ds(j * TILE, TILE)]
        col_sq = jnp.sum(cols_p * cols_p, axis=0)
        col_pv = jnp.sum(cols_p * cols_v, axis=0)             # p_j . v_j
        dot = lambda a, b: jax.lax.dot_general(
            a.T, b, (((1,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32)
        pp = dot(rows_p, cols_p)                              # p_i . p_j
        pv = dot(rows_p, cols_v)                              # p_i . v_j
        vp = dot(rows_v, cols_p)                              # v_i . p_j
        d2 = jnp.maximum(row_sq[:, None] + col_sq[None, :] - 2.0 * pp, 0.0)
        dist_safe = jnp.maximum(jnp.sqrt(d2), 0.01)
        # (p_j - p_i) . (v_j - v_i) = pj.vj - pi.vj - vi.pj + pi.vi
        rel_dot = col_pv[None, :] - pv - vp + row_pv[:, None]
        metric = dist_safe + rel_dot / dist_safe
        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
                   + j * TILE)
        invalid = (col_ids == row_ids[:, None]) | (col_ids >= n)
        scratch[:, pl.ds(j * TILE, TILE)] = jnp.where(invalid, _BIGF, metric)

    # shift matrix: relvel xyz (lanes 0..2) -> lanes 3..5 (built from iotas:
    # Pallas kernels may not capture array constants)
    sr = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    sc = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    shift3 = ((sc == sr + 3) & (sr < 3)).astype(jnp.float32)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, n_pad), 1)
    parts = []
    for m in range(k):
        vals = scratch[...]
        idx = jnp.argmin(vals, axis=1).astype(jnp.int32)      # first minimum
        onehot = (lane_iota == idx[:, None]).astype(jnp.float32)
        sel = lambda src: jax.lax.dot_general(
            onehot, src[0], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (TILE, 8)
        rel_p = sel(pos_ref) - rows_p.T
        rel_v = sel(vel_ref) - rows_v.T
        out8 = rel_p + jax.lax.dot_general(
            rel_v, shift3, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        parts.append(out8)
        scratch[...] = jnp.where(lane_iota == idx[:, None], _BIGF, vals)
    pad = jnp.zeros((TILE, 128 - 8 * k), jnp.float32)
    obs_ref[0] = jnp.concatenate(parts + [pad], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def neighbor_topk_obs(pos: jax.Array, vel: jax.Array, k: int,
                      interpret: bool = False) -> jax.Array:
    """Fused k-nearest neighbor observation (env/neighbors.py semantics) for
    large swarms.  pos/vel: (E, N, 3) -> (E, N, k*6) f32 (unclipped).

    Requires k <= 16 and k <= N-1.  Selection ties may differ from the XLA
    path by float-ulp (matmul-form distances); both break exact ties by
    lowest index.
    """
    assert 1 <= k <= 16
    e, n = pos.shape[0], pos.shape[1]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    to_t = lambda x: jnp.zeros((e, 8, n_pad), jnp.float32).at[:, :3, :n].set(
        jnp.swapaxes(x.astype(jnp.float32), 1, 2))
    params = jnp.asarray([float(n)], jnp.float32)
    n_tiles = n_pad // TILE
    obs = pl.pallas_call(
        functools.partial(_neighbor_topk_kernel, k),
        grid=(e, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, n_pad), lambda ei, ti: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda ei, ti: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 128), lambda ei, ti: (ei, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, n_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, n_pad), jnp.float32)],
        interpret=interpret,
    )(to_t(pos), to_t(vel), params)
    # lanes 8m..8m+5 -> (E, N, k, 6) -> (E, N, k*6)
    obs = obs[:, :n].reshape(e, n, 16, 8)[:, :, :k, :6]
    return obs.reshape(e, n, k * 6)
