"""Collision experience replay: device-resident state checkpointing.

Reference: gym_art/quadrotor_multi/quad_experience_replay.py — the reference
deep-copies the entire Python env every 0.5 s, keeps the last 3 s of
checkpoints, and on a collision pushes the checkpoint from 1.5 s earlier into
a 20-slot buffer; episode resets then replay a buffered pre-collision state
with probability `sample_prob` once the drones "can fly" (avg crashes < 1
over the last 100 episodes, quadrotor_multi.py:281-287).

Here a checkpoint is just a copy of the EnvState pytree, so the whole
mechanism becomes masked ring-buffer writes — fully jittable and vmappable
over the env batch.  Semantics deltas (documented):
  * the reference evicts buffer entries replayed >= 10 times on each sample
    (cleanup); we overwrite by ring order and skip entries replayed >= 10
    times at sample time, which bounds replays identically;
  * the "can fly" gate uses a per-env running window of the last 100 episode
    crash totals, like the reference's global deque.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from quadswarm_tpu.env.multi import (
    EnvConfig, EnvState, _compute_obs, _select_done, env_reset, env_step,
)

CP_STEP_SEC = 0.5            # checkpoint cadence (ReplayBuffer cp_step_size)
EP_CP_SLOTS = 6              # 3 s of checkpoints (max_episode_checkpoints_to_keep)
BUFFER_SLOTS = 20            # ReplayBuffer buffer_size
SAVE_BEFORE_COLLISION_SEC = 1.5
MAX_REPLAYS = 10
CRASH_WINDOW = 100


@struct.dataclass
class ReplayState:
    """Per-env replay machinery (stack an extra leading axis via vmap)."""

    ep_checkpoints: EnvState       # ring [EP_CP_SLOTS, ...]
    ep_cp_count: jax.Array         # int32, checkpoints written this episode
    buffer: EnvState               # ring [BUFFER_SLOTS, ...]
    buffer_count: jax.Array        # int32 valid entries
    buffer_idx: jax.Array          # int32 next write slot
    num_replayed: jax.Array        # (BUFFER_SLOTS,) int32
    last_tick_added: jax.Array     # int32
    saved_in_replay_buffer: jax.Array  # bool — currently replaying an episode
    activated: jax.Array           # bool — drones can fly
    crash_history: jax.Array       # (CRASH_WINDOW,) f32 ring of episode crashes
    episode_count: jax.Array       # int32
    replayed_events: jax.Array     # int32


def init_replay_state(template: EnvState) -> ReplayState:
    stack = lambda k: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (k,) + x.shape), template)
    return ReplayState(
        ep_checkpoints=stack(EP_CP_SLOTS),
        ep_cp_count=jnp.zeros((), jnp.int32),
        buffer=stack(BUFFER_SLOTS),
        buffer_count=jnp.zeros((), jnp.int32),
        buffer_idx=jnp.zeros((), jnp.int32),
        num_replayed=jnp.zeros((BUFFER_SLOTS,), jnp.int32),
        last_tick_added=jnp.full((), -1_000_000_000, jnp.int32),
        saved_in_replay_buffer=jnp.zeros((), bool),
        activated=jnp.zeros((), bool),
        crash_history=jnp.zeros((CRASH_WINDOW,), jnp.float32),
        episode_count=jnp.zeros((), jnp.int32),
        replayed_events=jnp.zeros((), jnp.int32),
    )


def _write_slot(ring, idx, item):
    return jax.tree.map(
        lambda r, x: jax.lax.dynamic_update_index_in_dim(r, x, idx, 0), ring, item)


def _read_slot(ring, idx):
    return jax.tree.map(lambda r: jax.lax.dynamic_index_in_dim(r, idx, 0, False), ring)


def _write_slot_if(cond, ring, idx, item):
    """Masked ring write that stays O(slot), not O(ring): always write slot
    `idx`, but select between the new item and the slot's current contents.
    (A `jnp.where(cond, dynamic_update(ring,...), ring)` would force XLA to
    copy the WHOLE ring every step — the bandwidth killer for scans.)"""
    cur = _read_slot(ring, idx)
    item = jax.tree.map(lambda a, b: jnp.where(cond, a, b), item, cur)
    return _write_slot(ring, idx, item)


def _write_slots_batched(cond, ring, idx, item):
    """Batched masked ring write via one-hot select.

    ring leaves (E, K, ...), idx/cond (E,), item leaves (E, ...).  A vmapped
    dynamic_update_index (scatter with E batched indices) serializes on TPU —
    XLA can't prove index uniqueness, so it lowers to a sequential update
    loop that measured ~400x the whole env step.  The elementwise one-hot
    select is a single fused pass over the ring instead.
    """
    k = jax.tree.leaves(ring)[0].shape[1]
    hot = (jnp.arange(k)[None, :] == idx[:, None]) & cond[:, None]   # (E, K)

    def wr(r, x):
        mask = hot.reshape(hot.shape + (1,) * (r.ndim - 2))
        return jnp.where(mask, x[:, None], r)

    return jax.tree.map(wr, ring, item)


def replay_step(cfg: EnvConfig, params: Any, sample_prob: float,
                state: EnvState, rstate: ReplayState, actions: jax.Array,
                key: jax.Array, auto_reset: bool = True,
                dyn_override=None, scen_override=None, pairs_override=None,
                defer_obs: bool = False, defer_ring_writes: bool = False):
    """env_step + the experience-replay wrapper logic for one env.

    With auto_reset=False (used by `batched_replay_step`), done episodes that
    do NOT replay a buffered state are left in their terminal state and
    flagged via info["replay/did_replay"]; the batched wrapper fresh-resets
    them under a lax.cond so the expensive reset path runs only on
    episode-boundary ticks (see multi.batched_env_step).

    defer_ring_writes (static): leave the checkpoint rings untouched and
    return the write commands in info (replay/_save_cp, _cp_slot, _can_write,
    _buf_slot, _buf_item) instead.  Under vmap+scan, the per-env ring scatter
    forces XLA to rewrite the WHOLE (E, slots, ...) ring arrays every tick —
    measured as ~400x the entire env step.  Writes fire on <=1/50 of ticks
    (0.5 s checkpoint cadence + rate-limited collision events), so the
    batched wrapper applies them under lax.cond(any fired)."""
    k_env, k_sample, k_choice, k_obs = jax.random.split(key, 4)
    pre_tick = state.tick
    new_state, obs, rew, dones, info = env_step(cfg, params, state, actions,
                                                k_env, auto_reset=auto_reset,
                                                dyn_override=dyn_override,
                                                scen_override=scen_override,
                                                pairs_override=pairs_override,
                                                defer_obs=defer_obs)
    done = dones[0]
    cp_freq = jnp.int32(CP_STEP_SEC * cfg.control_freq)
    grace = jnp.int32(1.5 * cfg.control_freq)

    # --- mid-episode: save checkpoints, record collision events -------------
    tick = pre_tick + 1
    save_cp = (~done) & rstate.activated & (~rstate.saved_in_replay_buffer) & (
        tick % cp_freq == 0)
    cp_slot = rstate.ep_cp_count % EP_CP_SLOTS
    if defer_ring_writes:
        ep_cps = rstate.ep_checkpoints
    else:
        ep_cps = _write_slot_if(save_cp, rstate.ep_checkpoints, cp_slot, new_state)
    ep_cp_count = jnp.where(save_cp, rstate.ep_cp_count + 1, rstate.ep_cp_count)

    # Collision this tick? (new drone pair or new obstacle hit)
    collided = jnp.any(new_state.prev_coll_ids & ~state.prev_coll_ids)
    if cfg.use_obstacles:
        collided = collided | jnp.any(new_state.prev_obst_hits & ~state.prev_obst_hits)
    steps_ago = jnp.int32(SAVE_BEFORE_COLLISION_SEC / CP_STEP_SEC)
    can_write = (
        (~done) & collided & rstate.activated & (~rstate.saved_in_replay_buffer)
        & (tick > grace)
        & (tick - rstate.last_tick_added > jnp.int32(5 * cfg.control_freq))
        & (ep_cp_count >= steps_ago))
    # checkpoint from 1.5 s ago = steps_ago slots back in the ring.  With
    # deferred writes this reads the pre-write ring: the slot written this
    # tick is ep_cp_count % 6 and the slot read is (ep_cp_count+1-3) % 6,
    # which never coincide, so the data is identical.
    read_slot = (ep_cp_count - steps_ago) % EP_CP_SLOTS
    if defer_ring_writes:
        buffer = rstate.buffer
    else:
        cp = _read_slot(ep_cps, read_slot)
        buffer = _write_slot_if(can_write, rstate.buffer, rstate.buffer_idx, cp)
    # one-hot select, not .at[idx].set — batched scalar-indexed scatters
    # serialize on TPU (see _write_slots_batched)
    buf_hot = jnp.arange(BUFFER_SLOTS) == rstate.buffer_idx
    num_replayed = jnp.where(can_write & buf_hot, 0, rstate.num_replayed)
    buffer_idx = jnp.where(can_write, (rstate.buffer_idx + 1) % BUFFER_SLOTS,
                           rstate.buffer_idx)
    buffer_count = jnp.where(
        can_write, jnp.minimum(rstate.buffer_count + 1, BUFFER_SLOTS),
        rstate.buffer_count)
    last_tick_added = jnp.where(can_write, tick, rstate.last_tick_added)

    # --- episode end: can-fly gate + replay-vs-fresh reset -------------------
    crashes = state.crashes_last_episode  # accumulated over the ending episode
    hist_hot = jnp.arange(CRASH_WINDOW) == rstate.episode_count % CRASH_WINDOW
    hist = jnp.where(done & hist_hot,
                     crashes.astype(rstate.crash_history.dtype),
                     rstate.crash_history)
    episode_count = jnp.where(done, rstate.episode_count + 1, rstate.episode_count)
    enough = episode_count >= 10
    window = jnp.minimum(episode_count, CRASH_WINDOW).astype(hist.dtype)
    mean_crashes = jnp.abs(jnp.sum(hist) / jnp.maximum(window, 1.0))
    activated = rstate.activated | (done & enough & (mean_crashes < 1.0))

    # Sample a replay event?
    choice_idx = jax.random.randint(k_choice, (), 0, jnp.maximum(buffer_count, 1))
    choice_hot = jnp.arange(BUFFER_SLOTS) == choice_idx
    # Read the PRE-update counts: when a collision write and episode end land
    # on the same tick and choice_idx equals the just-written slot, the slot's
    # old MAX_REPLAYS count must still veto the replay (reference semantics).
    replayable = jnp.sum(
        jnp.where(choice_hot, rstate.num_replayed, 0)) < MAX_REPLAYS
    do_replay = (done & activated & (buffer_count > 0) & replayable
                 & (jax.random.uniform(k_sample, ()) < sample_prob))
    if defer_ring_writes:
        # Buffer read + replayed-state obs happen in batched_replay_step
        # under lax.cond(any(do_replay)) — done fires on ~1/ep_len ticks.
        out_state = new_state
    else:
        replay_env = _read_slot(buffer, choice_idx)
        # Zero the episode collision counters like the reference (:168-171)
        replay_env = replay_env.replace(
            collisions_per_episode=jnp.zeros((), jnp.int32),
            collisions_after_settle=jnp.zeros((), jnp.int32),
            obst_collisions_per_episode=jnp.zeros((), jnp.int32),
            obst_collisions_after_settle=jnp.zeros((), jnp.int32),
            rew_coeff=new_state.rew_coeff,
        )
        out_state = jax.tree.map(
            lambda a, b: jnp.where(do_replay, a, b), replay_env, new_state)
        # Observation of the replayed state (the reference returns the obs
        # saved with the event; we re-derive it from the checkpointed state)
        replay_obs, _ = _compute_obs(
            cfg, out_state.dyn, out_state.scenario.goals, out_state.gyro_bias,
            k_obs, out_state.obst_active, out_state.obst_pos, out_state.obst_size)
        obs = jnp.where(do_replay, replay_obs, obs)
    num_replayed = num_replayed + jnp.where(do_replay & choice_hot, 1, 0)
    replayed_events = jnp.where(do_replay, rstate.replayed_events + 1,
                                rstate.replayed_events)
    saved = jnp.where(done, do_replay, rstate.saved_in_replay_buffer)
    ep_cp_count = jnp.where(done, 0, ep_cp_count)
    last_tick_added = jnp.where(done, jnp.int32(-1_000_000_000), last_tick_added)

    new_rstate = rstate.replace(
        ep_checkpoints=ep_cps, ep_cp_count=ep_cp_count,
        buffer=buffer, buffer_count=buffer_count, buffer_idx=buffer_idx,
        num_replayed=num_replayed, last_tick_added=last_tick_added,
        saved_in_replay_buffer=saved, activated=activated,
        crash_history=hist, episode_count=episode_count,
        replayed_events=replayed_events)
    info["replay/replay_rate"] = (replayed_events.astype(jnp.float32)
                                  / jnp.maximum(episode_count, 1))
    info["replay/replay_buffer_size"] = buffer_count
    info["replay/activated"] = activated
    if not auto_reset:
        info["replay/did_replay"] = do_replay
    if defer_ring_writes:
        info["replay/_save_cp"] = save_cp
        info["replay/_cp_slot"] = cp_slot
        info["replay/_can_write"] = can_write
        info["replay/_buf_slot"] = rstate.buffer_idx
        info["replay/_buf_read_slot"] = read_slot
        info["replay/_choice_idx"] = choice_idx
    return out_state, new_rstate, obs, rew, dones, info


def batched_replay_step(cfg: EnvConfig, params: Any, sample_prob: float,
                        states: EnvState, rstates: ReplayState,
                        actions: jax.Array, keys: jax.Array):
    """Vmapped replay_step with CONDITIONAL fresh-reset (the replay-sampled
    resets are cheap state selects and stay in the hot path; only the full
    env_reset for non-replayed episode ends is gated on lax.cond)."""
    from quadswarm_tpu.env.multi import (
        _batched_deferred_obs, _batched_pair_interactions, _batched_scenario,
        _batched_xla_dynamics, _pallas_fleet_dynamics, _per_drone,
    )

    # Hoisted fleet-wide dynamics/scenario (same key derivation as
    # replay_step -> env_step: k_env = split(key, 4)[0]).
    keys_env = jax.vmap(lambda k: jax.random.split(k, 4)[0])(keys)
    scen = _batched_scenario(cfg, states, keys_env)
    dyn = None
    if cfg.use_pallas_dynamics and not _per_drone(params):
        dyn = _pallas_fleet_dynamics(cfg, params, states, actions, keys_env)
    elif cfg.use_pallas_pairs:
        dyn = _batched_xla_dynamics(cfg, params, states, actions, keys_env)
    pairs = (None if not cfg.use_pallas_pairs
             else _batched_pair_interactions(cfg, params, states, dyn))
    # k-nearest kernel handles 1..16 neighbors; k = N-1 (index-order
    # semantics) or 0 stays on the XLA obs path inside env_step
    defer = cfg.use_pallas_pairs and 0 < cfg.num_use_neighbor_obs <= 16
    out_states, out_rstates, obs, rew, dones, info = jax.vmap(
        lambda s, r, a, k, sc, d, pr: replay_step(
            cfg, params, sample_prob, s, r, a, k, auto_reset=False,
            dyn_override=d, scen_override=sc, pairs_override=pr,
            defer_obs=defer, defer_ring_writes=True)
    )(states, rstates, actions, keys, scen, dyn, pairs)
    if defer:
        obs, gyro = _batched_deferred_obs(cfg, out_states, states.gyro_bias,
                                          keys_env)
        out_states = out_states.replace(gyro_bias=gyro)
    did_replay = info.pop("replay/did_replay")

    # Deferred slow-tick work — ring writes, replay-state selection, and
    # fresh resets — behind ONE outer lax.cond.  A data-dependent cond
    # whose branches differ is not free even when the branch never runs:
    # measured ~90-100 us per cond per tick on v5e, independent of
    # predicate timing (pre-computable predicates move nothing; identity-
    # branch conds canonicalize away; a tiny-body cond pays the same as a
    # heavy one — branch-differ buffer handling, not predicate latency or
    # branch compute).  Three separate conds cost the train rollout
    # ~52 ms/iter at 1024 envs while shrinking the rings 6x moved nothing
    # (docs/PERF.md round-5).  One outer cond pays the toll once per tick
    # like the plain path; the replay/reset branches nest INSIDE it, so
    # their own cond cost and bodies only materialize on the rare fire
    # ticks (checkpoint cadence, collision writes, episode ends).
    save_cp = info.pop("replay/_save_cp")
    cp_slot = info.pop("replay/_cp_slot")
    can_write = info.pop("replay/_can_write")
    buf_slot = info.pop("replay/_buf_slot")
    buf_read_slot = info.pop("replay/_buf_read_slot")
    choice_idx = info.pop("replay/_choice_idx")
    done_env = jnp.any(dones, axis=-1)
    needs_reset = done_env & ~did_replay
    k_obs = jax.vmap(lambda k: jax.random.split(k, 4)[3])(keys)
    reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(keys)
    # did_replay and needs_reset both imply done, so done_env covers them.
    fire = jnp.any(save_cp) | jnp.any(can_write) | jnp.any(done_env)

    def slow_path(args):
        out_states, obs, ep_ring, buf_ring = args
        # Masked ring writes (no-op by value when no env fires this tick;
        # the whole-ring rewrite only happens on fire ticks at all).
        ep_ring = _write_slots_batched(save_cp, ep_ring, cp_slot, out_states)
        # The 1.5s-ago checkpoint: read slot never equals this tick's write
        # slot (see replay_step), so reading the pre-write ring is identical.
        buf_item = jax.vmap(_read_slot)(ep_ring, buf_read_slot)
        buf_ring = _write_slots_batched(can_write, buf_ring, buf_slot,
                                        buf_item)

        def apply_replay(args):
            sts, ob = args
            replay_env = jax.vmap(_read_slot)(buf_ring, choice_idx)
            z = jnp.zeros(choice_idx.shape, jnp.int32)
            replay_env = replay_env.replace(
                collisions_per_episode=z, collisions_after_settle=z,
                obst_collisions_per_episode=z,
                obst_collisions_after_settle=z,
                rew_coeff=sts.rew_coeff)
            robs = jax.vmap(
                lambda s, k: _compute_obs(cfg, s.dyn, s.scenario.goals,
                                          s.gyro_bias, k, s.obst_active,
                                          s.obst_pos, s.obst_size)[0]
            )(replay_env, k_obs)
            return (_select_done(did_replay, replay_env, sts),
                    _select_done(did_replay, robs, ob))

        out_states, obs = jax.lax.cond(jnp.any(did_replay), apply_replay,
                                       lambda a: a, (out_states, obs))

        def do_reset(args):
            out_states, obs = args
            # Fresh (non-replayed) episodes resample obstacle density/size
            # when domain randomization is on
            # (quad_experience_replay.py:198-204)
            reset_states, reset_obs = jax.vmap(
                lambda k, s: env_reset(
                    cfg, params, k, rew_coeff=s.rew_coeff,
                    obst_density=(None if cfg.obst_density_random
                                  else s.obst_density),
                    obst_size=None if cfg.obst_size_random else s.obst_size)
            )(reset_keys, out_states)
            return (_select_done(needs_reset, reset_states, out_states),
                    _select_done(needs_reset, reset_obs, obs))

        out_states, obs = jax.lax.cond(jnp.any(needs_reset), do_reset,
                                       lambda a: a, (out_states, obs))
        return out_states, obs, ep_ring, buf_ring

    out_states, obs, ep_ring, buf_ring = jax.lax.cond(
        fire, slow_path, lambda a: a,
        (out_states, obs, out_rstates.ep_checkpoints, out_rstates.buffer))
    out_rstates = out_rstates.replace(ep_checkpoints=ep_ring, buffer=buf_ring)
    return out_states, out_rstates, obs, rew, dones, info
