"""Synchronous PPO learner over device-resident vectorized envs.

Replaces Sample Factory's APPO (rollout worker processes + inference worker +
GPU learner, SURVEY.md §2.2/§3.1) with the TPU-native equivalent: the env
batch, policy inference, and the PPO update all live in ONE jitted program
per iteration — no process or host boundaries in the hot path.  Asynchrony
was a CPU-worker latency-hiding device; on TPU the rollout is itself a
`lax.scan` of fused XLA steps, so synchronous PPO with the same
hyperparameters (runs/quad_multi_mix_baseline.py:8-18) is strictly better
placed.

Hyperparameter defaults mirror the 8-drone baseline:
lr=1e-4, gamma=0.99, gae_lambda=1.0, ppo_clip=0.1, clip_value=5.0,
rollout=128, batch_size=1024, max_grad_norm=5.0, reward_clip=10,
exploration_loss_coeff=0.0.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training.train_state import TrainState

from quadswarm_tpu.env.multi import (
    EnvConfig, EnvState, batched_env_step, env_reset, env_step,
)
from quadswarm_tpu.env.reward import RewardCoeffs
from quadswarm_tpu.models.actor_critic import (
    ActorCritic, apply_fused, gaussian_entropy, gaussian_log_prob,
    sample_actions,
)
from quadswarm_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from quadswarm_tpu.parallel.normalize import (
    NormalizerState, denormalize_value, make_norm_state, normalize_obs,
)


@struct.dataclass
class PPOConfig:
    learning_rate: float = struct.field(pytree_node=False, default=1e-4)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    gae_lambda: float = struct.field(pytree_node=False, default=1.0)
    ppo_clip_ratio: float = struct.field(pytree_node=False, default=0.1)
    ppo_clip_value: float = struct.field(pytree_node=False, default=5.0)
    value_loss_coeff: float = struct.field(pytree_node=False, default=0.5)
    exploration_loss_coeff: float = struct.field(pytree_node=False, default=0.0)
    # Max-entropy objective coefficient (SF --max_entropy_coeff; the PBT
    # obstacle run sets 0.0005).  Applied as an entropy bonus in the loss,
    # alongside exploration_loss_coeff.
    max_entropy_coeff: float = struct.field(pytree_node=False, default=0.0)
    max_grad_norm: float = struct.field(pytree_node=False, default=5.0)
    rollout: int = struct.field(pytree_node=False, default=128)
    batch_size: int = struct.field(pytree_node=False, default=1024)
    num_epochs: int = struct.field(pytree_node=False, default=1)
    reward_clip: float = struct.field(pytree_node=False, default=10.0)
    num_envs: int = struct.field(pytree_node=False, default=64)
    replay_sample_prob: float = struct.field(pytree_node=False, default=0.0)
    # APPO extras (parallel/appo.py; SF --with_vtrace / V-trace clips)
    with_vtrace: bool = struct.field(pytree_node=False, default=False)
    vtrace_rho: float = struct.field(pytree_node=False, default=1.0)
    vtrace_c: float = struct.field(pytree_node=False, default=1.0)
    # XLA unroll factor for the sequential minibatch-SGD scan: >1 trades
    # compile time for fewer scalar-core loop bubbles between the (small)
    # per-minibatch programs.  Pure performance knob — no semantic effect.
    sgd_unroll: int = struct.field(pytree_node=False, default=1)
    # Env groups for the shard-aware minibatch layout (shuffled_minibatches).
    # 0 = auto: 1 on a single device (the grouped per-group gather costs ~6%
    # there), 32 on a mesh (required so the SGD phase shards instead of
    # replicating — docs/SCALING.md).  Multi-device training needs
    # device_count | groups.
    sgd_shuffle_groups: int = struct.field(pytree_node=False, default=0)
    # SF --normalize_input / --normalize_returns (parallel/normalize.py);
    # every reference baseline sets both False (quad_multi_mix_baseline.py:
    # 17-18), so defaults match.
    normalize_input: bool = struct.field(pytree_node=False, default=False)
    normalize_returns: bool = struct.field(pytree_node=False, default=False)

    def __hash__(self):
        return hash(tuple(getattr(self, f.name) for f in
                          self.__dataclass_fields__.values()))  # type: ignore

    def __eq__(self, other):
        return isinstance(other, PPOConfig) and hash(self) == hash(other)


class Transition(NamedTuple):
    obs: jax.Array        # (E, N, obs_dim)
    actions: jax.Array    # (E, N, A)
    log_prob: jax.Array   # (E, N)
    value: jax.Array      # (E, N)
    reward: jax.Array     # (E, N)
    done: jax.Array       # (E, N) bool


def collect_rollout(env_cfg: EnvConfig, dyn_params: Any, model: ActorCritic,
                    ppo_cfg: PPOConfig, policy_params, env_states: EnvState,
                    obs: jax.Array, key: jax.Array, rew_coeff: RewardCoeffs,
                    replay_states=None, norm: NormalizerState | None = None):
    """T-step on-device rollout via lax.scan over the vmapped env step.

    Returns (env_states', obs', replay_states', Transition stack [T,...],
    last_value, infos).  When ppo_cfg.replay_sample_prob > 0 the step runs
    through the collision-replay wrapper (env/replay.py).
    """
    e = obs.shape[0]
    n = env_cfg.num_agents
    use_replay = ppo_cfg.replay_sample_prob > 0.0 and replay_states is not None

    # Push (possibly annealed) reward coefficients into every env
    env_states = env_states.replace(
        rew_coeff=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (e,) + jnp.shape(x)), rew_coeff))

    def policy(params, obs_flat):
        # The model may compute in bfloat16 (4x MXU throughput on TPU);
        # cast heads to f32 so action sampling, log-probs and GAE stay exact.
        # With normalize_input the encoder sees standardized obs; with
        # normalize_returns the critic predicts in normalized return space,
        # so the value is denormalized here for GAE/bootstrapping.
        mean, log_std, value = apply_fused(model, params,
                                           normalize_obs(norm, obs_flat))
        value = denormalize_value(norm, value.astype(jnp.float32))
        return mean.astype(jnp.float32), log_std.astype(jnp.float32), value

    def step_fn(carry, step_key):
        env_states, replay_states, obs = carry
        k_act, k_env = jax.random.split(step_key)
        flat_obs = obs.reshape(e * n, -1)
        mean, log_std, value = policy(policy_params, flat_obs)
        actions = sample_actions(k_act, mean, log_std)
        log_prob = gaussian_log_prob(mean, log_std, actions)
        actions_e = actions.reshape(e, n, -1)
        env_keys = jax.random.split(k_env, e)
        if use_replay:
            from quadswarm_tpu.env.replay import batched_replay_step
            env_states, replay_states, next_obs, rew, dones, info = \
                batched_replay_step(env_cfg, dyn_params,
                                    ppo_cfg.replay_sample_prob, env_states,
                                    replay_states, actions_e, env_keys)
        else:
            env_states, next_obs, rew, dones, info = batched_env_step(
                env_cfg, dyn_params, env_states, actions_e, env_keys)
        t = Transition(obs=obs, actions=actions_e,
                       log_prob=log_prob.reshape(e, n),
                       value=value.reshape(e, n),
                       reward=jnp.clip(rew, -ppo_cfg.reward_clip, ppo_cfg.reward_clip),
                       done=dones)
        return (env_states, replay_states, next_obs), (t, info)

    keys = jax.random.split(key, ppo_cfg.rollout)
    (env_states, replay_states, obs), (traj, infos) = jax.lax.scan(
        step_fn, (env_states, replay_states, obs), keys)
    _, _, last_value = policy(policy_params, obs.reshape(e * n, -1))
    return env_states, obs, replay_states, traj, last_value.reshape(e, n), infos


def compute_gae(traj: Transition, last_value, gamma, lam):
    """Generalized advantage estimation over the [T, E, N] trajectory."""

    def scan_fn(carry, t):
        gae, next_value = carry
        not_done = 1.0 - t.done.astype(t.value.dtype)
        delta = t.reward + gamma * next_value * not_done - t.value
        gae = delta + gamma * lam * not_done * gae
        return (gae, t.value), gae

    (_, _), advantages = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_value), last_value), traj, reverse=True)
    returns = advantages + traj.value
    return advantages, returns


def ppo_loss(model: ActorCritic, ppo_cfg: PPOConfig, params, batch,
             norm: NormalizerState | None = None):
    obs, actions, old_log_prob, old_value, advantages, returns = batch
    mean, log_std, value = apply_fused(model, params, normalize_obs(norm, obs))
    # bf16-safe: loss math in f32 regardless of the model compute dtype
    mean = mean.astype(jnp.float32)
    log_std = log_std.astype(jnp.float32)
    value = value.astype(jnp.float32)
    if norm is not None and norm.ret is not None:
        # Critic learns normalized returns: `value` (raw head output) is
        # already in normalized space; move targets + clip anchor there too.
        returns = norm.ret.normalize(returns, clip=None)
        old_value = norm.ret.normalize(old_value, clip=None)
    log_prob = gaussian_log_prob(mean, log_std, actions)
    ratio = jnp.exp(log_prob - old_log_prob)
    adv = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-8)
    clip = ppo_cfg.ppo_clip_ratio
    pg_loss = -jnp.mean(jnp.minimum(
        ratio * adv, jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv))
    v_clipped = old_value + jnp.clip(value - old_value, -ppo_cfg.ppo_clip_value,
                                     ppo_cfg.ppo_clip_value)
    v_loss = 0.5 * jnp.mean(jnp.maximum(
        (value - returns) ** 2, (v_clipped - returns) ** 2))
    entropy = jnp.mean(gaussian_entropy(log_std))
    loss = (pg_loss + ppo_cfg.value_loss_coeff * v_loss
            - (ppo_cfg.exploration_loss_coeff + ppo_cfg.max_entropy_coeff)
            * entropy)
    metrics = {"loss": loss, "pg_loss": pg_loss, "v_loss": v_loss,
               "entropy": entropy,
               "approx_kl": jnp.mean(old_log_prob - log_prob)}
    return loss, metrics


def train_iteration(env_cfg: EnvConfig, dyn_params: Any, model: ActorCritic,
                    ppo_cfg: PPOConfig, train_state: TrainState,
                    env_states: EnvState, obs, key, rew_coeff: RewardCoeffs,
                    replay_states=None,
                    norm_state: NormalizerState | None = None):
    """One APPO-equivalent iteration: rollout T steps, then minibatch SGD.

    Fully jittable; under a sharded env batch XLA turns the gradient mean
    into a psum over the mesh.
    """
    k_roll, k_perm = jax.random.split(key)
    env_states, obs, replay_states, traj, last_value, infos = collect_rollout(
        env_cfg, dyn_params, model, ppo_cfg, train_state.params, env_states,
        obs, k_roll, rew_coeff, replay_states, norm=norm_state)
    advantages, returns = compute_gae(traj, last_value, ppo_cfg.gamma,
                                      ppo_cfg.gae_lambda)
    # Normalizer stats fold in the fresh rollout BEFORE SGD (SF's
    # learner-side update); GAE above used the rollout-time stats.
    if norm_state is not None and norm_state.obs is not None:
        norm_state = norm_state.replace(obs=norm_state.obs.update(
            traj.obs.reshape(-1, traj.obs.shape[-1])))
    if norm_state is not None and norm_state.ret is not None:
        norm_state = norm_state.replace(ret=norm_state.ret.update(returns))

    train_state, metrics = sgd_epochs(model, ppo_cfg, train_state, traj,
                                      advantages, returns, k_perm,
                                      norm=norm_state)
    metrics["reward_mean"] = jnp.mean(traj.reward)
    return (train_state, env_states, obs, replay_states, metrics, infos,
            norm_state)


def shuffled_minibatches(tree, dims: tuple, batch_size: int, key,
                         groups: int = 1):
    """Shard-aware chunk-shuffled minibatch layout (sync PPO/APPO/mixed PBT).

    Leaves are [T, E, N, ...]; returns the tree with leaves reshaped to
    (num_minibatches, batch, ...).

    Two properties, both load-bearing on TPU:

    * CHUNKS, not rows: a random row permutation makes x[perm] a 262k-row
      random gather (~170 ms/iter; scalar-indexed gathers serialize);
      permuting blocks keeps the gather coarse and bandwidth-bound.
      Chunks are TWO-AXIS TILES of each group's (T, env*agent) sample
      grid — tb timesteps x sb agent-series (tb*sb = chunk, tb <= 16) —
      so every chunk spans MANY timesteps AND many distinct agent series
      (the reference shuffles per-sample; docs/PARITY.md).  Round-5 fix:
      the previous stride-num_chunks slicing had a power-of-2 degeneracy —
      at baseline shapes gcd(num_chunks, E*N) left only TWO distinct
      (env, agent) series per 256-row chunk, i.e. 8 per minibatch, which
      starves sample diversity and makes mixed-PBT per-policy masks empty
      in ~1/3 of minibatches ((7/8)^8); the tiling gives 64 series per
      minibatch at the same gather coarseness.  Falls back to the strided
      slicing when tile divisibility fails (tiny test shapes).
    * GROUPED by env range: the buffer is split into g = gcd(E, batch,
      `groups`) contiguous env groups and every minibatch draws an equal
      number of chunks from each group.  Under a data-sharded env batch
      each group lives on one device and each minibatch spans all devices
      evenly, so the minibatch-SGD phase SHARDS.  The previous [T,E,N]-flat
      layout mixed the sharded env axis in a reshape, which made XLA
      all-gather the trajectory and replicate the whole learner per device
      (measured: ~60% of train-step flops replicated at D>=2 —
      docs/SCALING.md).  Multi-device training needs D | g; the default
      cap of 32 groups covers the practical mesh sizes for this model.
    """
    import math

    t_dim, e_dim, n_dim = dims
    total = t_dim * e_dim * n_dim
    num_minibatches = max(total // batch_size, 1)
    batch = min(batch_size, total)
    g = math.gcd(math.gcd(e_dim, batch), max(groups, 1))
    b = batch // g                     # rows per group per minibatch
    chunk = min(256, b)
    while b % chunk:
        chunk //= 2
    s_g = total // g                   # group stream length (env-major)
    num_chunks = s_g // chunk
    bc = b // chunk                    # chunks per group per minibatch
    # INDEPENDENT permutation per group: group streams have identical
    # internal (env-major, stride-interleaved) structure, so a shared perm
    # would give every group's chunk the same stream offset and collapse
    # each minibatch onto the same timestep subset.  The per-group gather
    # moves whole chunk-row blocks (>=16 rows per index), so it stays
    # coarse/bandwidth-bound on TPU.
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, num_chunks)
    )(jax.random.split(key, g))[:, : num_minibatches * bc]   # (g, sel)

    # Two-axis tile shape: tb timesteps x sb series per chunk (see
    # docstring).  tb divides both t_dim and chunk; sb must divide the
    # group's series count, else fall back to the strided-slice layout.
    eng = (e_dim // g) * n_dim
    tb = math.gcd(t_dim, chunk)
    tb = min(tb, 16)
    while chunk % tb:
        tb //= 2
    sb = chunk // tb
    tiled = tb > 1 and sb > 0 and eng % sb == 0 and s_g == num_chunks * chunk

    def layout(x):
        rest = x.shape[3:]
        # Group = contiguous env range (device shard).
        xs = x.reshape((t_dim, g, eng) + rest)
        xs = jnp.moveaxis(xs, 1, 0)                       # (g, T, eng)
        if tiled:
            xs = xs.reshape((g, t_dim // tb, tb, eng // sb, sb) + rest)
            xs = xs.swapaxes(2, 3)                        # tile-major
            xs = xs.reshape((g, num_chunks, chunk) + rest)
        else:
            xs = xs.reshape((g, s_g) + rest)[:, : num_chunks * chunk]
            xs = xs.reshape((g, chunk, num_chunks) + rest).swapaxes(1, 2)
        idx = perms.reshape(perms.shape + (1,) * (xs.ndim - 2))
        xs = jnp.take_along_axis(xs, idx, axis=1)
        xs = xs.reshape((g, num_minibatches, b) + rest)
        return jnp.swapaxes(xs, 0, 1).reshape(
            (num_minibatches, g * b) + rest)

    return jax.tree.map(layout, tree)


def sgd_epochs(model: ActorCritic, ppo_cfg: PPOConfig, train_state: TrainState,
               traj: Transition, advantages, returns, key,
               norm: NormalizerState | None = None):
    """Shuffled minibatch SGD over a flattened [T,E,N] trajectory (the
    learner half of the iteration; shared by sync PPO and APPO)."""
    t_dim, e_dim, n_dim = traj.reward.shape
    dims = (t_dim, e_dim, n_dim)
    total = t_dim * e_dim * n_dim
    tree = (traj.obs, traj.actions, traj.log_prob, traj.value,
            advantages, returns)
    num_minibatches = max(total // ppo_cfg.batch_size, 1)

    def epoch(train_state, ek):
        batched = shuffled_minibatches(
            tree, dims, ppo_cfg.batch_size, ek,
            groups=max(ppo_cfg.sgd_shuffle_groups, 1))

        def minibatch(train_state, batch):
            grad_fn = jax.value_and_grad(
                lambda p: ppo_loss(model, ppo_cfg, p, batch, norm=norm),
                has_aux=True)
            (loss, metrics), grads = grad_fn(train_state.params)
            return train_state.apply_gradients(grads=grads), metrics

        return jax.lax.scan(minibatch, train_state, batched,
                            unroll=min(ppo_cfg.sgd_unroll, num_minibatches))

    epoch_keys = jax.random.split(key, ppo_cfg.num_epochs)
    metrics_all = None
    for i in range(ppo_cfg.num_epochs):
        train_state, metrics_all = epoch(train_state, epoch_keys[i])
    metrics = jax.tree.map(lambda x: x[-1], metrics_all)
    return train_state, metrics


def make_train_state(model: ActorCritic, ppo_cfg: PPOConfig, key,
                     obs_dim: int) -> TrainState:
    params = model.init(key, jnp.zeros((1, obs_dim)))
    # optax.flatten: run clip+adam on ONE concatenated parameter vector
    # instead of ~40 small per-leaf kernels.  Mathematically identical
    # (global-norm clip and Adam are elementwise/global either way), but the
    # SGD inner loop is minibatch-latency-bound on TPU — hundreds of tiny
    # dispatches per update step were a large share of the learner budget.
    tx = optax.flatten(optax.chain(
        optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
        optax.adam(ppo_cfg.learning_rate),
    ))
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


class Trainer:
    """Host-side orchestration: mesh placement, jit, annealing, metrics.

    Equivalent of Sample Factory's Runner+Learner for this env family.
    """

    def __init__(self, env_cfg: EnvConfig, ppo_cfg: PPOConfig,
                 model: ActorCritic, dyn_params: Any, seed: int = 0,
                 anneal_schedules: dict | None = None, mesh=None,
                 base_rew_coeff: dict | None = None):
        self.env_cfg = env_cfg
        self.ppo_cfg = ppo_cfg
        self.model = model
        self.dyn_params = dyn_params
        if mesh is None:
            # Largest device count that divides the env batch evenly
            devs = jax.devices()
            n_dev = len(devs)
            while ppo_cfg.num_envs % n_dev != 0:
                n_dev -= 1
            mesh = make_mesh(devs[:n_dev])
        self.mesh = mesh
        if ppo_cfg.sgd_shuffle_groups == 0:
            # Auto: plain single-gather layout on one device; 32 env groups
            # on a mesh so the minibatch-SGD phase shards (docs/SCALING.md).
            ppo_cfg = ppo_cfg.replace(
                sgd_shuffle_groups=1 if self.mesh.size == 1 else 32)
            self.ppo_cfg = ppo_cfg
        self.anneal_schedules = anneal_schedules or {}
        self.env_steps = 0

        key = jax.random.PRNGKey(seed)
        self.key, k_model, k_env = jax.random.split(key, 3)
        self.train_state = make_train_state(model, ppo_cfg, k_model, env_cfg.obs_dim)
        self.norm_state = make_norm_state(ppo_cfg.normalize_input,
                                          ppo_cfg.normalize_returns,
                                          env_cfg.obs_dim)

        env_keys = jax.random.split(k_env, ppo_cfg.num_envs)
        reset_fn = jax.jit(
            jax.vmap(lambda k: env_reset(env_cfg, dyn_params, k)),
            out_shardings=batch_sharding(self.mesh))
        self.env_states, self.obs = reset_fn(env_keys)
        self.train_state = jax.device_put(self.train_state,
                                          replicated_sharding(self.mesh))
        self.norm_state = jax.device_put(self.norm_state,
                                         replicated_sharding(self.mesh))

        bsh = batch_sharding(self.mesh)
        rsh = replicated_sharding(self.mesh)
        if ppo_cfg.replay_sample_prob > 0.0:
            from quadswarm_tpu.env.replay import init_replay_state
            # Zero template: ring slots are never read before being written
            # (gated on ep_cp_count / buffer_count), so contents don't matter
            # — and this stays multi-host safe (no device_get of a sharded
            # global array, which is non-addressable under jax.distributed).
            tmpl_sd, _ = jax.eval_shape(
                lambda k: env_reset(env_cfg, dyn_params, k), env_keys[0])
            template = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), tmpl_sd)
            self.replay_states = jax.device_put(
                jax.vmap(lambda _: init_replay_state(template))(
                    jnp.arange(ppo_cfg.num_envs)), bsh)
            replay_sh = bsh
        else:
            self.replay_states = None
            replay_sh = rsh  # empty pytree; spec is inert
        self._shardings = (rsh, bsh, bsh, rsh, rsh, replay_sh, rsh)
        self._build_iter_fn()
        # Collision shaping coefficients.  The training CLI passes the
        # --quads_*_reward flags here (config.base_rew_coeff_from_args,
        # reference env_wrappers/quad_utils.py:74-77); direct construction
        # defaults to the 8-drone mix baseline's values.
        self.base_rew_coeff = dict(base_rew_coeff) if base_rew_coeff else dict(
            quadcol_bin=5.0, quadcol_bin_smooth_max=10.0, quadcol_bin_obst=5.0)

    def _build_iter_fn(self):
        self._iter_fn = jax.jit(
            functools.partial(train_iteration, self.env_cfg, self.dyn_params,
                              self.model, self.ppo_cfg),
            in_shardings=self._shardings,
            donate_argnums=(0, 1, 2, 5, 6),
        )
        self._stats_fn = None

    def episode_stats(self, infos) -> dict:
        """Aggregate rollout episode stats multi-host-safely: jit-reduce the
        (env-sharded) info pytree to replicated scalars on device, then
        convert host-side.  Every process must call this (the reduction is a
        collective); only rank 0 typically logs the result."""
        from quadswarm_tpu.utils.metrics import episode_stat_sums, stats_from_sums
        if self._stats_fn is None:
            self._stats_fn = jax.jit(
                episode_stat_sums,
                out_shardings=replicated_sharding(self.mesh))
        return stats_from_sums(jax.device_get(self._stats_fn(infos)))

    def set_ppo_cfg(self, ppo_cfg: PPOConfig) -> None:
        """Swap trainer hyperparameters (e.g. a PBT-mutated gamma).  The
        config is static under jit, so the iteration program is rebuilt —
        a recompile on the next iteration, not a silent no-op."""
        self.ppo_cfg = ppo_cfg
        self._build_iter_fn()

    def current_rew_coeff(self) -> RewardCoeffs:
        """Reward-shaping + linear annealing (reward_shaping.py:110-118):
        annealed coefficients ramp linearly from 0 to their final value over
        anneal_env_steps."""
        coeffs = dict(self.base_rew_coeff)
        for name, (final, steps) in self.anneal_schedules.items():
            coeffs[name] = min(final * self.env_steps / max(steps, 1), final)
        return RewardCoeffs(**coeffs)

    def iteration(self):
        self.key, k = jax.random.split(self.key)
        rew_coeff = jax.tree.map(
            lambda x: jnp.asarray(x, self.env_cfg.dtype), self.current_rew_coeff())
        (self.train_state, self.env_states, self.obs, self.replay_states,
         metrics, infos, self.norm_state) = self._iter_fn(
            self.train_state, self.env_states, self.obs, k, rew_coeff,
            self.replay_states, self.norm_state)
        self.env_steps += (self.ppo_cfg.rollout * self.ppo_cfg.num_envs
                           * self.env_cfg.num_agents)
        return metrics, infos

    def train(self, total_env_steps: int, log_every: int = 10, logger=None):
        import time
        it = 0
        last_t, last_steps = time.time(), self.env_steps
        while self.env_steps < total_env_steps:
            metrics, infos = self.iteration()
            it += 1
            if it % log_every == 0:
                m = jax.tree.map(float, jax.device_get(metrics))
                now = time.time()
                # windowed SPS: the first window absorbs jit compilation,
                # later windows report steady-state throughput
                sps = (self.env_steps - last_steps) / max(now - last_t, 1e-9)
                last_t, last_steps = now, self.env_steps
                m["sps"] = sps
                m["env_steps"] = self.env_steps
                if logger is not None:
                    logger(self.env_steps, m, infos)
                else:
                    print(f"steps={self.env_steps} sps={sps:,.0f} "
                          f"loss={m['loss']:.4f} rew={m['reward_mean']:.4f}")
        return self.train_state
