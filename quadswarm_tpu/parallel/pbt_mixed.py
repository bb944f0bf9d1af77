"""Mixed-policy PBT: P policies sharing ONE env batch, assigned per agent.

Reference semantics: Sample Factory's `--pbt_mix_policies_in_one_env=True`
(runs/obstacles/pbt_quads_multi_obstacles.py:12) puts agents controlled by
different policies into the same episodes, so PBT objectives are measured
under direct interaction, and each policy's reward shaping applies to its
own agents (swarm_rl/env_wrappers/reward_shaping.py:19-44 per-policy
RewardShapingInterface).

TPU-native form:
- policy params and optimizer states are STACKED with a leading [P] axis
  (one pytree, one buffer donation, no per-policy Python objects);
- the rollout computes all P policy heads on the whole agent batch (the
  models are tiny, so P forward passes cost less than a gather of stacked
  params) and one-hot-selects each agent's assigned head;
- per-agent reward coefficients reach the env as (N,)-shaped RewardCoeffs
  leaves (reward math broadcasts elementwise), i.e.
  `coeffs_stacked[assignment]`;
- the learner is a single vmap over P of masked-PPO: every policy sees the
  same shuffled minibatches, its loss averaging only its own agents'
  samples (mask = assignment == p);
- assignments resample at episode boundaries with an on-device key.

Replacement/mutation (`pbt_round`) ranks policies by mean true_reward of
their agents at episode ends and copies [P]-slices of the stacked pytrees.

The collision experience-replay curriculum (env/replay.py) composes with the
mixed rollout exactly as in sync PPO: the reference wraps the env in
ExperienceReplayWrapper irrespective of PBT (env_wrappers/quad_utils.py:68),
so `--replay_buffer_sample_prob=0.75` — inherited by the flagship PBT CLI —
must (and does) drive `batched_replay_step` here too.

Input/return normalization (SF --normalize_input / --normalize_returns)
composes as a STACKED per-policy NormalizerState: each policy standardizes
observations with its own running stats (fed only by its agents' samples
via RunningMeanStd.update_masked), denormalizes its own value predictions,
and the normalizer slice follows the weights on PBT replacement and rides
each per-policy checkpoint's `extra` payload.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quadswarm_tpu.env.multi import EnvConfig, batched_env_step, env_reset
from quadswarm_tpu.env.reward import RewardCoeffs
from quadswarm_tpu.models.actor_critic import (
    ActorCritic, gaussian_entropy, gaussian_log_prob, sample_actions,
)
from quadswarm_tpu.parallel.normalize import (
    NormalizerState, denormalize_value, make_norm_state, normalize_obs,
)
from quadswarm_tpu.parallel.ppo import (
    PPOConfig, compute_gae, shuffled_minibatches,
)


class MixedTransition(NamedTuple):
    obs: jax.Array         # (E, N, obs)
    actions: jax.Array     # (E, N, A)
    log_prob: jax.Array    # (E, N)
    value: jax.Array       # (E, N)
    reward: jax.Array      # (E, N)
    done: jax.Array        # (E, N)
    assignment: jax.Array  # (E, N) int32 — policy id that acted


def _select_policy(outs, assignment_flat, num_policies):
    """outs: (P, EN, ...) -> (EN, ...) selecting each row's assigned head."""
    hot = jax.nn.one_hot(assignment_flat, num_policies, dtype=outs.dtype)
    return jnp.einsum("np,pn...->n...", hot, outs)


def mixed_rollout(env_cfg: EnvConfig, dyn_params: Any, model: ActorCritic,
                  ppo_cfg: PPOConfig, num_policies: int, stacked_params,
                  env_states, obs, assignment, coeff_stack: RewardCoeffs,
                  key, replay_states=None,
                  norm: NormalizerState | None = None):
    """T-step rollout of one shared env batch under P policies.

    coeff_stack leaves are (P,)-shaped; each env's rew_coeff becomes the
    (N,)-leaved gather by that env's agent assignments.

    `norm` (optional) is a STACKED per-policy NormalizerState (leading [P]
    axis): each policy head sees observations standardized with ITS OWN
    running stats, and its value predictions denormalize with its own
    return stats — the per-policy reading of SF's --normalize_input /
    --normalize_returns under --pbt_mix_policies_in_one_env.  The P-way
    normalize rides the existing all-heads vmap, so it costs one extra
    elementwise pass per head, not a gather.

    With ppo_cfg.replay_sample_prob > 0 the step runs through the collision
    experience-replay wrapper (env/replay.batched_replay_step) — the
    reference applies ExperienceReplayWrapper regardless of PBT
    (swarm_rl/env_wrappers/quad_utils.py:68), and its flagship PBT CLI
    inherits --replay_buffer_sample_prob=0.75
    (runs/obstacles/quad_obstacle_baseline.py:10).  Replayed episodes keep
    the current rew_coeff; the post-step assignment resample + coeff push
    applies to replayed and fresh episodes alike (SF resamples policy
    assignment per episode either way).
    """
    e, n = assignment.shape
    p_count = num_policies
    use_replay = ppo_cfg.replay_sample_prob > 0.0 and replay_states is not None

    def push_coeffs(env_states, assignment):
        # Non-mutated RewardCoeffs fields are scalar defaults — broadcast
        # them to (P,) so the per-agent gather works uniformly.
        per_agent = jax.tree.map(
            lambda c: jnp.broadcast_to(
                jnp.asarray(c, env_cfg.dtype), (p_count,))[assignment],
            coeff_stack)
        return env_states.replace(rew_coeff=per_agent)

    env_states = push_coeffs(env_states, assignment)

    def step_fn(carry, step_key):
        env_states, replay_states, obs, assignment = carry
        k_act, k_env, k_assign = jax.random.split(step_key, 3)
        flat_obs = obs.reshape(e * n, -1)

        def head(p, nrm):
            mean, log_std, value = model.apply(p, normalize_obs(nrm, flat_obs))
            value = denormalize_value(nrm, value.astype(jnp.float32))
            return (mean.astype(jnp.float32), log_std.astype(jnp.float32),
                    value)

        mean, log_std, value = jax.vmap(head)(stacked_params, norm)
        sel = assignment.reshape(e * n)
        mean = _select_policy(mean, sel, p_count)
        log_std = _select_policy(log_std, sel, p_count)
        value = _select_policy(value.reshape(p_count, e * n), sel, p_count)
        actions = sample_actions(k_act, mean, log_std)
        log_prob = gaussian_log_prob(mean, log_std, actions)
        actions_e = actions.reshape(e, n, -1)
        env_keys = jax.random.split(k_env, e)
        if use_replay:
            from quadswarm_tpu.env.replay import batched_replay_step
            new_states, replay_states, next_obs, rew, dones, info = \
                batched_replay_step(env_cfg, dyn_params,
                                    ppo_cfg.replay_sample_prob, env_states,
                                    replay_states, actions_e, env_keys)
        else:
            new_states, next_obs, rew, dones, info = batched_env_step(
                env_cfg, dyn_params, env_states, actions_e, env_keys)
        t = MixedTransition(obs=obs, actions=actions_e,
                            log_prob=log_prob.reshape(e, n),
                            value=value.reshape(e, n),
                            reward=jnp.clip(rew, -ppo_cfg.reward_clip,
                                            ppo_cfg.reward_clip),
                            done=dones, assignment=assignment)
        # Resample assignments for envs that just finished an episode
        done_env = jnp.any(dones, axis=-1)
        fresh = jax.random.randint(k_assign, (e, n), 0, p_count)
        assignment = jnp.where(done_env[:, None], fresh, assignment)
        new_states = push_coeffs(new_states, assignment)
        return (new_states, replay_states, next_obs, assignment), (t, info)

    keys = jax.random.split(key, ppo_cfg.rollout)
    (env_states, replay_states, obs, assignment), (traj, infos) = jax.lax.scan(
        step_fn, (env_states, replay_states, obs, assignment), keys)
    flat_obs = obs.reshape(e * n, -1)
    values = jax.vmap(
        lambda p, nrm: denormalize_value(
            nrm, model.apply(p, normalize_obs(nrm, flat_obs))[2].astype(
                jnp.float32)))(stacked_params, norm)
    last_value = _select_policy(values.reshape(p_count, e * n),
                                assignment.reshape(e * n), p_count)
    return (env_states, replay_states, obs, assignment, traj,
            last_value.reshape(e, n), infos)


def masked_ppo_loss(model: ActorCritic, ppo_cfg: PPOConfig, params, batch,
                    mask, norm: NormalizerState | None = None):
    """PPO loss averaged over this policy's samples only (mask in {0,1}).

    `norm` is THIS policy's normalizer slice: obs standardize with its
    stats; with return normalization the critic learns in normalized
    return space (targets + clip anchor moved there, as in ppo.ppo_loss)."""
    obs, actions, old_log_prob, old_value, advantages, returns = batch
    mean, log_std, value = model.apply(params, normalize_obs(norm, obs))
    mean = mean.astype(jnp.float32)
    log_std = log_std.astype(jnp.float32)
    value = value.astype(jnp.float32)
    if norm is not None and norm.ret is not None:
        returns = norm.ret.normalize(returns, clip=None)
        old_value = norm.ret.normalize(old_value, clip=None)
    log_prob = gaussian_log_prob(mean, log_std, actions)
    # Clamp the log-ratio: out-of-mask samples belong to OTHER policies, and
    # once policies diverge log_prob - old_log_prob can overflow exp to inf;
    # inf * mask(0) = NaN would poison the summed loss for every policy.
    ratio = jnp.exp(jnp.clip(log_prob - old_log_prob, -20.0, 20.0))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    madv = advantages * mask
    mmean = jnp.sum(madv) / denom
    mstd = jnp.sqrt(jnp.sum(mask * (advantages - mmean) ** 2) / denom)
    adv = (advantages - mmean) / (mstd + 1e-8)
    clip = ppo_cfg.ppo_clip_ratio
    pg = -jnp.minimum(ratio * adv,
                      jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv)
    v_clipped = old_value + jnp.clip(value - old_value,
                                     -ppo_cfg.ppo_clip_value,
                                     ppo_cfg.ppo_clip_value)
    v_err = jnp.maximum((value - returns) ** 2, (v_clipped - returns) ** 2)
    entropy = gaussian_entropy(log_std)
    per_sample = (pg + 0.5 * ppo_cfg.value_loss_coeff * v_err
                  - (ppo_cfg.exploration_loss_coeff
                     + ppo_cfg.max_entropy_coeff) * entropy)
    loss = jnp.sum(per_sample * mask) / denom
    return loss


def mixed_train_iteration(env_cfg: EnvConfig, dyn_params: Any,
                          model: ActorCritic, ppo_cfg: PPOConfig,
                          num_policies: int, tx, stacked_params,
                          stacked_opt, env_states, obs, assignment,
                          replay_states, norm, coeff_stack: RewardCoeffs,
                          key):
    """One iteration: shared rollout, then a vmapped masked update per
    policy (same minibatch permutation for every policy).  `norm` is the
    stacked per-policy NormalizerState (or None): each policy's stats fold
    in only ITS agents' fresh rollout samples (update_masked), before SGD,
    mirroring ppo.train_iteration's learner-side update."""
    k_roll, k_perm = jax.random.split(key)
    (env_states, replay_states, obs, assignment, traj, last_value,
     infos) = mixed_rollout(
        env_cfg, dyn_params, model, ppo_cfg, num_policies, stacked_params,
        env_states, obs, assignment, coeff_stack, k_roll,
        replay_states=replay_states, norm=norm)
    advantages, returns = compute_gae(traj, last_value, ppo_cfg.gamma,
                                      ppo_cfg.gae_lambda)

    pids = jnp.arange(num_policies)
    if norm is not None and (norm.obs is not None or norm.ret is not None):
        assign_flat = traj.assignment.reshape(-1)
        if norm.obs is not None:
            obs_flat = traj.obs.reshape(-1, traj.obs.shape[-1])
            norm = norm.replace(obs=jax.vmap(
                lambda st, pid: st.update_masked(obs_flat, assign_flat == pid)
            )(norm.obs, pids))
        if norm.ret is not None:
            ret_flat = returns.reshape(-1)
            norm = norm.replace(ret=jax.vmap(
                lambda st, pid: st.update_masked(ret_flat, assign_flat == pid)
            )(norm.ret, pids))

    t_dim, e_dim, n_dim = traj.reward.shape
    tree = (traj.obs, traj.actions, traj.log_prob, traj.value,
            advantages, returns)
    batched, assign_mb = shuffled_minibatches(
        (tree, traj.assignment), (t_dim, e_dim, n_dim),
        ppo_cfg.batch_size, k_perm,
        groups=max(ppo_cfg.sgd_shuffle_groups, 1))

    def update_policy(pid, params, opt_state, nrm):
        def minibatch(carry, mb):
            params, opt_state = carry
            data, assign = mb
            mask = (assign == pid).astype(data[0].dtype)
            loss, grads = jax.value_and_grad(
                lambda p: masked_ppo_loss(model, ppo_cfg, p, data, mask,
                                          norm=nrm)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), (batched, assign_mb))
        return params, opt_state, losses[-1]

    stacked_params, stacked_opt, losses = jax.vmap(update_policy)(
        pids, stacked_params, stacked_opt, norm)
    metrics = {"loss": losses, "reward_mean": jnp.mean(traj.reward)}
    # Per-policy episode objective: mean true_reward of a policy's agents at
    # episode ends this rollout (reward_shaping.py:79-86 true_reward)
    done = infos["episode_done"]                      # (T, E)
    tr = infos["true_reward"]                         # (T, E, N)
    hot = jax.nn.one_hot(traj.assignment, num_policies)   # (T, E, N, P)
    w = done[:, :, None, None] * hot
    obj = (jnp.einsum("tenp,ten->p", w, tr)
           / jnp.maximum(jnp.einsum("tenp->p", w), 1.0))
    metrics["pbt/objective"] = obj
    metrics["pbt/episodes"] = jnp.einsum("tenp->p", w)
    return (stacked_params, stacked_opt, env_states, obs, assignment,
            replay_states, norm, metrics, infos)


class MixedPBTRunner:
    """P policies in one env batch; periodic rank-replace-mutate."""

    def __init__(self, env_cfg: EnvConfig, ppo_cfg: PPOConfig,
                 model: ActorCritic, dyn_params: Any, pbt_cfg,
                 seed: int = 0, exp_dir: str = "train_dir/pbt_mixed",
                 base_rew_coeff: dict | None = None, mesh=None):
        from quadswarm_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated_sharding,
        )
        self.env_cfg, self.ppo_cfg, self.model = env_cfg, ppo_cfg, model
        self.dyn_params, self.pbt_cfg, self.exp_dir = dyn_params, pbt_cfg, exp_dir
        self.rng = np.random.default_rng(seed)
        p_count = pbt_cfg.num_policies
        self.num_policies = p_count
        if mesh is None:
            # Largest device count that divides the shared env batch: the
            # stacked-P learner replicates over the mesh, the env batch
            # shards (TPU form of the reference's 4-GPU PBT run,
            # pbt_quads_multi_obstacles.py:14-19).
            devs = jax.devices()
            n_dev = len(devs)
            while ppo_cfg.num_envs % n_dev != 0:
                n_dev -= 1
            mesh = make_mesh(devs[:n_dev])
        self.mesh = mesh
        bsh = batch_sharding(mesh)
        rsh = replicated_sharding(mesh)

        key = jax.random.PRNGKey(seed)
        self.key, k_model, k_env, k_assign = jax.random.split(key, 4)
        # flatten: clip+adam run on one concatenated vector per policy
        # instead of ~40 per-leaf kernels (see ppo.make_train_state).
        self.tx = optax.flatten(optax.chain(
            optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
            optax.adam(ppo_cfg.learning_rate)))
        init_keys = jax.random.split(k_model, p_count)
        obs_dim = env_cfg.obs_dim
        self.params = jax.device_put(jax.vmap(
            lambda k: model.init(k, jnp.zeros((1, obs_dim))))(init_keys), rsh)
        self.opt_state = jax.device_put(
            jax.vmap(self.tx.init)(self.params), rsh)

        env_keys = jax.random.split(k_env, ppo_cfg.num_envs)
        self.env_states, self.obs = jax.jit(
            jax.vmap(lambda k: env_reset(env_cfg, dyn_params, k)),
            out_shardings=bsh)(env_keys)
        self.assignment = jax.device_put(jax.random.randint(
            k_assign, (ppo_cfg.num_envs, env_cfg.num_agents), 0, p_count), bsh)
        if ppo_cfg.replay_sample_prob > 0.0:
            # Collision experience replay composes with mixed PBT: the
            # reference wraps the env irrespective of PBT
            # (env_wrappers/quad_utils.py:68) and its flagship PBT CLI sets
            # --replay_buffer_sample_prob=0.75.  Same zero-template pattern
            # as ppo.Trainer (ring slots are never read before written).
            from quadswarm_tpu.env.replay import init_replay_state
            tmpl_sd, _ = jax.eval_shape(
                lambda k: env_reset(env_cfg, dyn_params, k), env_keys[0])
            template = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), tmpl_sd)
            # Mixed PBT runs with per-agent (N,)-shaped rew_coeff leaves
            # (push_coeffs), so the ring template must match that shape.
            template = template.replace(rew_coeff=jax.tree.map(
                lambda c: jnp.zeros((env_cfg.num_agents,), c.dtype),
                template.rew_coeff))
            self.replay_states = jax.device_put(
                jax.vmap(lambda _: init_replay_state(template))(
                    jnp.arange(ppo_cfg.num_envs)), bsh)
            replay_sh = bsh
        else:
            self.replay_states = None
            replay_sh = rsh  # empty pytree; spec is inert
        if ppo_cfg.normalize_input or ppo_cfg.normalize_returns:
            # Per-policy normalizers: one stacked [P] RunningMeanStd set,
            # each policy's stats fed only by its own agents' samples.
            self.norm_state = jax.device_put(jax.vmap(
                lambda _: make_norm_state(ppo_cfg.normalize_input,
                                          ppo_cfg.normalize_returns,
                                          env_cfg.obs_dim))(
                jnp.arange(p_count)), rsh)
        else:
            self.norm_state = None
        base = dict(base_rew_coeff) if base_rew_coeff else dict(
            quadcol_bin=5.0, quadcol_bin_smooth_max=10.0, quadcol_bin_obst=5.0)
        self.coeffs = [dict(base) for _ in range(p_count)]
        self.env_steps = 0
        self.objective_hist = [[] for _ in range(p_count)]
        self._iter = jax.jit(
            functools.partial(mixed_train_iteration, env_cfg, dyn_params,
                              model, ppo_cfg, p_count, self.tx),
            in_shardings=(rsh, rsh, bsh, bsh, bsh, replay_sh, rsh, rsh, rsh),
            donate_argnums=(0, 1, 2, 3, 4, 5, 6))

    def _coeff_stack(self) -> RewardCoeffs:
        stacked = {k: jnp.asarray([c.get(k, 0.0) for c in self.coeffs],
                                  self.env_cfg.dtype)
                   for k in ("quadcol_bin", "quadcol_bin_smooth_max",
                             "quadcol_bin_obst")}
        return RewardCoeffs(**stacked)

    def iteration(self):
        self.key, k = jax.random.split(self.key)
        (self.params, self.opt_state, self.env_states, self.obs,
         self.assignment, self.replay_states, self.norm_state, metrics,
         infos) = self._iter(
            self.params, self.opt_state, self.env_states, self.obs,
            self.assignment, self.replay_states, self.norm_state,
            self._coeff_stack(), k)
        self.env_steps += (self.ppo_cfg.rollout * self.ppo_cfg.num_envs
                           * self.env_cfg.num_agents)
        obj = np.asarray(jax.device_get(metrics["pbt/objective"]))
        eps = np.asarray(jax.device_get(metrics["pbt/episodes"]))
        for p in range(self.num_policies):
            if eps[p] > 0:
                self.objective_hist[p].append(float(obj[p]))
        return metrics, infos

    def pbt_round(self):
        """Rank by recent objective; bottom fraction adopts a top policy's
        params/opt slice with mutated reward shaping (pbt.py semantics over
        stacked pytrees)."""
        objectives = np.array([
            np.mean(h[-20:]) if h else -np.inf for h in self.objective_hist])
        order = np.argsort(-objectives)
        k = max(int(round(self.pbt_cfg.replace_fraction
                          * self.num_policies)), 1)
        top, bottom = order[:k], order[-k:]
        for b in bottom:
            t = int(self.rng.choice(top))
            if t == b or not np.isfinite(objectives[t]):
                continue
            gap = objectives[t] - objectives[b]
            threshold = max(
                abs(objectives[t]) * self.pbt_cfg.replace_reward_gap,
                getattr(self.pbt_cfg, "replace_reward_gap_absolute", 0.0))
            if gap <= threshold:
                continue
            copy_slice = lambda x: x.at[b].set(x[t])
            self.params = jax.tree.map(copy_slice, self.params)
            self.opt_state = jax.tree.map(
                lambda x: copy_slice(x) if hasattr(x, "at") else x,
                self.opt_state)
            if self.norm_state is not None:
                # the adoptee's normalizer follows the weights it adopted
                # (a policy's params are only meaningful under its stats)
                self.norm_state = jax.tree.map(copy_slice, self.norm_state)
            mutated = dict(self.coeffs[t])
            for name in mutated:
                if self.rng.random() < self.pbt_cfg.mutation_rate:
                    lo, hi = self.pbt_cfg.perturb_range
                    mutated[name] = float(mutated[name]) * self.rng.uniform(lo, hi)
            self.coeffs[b] = mutated
            self.objective_hist[b] = []

    # --- checkpointing ----------------------------------------------------
    # Each policy's slice of the stacked pytrees is written as a standard
    # per-policy checkpoint (checkpoint_p{i}/checkpoint_*.msgpack), so
    # enjoy/sim2real load mixed-PBT policies exactly like single-policy runs;
    # runner-level state (coeffs, objective history) goes to pbt_state.json.

    def save(self, train_dir: str, experiment: str, keep: int = 3) -> None:
        import json
        import os
        from types import SimpleNamespace

        from quadswarm_tpu.utils.checkpoint import (
            checkpoint_dir, save_checkpoint,
        )
        params_h, opt_h = jax.device_get((self.params, self.opt_state))
        norm_h = (jax.device_get(self.norm_state)
                  if self.norm_state is not None else None)
        for p in range(self.num_policies):
            st = SimpleNamespace(
                params=jax.tree.map(lambda x: x[p], params_h),
                opt_state=jax.tree.map(lambda x: x[p], opt_h),
                step=0)
            # per-policy normalizer slice rides the `extra` payload, so
            # enjoy/sim2real load mixed-PBT policies exactly like
            # single-policy checkpoints (train.py resume path)
            extra = (jax.tree.map(lambda x: x[p], norm_h)
                     if norm_h is not None else None)
            save_checkpoint(checkpoint_dir(train_dir, experiment, p), st,
                            self.env_steps, keep=keep, extra=extra)
        meta = {"coeffs": self.coeffs, "env_steps": self.env_steps,
                "objective_hist": [h[-50:] for h in self.objective_hist]}
        with open(os.path.join(train_dir, experiment, "pbt_state.json"),
                  "w") as f:
            json.dump(meta, f)

    def restore(self, train_dir: str, experiment: str) -> bool:
        """Load the latest per-policy checkpoints (all P must exist)."""
        import json
        import os

        from flax import serialization

        from quadswarm_tpu.utils.checkpoint import (
            checkpoint_dir, latest_checkpoint, load_checkpoint,
        )
        paths = [latest_checkpoint(checkpoint_dir(train_dir, experiment, p))
                 for p in range(self.num_policies)]
        if any(pt is None for pt in paths):
            return False
        params_h, opt_h = jax.device_get((self.params, self.opt_state))
        norm_h = (jax.device_get(self.norm_state)
                  if self.norm_state is not None else None)
        for p, path in enumerate(paths):
            payload = load_checkpoint(path)
            tmpl_p = jax.tree.map(lambda x: x[p], params_h)
            tmpl_o = jax.tree.map(lambda x: x[p], opt_h)
            sp = serialization.from_state_dict(tmpl_p, payload["params"])
            so = serialization.from_state_dict(tmpl_o, payload["opt_state"])
            self.params = jax.tree.map(
                lambda full, s: full.at[p].set(jnp.asarray(s)),
                self.params, sp)
            self.opt_state = jax.tree.map(
                lambda full, s: full.at[p].set(jnp.asarray(s)),
                self.opt_state, so)
            if norm_h is not None and "extra" in payload:
                tmpl_n = jax.tree.map(lambda x: x[p], norm_h)
                sn = serialization.from_state_dict(tmpl_n, payload["extra"])
                self.norm_state = jax.tree.map(
                    lambda full, s: full.at[p].set(jnp.asarray(s)),
                    self.norm_state, sn)
            self.env_steps = int(payload["env_steps"])
        meta_path = os.path.join(train_dir, experiment, "pbt_state.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.coeffs = [dict(c) for c in meta["coeffs"]]
            self.env_steps = int(meta["env_steps"])
            self.objective_hist = [list(h) for h in meta["objective_hist"]]
        return True
