"""APPO: asynchronous PPO with policy lag and V-trace correction.

Reference: Sample Factory's APPO — the trainer swarm_rl delegates to via
`run_rl(cfg)` (swarm_rl/train.py:32; SURVEY.md §2.2/§3.1).  SF hides rollout
latency with actor processes that sample using *stale* policy weights (the
learner broadcasts new versions asynchronously) and optionally corrects the
resulting off-policy-ness with V-trace (SF `--with_vtrace`).

TPU-native reading: the actor/learner split becomes TWO jitted programs —
`rollout` (env scan + inference under behavior params) and `learn` (V-trace /
GAE + minibatch SGD).  With `policy_lag=L`, the rollout dispatched at
iteration i uses the params produced at iteration i-1-L(+1 queue semantics),
so the rollout program has no data dependency on the immediately preceding
learner program.  `policy_lag=0` reduces exactly to synchronous PPO.

MEASURED (v5e single chip, bench.py --train --async_rl, round 4): a single
TPU core executes one program at a time, so the two programs do NOT overlap
on one chip — APPO lag=1 measured 1.82M agent-steps/s vs 2.15M for the
fused sync Trainer (the gap is the learner-side value/log-prob recompute
over the stale trajectory, which sync PPO gets for free from the rollout).
On one chip APPO is therefore a SEMANTIC choice (SF-style staleness
tolerance + V-trace), not a throughput one.

Multi-chip split (round 5): `split_mesh=(R, L)` places the rollout program
(env batch, behavior params) on the first R devices and the learner program
(train state, SGD) on the last L, with the trajectory shipped between the
submeshes each iteration and fresh params shipped back into the behavior
queue.  The disjoint PLACEMENT is validated on the 8-virtual-device CPU
mesh (tests/test_distributed.py::test_appo_disjoint_submesh_placement:
rollout outputs live only on the rollout submesh, learner state only on
the learner submesh, training stays green).  Wall-clock overlap of the two
programs — the latency-hiding payoff, requiring async dispatch across
REAL disjoint chips — remains unmeasured: no multi-chip hardware is
available to this build, and virtual CPU devices share one core, so any
wall-time number would be fiction.  Treat overlap as an untested
hypothesis with the placement scaffolding in place.

V-trace (Espeholt et al., IMPALA 2018): with clipped importance weights
rho_t = min(pi/mu, rho_clip), c_t = min(pi/mu, c_clip),
    vs_t - V_t = delta_t + gamma * c_t * (vs_{t+1} - V_{t+1}),
    delta_t    = rho_t * (r_t + gamma * V_{t+1} - V_t),
policy-gradient advantage rho_t * (r_t + gamma * vs_{t+1} - V_t).  With
rho=c=1 and on-policy data this reduces to GAE(lambda=1) — tested against
`compute_gae` in tests/test_training.py.
"""
from __future__ import annotations

import functools
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp

from quadswarm_tpu.models.actor_critic import apply_fused, gaussian_log_prob
from quadswarm_tpu.parallel.mesh import batch_sharding, replicated_sharding
from quadswarm_tpu.parallel.ppo import (
    PPOConfig, Trainer, Transition, collect_rollout, compute_gae, sgd_epochs,
)


def vtrace_advantages(ratio: jax.Array, reward: jax.Array, value: jax.Array,
                      done: jax.Array, last_value: jax.Array, gamma: float,
                      rho_clip: float = 1.0, c_clip: float = 1.0):
    """V-trace targets/advantages over a [T, E, N] trajectory.

    `ratio` = exp(log pi_learner - log mu_behavior) per step; `value` are the
    LEARNER's value predictions for the visited states; `last_value` the
    learner bootstrap for the state after the final step.  Episode boundaries
    (`done`) cut the recursion and the bootstrap exactly like in GAE.
    """
    dtype = value.dtype
    rho = jnp.minimum(ratio, rho_clip).astype(dtype)
    c = jnp.minimum(ratio, c_clip).astype(dtype)
    not_done = 1.0 - done.astype(dtype)
    next_values = jnp.concatenate([value[1:], last_value[None]], axis=0)
    delta = rho * (reward + gamma * next_values * not_done - value)

    def scan_fn(acc, x):
        delta_t, c_t, nd_t = x
        acc = delta_t + gamma * c_t * nd_t * acc
        return acc, acc

    _, vs_minus_v = jax.lax.scan(scan_fn, jnp.zeros_like(last_value),
                                 (delta, c, not_done), reverse=True)
    vs = vs_minus_v + value
    vs_next = jnp.concatenate([vs[1:], last_value[None]], axis=0)
    pg_adv = rho * (reward + gamma * vs_next * not_done - value)
    return pg_adv, vs


def appo_learn(model, ppo_cfg: PPOConfig, train_state, traj: Transition,
               last_obs: jax.Array, key: jax.Array, norm_state=None):
    """Learner half: recompute values (and log-probs, for V-trace) under the
    CURRENT params over the stale trajectory, build advantages/targets, run
    minibatch SGD (shared with sync PPO)."""
    from quadswarm_tpu.parallel.normalize import (
        denormalize_value, normalize_obs,
    )
    t_dim, e_dim, n_dim = traj.reward.shape

    def learner_forward(obs):
        obs_flat = normalize_obs(norm_state, obs.reshape(-1, obs.shape[-1]))
        mean, log_std, value = apply_fused(model, train_state.params, obs_flat)
        # bf16-safe: V-trace/GAE math in f32; critic output denormalized
        # into reward space wherever it bootstraps (normalize.py docstring)
        return (mean.astype(jnp.float32), log_std.astype(jnp.float32),
                denormalize_value(norm_state, value.astype(jnp.float32)))

    # The value/log-prob recompute over the stale trajectory runs as a scan
    # over rollout steps (E*N rows each), NOT one forward over all T*E*N
    # rows: at baseline shapes (128 x 1024 x 8) the single-shot encoder
    # activations are (2, 1M, 6, 256) bf16 = 6 GB apiece and the program
    # exceeds v5e HBM (measured 18.06G > 15.75G).  Only the scalar value /
    # log-prob per sample leave the scan.
    def fwd_t(_, xs):
        o, a = xs
        mean, log_std, v = learner_forward(o)
        if ppo_cfg.with_vtrace:
            lp = gaussian_log_prob(
                mean, log_std, a.reshape(-1, a.shape[-1]))
            lp = lp.reshape(e_dim, n_dim)
        else:
            lp = jnp.zeros((e_dim, n_dim), jnp.float32)
        return None, (v.reshape(e_dim, n_dim), lp)

    _, (values, target_log_prob) = jax.lax.scan(
        fwd_t, None, (traj.obs, traj.actions))
    _, _, last_value_flat = learner_forward(last_obs)
    last_value = last_value_flat.reshape(e_dim, n_dim)

    if ppo_cfg.with_vtrace:
        ratio = jnp.exp(jax.lax.stop_gradient(target_log_prob)
                        - traj.log_prob)
        advantages, returns = vtrace_advantages(
            ratio, traj.reward, jax.lax.stop_gradient(values), traj.done,
            jax.lax.stop_gradient(last_value), ppo_cfg.gamma,
            ppo_cfg.vtrace_rho, ppo_cfg.vtrace_c)
    else:
        # GAE under the learner's value function (SF recomputes values on the
        # learner as well); the PPO ratio still corrects the policy lag.
        learner_traj = traj._replace(value=jax.lax.stop_gradient(values))
        advantages, returns = compute_gae(
            learner_traj, jax.lax.stop_gradient(last_value), ppo_cfg.gamma,
            ppo_cfg.gae_lambda)

    if norm_state is not None and norm_state.obs is not None:
        norm_state = norm_state.replace(obs=norm_state.obs.update(
            traj.obs.reshape(-1, traj.obs.shape[-1])))
    if norm_state is not None and norm_state.ret is not None:
        norm_state = norm_state.replace(ret=norm_state.ret.update(returns))
    train_state, metrics = sgd_epochs(model, ppo_cfg, train_state, traj,
                                      advantages, returns, key,
                                      norm=norm_state)
    metrics["reward_mean"] = jnp.mean(traj.reward)
    return train_state, metrics, norm_state


class APPOTrainer(Trainer):
    """Two-program asynchronous trainer (rollout | learn) with policy lag.

    `policy_lag=0` is synchronous PPO with the learner-side advantage
    computation; `policy_lag>=1` lets rollout i run independently of learner
    i-1 (APPO).  V-trace is enabled via PPOConfig.with_vtrace.
    """

    def __init__(self, env_cfg, ppo_cfg: PPOConfig, model, dyn_params: Any,
                 seed: int = 0, anneal_schedules: dict | None = None,
                 mesh=None, policy_lag: int = 1,
                 base_rew_coeff: dict | None = None,
                 split_mesh: tuple[int, int] | None = None):
        if split_mesh is not None:
            # Disjoint rollout/learner submeshes: the env batch + behavior
            # params live on the first R devices, the train state + SGD on
            # the last L.  See module docstring — placement is validated;
            # wall-clock overlap needs real multi-chip hardware.
            from quadswarm_tpu.parallel.mesh import make_mesh
            r, l = split_mesh
            devs = jax.devices()
            if r + l > len(devs):
                raise ValueError(f"split_mesh={split_mesh} needs {r + l} "
                                 f"devices, have {len(devs)}")
            if mesh is not None:
                raise ValueError("pass either mesh or split_mesh, not both")
            mesh = make_mesh(devs[:r])
            self._learn_mesh = make_mesh(devs[r:r + l])
        else:
            self._learn_mesh = None
        super().__init__(env_cfg, ppo_cfg, model, dyn_params, seed=seed,
                         anneal_schedules=anneal_schedules, mesh=mesh,
                         base_rew_coeff=base_rew_coeff)
        self.policy_lag = policy_lag
        if self._learn_mesh is not None:
            # learner-resident state moves to the learner submesh
            lrsh = replicated_sharding(self._learn_mesh)
            self.train_state = jax.device_put(self.train_state, lrsh)
            self.norm_state = jax.device_put(self.norm_state, lrsh)
        self._build_appo_fns()
        # queue[0] is the behavior version for the next rollout; with lag L
        # the rollout dispatched at iteration i uses the learner output of
        # iteration i-1-L (clipped at init).  Behavior copies live on the
        # ROLLOUT submesh when split.
        self._param_queue = deque([self._behavior_copy(self.train_state.params)],
                                  maxlen=policy_lag + 1)

    def _behavior_copy(self, params):
        if self._learn_mesh is None:
            return params
        return jax.device_put(params, replicated_sharding(self.mesh))

    def set_ppo_cfg(self, ppo_cfg: PPOConfig) -> None:
        # Rebuild BOTH asynchronous programs — ppo_cfg is static in each.
        super().set_ppo_cfg(ppo_cfg)
        self._build_appo_fns()

    def _build_appo_fns(self):
        env_cfg, ppo_cfg = self.env_cfg, self.ppo_cfg
        model, dyn_params = self.model, self.dyn_params
        bsh = batch_sharding(self.mesh)
        rsh = replicated_sharding(self.mesh)
        replay_sh = bsh if self.replay_states is not None else rsh

        def rollout_fn(behavior_params, env_states, obs, key, rew_coeff,
                       replay_states, norm_state):
            # Behavior inference uses the CURRENT normalizer stats (stats
            # are not part of the lagged param queue — SF likewise shares
            # one normalizer between actors and learner).
            env_states, next_obs, replay_states, traj, _lv, infos = \
                collect_rollout(env_cfg, dyn_params, model, ppo_cfg,
                                behavior_params, env_states, obs, key,
                                rew_coeff, replay_states, norm=norm_state)
            return env_states, next_obs, replay_states, traj, infos

        # Trajectory arrays are [T, E, ...] — env batch on axis 1.  Pinning
        # the rollout OUTPUT sharding to the learner INPUT sharding guarantees
        # the ~240 MB trajectory is never resharded/copied between the two
        # programs when they share one mesh (VERDICT r2 weak #3).  With
        # split_mesh, the learner's shardings live on ITS submesh and the
        # trajectory is explicitly shipped across in iteration().
        from jax.sharding import NamedSharding, PartitionSpec
        tsh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
        self._rollout_fn = jax.jit(
            rollout_fn,
            in_shardings=(rsh, bsh, bsh, rsh, rsh, replay_sh, rsh),
            out_shardings=(bsh, bsh, replay_sh, tsh, tsh),
            donate_argnums=(1, 2, 5))
        lmesh = self._learn_mesh if self._learn_mesh is not None else self.mesh
        self._tsh_l = NamedSharding(lmesh, PartitionSpec(None, "data"))
        self._bsh_l = batch_sharding(lmesh)
        self._rsh_l = replicated_sharding(lmesh)
        # NOTE on donation: train_state is NOT donated — the behavior queue
        # aliases its params buffers across iterations.  last_obs (arg 2) is
        # self.obs, which the next rollout still needs.  The trajectory is
        # NOT donated either: it is read by every SGD minibatch and no learner
        # output matches its shape, so donating it can never alias — it only
        # produced XLA "donated buffers were not usable" warnings (the buffers
        # are freed by refcount when `traj` drops after the call regardless).
        self._learn_fn = jax.jit(
            functools.partial(appo_learn, model, ppo_cfg),
            in_shardings=(self._rsh_l, self._tsh_l, self._bsh_l,
                          self._rsh_l, self._rsh_l))

    def iteration(self):
        self.key, k_roll, k_learn = jax.random.split(self.key, 3)
        rew_coeff = jax.tree.map(
            lambda x: jnp.asarray(x, self.env_cfg.dtype),
            self.current_rew_coeff())
        behavior_params = self._param_queue[0]
        split = self._learn_mesh is not None
        # With split_mesh the normalizer is learner-resident; the rollout
        # gets a shipped copy on its own submesh (SF likewise broadcasts
        # shared normalizer stats to the actors).
        norm_r = (jax.device_put(self.norm_state,
                                 replicated_sharding(self.mesh))
                  if split else self.norm_state)
        (self.env_states, self.obs, self.replay_states, traj,
         infos) = self._rollout_fn(behavior_params, self.env_states, self.obs,
                                   k_roll, rew_coeff, self.replay_states,
                                   norm_r)
        if split:
            # Ship the trajectory + bootstrap obs to the learner submesh.
            traj = jax.device_put(traj, self._tsh_l)
            last_obs = jax.device_put(self.obs, self._bsh_l)
        else:
            last_obs = self.obs
        self.train_state, metrics, self.norm_state = self._learn_fn(
            self.train_state, traj, last_obs, k_learn, self.norm_state)
        self._param_queue.append(self._behavior_copy(self.train_state.params))
        self.env_steps += (self.ppo_cfg.rollout * self.ppo_cfg.num_envs
                           * self.env_cfg.num_agents)
        return metrics, infos
