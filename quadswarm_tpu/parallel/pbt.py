"""Population-Based Training orchestration.

Reference: Sample Factory PBT as configured by
runs/obstacles/pbt_quads_multi_obstacles.py:6-25 (8 policies, periodic
mutation after a warmup, weaker policies replaced by perturbed copies of
stronger ones) with the env-side hook being the reward-shaping coefficients
(reward_shaping.py:19-44 RewardShapingInterface).

Here each policy is a Trainer over its own shard of envs; ranking uses the
env-computed `true_reward` (episode rewraw_main + 1000 * rewraw_quadcol).
Mutation perturbs the reward-shaping coefficients; replacement copies model
and optimizer state.  All policies share one jitted program (identical
shapes), so a population of 8 costs one compile.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import numpy as np

from quadswarm_tpu.parallel.ppo import Trainer
from quadswarm_tpu.utils.checkpoint import save_checkpoint
from quadswarm_tpu.utils.metrics import MetricLogger

MUTABLE_COEFFS = ("quadcol_bin", "quadcol_bin_smooth_max", "quadcol_bin_obst")


@dataclass
class PBTConfig:
    num_policies: int = 8
    period_env_steps: int = 5_000_000       # --pbt_period_env_steps
    start_mutation: int = 20_000_000        # --pbt_start_mutation
    replace_fraction: float = 0.3           # --pbt_replace_fraction
    mutation_rate: float = 0.15             # --pbt_mutation_rate
    replace_reward_gap: float = 0.1         # --pbt_replace_reward_gap
    # Absolute floor on the objective gap that triggers replacement
    # (--pbt_replace_reward_gap_absolute; SF uses max(relative, absolute))
    replace_reward_gap_absolute: float = 1e-6
    perturb_range: tuple = (0.8, 1.2)       # (1/pbt_perturb_max, pbt_perturb_max)
    optimize_gamma: bool = False            # --pbt_optimize_gamma


@dataclass
class PolicySlot:
    trainer: Trainer
    recent_true_rewards: list = field(default_factory=list)
    last_pbt_steps: int = 0

    def objective(self) -> float:
        if not self.recent_true_rewards:
            return -np.inf
        return float(np.mean(self.recent_true_rewards[-100:]))


class PBTRunner:
    def __init__(self, env_cfg, ppo_cfg, model, dyn_params, pbt_cfg: PBTConfig,
                 seed: int = 0, anneal_schedules=None, exp_dir: str = "train_dir/pbt",
                 base_rew_coeff: dict | None = None, mesh=None):
        self.pbt_cfg = pbt_cfg
        self.exp_dir = exp_dir
        self.rng = np.random.default_rng(seed)
        # `mesh` (e.g. the global multi-host mesh) shards EACH policy's env
        # batch over every device — the TPU form of the reference's 4-GPU PBT
        # run (pbt_quads_multi_obstacles.py:14-19), where policies time-share
        # the whole slice instead of owning one device each.
        self.policies = [
            PolicySlot(Trainer(env_cfg, ppo_cfg, model, dyn_params,
                               seed=seed + 1000 * p,
                               anneal_schedules=anneal_schedules,
                               base_rew_coeff=base_rew_coeff, mesh=mesh))
            for p in range(pbt_cfg.num_policies)
        ]
        self.is_main = jax.process_index() == 0
        self.loggers = [MetricLogger(os.path.join(exp_dir, f"p{p}"))
                        for p in range(pbt_cfg.num_policies)] \
            if self.is_main else None

    @property
    def total_env_steps(self) -> int:
        return sum(s.trainer.env_steps for s in self.policies)

    def _record_objective(self, slot: PolicySlot, stats: dict) -> None:
        """Record this rollout's episode-mean true_reward, weighted by episode
        count (the batch mean enters the window once per finished episode,
        capped).  Uses the multi-host-safe aggregated stats rather than
        fetching the sharded info arrays."""
        if "true_reward" in stats:
            n = min(int(stats.get("num_episodes", 1)), 100)
            slot.recent_true_rewards.extend([stats["true_reward"]] * n)
            slot.recent_true_rewards = slot.recent_true_rewards[-1000:]

    def _mutate_coeffs(self, coeffs: dict) -> dict:
        out = dict(coeffs)
        for name in MUTABLE_COEFFS:
            if self.rng.random() < self.pbt_cfg.mutation_rate:
                lo, hi = self.pbt_cfg.perturb_range
                out[name] = float(out.get(name, 0.0)) * self.rng.uniform(lo, hi)
        return out

    def _pbt_round(self) -> None:
        """Rank policies; bottom fraction adopts a top policy's weights with
        mutated reward shaping (SF PBT semantics)."""
        objectives = np.array([s.objective() for s in self.policies])
        order = np.argsort(-objectives)  # best first
        k = max(int(round(self.pbt_cfg.replace_fraction * len(self.policies))), 1)
        top, bottom = order[:k], order[-k:]
        for b in bottom:
            t = int(self.rng.choice(top))
            if t == b:
                continue
            gap = objectives[t] - objectives[b]
            threshold = max(abs(objectives[t]) * self.pbt_cfg.replace_reward_gap,
                            self.pbt_cfg.replace_reward_gap_absolute)
            if not np.isfinite(gap) or gap <= threshold:
                continue
            src, dst = self.policies[t].trainer, self.policies[b].trainer
            dst.train_state = dst.train_state.replace(
                params=jax.tree.map(lambda x: x.copy(), src.train_state.params),
                opt_state=jax.tree.map(
                    lambda x: x.copy() if hasattr(x, "copy") else x,
                    src.train_state.opt_state))
            dst.base_rew_coeff = self._mutate_coeffs(src.base_rew_coeff)
            if (self.pbt_cfg.optimize_gamma
                    and self.rng.random() < self.pbt_cfg.mutation_rate):
                # SF --pbt_optimize_gamma: mutate the discount by perturbing
                # the horizon 1/(1-gamma), clamped to a sane range.  gamma is
                # static under jit, so the adoptee's program is rebuilt.
                lo, hi = self.pbt_cfg.perturb_range
                horizon = 1.0 / (1.0 - src.ppo_cfg.gamma)
                gamma = 1.0 - 1.0 / max(horizon * self.rng.uniform(lo, hi), 2.0)
                gamma = float(np.clip(gamma, 0.9, 0.9995))
                dst.set_ppo_cfg(dst.ppo_cfg.replace(gamma=gamma))
            self.policies[b].recent_true_rewards = []
            print(f"PBT: policy {b} <- policy {t} "
                  f"(obj {objectives[b]:.1f} <- {objectives[t]:.1f}), "
                  f"coeffs {dst.base_rew_coeff}")

    def train(self, total_env_steps: int, log_every: int = 10) -> None:
        it = 0
        t0 = time.time()
        while self.total_env_steps < total_env_steps:
            for p, slot in enumerate(self.policies):
                metrics, infos = slot.trainer.iteration()
                # collective on every process; result identical on all ranks
                stats = slot.trainer.episode_stats(infos)
                self._record_objective(slot, stats)
                if it % log_every == 0 and self.is_main:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    m.update(stats)
                    m["pbt/objective"] = slot.objective()
                    self.loggers[p].log(slot.trainer.env_steps, m)
                steps = slot.trainer.env_steps
                if (steps >= self.pbt_cfg.start_mutation
                        and steps - slot.last_pbt_steps
                        >= self.pbt_cfg.period_env_steps):
                    slot.last_pbt_steps = steps
                    if p == len(self.policies) - 1:
                        self._pbt_round()
            it += 1
        if self.is_main:
            for p, slot in enumerate(self.policies):
                save_checkpoint(os.path.join(self.exp_dir, f"checkpoint_p{p}"),
                                slot.trainer.train_state,
                                slot.trainer.env_steps,
                                extra=slot.trainer.norm_state)
