"""Episode-metrics aggregation + logging sinks.

The env emits fixed-shape info pytrees every tick with an `episode_done`
flag; this module masks and averages them host-side, reconstructing the
reference's scenario-prefixed stat names (quadrotor_multi.py:644-718) from
the numeric scenario mode, and writes to TensorBoard (via torch, already in
the image) and/or JSONL.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from quadswarm_tpu.env.scenarios import MODES

_PER_AGENT_KEYS = {"distance_to_goal_1s", "distance_to_goal_3s",
                   "distance_to_goal_5s", "true_reward"}
_SCENARIO_PREFIXED = {
    "num_collisions_after_settle": "num_collisions",
    "num_collisions_final_5_s": "num_collisions_final_5_s",
    "distance_to_goal_1s": "distance_to_goal_1s",
    "distance_to_goal_3s": "distance_to_goal_3s",
    "distance_to_goal_5s": "distance_to_goal_5s",
    "num_collisions_obst_quad": "num_collisions_obst",
    "metric/agent_success_rate": "agent_success_rate",
    "metric/agent_deadlock_rate": "agent_deadlock_rate",
    "metric/agent_col_rate": "agent_col_rate",
    "metric/agent_neighbor_col_rate": "agent_neighbor_col_rate",
    "metric/agent_obst_col_rate": "agent_obst_col_rate",
}


def episode_stat_sums(infos) -> dict:
    """Jittable episode-stat reduction: masked sums + per-mode one-hot sums.

    Multi-host-safe replacement for `device_get(infos)` +
    `aggregate_episode_stats`: rollout infos have their env axis sharded over
    the global mesh, which is non-addressable under multi-process
    `jax.distributed` — so the reduction runs ON DEVICE (XLA inserts the
    cross-host psum) and only fully-replicated scalars / (num_modes,) vectors
    reach the host.  `stats_from_sums` turns the result into the same dict
    `aggregate_episode_stats` produces.

    Replaces the cross-worker stat aggregation Sample Factory did behind
    `run_rl` (SURVEY.md §2.2; /root/reference/swarm_rl/train.py:32).
    """
    import jax
    import jax.numpy as jnp

    done = infos["episode_done"].astype(jnp.float32)          # [T, E]
    modes = infos["scenario_mode"].astype(jnp.int32)          # [T, E]
    onehot = jax.nn.one_hot(modes, len(MODES), dtype=jnp.float32)
    onehot = onehot * done[..., None]                         # [T, E, M]
    sums: dict = {"_count": jnp.sum(done),
                  "_mode_count": jnp.sum(onehot, axis=(0, 1))}
    for key, val in infos.items():
        if key in ("episode_done", "scenario_mode") or key.startswith("rewards/"):
            continue
        v = val.astype(jnp.float32)
        if v.ndim == done.ndim + 1:                           # per-agent
            v = v.mean(axis=-1)
        sums[key] = jnp.sum(v * done)
        if key in _SCENARIO_PREFIXED:
            sums["_mode/" + key] = jnp.sum(v[..., None] * onehot, axis=(0, 1))
    return sums


def stats_from_sums(sums) -> dict[str, float]:
    """Host-side: turn `episode_stat_sums` output (fetched to numpy) into the
    flat stat dict, reconstructing the scenario-prefixed copies."""
    count = float(sums["_count"])
    if count == 0:
        return {}
    mode_count = np.asarray(sums["_mode_count"])
    out: dict[str, float] = {}
    for key, val in sums.items():
        if key.startswith("_"):
            continue
        out[key] = float(val) / count
        base = _SCENARIO_PREFIXED.get(key)
        if base is not None:
            mode_sums = np.asarray(sums["_mode/" + key])
            for mode_id in np.nonzero(mode_count > 0)[0]:
                out[f"{MODES[int(mode_id)]}/{base}"] = float(
                    mode_sums[mode_id] / mode_count[mode_id])
    out["num_episodes"] = count
    return out


def aggregate_episode_stats(infos) -> dict[str, float]:
    """Average episode stats over all (t, env) entries where episode_done.

    `infos` is the host-fetched pytree of stacked rollout infos with leading
    dims [T, E] (scalars per env) or [T, E, N] (per-agent).
    """
    infos = {k: np.asarray(v) for k, v in infos.items()}
    done = infos["episode_done"].astype(bool)          # [T, E]
    out: dict[str, float] = {}
    if not done.any():
        return out
    modes = infos["scenario_mode"][done]               # [K]
    for key, val in infos.items():
        if key in ("episode_done", "scenario_mode") or key.startswith("rewards/"):
            continue
        if val.ndim == done.ndim + 1:                  # per-agent -> mean over N
            ep_vals = val[done].mean(axis=-1)
        else:
            ep_vals = val[done]
        out[key] = float(np.mean(ep_vals))
        base = _SCENARIO_PREFIXED.get(key)
        if base is not None:
            for mode_id in np.unique(modes):
                sel = modes == mode_id
                out[f"{MODES[int(mode_id)]}/{base}"] = float(np.mean(ep_vals[sel]))
    out["num_episodes"] = float(done.sum())
    return out


class MetricLogger:
    """TensorBoard (torch SummaryWriter) + JSONL sink, like the reference's
    TensorBoard/WandB outputs (README.md:69-88)."""

    def __init__(self, exp_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_kwargs: dict | None = None):
        os.makedirs(exp_dir, exist_ok=True)
        self.jsonl = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except Exception:
                self.tb = None
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(dir=exp_dir, **(wandb_kwargs or {}))
            except Exception:
                self.wandb = None
        self.t0 = time.time()

    def log(self, env_steps: int, scalars: dict[str, float]) -> None:
        rec = {"env_steps": env_steps, "wall_time": time.time() - self.t0}
        rec.update(scalars)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, env_steps)
        if self.wandb is not None:
            self.wandb.log(scalars, step=env_steps)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
