"""Reference-shaped Python API over the functional batched env.

Reference: gym_art/quadrotor_multi/quadrotor_multi.py (QuadrotorEnvMulti,
:23-832 — gym.Env with `is_multiagent=True`, list-of-agents step API) and
swarm_rl/env_wrappers/compatibility.py (QuadEnvCompatibility:10-57 — old
4-tuple -> gymnasium 5-tuple).

The TPU framework's native interface is the pure function pair
(`env_reset`, `env_step`) over `[num_envs, num_agents, ...]` pytrees; that is
what training uses.  This module is the drop-in surface for users of the
reference: a stateful class whose `reset()` returns a list of per-agent
observations and whose `step(actions)` takes a list of per-agent actions and
returns `(obs_list, rew_list, done_list, info_list)` with
`info[i]['episode_extra_stats']` populated at episode end, auto-resetting
like quadrotor_multi.py:720-722.  Internally it is one jitted XLA program per
tick on whatever backend JAX selected (TPU/CPU).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig, env_reset, env_step
from quadswarm_tpu.env.params import make_dynamics_params
from quadswarm_tpu.env.reward import RewardCoeffs
from quadswarm_tpu.env.scenarios import MODES

try:  # spaces come from gymnasium when present; fall back to plain tuples
    from gymnasium import spaces as _spaces
except ImportError:  # pragma: no cover
    _spaces = None


def _box(low, high, shape):
    if _spaces is None:  # pragma: no cover
        return (low, high, shape)
    return _spaces.Box(low=low, high=high, shape=shape, dtype=np.float32)


class QuadrotorEnvMulti:
    """Stateful, reference-compatible swarm env (quadrotor_multi.py:23-832).

    Old-gym list API: `reset() -> [obs_i]`,
    `step([a_i]) -> ([obs_i], [rew_i], [done_i], [info_i])`.
    """

    is_multiagent = True

    def __init__(self, num_agents: int = 8, ep_time: float = 15.0,
                 room_dims=(10.0, 10.0, 10.0), obs_repr: str = "xyz_vxyz_R_omega",
                 neighbor_obs_type: str = "pos_vel", neighbor_visible_num: int = -1,
                 collision_hitbox_radius: float = 2.0,
                 collision_falloff_radius: float = 4.0,
                 use_obstacles: bool = False, obst_density: float = 0.2,
                 obst_size: float = 1.0, obst_spawn_area=(6.0, 6.0),
                 use_downwash: bool = False, quads_mode: str = "static_same_goal",
                 use_numba: bool = False,  # accepted for parity; XLA is the JIT here
                 quad: str = "Crazyflie", dynamics_change: dict | None = None,
                 dyn_sampler_1: dict | None = None,
                 sense_noise: str | None = "default",
                 render_mode: str | None = None, seed: int = 0,
                 rew_coeff: RewardCoeffs | None = None):
        del use_numba
        self.cfg = EnvConfig(
            num_agents=num_agents, ep_time=ep_time, room_dims=tuple(room_dims),
            obs_repr=obs_repr, neighbor_obs_type=neighbor_obs_type,
            neighbor_visible_num=neighbor_visible_num,
            collision_hitbox_radius=collision_hitbox_radius,
            collision_falloff_radius=collision_falloff_radius,
            use_obstacles=use_obstacles, obst_density=obst_density,
            obst_size=obst_size, obst_spawn_area=tuple(obst_spawn_area),
            use_downwash=use_downwash, quads_mode=quads_mode,
            use_sensor_noise=sense_noise is not None,
        )
        self.params = make_dynamics_params(
            quad=quad, dynamics_change=dynamics_change,
            dyn_sampler_1=dyn_sampler_1, num_agents=num_agents,
            per_drone=dyn_sampler_1 is not None, seed=seed)
        self.num_agents = num_agents
        self.render_mode = render_mode
        self.rew_coeff = rew_coeff if rew_coeff is not None else RewardCoeffs()
        self._key = jax.random.PRNGKey(seed)
        cfg, params = self.cfg, self.params
        self._reset_fn = jax.jit(
            lambda k, rc: env_reset(cfg, params, k, rew_coeff=rc))
        self._step_fn = jax.jit(
            lambda s, a, k: env_step(cfg, params, s, a, k))
        self._state = None

        self.observation_space = _box(-np.inf, np.inf, (self.cfg.obs_dim,))
        self.action_space = _box(-1.0, 1.0, (self.cfg.action_dim,))

    # ------------------------------------------------------------------ helpers
    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def seed(self, seed: int | None = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        return [seed]

    # ------------------------------------------------------------------ gym API
    def reset(self, seed: int | None = None, options: Any = None,
              obst_density=None, obst_size=None):
        """Optional obst_density/obst_size override the config for this
        episode — the hook the reference's replay wrapper uses for obstacle
        domain randomization (quadrotor_multi.py:339, reset(obst_density=..))."""
        del options
        if seed is not None:
            self.seed(seed)
        if obst_density is not None or obst_size is not None:
            cfg, params = self.cfg, self.params
            self._state, obs = jax.jit(
                lambda k, rc, d, s: env_reset(cfg, params, k, rew_coeff=rc,
                                              obst_density=d, obst_size=s)
            )(self._split(), self.rew_coeff,
              jnp.asarray(obst_density if obst_density is not None
                          else self.cfg.obst_density, self.cfg.dtype),
              jnp.asarray(obst_size if obst_size is not None
                          else self.cfg.obst_size, self.cfg.dtype))
        else:
            self._state, obs = self._reset_fn(self._split(), self.rew_coeff)
        return list(np.asarray(obs, np.float32))

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        acts = jnp.asarray(np.stack([np.asarray(a, np.float32) for a in actions]))
        self._state, obs, rew, done, info = self._step_fn(
            self._state, acts, self._split())
        obs_np = np.asarray(obs, np.float32)
        rew_np = np.asarray(rew, np.float32)
        done_np = np.asarray(done, bool)
        infos = self._build_infos(info, done_np)
        return list(obs_np), list(rew_np), list(done_np), infos

    def _build_infos(self, info: dict, done: np.ndarray) -> list[dict]:
        """Per-agent info dicts; at done, attach `episode_extra_stats` with the
        reference's metric names plus scenario-prefixed copies
        (quadrotor_multi.py:629-718)."""
        host = {k: np.asarray(v) for k, v in info.items()}
        rewards_i = {k: host[k] for k in host if k.startswith("rewards/")}
        infos: list[dict] = []
        ep_done = bool(done.any())
        scen = MODES[int(host["scenario_mode"])]
        for i in range(self.num_agents):
            d: dict[str, Any] = {"rewards": {
                k.split("/", 1)[1]: float(np.ravel(v)[i] if np.ndim(v) else v)
                for k, v in rewards_i.items()}}
            if ep_done:
                stats: dict[str, float] = {}
                for k, v in host.items():
                    if k.startswith("rewards/") or k in ("episode_done",
                                                         "scenario_mode"):
                        continue
                    val = float(np.ravel(v)[i]) if np.ndim(v) >= 1 else float(v)
                    stats[k] = val
                    stats[f"{scen}/{k}"] = val
                d["episode_extra_stats"] = stats
            infos.append(d)
        return infos

    # ------------------------------------------------------------------ render
    def render(self, views=("topdown", "chase", "global")):
        """rgb_array frame of the current state (one panel per view mode,
        quadrotor_multi.py:726-812)."""
        from quadswarm_tpu.utils.render import render_frame
        if self._state is None:
            return None
        s = self._state
        obstacles = None
        if self.cfg.use_obstacles:
            active = np.asarray(s.obst_active)
            obstacles = np.asarray(s.obst_pos)[active]
        return render_frame(
            np.asarray(s.dyn.pos), np.asarray(s.scenario.goals),
            np.asarray(s.prev_coll_ids), room_dims=self.cfg.room_dims,
            views=views, obstacles=obstacles,
            obst_size=float(np.asarray(s.obst_size)))

    def close(self):
        self._state = None


class QuadEnvCompatibility:
    """Old 4-tuple -> gymnasium 5-tuple conversion
    (swarm_rl/env_wrappers/compatibility.py:10-57).  `terminated` is False and
    `truncated` is the old done (episodes end only by time limit, matching the
    reference's time-based done at quadrotor_single.py:353)."""

    def __init__(self, env: QuadrotorEnvMulti):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, seed: int | None = None, options: Any = None):
        return self.env.reset(seed=seed, options=options), {}

    def step(self, actions):
        obs, rew, done, infos = self.env.step(actions)
        terminated = [False] * len(done)
        return obs, rew, terminated, list(done), infos


def make_quadrotor_env_multi(args) -> QuadEnvCompatibility:
    """Env factory from a parsed --quads_* namespace
    (swarm_rl/env_wrappers/quad_utils.py:20-117): hardcodes quad='Crazyflie',
    sense_noise='default' like the reference (:22-31)."""
    env = QuadrotorEnvMulti(
        num_agents=args.quads_num_agents, ep_time=args.quads_episode_duration,
        room_dims=tuple(args.quads_room_dims), obs_repr=args.quads_obs_repr,
        neighbor_obs_type=args.quads_neighbor_obs_type,
        neighbor_visible_num=args.quads_neighbor_visible_num,
        collision_hitbox_radius=args.quads_collision_hitbox_radius,
        collision_falloff_radius=args.quads_collision_falloff_radius,
        use_obstacles=args.quads_use_obstacles,
        obst_density=args.quads_obst_density, obst_size=args.quads_obst_size,
        obst_spawn_area=tuple(args.quads_obst_spawn_area),
        use_downwash=args.quads_use_downwash, quads_mode=args.quads_mode,
        quad="Crazyflie", sense_noise="default")
    return QuadEnvCompatibility(env)
