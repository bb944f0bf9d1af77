"""QuadSwarm multi-agent environment as one pure, fully-batched step function.

Reference: gym_art/quadrotor_multi/quadrotor_multi.py (QuadrotorEnvMulti) +
quadrotor_single.py (QuadrotorSingle).  The N per-drone Python objects and
their per-agent step loop (quadrotor_multi.py:416-425) become a single state
pytree with a leading agent axis; `env_step` reproduces the reference's tick
pipeline exactly (SURVEY.md §3.2):

    dynamics -> per-drone reward -> collision detection (drone/obstacle/room)
    -> collision rewards -> interaction forces -> scenario step -> obs
    -> done/metrics -> masked auto-reset

vmap over `env_step` gives thousands of independent swarm envs per chip; the
training stack shards that batch over the device mesh.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from quadswarm_tpu.env import collisions as coll
from quadswarm_tpu.env import obstacles as obst
from quadswarm_tpu.env.controls import apply_control
from quadswarm_tpu.env.downwash import apply_downwash
from quadswarm_tpu.env.dynamics import (
    DroneState, DynamicsConfig, dynamics_step, init_state,
)
from quadswarm_tpu.env.neighbors import neighbor_clip_bounds, neighbor_obs
from quadswarm_tpu.env.obs import obs_size, self_obs
from quadswarm_tpu.env.reward import RewardCoeffs, compute_reward, proximity_penalties
from quadswarm_tpu.env.scenarios import (
    MIX_MODES_MULTI, MIX_MODES_OBSTACLES, MIX_MODES_OBSTACLES_SINGLE,
    MIX_MODES_SINGLE, MODE_IDS, ScenarioConfig, ScenarioState,
    event_table_width, scenario_reset, scenario_step,
)
from quadswarm_tpu.env.sensor import SensorNoiseParams, add_noise

GRAV = 9.81


def _per_drone(params: Any) -> bool:
    """True when DynamicsParams carry a leading per-drone axis (stacked by
    DynamicsParams.stack for domain randomization)."""
    return jnp.ndim(params.mass) >= 1


def _pack_lanes() -> int:
    """Lane width of the packed pair-history state (use_pallas_pairs)."""
    from quadswarm_tpu.ops.pallas.swarm_interactions import PACK_LANES
    return PACK_LANES


@struct.dataclass
class EnvConfig:
    """Static env configuration (mirrors QuadrotorEnvMulti.__init__ kwargs +
    the QuadrotorSingle episode parameters)."""

    num_agents: int = struct.field(pytree_node=False, default=8)
    ep_time: float = struct.field(pytree_node=False, default=15.0)
    sim_freq: float = struct.field(pytree_node=False, default=200.0)
    sim_steps: int = struct.field(pytree_node=False, default=2)
    room_dims: tuple = struct.field(pytree_node=False, default=(10.0, 10.0, 10.0))
    obs_repr: str = struct.field(pytree_node=False, default="xyz_vxyz_R_omega")
    neighbor_obs_type: str = struct.field(pytree_node=False, default="pos_vel")
    neighbor_visible_num: int = struct.field(pytree_node=False, default=-1)
    collision_hitbox_radius: float = struct.field(pytree_node=False, default=2.0)
    collision_falloff_radius: float = struct.field(pytree_node=False, default=4.0)
    use_obstacles: bool = struct.field(pytree_node=False, default=False)
    obst_density: float = struct.field(pytree_node=False, default=0.2)
    obst_size: float = struct.field(pytree_node=False, default=1.0)
    obst_spawn_area: tuple = struct.field(pytree_node=False, default=(6.0, 6.0))
    # Obstacle domain randomization (--quads_domain_random +
    # --quads_obst_{density,size}_random): resample density/size per episode
    # from the reference's grids arange(min, max, 0.05 / 0.1)
    # (quad_experience_replay.py:76-87,108-120,198-204).
    obst_density_random: bool = struct.field(pytree_node=False, default=False)
    obst_density_min: float = struct.field(pytree_node=False, default=0.05)
    obst_density_max: float = struct.field(pytree_node=False, default=0.2)
    obst_size_random: bool = struct.field(pytree_node=False, default=False)
    obst_size_min: float = struct.field(pytree_node=False, default=0.3)
    obst_size_max: float = struct.field(pytree_node=False, default=0.6)
    use_downwash: bool = struct.field(pytree_node=False, default=False)
    # Large-swarm pair path: the O(N^2) drone-drone work (collision masks,
    # proximity penalties, k-nearest neighbor obs) runs in fused Pallas
    # kernels (ops/pallas/swarm_interactions.py) and the per-env pair history
    # is stored packed as (N, PACK_LANES) int32 bits instead of (N, N) bool.
    # Only the batched path (batched_env_step / batched_replay_step) uses the
    # kernels; single-env env_step falls back to XLA on the packed state.
    use_pallas_pairs: bool = struct.field(pytree_node=False, default=False)
    quads_mode: str = struct.field(pytree_node=False, default="static_same_goal")
    control_mode: str = struct.field(pytree_node=False, default="raw")
    zero_action_middle: bool = struct.field(pytree_node=False, default=True)
    init_random_state: bool = struct.field(pytree_node=False, default=False)
    use_sensor_noise: bool = struct.field(pytree_node=False, default=True)
    apply_collision_force: bool = struct.field(pytree_node=False, default=True)
    # Use the fused Pallas dynamics kernel (ops/pallas/dynamics_kernel.py) in
    # batched_env_step: all envs' drones integrate in ONE VMEM-resident kernel
    # instead of ~100 small XLA ops.  Requires shared (non-per-drone) params;
    # parity vs the XLA path is tested in tests/test_pallas_dynamics.py.
    use_pallas_dynamics: bool = struct.field(pytree_node=False, default=False)
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

    # ------------------------------------------------------------------ derived
    @property
    def dt(self) -> float:
        return 1.0 / self.sim_freq

    @property
    def control_freq(self) -> float:
        return self.sim_freq / self.sim_steps

    @property
    def control_dt(self) -> float:
        return 1.0 / self.control_freq

    @property
    def ep_len(self) -> int:
        return int(self.ep_time / (self.dt * self.sim_steps))

    @property
    def num_use_neighbor_obs(self) -> int:
        if self.neighbor_obs_type == "none":
            return 0
        if self.neighbor_visible_num == -1:
            return self.num_agents - 1
        # visible_num can exceed N-1 when a baseline config is run with a
        # smaller swarm; only N-1 neighbors exist to observe.
        return min(self.neighbor_visible_num, self.num_agents - 1)

    @property
    def room_box(self) -> tuple:
        rd = self.room_dims
        return ((-rd[0] / 2.0, -rd[1] / 2.0, 0.0), (rd[0] / 2.0, rd[1] / 2.0, rd[2]))

    @property
    def spawn_box(self) -> float:
        # quadrotor_single.py:215-218
        return 0.1 if self.use_obstacles else 2.0

    @property
    def num_obstacle_cells(self) -> int:
        return int(self.obst_spawn_area[0]) * int(self.obst_spawn_area[1])

    @property
    def obs_dim(self) -> int:
        return obs_size(self.obs_repr, self.neighbor_obs_type,
                        self.num_use_neighbor_obs, self.use_obstacles)

    @property
    def action_dim(self) -> int:
        from quadswarm_tpu.env.controls import action_dim
        return action_dim(self.control_mode)

    def dynamics_config(self, arm=None) -> DynamicsConfig:
        """arm: the fleet's arm length.  The reference TRAINING path clamps
        floor contact at the drone's arm length (quadrotor_dynamics.py:378,
        step1_numba passes self.arm — the pure-python path's 0.05 is not what
        training runs); like the collision radii, a domain-randomized fleet
        uses drone 0's arm (quadrotor_multi.py:81)."""
        ft = 0.05 if arm is None else float(np.asarray(arm).reshape(-1)[0])
        return DynamicsConfig(dt=self.dt, sim_steps=self.sim_steps,
                              room_box=self.room_box, floor_threshold=ft)

    def scenario_config(self) -> ScenarioConfig:
        return ScenarioConfig(
            num_agents=self.num_agents, control_freq=self.control_freq,
            ep_time=self.ep_time, room_dims=self.room_dims, box=self.spawn_box,
            obst_area=(int(self.obst_spawn_area[0]), int(self.obst_spawn_area[1])))

    def mode_list(self) -> tuple:
        """Mix-mode candidates (mix.py:46-57)."""
        if self.quads_mode != "mix":
            return (MODE_IDS[self.quads_mode],)
        if self.num_agents == 1:
            return MIX_MODES_OBSTACLES_SINGLE if self.use_obstacles else MIX_MODES_SINGLE
        return MIX_MODES_OBSTACLES if self.use_obstacles else MIX_MODES_MULTI

    def __hash__(self):
        return hash((self.num_agents, self.ep_time, self.sim_freq, self.sim_steps,
                     self.room_dims, self.obs_repr, self.neighbor_obs_type,
                     self.neighbor_visible_num, self.collision_hitbox_radius,
                     self.collision_falloff_radius, self.use_obstacles,
                     self.obst_density, self.obst_size, self.obst_spawn_area,
                     self.obst_density_random, self.obst_density_min,
                     self.obst_density_max, self.obst_size_random,
                     self.obst_size_min, self.obst_size_max,
                     self.use_downwash, self.use_pallas_pairs,
                     self.quads_mode, self.control_mode,
                     self.zero_action_middle, self.init_random_state,
                     self.use_sensor_noise, self.apply_collision_force,
                     self.use_pallas_dynamics, str(self.dtype)))

    def __eq__(self, other):
        return isinstance(other, EnvConfig) and hash(self) == hash(other)


@struct.dataclass
class EnvState:
    """Full per-env (swarm) state: drone dynamics with leading agent axis,
    scenario variables, collision bookkeeping, and episode metric counters."""

    dyn: DroneState                  # leading axis N
    scenario: ScenarioState
    rew_coeff: RewardCoeffs          # data (annealed by the training wrapper)
    tick: jax.Array                  # int32, control ticks since reset
    prev_coll_pairs: jax.Array       # (N, N) bool — colliding pairs last tick
    #                                  (use_pallas_pairs: (N, PACK_LANES) int32
    #                                   packed bits — swarm_interactions.py)
    prev_coll_ids: jax.Array         # (N,) bool — drones in any pair last tick
    prev_obst_hits: jax.Array        # (N,) bool
    prev_wall: jax.Array             # (N,) bool
    prev_ceiling: jax.Array          # (N,) bool
    prev_room: jax.Array             # (N,) bool
    obst_active: jax.Array           # (C,) bool
    obst_pos: jax.Array              # (C, 3)
    obst_density: jax.Array          # f (domain randomization)
    obst_size: jax.Array             # f
    gyro_bias: jax.Array             # (N, 3)
    dist5: jax.Array                 # (N, 5) ring buffer of recent distances
    # episode counters (quadrotor_multi.py:141-206)
    collisions_per_episode: jax.Array
    collisions_after_settle: jax.Array
    collisions_final_5s: jax.Array
    obst_collisions_per_episode: jax.Array
    obst_collisions_after_settle: jax.Array
    collisions_floor_per_episode: jax.Array
    collisions_wall_per_episode: jax.Array
    collisions_ceiling_per_episode: jax.Array
    collisions_room_per_episode: jax.Array
    obst_coll_dist_3_5: jax.Array
    obst_coll_dist_5: jax.Array
    agent_col_agent: jax.Array       # (N,) 1.0 = never collided with a drone
    agent_col_obst: jax.Array        # (N,) 1.0 = never collided with an obstacle
    reached_goal: jax.Array          # (N,) bool
    dist_sum_1s: jax.Array           # (N,) trailing-window distance sums
    dist_sum_3s: jax.Array
    dist_sum_5s: jax.Array
    crashes_last_episode: jax.Array  # f — rew_crash accumulation (replay gate)
    cum_rewraw_main: jax.Array       # (N,) episode sum of rewraw_pos
    cum_rewraw_quadcol: jax.Array    # (N,) episode sum of rewraw_quadcol


def _sample_spawn(cfg: EnvConfig, key: jax.Array, spawn_points: jax.Array):
    """Spawn pose around the scenario spawn points
    (quadrotor_single.py:387-447, init_random_state=False path).

    The reference's rejection loop "random yaw until facing within 60 deg of
    -pos" is replaced by directly sampling yaw = atan2(-y,-x) + U(-pi/3,pi/3),
    which is the same distribution.
    """
    n = cfg.num_agents
    dtype = cfg.dtype
    k_pos, k_yaw = jax.random.split(key)
    box = cfg.spawn_box
    offset = jax.random.uniform(k_pos, (n, 3), dtype, -box, box)
    pos = spawn_points + offset
    pos = pos.at[:, 2].set(jnp.maximum(pos[:, 2], 0.75))
    face = jnp.arctan2(-pos[:, 1], -pos[:, 0])
    yaw = face + jax.random.uniform(k_yaw, (n,), dtype, -jnp.pi / 3, jnp.pi / 3)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(yaw)
    one = jnp.ones_like(yaw)
    rot = jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], axis=-2)
    vel = jnp.zeros((n, 3), dtype)
    omega = jnp.zeros((n, 3), dtype)
    return pos, vel, rot, omega


def _compute_obs(cfg: EnvConfig, dyn: DroneState, goals: jax.Array,
                 gyro_bias: jax.Array, key: jax.Array,
                 obst_active: jax.Array, obst_pos: jax.Array,
                 obst_size_val, neighbor_override=None) -> tuple[jax.Array, jax.Array]:
    """Assemble the (N, obs_dim) observation: noisy self obs + neighbor
    relative obs + obstacle SDF patch (quadrotor_multi.py:592-607).

    neighbor_override: precomputed UNCLIPPED (N, k*6) relative neighbor obs
    (from the fused Pallas k-nearest kernel in the large-swarm batched path);
    clipping is applied here either way."""
    noise_params = SensorNoiseParams(bypass=not cfg.use_sensor_noise)
    pos, vel, rot, omega, _, gyro_bias = add_noise(
        noise_params, key, dyn.pos, dyn.vel, dyn.rot, dyn.omega,
        dyn.accelerometer, cfg.dt, gyro_bias)
    parts = [self_obs(cfg.obs_repr, pos, vel, rot, omega, goals, cfg.room_box)]
    if cfg.num_use_neighbor_obs > 0:
        clip_lo, clip_hi = neighbor_clip_bounds(
            cfg.num_use_neighbor_obs, cfg.room_dims, 3.0, cfg.dtype)
        if neighbor_override is not None:
            parts.append(jnp.clip(neighbor_override.astype(cfg.dtype),
                                  clip_lo, clip_hi))
        else:
            # Neighbor obs uses TRUE positions (quadrotor_multi.py:425,594-596)
            parts.append(neighbor_obs(dyn.pos, dyn.vel,
                                      cfg.num_use_neighbor_obs,
                                      clip_lo, clip_hi))
    if cfg.use_obstacles:
        parts.append(obst.surround_sdf_obs(
            dyn.pos[:, :2], obst_pos[:, :2], obst_active, obst_size_val / 2.0))
    return jnp.concatenate(parts, axis=-1).astype(cfg.dtype), gyro_bias


def env_reset(cfg: EnvConfig, params: Any, key: jax.Array,
              rew_coeff: RewardCoeffs | None = None,
              obst_density=None, obst_size=None,
              mode=None, event_slots: int | None = None
              ) -> tuple[EnvState, jax.Array]:
    """Fresh episode: obstacles -> scenario -> spawn -> obs
    (quadrotor_multi.py:339-411).

    event_slots (static) pins the presampled event-table size; auto-reset
    passes the incoming state's size so shapes stay stable across resets."""
    n = cfg.num_agents
    dtype = cfg.dtype
    keys = jax.random.split(key, 6)
    if rew_coeff is None:
        rew_coeff = RewardCoeffs()
    rew_coeff = jax.tree.map(lambda x: jnp.asarray(x, dtype), rew_coeff)

    # Per-episode obstacle domain randomization: when enabled and no explicit
    # value is passed, sample from the reference's discrete grids
    # (quad_experience_replay.py:81-87: arange(min, max, 0.05) / (.., 0.1)).
    if obst_density is None and cfg.obst_density_random:
        grid = np.arange(cfg.obst_density_min, cfg.obst_density_max, 0.05)
        kd = jax.random.fold_in(keys[5], 0)
        density = jnp.asarray(grid, dtype)[
            jax.random.randint(kd, (), 0, len(grid))]
    else:
        density = jnp.asarray(
            cfg.obst_density if obst_density is None else obst_density, dtype)
    if obst_size is None and cfg.obst_size_random:
        grid = np.arange(cfg.obst_size_min, cfg.obst_size_max, 0.1)
        ks = jax.random.fold_in(keys[5], 1)
        size = jnp.asarray(grid, dtype)[
            jax.random.randint(ks, (), 0, len(grid))]
    else:
        size = jnp.asarray(
            cfg.obst_size if obst_size is None else obst_size, dtype)

    # Obstacles (fixed capacity = grid cells, masked)
    n_cells = cfg.num_obstacle_cells
    centers = jnp.asarray(obst.cell_centers(
        int(cfg.obst_spawn_area[0]), int(cfg.obst_spawn_area[1])), dtype)
    if cfg.use_obstacles:
        obst_active, obst_pos = obst.generate_obstacle_grid(
            keys[0], n_cells, density, centers, cfg.room_dims[2])
    else:
        obst_active = jnp.zeros((n_cells,), bool)
        obst_pos = jnp.concatenate(
            [centers, jnp.full((n_cells, 1), cfg.room_dims[2] / 2, dtype)], axis=-1)

    # Scenario (mode sampled from the mix list; single-element list otherwise;
    # an explicit `mode` override is provided for tests and curricula)
    # allowed_modes sizes the presampled event table; an explicit mode
    # override can be outside the config's mode list, so size for all modes.
    table_modes = cfg.mode_list() if mode is None else None
    if mode is None:
        mode_list = jnp.asarray(cfg.mode_list(), jnp.int32)
        mode = mode_list[jax.random.randint(keys[1], (), 0, len(cfg.mode_list()))]
    else:
        mode = jnp.asarray(mode, jnp.int32)
    scen = scenario_reset(cfg.scenario_config(), keys[2], mode,
                          obst_active, centers, dtype,
                          allowed_modes=table_modes, num_slots=event_slots)

    pos, vel, rot, omega = _sample_spawn(cfg, keys[3], scen.spawn_points)
    dyn = init_state((n,), dtype).replace(pos=pos, vel=vel, rot=rot, omega=omega)

    zero_i = jnp.zeros((), jnp.int32)
    state = EnvState(
        dyn=dyn,
        scenario=scen,
        rew_coeff=rew_coeff,
        tick=zero_i,
        prev_coll_pairs=(jnp.zeros((n, _pack_lanes()), jnp.int32)
                         if cfg.use_pallas_pairs else jnp.zeros((n, n), bool)),
        prev_coll_ids=jnp.zeros((n,), bool),
        prev_obst_hits=jnp.zeros((n,), bool),
        prev_wall=jnp.zeros((n,), bool),
        prev_ceiling=jnp.zeros((n,), bool),
        prev_room=jnp.zeros((n,), bool),
        obst_active=obst_active,
        obst_pos=obst_pos,
        obst_density=density,
        obst_size=size,
        gyro_bias=jnp.zeros((n, 3), dtype),
        dist5=jnp.zeros((n, 5), dtype),
        collisions_per_episode=zero_i,
        collisions_after_settle=zero_i,
        collisions_final_5s=zero_i,
        obst_collisions_per_episode=zero_i,
        obst_collisions_after_settle=zero_i,
        collisions_floor_per_episode=zero_i,
        collisions_wall_per_episode=zero_i,
        collisions_ceiling_per_episode=zero_i,
        collisions_room_per_episode=zero_i,
        obst_coll_dist_3_5=zero_i,
        obst_coll_dist_5=zero_i,
        agent_col_agent=jnp.ones((n,), dtype),
        agent_col_obst=jnp.ones((n,), dtype),
        reached_goal=jnp.zeros((n,), bool),
        dist_sum_1s=jnp.zeros((n,), dtype),
        dist_sum_3s=jnp.zeros((n,), dtype),
        dist_sum_5s=jnp.zeros((n,), dtype),
        crashes_last_episode=jnp.zeros((), dtype),
        cum_rewraw_main=jnp.zeros((n,), dtype),
        cum_rewraw_quadcol=jnp.zeros((n,), dtype),
    )
    obs, gyro_bias = _compute_obs(cfg, dyn, scen.goals, state.gyro_bias, keys[4],
                                  obst_active, obst_pos, size)
    return state.replace(gyro_bias=gyro_bias), obs


def _control_thrusts(cfg: EnvConfig, params: Any, state: EnvState,
                     actions: jax.Array, goals: jax.Array) -> jax.Array:
    """Stage 1a of env_step: policy action -> normalized motor thrusts."""
    dtype = cfg.dtype
    j_inv = None
    if cfg.control_mode in ("omega", "velocity_yaw", "mellinger"):
        from quadswarm_tpu.env.controls import jacobian_inv
        j_inv = (jax.vmap(jacobian_inv)(params) if _per_drone(params)
                 else jacobian_inv(params)).astype(dtype)
    return apply_control(cfg.control_mode, actions.astype(dtype),
                         j_inv=j_inv, state=state.dyn, goal=goals,
                         zero_action_middle=cfg.zero_action_middle)


def env_step(cfg: EnvConfig, params: Any, state: EnvState, actions: jax.Array,
             key: jax.Array, auto_reset: bool = True, dyn_override=None,
             scen_override=None, pairs_override=None, defer_obs: bool = False):
    """One control tick for the whole swarm.  Returns
    (state', obs, rewards (N,), dones (N,), info dict).

    pairs_override: (col_any, penalty_unit, resp_any, resp_partner,
    curr_packed) from the fused Pallas pair kernel, computed over ALL envs by
    batched_env_step (ops/pallas/swarm_interactions.pair_collisions) —
    replaces the O(N^2) collision stage.  defer_obs=True skips observation
    assembly (returns obs=None, gyro_bias unchanged) so the batched caller
    can build obs with the fused k-nearest kernel from post-response
    velocities; requires auto_reset=False.

    auto_reset (static): when True, a finished episode's state is replaced by
    a fresh `env_reset` via masked select — convenient for a single stateful
    env, but under `vmap` the reset branch is computed EVERY step for EVERY
    env (vmapped select evaluates both sides), which costs as much as the
    whole step.  Batched rollouts should use `batched_env_step`, which runs
    the reset under a top-level `lax.cond` so it only executes on the ~1/1500
    ticks where an episode actually ends."""
    n = cfg.num_agents
    dtype = cfg.dtype
    keys = jax.random.split(key, 10)
    dyn_cfg = cfg.dynamics_config(arm=params.arm)
    goals = state.scenario.goals

    # ---- 1. Per-drone control + dynamics (quadrotor_single._step) ----------
    if dyn_override is not None:
        # batched_env_step already integrated the whole fleet (fused Pallas
        # kernel over envs x agents); keys[0] is left unconsumed on purpose —
        # the batched path re-derives the identical per-drone keys from it.
        dyn = dyn_override
    else:
        thrust_cmds = _control_thrusts(cfg, params, state, actions, goals)
        dyn_keys = jax.random.split(keys[0], n)
        if _per_drone(params):
            # Domain-randomized fleets: params carry a leading per-drone axis
            # (DynamicsParams.stack), mapped alongside the drone states.
            dyn = jax.vmap(lambda p, s, t, k: dynamics_step(p, dyn_cfg, s, t, k))(
                params, state.dyn, thrust_cmds, dyn_keys)
        else:
            dyn = jax.vmap(lambda s, t, k: dynamics_step(params, dyn_cfg, s, t, k))(
                state.dyn, thrust_cmds, dyn_keys)

    time_remain = cfg.ep_len - state.tick
    rewards, rew_info = compute_reward(
        state.rew_coeff, dyn.pos, goals, actions.astype(dtype), dyn.rot, dyn.omega,
        dyn.on_floor, cfg.dt)
    tick = state.tick + 1
    done = tick > cfg.ep_len

    # ---- 2. Collision detection ---------------------------------------------
    # Like the reference, collision radii use drone 0's arm length
    # (quadrotor_multi.py:81, 154-155: envs[0].dynamics.arm).
    arm = params.arm[0] if _per_drone(params) else params.arm
    hitbox = cfg.collision_hitbox_radius * arm
    falloff = cfg.collision_falloff_radius * arm
    if pairs_override is not None:
        # batched_env_step ran the fused Pallas pair kernel over all envs —
        # the (N, N) matrices never exist; pair history arrives packed.
        curr_ids, pen_unit, resp_any, resp_partner, store_pairs = pairs_override
        new_pairs = None
    elif cfg.use_pallas_pairs:
        # Single-env fallback on the packed state layout (gym_api / enjoy /
        # reset tick): XLA math, pack/unpack around it.
        from quadswarm_tpu.ops.pallas.swarm_interactions import (
            pack_pairs, unpack_pairs)
        dist, curr_pairs = coll.collision_matrix(dyn.pos, hitbox)
        curr_ids = jnp.any(curr_pairs, axis=-1)
        new_pairs = curr_pairs & ~unpack_pairs(state.prev_coll_pairs, n)
        store_pairs = pack_pairs(curr_pairs)
    else:
        dist, curr_pairs = coll.collision_matrix(dyn.pos, hitbox)
        curr_ids = jnp.any(curr_pairs, axis=-1)
        new_pairs = curr_pairs & ~state.prev_coll_pairs     # new pair set
        store_pairs = curr_pairs
    unique_ids = curr_ids & ~state.prev_coll_ids        # setdiff1d on drone ids

    collisions_curr_tick = jnp.sum(unique_ids).astype(jnp.int32) // 2
    grace = tick >= jnp.int32(1.5 * cfg.control_freq)
    final5 = time_remain <= jnp.int32(5.0 * cfg.control_freq)
    collisions_per_episode = state.collisions_per_episode + collisions_curr_tick
    collisions_after_settle = state.collisions_after_settle + jnp.where(
        grace, collisions_curr_tick, 0)
    collisions_final_5s = state.collisions_final_5s + jnp.where(
        final5, collisions_curr_tick, 0)
    agent_col_agent = jnp.where((collisions_curr_tick > 0) & grace & unique_ids,
                                0.0, state.agent_col_agent)

    # Obstacle collisions
    if cfg.use_obstacles:
        obst_hit, obst_idx = obst.obstacle_collisions(
            dyn.pos[:, :2], state.obst_pos[:, :2], state.obst_active,
            state.obst_size / 2.0, arm)
        curr_obst = obst_hit & ~state.prev_obst_hits
        n_obst_coll = jnp.sum(curr_obst).astype(jnp.int32)
        obst_collisions_per_episode = state.obst_collisions_per_episode + n_obst_coll
        obst_after = state.obst_collisions_after_settle + jnp.where(grace, n_obst_coll, 0)
        # distance-binned obstacle collision stats (quadrotor_multi.py:471-478)
        rel_dist = jnp.linalg.norm(dyn.pos - goals, axis=-1)
        d35 = jnp.sum(curr_obst & grace & (rel_dist > 3.5)).astype(jnp.int32)
        d5 = jnp.sum(curr_obst & grace & (rel_dist > 5.0)).astype(jnp.int32)
        obst_dist_3_5 = state.obst_coll_dist_3_5 + d35
        obst_dist_5 = state.obst_coll_dist_5 + d5
        agent_col_obst = jnp.where((n_obst_coll > 0) & grace & curr_obst,
                                   0.0, state.agent_col_obst)
    else:
        obst_hit = jnp.zeros((n,), bool)
        obst_idx = jnp.zeros((n,), jnp.int32)
        curr_obst = obst_hit
        obst_collisions_per_episode = state.obst_collisions_per_episode
        obst_after = state.obst_collisions_after_settle
        obst_dist_3_5 = state.obst_coll_dist_3_5
        obst_dist_5 = state.obst_coll_dist_5
        agent_col_obst = state.agent_col_obst

    # Room collisions (quadrotor_multi.py:289-302: floor raw, wall/ceiling
    # setdiff'd against previous tick)
    floor_crash = dyn.crashed_floor
    wall_crash = dyn.crashed_wall & ~state.prev_wall
    ceiling_crash = dyn.crashed_ceiling & ~state.prev_ceiling
    room_crash = (floor_crash | wall_crash | ceiling_crash) & ~state.prev_room

    collisions_floor = state.collisions_floor_per_episode + jnp.where(
        grace, jnp.sum(floor_crash).astype(jnp.int32), 0)
    collisions_wall = state.collisions_wall_per_episode + jnp.where(
        grace, jnp.sum(wall_crash).astype(jnp.int32), 0)
    collisions_ceiling = state.collisions_ceiling_per_episode + jnp.where(
        grace, jnp.sum(ceiling_crash).astype(jnp.int32), 0)
    collisions_room = state.collisions_room_per_episode + jnp.where(
        grace, jnp.sum(room_crash).astype(jnp.int32), 0)

    # ---- 3. Collision rewards (quadrotor_multi.py:499-546) -----------------
    rew_quadcol = -state.rew_coeff.quadcol_bin * unique_ids.astype(dtype)
    # reference filters to pairs with dist <= falloff (:443-444)
    if pairs_override is not None:
        # kernel penalty is the unit-coefficient sum( 1 - d/falloff ); scale
        # by the (annealed) coefficient and dt here — exactly
        # proximity_penalties with max_penalty folded out.
        rew_proximity = -(cfg.control_dt
                          * state.rew_coeff.quadcol_bin_smooth_max
                          * pen_unit.astype(dtype))
    else:
        rew_proximity = -proximity_penalties(
            dist, dist <= falloff, falloff,
            state.rew_coeff.quadcol_bin_smooth_max, cfg.control_dt)
    rew_obst_raw = -curr_obst.astype(dtype)
    rew_quadcol_obst = state.rew_coeff.quadcol_bin_obst * rew_obst_raw

    rewards = rewards + rew_quadcol + rew_proximity
    if cfg.use_obstacles:
        rewards = rewards + rew_quadcol_obst

    # Goal-distance tracking for reached_goal / distance metrics
    dist_to_goal = jnp.linalg.norm(dyn.pos - goals, axis=-1)
    dist5 = jnp.concatenate([state.dist5[:, 1:], dist_to_goal[:, None]], axis=1)
    have5 = tick >= 5
    reached = state.reached_goal | (
        have5 & (jnp.mean(dist5, axis=1) < state.scenario.approach_goal_metric))
    last_ticks = cfg.ep_len + 1
    in_1s = tick > last_ticks - jnp.int32(1 * cfg.control_freq)
    in_3s = tick > last_ticks - jnp.int32(3 * cfg.control_freq)
    in_5s = tick > last_ticks - jnp.int32(5 * cfg.control_freq)
    dist_sum_1s = state.dist_sum_1s + jnp.where(in_1s, dist_to_goal, 0.0)
    dist_sum_3s = state.dist_sum_3s + jnp.where(in_3s, dist_to_goal, 0.0)
    dist_sum_5s = state.dist_sum_5s + jnp.where(in_5s, dist_to_goal, 0.0)

    # ---- 4. Interaction forces (quadrotor_multi.py:548-587) -----------------
    vel, omega = dyn.vel, dyn.omega
    if cfg.use_downwash:
        vel, omega, _ = apply_downwash(keys[1], dyn.pos, vel, omega, dyn.rot,
                                       cfg.control_dt)
    if cfg.apply_collision_force:
        if pairs_override is not None:
            vel, omega = coll.drone_collision_response_indexed(
                keys[2], dyn.pos, vel, omega, resp_any, resp_partner)
        else:
            vel, omega = coll.drone_collision_response(
                keys[2], dyn.pos, vel, omega, new_pairs)
        if cfg.use_obstacles:
            # one-hot select, not a gather (see collisions.py note on TPU
            # gather cost); each row has exactly one hit
            hit_hot = obst_idx[:, None] == jnp.arange(state.obst_pos.shape[0])
            hit_obst_pos = jnp.sum(
                jnp.where(hit_hot[..., None], state.obst_pos[None, :, :], 0.0),
                axis=1)
            vel, omega = coll.obstacle_collision_response(
                keys[3], dyn.pos, vel, omega, hit_obst_pos, state.obst_size,
                curr_obst)
        vel, omega = coll.wall_collision_response(
            keys[4], dyn.pos, vel, omega, cfg.room_box, wall_crash)
        vel, omega = coll.ceiling_collision_response(
            keys[5], vel, omega, ceiling_crash)
    dyn = dyn.replace(vel=vel, omega=omega)

    # ---- 5. Scenario step ----------------------------------------------------
    n_cells = cfg.num_obstacle_cells
    centers = state.obst_pos[:, :2]
    if scen_override is not None:
        # batched_env_step already advanced all envs' scenarios (fused fast
        # phase + presampled event-table playback, batched_scenario_step).
        scen = scen_override
    else:
        # Scenario randomness is self-derived from scenario.scen_key
        # (fold_in by tick); the keys[6] argument is ignored by design so
        # the batched table playback can reproduce event keys at reset.
        scen = scenario_step(cfg.scenario_config(), state.scenario, tick,
                             keys[6], state.obst_active, centers,
                             allowed_modes=cfg.mode_list())

    # ---- 6. Observations ------------------------------------------------------
    if defer_obs:
        # batched_env_step assembles obs afterwards (fused k-nearest kernel
        # needs the whole fleet's POST-response velocities at once); it
        # re-derives keys[7] and updates gyro_bias itself.
        assert not auto_reset, "defer_obs requires auto_reset=False"
        obs, gyro_bias = None, state.gyro_bias
    else:
        obs, gyro_bias = _compute_obs(cfg, dyn, scen.goals, state.gyro_bias,
                                      keys[7], state.obst_active,
                                      state.obst_pos, state.obst_size)

    crashes_last_episode = state.crashes_last_episode + rew_info.rew_crash[0]
    # Cumulative raw rewards for true_reward (reward_shaping.py:79-86):
    # true_reward = sum(rewraw_main) + 1000 * sum(rewraw_quadcol)
    cum_rewraw_main = state.cum_rewraw_main + rew_info.rewraw_pos
    cum_rewraw_quadcol = state.cum_rewraw_quadcol - unique_ids.astype(dtype)

    new_state = state.replace(
        dyn=dyn, scenario=scen, tick=tick,
        prev_coll_pairs=store_pairs, prev_coll_ids=curr_ids,
        prev_obst_hits=obst_hit,
        prev_wall=wall_crash, prev_ceiling=ceiling_crash, prev_room=room_crash,
        gyro_bias=gyro_bias, dist5=dist5,
        collisions_per_episode=collisions_per_episode,
        collisions_after_settle=collisions_after_settle,
        collisions_final_5s=collisions_final_5s,
        obst_collisions_per_episode=obst_collisions_per_episode,
        obst_collisions_after_settle=obst_after,
        collisions_floor_per_episode=collisions_floor,
        collisions_wall_per_episode=collisions_wall,
        collisions_ceiling_per_episode=collisions_ceiling,
        collisions_room_per_episode=collisions_room,
        obst_coll_dist_3_5=obst_dist_3_5,
        obst_coll_dist_5=obst_dist_5,
        agent_col_agent=agent_col_agent,
        agent_col_obst=agent_col_obst,
        reached_goal=reached,
        dist_sum_1s=dist_sum_1s, dist_sum_3s=dist_sum_3s, dist_sum_5s=dist_sum_5s,
        crashes_last_episode=crashes_last_episode,
        cum_rewraw_main=cum_rewraw_main,
        cum_rewraw_quadcol=cum_rewraw_quadcol,
    )

    # ---- 7. Episode metrics + masked auto-reset ------------------------------
    info = _episode_stats(cfg, new_state, done)
    info["rewards/rew_pos"] = rew_info.rew_pos
    info["rewards/rew_action"] = rew_info.rew_action
    info["rewards/rew_crash"] = rew_info.rew_crash
    info["rewards/rew_orient"] = rew_info.rew_orient
    info["rewards/rew_spin"] = rew_info.rew_spin
    info["rewards/rewraw_pos"] = rew_info.rewraw_pos
    info["rewards/rewraw_crash"] = rew_info.rewraw_crash
    info["rewards/rew_quadcol"] = rew_quadcol
    info["rewards/rew_proximity"] = rew_proximity
    info["rewards/rewraw_quadcol"] = -unique_ids.astype(dtype)
    info["rewards/rew_quadcol_obstacle"] = rew_quadcol_obst
    info["rewards/rewraw_quadcol_obstacle"] = rew_obst_raw

    if auto_reset:
        slots = (state.scenario.events.shape[-1]
                 // event_table_width(cfg.num_agents))
        reset_state, reset_obs = env_reset(
            cfg, params, keys[8], rew_coeff=state.rew_coeff,
            obst_density=None if cfg.obst_density_random else state.obst_density,
            obst_size=None if cfg.obst_size_random else state.obst_size,
            event_slots=slots)
        new_state = jax.tree.map(lambda a, b: jnp.where(done, a, b),
                                 reset_state, new_state)
        obs = jnp.where(done, reset_obs, obs)

    dones = jnp.broadcast_to(done, (n,))
    return new_state, obs, rewards, dones, info


def _select_done(done_env: jax.Array, reset_tree, keep_tree):
    """Per-env select: done_env (E,) broadcast against each leaf (E, ...)."""
    def sel(a, b):
        mask = done_env.reshape(done_env.shape + (1,) * (a.ndim - 1))
        return jnp.where(mask, a, b)
    return jax.tree.map(sel, reset_tree, keep_tree)


def _pallas_fleet_dynamics(cfg: EnvConfig, params: Any, states: EnvState,
                           actions: jax.Array, keys: jax.Array) -> DroneState:
    """Integrate ALL envs' drones in one fused Pallas kernel call.

    Consumes PRNG keys exactly as the per-env path does (env_step splits each
    env key into 10, dyn keys come from keys[0] split per agent), so the OU
    thrust noise and crash-yaw draws are bit-identical to the XLA path.
    """
    from quadswarm_tpu.ops.pallas.dynamics_kernel import dynamics_step_flat

    e, n = actions.shape[0], cfg.num_agents
    goals = states.scenario.goals
    thrust = jax.vmap(
        lambda s, a, g: _control_thrusts(cfg, params, s, a, g)
    )(states, actions, goals)
    dyn_keys = jax.vmap(
        lambda k: jax.random.split(jax.random.split(k, 10)[0], n)
    )(keys)                                               # (E, N, key)
    flat = lambda x: x.reshape((e * n,) + x.shape[2:])
    dyn_flat = jax.tree.map(flat, states.dyn)
    out = dynamics_step_flat(params, cfg.dynamics_config(arm=params.arm),
                             dyn_flat,
                             flat(thrust),
                             dyn_keys.reshape((e * n,) + dyn_keys.shape[2:]))
    return jax.tree.map(lambda x: x.reshape((e, n) + x.shape[1:]), out)


def _batched_xla_dynamics(cfg: EnvConfig, params: Any, states: EnvState,
                          actions: jax.Array, keys: jax.Array) -> DroneState:
    """Integrate all envs' drones with the vmapped XLA dynamics — used when
    the pair kernel needs the whole fleet's post-integration positions before
    the vmapped env_step runs.  Consumes keys exactly like env_step's
    internal path (keys[0] of the 10-way split, split per agent)."""
    n = cfg.num_agents
    dyn_cfg = cfg.dynamics_config(arm=params.arm)

    def one_env(s, a, k):
        thrust = _control_thrusts(cfg, params, s, a, s.scenario.goals)
        dyn_keys = jax.random.split(jax.random.split(k, 10)[0], n)
        if _per_drone(params):
            return jax.vmap(
                lambda p, st, t, dk: dynamics_step(p, dyn_cfg, st, t, dk)
            )(params, s.dyn, thrust, dyn_keys)
        return jax.vmap(
            lambda st, t, dk: dynamics_step(params, dyn_cfg, st, t, dk)
        )(s.dyn, thrust, dyn_keys)

    return jax.vmap(one_env)(states, actions, keys)


def _batched_pair_interactions(cfg: EnvConfig, params: Any, states: EnvState,
                               dyn: DroneState):
    """Fused Pallas pair kernel over the whole (E, N) fleet: collision masks,
    unit proximity penalties, response partners, packed pair history.  The
    coefficient-bearing scaling (quadcol_bin_smooth_max, dt) happens inside
    env_step so per-env annealed reward coefficients stay exact."""
    from quadswarm_tpu.ops.pallas.swarm_interactions import pair_collisions

    arm = params.arm[0] if _per_drone(params) else params.arm
    hitbox = cfg.collision_hitbox_radius * arm
    falloff = cfg.collision_falloff_radius * arm
    interp = jax.default_backend() != "tpu"
    return pair_collisions(dyn.pos.astype(jnp.float32), states.prev_coll_pairs,
                           hitbox, falloff, 1.0, interpret=interp)


def _batched_deferred_obs(cfg: EnvConfig, new_states: EnvState,
                          old_gyro_bias: jax.Array, keys: jax.Array):
    """Assemble observations for the whole batch after the vmapped step: the
    neighbor slice comes from the fused Pallas k-nearest kernel on the fleet's
    post-response state, the rest (noisy self obs, SDF patch) is the vmapped
    XLA path.  Re-derives env_step's keys[7]."""
    from quadswarm_tpu.ops.pallas.swarm_interactions import neighbor_topk_obs

    keys7 = jax.vmap(lambda k: jax.random.split(k, 10)[7])(keys)
    interp = jax.default_backend() != "tpu"
    nbr = neighbor_topk_obs(new_states.dyn.pos.astype(jnp.float32),
                            new_states.dyn.vel.astype(jnp.float32),
                            cfg.num_use_neighbor_obs, interpret=interp)
    return jax.vmap(
        lambda d, g, gb, k7, oa, op, osz, nb: _compute_obs(
            cfg, d, g, gb, k7, oa, op, osz, neighbor_override=nb)
    )(new_states.dyn, new_states.scenario.goals, old_gyro_bias, keys7,
      new_states.obst_active, new_states.obst_pos, new_states.obst_size, nbr)


def _batched_scenario(cfg: EnvConfig, states: EnvState, keys: jax.Array):
    """Advance all envs' scenarios: fused continuous motion + presampled
    event-table playback (scenarios.batched_scenario_step).  Scenario
    randomness is self-derived from each env's scen_key (fold_in by tick), so
    no step keys are consumed here."""
    from quadswarm_tpu.env.scenarios import batched_scenario_step

    del keys
    ticks = states.tick + 1
    return batched_scenario_step(cfg.scenario_config(), states.scenario,
                                 ticks, cfg.mode_list())


def batched_env_step(cfg: EnvConfig, params: Any, states: EnvState,
                     actions: jax.Array, keys: jax.Array):
    """Vmapped env_step with CONDITIONAL auto-reset.

    The reference auto-resets inside step (quadrotor_multi.py:720-722); the
    naive batched translation evaluates the full reset path (formation
    generation, obstacle sampling, argsorts) every tick for every env, which
    measures as ~100% of the step cost on TPU.  Here the vmapped reset runs
    under `lax.cond(any(done))` — XLA executes the branch only on ticks where
    an episode ends (episodes are fixed-length, so this is ~1 tick in
    ep_len), leaving the hot path pure physics/interactions.
    """
    scen = _batched_scenario(cfg, states, keys)
    dyn = None
    if cfg.use_pallas_dynamics and not _per_drone(params):
        dyn = _pallas_fleet_dynamics(cfg, params, states, actions, keys)
    elif cfg.use_pallas_pairs:
        dyn = _batched_xla_dynamics(cfg, params, states, actions, keys)
    pairs = (None if not cfg.use_pallas_pairs
             else _batched_pair_interactions(cfg, params, states, dyn))
    # k-nearest kernel handles 1..16 neighbors; k = N-1 (index-order
    # semantics) or 0 stays on the XLA obs path inside env_step
    defer = cfg.use_pallas_pairs and 0 < cfg.num_use_neighbor_obs <= 16
    new_states, obs, rew, dones, info = jax.vmap(
        lambda s, a, k, d, pr, sc: env_step(
            cfg, params, s, a, k, auto_reset=False, dyn_override=d,
            scen_override=sc, pairs_override=pr, defer_obs=defer)
    )(states, actions, keys, dyn, pairs, scen)
    if defer:
        obs, gyro = _batched_deferred_obs(cfg, new_states, states.gyro_bias,
                                          keys)
        new_states = new_states.replace(gyro_bias=gyro)
    done_env = jnp.any(dones, axis=-1)
    reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(keys)

    slots = (states.scenario.events.shape[-1]
             // event_table_width(cfg.num_agents))

    def do_reset(args):
        new_states, obs = args
        reset_states, reset_obs = jax.vmap(
            lambda k, s: env_reset(
                cfg, params, k, rew_coeff=s.rew_coeff,
                obst_density=(None if cfg.obst_density_random
                              else s.obst_density),
                obst_size=None if cfg.obst_size_random else s.obst_size,
                event_slots=slots)
        )(reset_keys, new_states)
        return (_select_done(done_env, reset_states, new_states),
                _select_done(done_env, reset_obs, obs))

    new_states, obs = jax.lax.cond(jnp.any(done_env), do_reset,
                                   lambda args: args, (new_states, obs))
    return new_states, obs, rew, dones, info


def _episode_stats(cfg: EnvConfig, s: EnvState, done) -> dict:
    """Per-episode metrics emitted at done (quadrotor_multi.py:625-718).
    Scenario-prefixed copies are reconstructed host-side from 'scenario_mode'."""
    n = cfg.num_agents
    dtype = cfg.dtype
    freq = cfg.control_freq
    agent_col_flag = jnp.logical_and(s.agent_col_agent > 0, s.agent_col_obst > 0)
    success = jnp.logical_and(agent_col_flag, s.reached_goal)
    deadlock = jnp.logical_and(agent_col_flag, ~s.reached_goal)
    info = {
        "episode_done": done,
        "scenario_mode": s.scenario.mode,
        "num_collisions": s.collisions_per_episode,
        "num_collisions_after_settle": s.collisions_after_settle,
        "num_collisions_final_5_s": s.collisions_final_5s,
        "num_collisions_with_room": s.collisions_room_per_episode,
        "num_collisions_with_floor": s.collisions_floor_per_episode,
        "num_collisions_with_wall": s.collisions_wall_per_episode,
        "num_collisions_with_ceiling": s.collisions_ceiling_per_episode,
        "num_collisions_obst_quad": s.obst_collisions_per_episode,
        "num_collisions_obst_quad_after_settle": s.obst_collisions_after_settle,
        "num_collisions_obst_quad_3_5": s.obst_coll_dist_3_5,
        "num_collisions_obst_quad_5": s.obst_coll_dist_5,
        "distance_to_goal_1s": s.dist_sum_1s / jnp.asarray(1 * freq, dtype),
        "distance_to_goal_3s": s.dist_sum_3s / jnp.asarray(3 * freq, dtype),
        "distance_to_goal_5s": s.dist_sum_5s / jnp.asarray(5 * freq, dtype),
        "metric/agent_success_rate": jnp.sum(success).astype(dtype) / n,
        "metric/agent_deadlock_rate": jnp.sum(deadlock).astype(dtype) / n,
        "metric/agent_col_rate": 1.0 - jnp.sum(agent_col_flag).astype(dtype) / n,
        "metric/agent_neighbor_col_rate": 1.0 - jnp.sum(s.agent_col_agent) / n,
        "metric/agent_obst_col_rate": 1.0 - jnp.sum(s.agent_col_obst) / n,
        # true_reward for PBT ranking (reward_shaping.py:79-86)
        "true_reward": s.cum_rewraw_main + 1000.0 * s.cum_rewraw_quadcol,
    }
    return info
