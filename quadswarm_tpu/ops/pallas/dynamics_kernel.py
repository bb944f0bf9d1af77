"""Pallas TPU kernel: fully-fused rigid-body dynamics step.

The reference's hottest kernel (`step1`/`step1_numba`,
quadrotor_dynamics.py:225-346 + floor_interaction_numba:569-639; SURVEY.md
§2.1 row 1) as ONE Pallas program: motor first-order filter, thrust/torque,
Rodrigues rotation integration, periodic re-orthonormalization, Euler omega
update with quadratic damping, position integration + room clipping, the
floor friction state machine, and the velocity/accelerometer update — for
BOTH physics sub-steps of a control tick — fused into a single VMEM-resident
kernel.

Why: under XLA this sequence lowers to ~100 small elementwise kernels per
sub-step; at 32k drones each op is ~1 MB, so the step is launch/latency
bound, not bandwidth bound.  Fusing everything means each drone-state plane
is read from HBM once and written once per control tick (sub-step
intermediates never leave VMEM) — the speed-of-light for this op.

Layout: structure-of-arrays.  Every scalar component of the drone state is a
plane of shape (R, 128) (the flat drone batch folded into sublanes x lanes),
stacked into a single (C, R, 128) array so the kernel takes two refs (in
planes, out planes) plus an SMEM parameter vector.  All math is elementwise
VPU work on (BLOCK_ROWS, 128) tiles; cross-component terms (cross products,
3x3 matrix application) are unrolled over the 3/9 component planes.

Shared (non-per-drone-randomized) dynamics parameters only; the XLA path
(env/dynamics.py) remains the reference implementation and the fallback for
randomized fleets — parity between the two is tested in
tests/test_pallas_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAV = 9.81
EPS = 1e-6
LANES = 128
BLOCK_ROWS = 64          # 64 x 128 = 8192 drones per grid program

# --- channel layout -----------------------------------------------------------
# inputs
I_POS = 0          # 3
I_VEL = 3          # 3
I_ROT = 6          # 9 row-major
I_OMEGA = 15       # 3
I_CMDSD = 18       # 4
I_ROTD = 22        # 4
I_ONFLOOR = 26     # 1 (0/1 f32)
I_STEPCNT = 27     # 1 (f32-encoded int)
I_CMDS = 28        # 4
I_NOISE = 32       # 4
I_YAWC = 36        # 1, cos(rand yaw) — Mosaic TC has no atan2, so trig of
I_YAWS = 37        # 1, sin(rand yaw)   host-drawn angles happens outside
N_IN = 38
# outputs
O_POS = 0
O_VEL = 3
O_ROT = 6
O_OMEGA = 15
O_CMDSD = 18
O_ROTD = 22
O_ONFLOOR = 26
O_STEPCNT = 27
O_ACC = 28         # 3
O_ACCEL = 31       # 3
O_CR_FLOOR = 34
O_CR_WALL = 35
O_CR_CEIL = 36
N_OUT = 37

# --- parameter vector layout (SMEM) ------------------------------------------
P_DT = 0
P_MU = 1
P_OMEGA_MAX = 2
P_FLOOR_THR = 3
P_GRAV = 4
P_VEL_DAMP = 5
P_LINEARITY = 6
P_TAU_UP = 7
P_TAU_DOWN = 8
P_MASS = 9
P_INERTIA = 10       # 3
P_DAMP_OMEGA_Q = 13
P_THRUST_MAX = 14    # 4
P_TORQUE_MAX = 18    # 4
P_PROP_CROSS = 22    # 12, motor-major (m0x m0y m0z m1x ...)
P_PROP_CCW = 34      # 4
P_ROOM_LO = 38       # 3
P_ROOM_HI = 41       # 3
N_PARAMS = 44


def _dynamics_kernel(p_ref, in_ref, out_ref, *, sim_steps: int,
                     ortho_every: int, ortho_iters: int = 2):
    p = lambda i: p_ref[i]
    dt = p(P_DT)

    s = {
        "pos": [in_ref[I_POS + i] for i in range(3)],
        "vel": [in_ref[I_VEL + i] for i in range(3)],
        "rot": [in_ref[I_ROT + i] for i in range(9)],
        "omega": [in_ref[I_OMEGA + i] for i in range(3)],
        "cmdsd": [in_ref[I_CMDSD + i] for i in range(4)],
        "rotd": [in_ref[I_ROTD + i] for i in range(4)],
        "on_floor": in_ref[I_ONFLOOR] > 0.5,
        "step_count": in_ref[I_STEPCNT],
    }
    cmds = [jnp.clip(in_ref[I_CMDS + i], 0.0, 1.0) for i in range(4)]
    noise = [in_ref[I_NOISE + i] for i in range(4)]
    yaw_c, yaw_s = in_ref[I_YAWC], in_ref[I_YAWS]

    for _ in range(sim_steps):
        # -- motor first-order filter in the sqrt domain (:226-246) ----------
        thrusts = []
        thrust_total = jnp.zeros_like(cmds[0])
        for m in range(4):
            tau = jnp.where(cmds[m] < s["cmdsd"][m], p(P_TAU_DOWN), p(P_TAU_UP))
            tau = jnp.minimum(tau, 1.0)
            rotd = tau * (jnp.sqrt(cmds[m]) - s["rotd"][m]) + s["rotd"][m]
            cd = rotd * rotd
            cd = jnp.clip(cd + cmds[m] * noise[m], 0.0, 1.0)
            s["rotd"][m] = rotd
            s["cmdsd"][m] = cd
            lin = p(P_LINEARITY)
            th = p(P_THRUST_MAX + m) * ((1.0 - lin) * cd * cd + lin * cd)
            thrusts.append(th)
            thrust_total = thrust_total + th

        # -- torques (:249-256) ----------------------------------------------
        torque = [jnp.zeros_like(thrust_total) for _ in range(3)]
        for m in range(4):
            for a in range(3):
                torque[a] = torque[a] + p(P_PROP_CROSS + 3 * m + a) * thrusts[m]
            torque[2] = torque[2] + (p(P_TORQUE_MAX + m) * p(P_PROP_CCW + m)
                                     * s["cmdsd"][m])

        # -- Rodrigues rotation update about world omega (:296-306) ----------
        R = s["rot"]
        w = s["omega"]
        ww = [R[3 * r + 0] * w[0] + R[3 * r + 1] * w[1] + R[3 * r + 2] * w[2]
              for r in range(3)]  # world-frame omega
        norm = jnp.sqrt(ww[0] * ww[0] + ww[1] * ww[1] + ww[2] * ww[2])
        safe = jnp.where(norm > 0.0, norm, 1.0)
        kx, ky, kz = ww[0] / safe, ww[1] / safe, ww[2] / safe
        ang = norm * dt
        sa, ca = jnp.sin(ang), jnp.cos(ang)
        one_c = 1.0 - ca
        # dR = ca*I + sa*K + (1-ca) k k^T   (K = hat(k))
        d00 = ca + one_c * kx * kx
        d01 = -sa * kz + one_c * kx * ky
        d02 = sa * ky + one_c * kx * kz
        d10 = sa * kz + one_c * ky * kx
        d11 = ca + one_c * ky * ky
        d12 = -sa * kx + one_c * ky * kz
        d20 = -sa * ky + one_c * kz * kx
        d21 = sa * kx + one_c * kz * ky
        d22 = ca + one_c * kz * kz
        dR = [d00, d01, d02, d10, d11, d12, d20, d21, d22]
        newR = [None] * 9
        for r in range(3):
            for c in range(3):
                newR[3 * r + c] = (dR[3 * r + 0] * R[0 + c]
                                   + dR[3 * r + 1] * R[3 + c]
                                   + dR[3 * r + 2] * R[6 + c])
        R = newR

        # -- periodic re-orthonormalization (Newton polar, :308-314) ---------
        sc = s["step_count"] + 1.0
        do_ortho = sc >= float(ortho_every)
        Ro = list(R)
        for _ in range(ortho_iters):
            # G = Ro^T Ro; Ro <- 1.5 Ro - 0.5 Ro G
            G = [None] * 9
            for r in range(3):
                for c in range(3):
                    G[3 * r + c] = (Ro[r] * Ro[c] + Ro[3 + r] * Ro[3 + c]
                                    + Ro[6 + r] * Ro[6 + c])
            Rn = [None] * 9
            for r in range(3):
                for c in range(3):
                    Rn[3 * r + c] = 1.5 * Ro[3 * r + c] - 0.5 * (
                        Ro[3 * r + 0] * G[0 + c] + Ro[3 * r + 1] * G[3 + c]
                        + Ro[3 * r + 2] * G[6 + c])
            Ro = Rn
        R = [jnp.where(do_ortho, a, b) for a, b in zip(Ro, R)]
        sc = jnp.where(do_ortho, 0.0, sc)
        s["step_count"] = sc

        # -- omega update: Euler + quadratic damping (:316-325) ---------------
        Iw = [p(P_INERTIA + a) * w[a] for a in range(3)]
        cr = [-(w[1] * Iw[2] - w[2] * Iw[1]),
              -(w[2] * Iw[0] - w[0] * Iw[2]),
              -(w[0] * Iw[1] - w[1] * Iw[0])]
        new_w = []
        for a in range(3):
            od = (cr[a] + torque[a]) / p(P_INERTIA + a)
            damp = jnp.clip(p(P_DAMP_OMEGA_Q) * w[a] * w[a], 0.0, 1.0)
            wa = w[a] + (1.0 - damp) * dt * od
            new_w.append(jnp.clip(wa, -p(P_OMEGA_MAX), p(P_OMEGA_MAX)))
        w = new_w

        # -- position integration + room clip (:327-336) ----------------------
        pos_raw = [s["pos"][a] + dt * s["vel"][a] for a in range(3)]
        pos = [jnp.clip(pos_raw[a], p(P_ROOM_LO + a), p(P_ROOM_HI + a))
               for a in range(3)]
        crashed_wall = (pos_raw[0] != pos[0]) | (pos_raw[1] != pos[1])
        crashed_ceiling = pos_raw[2] > pos[2]

        # -- floor interaction (numba/training semantics, :569-639) ----------
        below = pos[2] <= p(P_FLOOR_THR)
        case_a = below & s["on_floor"]
        case_b = below & (~s["on_floor"])
        pos[2] = jnp.where(below, p(P_FLOOR_THR), pos[2])
        # force = R @ [0, 0, thrust_total]
        force = [R[3 * r + 2] * thrust_total for r in range(3)]

        # cos/sin of atan2(y, x) computed as normalized components (Mosaic
        # has no atan2); atan2(0, 0) = 0 -> (cos, sin) = (1, 0), matching the
        # XLA path's "phantom +x force" semantics exactly.
        def cos_sin_atan2(y, x):
            h = jnp.sqrt(x * x + y * y)
            hs = jnp.where(h > 0.0, h, 1.0)
            return (jnp.where(h > 0.0, x / hs, 1.0),
                    jnp.where(h > 0.0, y / hs, 0.0))

        theta_c, theta_s = cos_sin_atan2(R[3], R[0] + EPS)
        inverted = R[8] < 0.0
        use_yaw = case_b & inverted
        ct = jnp.where(use_yaw, yaw_c, theta_c)
        st_ = jnp.where(use_yaw, yaw_s, theta_s)

        friction_mag = p(P_MU) * (p(P_MASS) * GRAV - force[2])
        v = s["vel"]
        vel_norm = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
        fxy_mag = jnp.sqrt(force[0] * force[0] + force[1] * force[1])
        static_mag = jnp.maximum(fxy_mag - friction_mag, 0.0)
        f_c, f_s = cos_sin_atan2(force[1], force[0])
        static_fx = jnp.where(static_mag == 0.0, 0.0, static_mag * f_c)
        static_fy = jnp.where(static_mag == 0.0, 0.0, static_mag * f_s)
        fr_c, fr_s = cos_sin_atan2(-v[1], -v[0])
        kin_fx = force[0] + fr_c * friction_mag
        kin_fy = force[1] + fr_s * friction_mag
        is_static = vel_norm < EPS
        floor_fx = jnp.where(is_static, static_fx, kin_fx)
        floor_fy = jnp.where(is_static, static_fy, kin_fy)
        force[0] = jnp.where(case_a, floor_fx, force[0])
        force[1] = jnp.where(case_a, floor_fy, force[1])

        # below: yaw-flatten (case A) / crash rotation (case B)
        flatR = [ct, -st_, jnp.zeros_like(ct),
                 st_, ct, jnp.zeros_like(ct),
                 jnp.zeros_like(ct), jnp.zeros_like(ct), jnp.ones_like(ct)]
        R = [jnp.where(below, a, b) for a, b in zip(flatR, R)]
        zero = jnp.zeros_like(v[0])
        v = [jnp.where(case_b, zero, v[a]) for a in range(3)]
        w = [jnp.where(case_b, zero, w[a]) for a in range(3)]
        for m in range(4):
            s["cmdsd"][m] = jnp.where(case_b, zero, s["cmdsd"][m])
            s["rotd"][m] = jnp.where(case_b, zero, s["rotd"][m])

        acc = [force[a] / p(P_MASS) for a in range(3)]
        acc[2] = acc[2] - GRAV
        acc[2] = jnp.where(below, jnp.maximum(acc[2], 0.0), acc[2])

        # -- velocity + accelerometer (:342-346) -------------------------------
        vd = p(P_VEL_DAMP)
        v = [(1.0 - vd) * v[a] + dt * acc[a] for a in range(3)]
        ag = [acc[0], acc[1], acc[2] + p(P_GRAV)]
        accel = [R[0 + c] * ag[0] + R[3 + c] * ag[1] + R[6 + c] * ag[2]
                 for c in range(3)]  # R^T (acc + g)

        s["pos"], s["vel"], s["rot"], s["omega"] = pos, v, R, w
        s["on_floor"] = below
        s["acc"] = acc
        s["accel"] = accel
        s["crashed_floor"] = case_b
        s["crashed_wall"] = crashed_wall
        s["crashed_ceiling"] = crashed_ceiling

    for i in range(3):
        out_ref[O_POS + i] = s["pos"][i]
        out_ref[O_VEL + i] = s["vel"][i]
        out_ref[O_OMEGA + i] = s["omega"][i]
        out_ref[O_ACC + i] = s["acc"][i]
        out_ref[O_ACCEL + i] = s["accel"][i]
    for i in range(9):
        out_ref[O_ROT + i] = s["rot"][i]
    for m in range(4):
        out_ref[O_CMDSD + m] = s["cmdsd"][m]
        out_ref[O_ROTD + m] = s["rotd"][m]
    f32 = lambda b: b.astype(jnp.float32)
    out_ref[O_ONFLOOR] = f32(s["on_floor"])
    out_ref[O_STEPCNT] = s["step_count"]
    out_ref[O_CR_FLOOR] = f32(s["crashed_floor"])
    out_ref[O_CR_WALL] = f32(s["crashed_wall"])
    out_ref[O_CR_CEIL] = f32(s["crashed_ceiling"])


def _param_vector(params, cfg) -> jax.Array:
    f = lambda x: jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.concatenate([
        f(cfg.dt), f(cfg.mu), f(cfg.omega_max), f(cfg.floor_threshold),
        f(cfg.gravity), f(params.vel_damp), f(params.motor_linearity),
        f(params.motor_tau_up), f(params.motor_tau_down), f(params.mass),
        f(params.inertia), f(params.damp_omega_quadratic),
        f(params.thrust_max), f(params.torque_max),
        f(params.prop_crossproducts), f(params.prop_ccw),
        f(jnp.asarray(cfg.room_box[0])), f(jnp.asarray(cfg.room_box[1])),
    ])


def _to_planes(state, thrust_cmds, noise, yaw, rows):
    """Flat (B, ...) leaves -> one (N_IN, rows, 128) f32 stack."""
    b = state.pos.shape[0]
    pad = rows * LANES - b

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    # ONE concat + ONE transpose instead of ~35 per-column slice/pad/stack
    # ops — the marshalling previously cost several times the kernel itself.
    cols = jnp.concatenate([
        f32(state.pos), f32(state.vel), f32(state.rot.reshape(b, 9)),
        f32(state.omega), f32(state.thrust_cmds_damp),
        f32(state.thrust_rot_damp),
        f32(state.on_floor)[:, None], f32(state.step_count)[:, None],
        f32(thrust_cmds), f32(noise),
        jnp.cos(f32(yaw))[:, None], jnp.sin(f32(yaw))[:, None],
    ], axis=1)                                           # (B, N_IN)
    planes = jnp.pad(cols.T, ((0, 0), (0, pad)))
    return planes.reshape(planes.shape[0], rows, LANES)


def dynamics_step_flat(params, cfg, state, thrust_cmds, keys,
                       interpret: bool | None = None):
    """Drop-in replacement for `vmap(dynamics_step)` over a FLAT drone batch.

    Consumes the per-drone PRNG keys exactly like dynamics.dynamics_step
    (split -> OU noise draw, crash-yaw draw), so the injected randomness is
    bit-identical to the XLA path; only the integrator arithmetic runs in the
    fused Pallas kernel.
    """
    from quadswarm_tpu.env.dynamics import ou_noise_step

    noise_keys, yaw_keys = jax.vmap(
        lambda k: tuple(jax.random.split(k)))(keys)
    ou_state = jax.vmap(
        lambda s, k: ou_noise_step(s, k, params.thrust_noise_ratio)
    )(state.ou_state, noise_keys)
    yaw = jax.vmap(
        lambda k: jax.random.uniform(k, (), state.pos.dtype, -jnp.pi, jnp.pi)
    )(yaw_keys)
    out = dynamics_step_planes(params, cfg, state, thrust_cmds, ou_state, yaw,
                               interpret=interpret)
    return out.replace(ou_state=ou_state)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def dynamics_step_planes(params, cfg, state, thrust_cmds, noise, yaw,
                         interpret: bool | None = None):
    """Fused control-tick dynamics (cfg.sim_steps sub-steps) for a FLAT batch.

    state: DroneState with leaves (B, ...); thrust_cmds/noise (B, 4); yaw (B,).
    Returns a new DroneState (ou_state/omega_dot/torque passed through; the
    latter two are diagnostics the env does not consume).

    interpret=None (default) auto-selects: compiled Mosaic on TPU, the Pallas
    interpreter elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = state.pos.shape[0]
    rows = -(-b // (BLOCK_ROWS * LANES)) * BLOCK_ROWS
    stacked = _to_planes(state, thrust_cmds, noise, yaw, rows)
    pvec = _param_vector(params, cfg)

    grid = (rows // BLOCK_ROWS,)
    out = pl.pallas_call(
        functools.partial(_dynamics_kernel, sim_steps=cfg.sim_steps,
                          ortho_every=cfg.orthonormalize_every),
        out_shape=jax.ShapeDtypeStruct((N_OUT, rows, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((N_IN, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pvec, stacked)

    # ONE transpose back to (B, N_OUT), then cheap column slices (field
    # offsets are contiguous — see the O_* table above)
    cols = out.reshape(N_OUT, rows * LANES)[:, :b].T
    dtype = state.pos.dtype
    sl = lambda o, k: cols[:, o:o + k].astype(dtype)
    return state.replace(
        pos=sl(O_POS, 3), vel=sl(O_VEL, 3),
        rot=sl(O_ROT, 9).reshape(b, 3, 3),
        omega=sl(O_OMEGA, 3),
        thrust_cmds_damp=sl(O_CMDSD, 4),
        thrust_rot_damp=sl(O_ROTD, 4),
        acc=sl(O_ACC, 3), accelerometer=sl(O_ACCEL, 3),
        on_floor=cols[:, O_ONFLOOR] > 0.5,
        step_count=cols[:, O_STEPCNT].astype(jnp.int32),
        crashed_floor=cols[:, O_CR_FLOOR] > 0.5,
        crashed_wall=cols[:, O_CR_WALL] > 0.5,
        crashed_ceiling=cols[:, O_CR_CEIL] > 0.5,
    )
