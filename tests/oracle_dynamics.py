"""NumPy reference oracle for one physics sub-step.

Re-states the published quadrotor model (Mellinger/RotorS-style, as used by
QuadSwarm: motor first-order filter in sqrt domain, thrust+reaction torques,
Rodrigues rotational integration, Euler translation with room clipping, and
the floor-contact friction state machine).  Scalar, single-drone, NumPy only —
serves as the bit-level oracle for the batched JAX kernel, mirroring the
reference's own numba-vs-python parity harness (tests/test_numba_opt.py).
"""
import numpy as np

GRAV = 9.81
EPS = 1e-6


def oracle_substep(p, s, thrust_cmds, thrust_noise, dt, room_lo, room_hi,
                   floor_threshold=0.05, mu=0.6, omega_max=40.0,
                   ortho_every=101, rand_yaw_theta=0.0):
    """Advance one sub-step; `p` is a dict of params, `s` a dict of state.

    Returns a new state dict.  All branching is plain Python, making this the
    trusted single-drone ground truth.
    """
    s = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in s.items()}
    cmds = np.clip(np.asarray(thrust_cmds, dtype=np.float64), 0.0, 1.0)

    # Motor filter (sqrt domain, asymmetric tau)
    tau = np.where(cmds < s["cmds_damp"], p["tau_down"], p["tau_up"])
    tau = np.minimum(tau, 1.0)
    rot_cmd = np.sqrt(cmds)
    s["rot_damp"] = tau * (rot_cmd - s["rot_damp"]) + s["rot_damp"]
    s["cmds_damp"] = np.clip(s["rot_damp"] ** 2 + cmds * thrust_noise, 0.0, 1.0)

    lin = p["linearity"]
    thrusts = p["thrust_max"] * ((1 - lin) * s["cmds_damp"] ** 2 + lin * s["cmds_damp"])
    torques = p["prop_cross"] * thrusts[:, None]
    torques[:, 2] += p["torque_max"] * p["prop_ccw"] * s["cmds_damp"]
    torque = torques.sum(axis=0)
    thrust_z = thrusts.sum()

    # Rodrigues rotation update about world-frame omega
    w_world = s["rot"] @ s["omega"]
    wn = np.linalg.norm(w_world)
    if wn != 0.0:
        k = np.array([[0, -w_world[2], w_world[1]],
                      [w_world[2], 0, -w_world[0]],
                      [-w_world[1], w_world[0], 0]]) / wn
        ang = wn * dt
        drot = np.eye(3) + np.sin(ang) * k + (1 - np.cos(ang)) * (k @ k)
        s["rot"] = drot @ s["rot"]

    s["step_count"] = s.get("step_count", 0) + 1
    if s["step_count"] >= ortho_every:
        u, _, vt = np.linalg.svd(s["rot"])
        s["rot"] = u @ vt
        s["step_count"] = 0

    # Omega update with quadratic damping
    inv_i = 1.0 / p["inertia"]
    omega_dot = inv_i * (np.cross(-s["omega"], p["inertia"] * s["omega"]) + torque)
    dq = np.clip(p["damp_omega_quad"] * s["omega"] ** 2, 0.0, 1.0)
    s["omega"] = np.clip(s["omega"] + (1 - dq) * dt * omega_dot, -omega_max, omega_max)

    # Translation + room clip
    pos_raw = s["pos"] + dt * s["vel"]
    s["pos"] = np.clip(pos_raw, room_lo, room_hi)
    s["crashed_wall"] = not np.array_equal(pos_raw[:2], s["pos"][:2])
    s["crashed_ceiling"] = pos_raw[2] > s["pos"][2]

    # Floor interaction
    sum_thr_drag = np.array([0.0, 0.0, thrust_z])
    s["crashed_floor"] = False
    if s["pos"][2] <= floor_threshold:
        s["pos"][2] = floor_threshold
        force = s["rot"] @ sum_thr_drag
        theta = np.arctan2(s["rot"][1, 0], s["rot"][0, 0] + EPS)
        c, q = np.cos(theta), np.sin(theta)
        flat = np.array([[c, -q, 0.0], [q, c, 0.0], [0.0, 0.0, 1.0]])
        if s["on_floor"]:
            s["rot"] = flat
            # numba/training-path semantics (floor_interaction_numba:583-604):
            # fr_mag is NOT clamped at 0 (phantom force when thrust > weight,
            # direction arctan2(0,0)=+x), kinetic friction opposes velocity.
            fr_mag = mu * (p["mass"] * GRAV - force[2])
            if np.linalg.norm(s["vel"]) < EPS:
                fxy = np.linalg.norm(force[:2])
                new_mag = max(fxy - fr_mag, 0.0)
                if new_mag == 0.0:
                    force[0] = force[1] = 0.0
                else:
                    ang = np.arctan2(force[1], force[0])
                    force[0] = new_mag * np.cos(ang)
                    force[1] = new_mag * np.sin(ang)
            else:
                ang = np.arctan2(s["vel"][1], s["vel"][0])
                force[0] -= np.cos(ang) * fr_mag
                force[1] -= np.sin(ang) * fr_mag
        else:
            s["on_floor"] = True
            s["crashed_floor"] = True
            s["vel"] = np.zeros(3)
            s["omega"] = np.zeros(3)
            if s["rot"][2, 2] < 0:
                c, q = np.cos(rand_yaw_theta), np.sin(rand_yaw_theta)
                s["rot"] = np.array([[c, -q, 0.0], [q, c, 0.0], [0.0, 0.0, 1.0]])
            else:
                s["rot"] = flat
            s["cmds_damp"] = np.zeros(4)
            s["rot_damp"] = np.zeros(4)
        acc = np.array([0.0, 0.0, -GRAV]) + force / p["mass"]
        acc[2] = max(0.0, acc[2])
    else:
        s["on_floor"] = False
        force = s["rot"] @ sum_thr_drag
        acc = np.array([0.0, 0.0, -GRAV]) + force / p["mass"]

    s["acc"] = acc
    s["vel"] = (1.0 - p["vel_damp"]) * s["vel"] + dt * acc
    s["accelerometer"] = s["rot"].T @ (acc + np.array([0.0, 0.0, GRAV]))
    return s


def oracle_params(dyn_params):
    """Flatten a DynamicsParams into the oracle's dict form."""
    return {
        "mass": float(dyn_params.mass),
        "inertia": np.asarray(dyn_params.inertia, dtype=np.float64),
        "thrust_max": np.asarray(dyn_params.thrust_max, dtype=np.float64),
        "torque_max": np.asarray(dyn_params.torque_max, dtype=np.float64),
        "prop_cross": np.asarray(dyn_params.prop_crossproducts, dtype=np.float64),
        "prop_ccw": np.asarray(dyn_params.prop_ccw, dtype=np.float64),
        "linearity": float(dyn_params.motor_linearity),
        "tau_up": float(dyn_params.motor_tau_up),
        "tau_down": float(dyn_params.motor_tau_down),
        "vel_damp": float(dyn_params.vel_damp),
        "damp_omega_quad": float(dyn_params.damp_omega_quadratic),
    }


def oracle_init_state():
    return {
        "pos": np.zeros(3),
        "vel": np.zeros(3),
        "rot": np.eye(3),
        "omega": np.zeros(3),
        "cmds_damp": np.zeros(4),
        "rot_damp": np.zeros(4),
        "acc": np.zeros(3),
        "accelerometer": np.array([0.0, 0.0, GRAV]),
        "on_floor": False,
        "crashed_floor": False,
        "crashed_wall": False,
        "crashed_ceiling": False,
        "step_count": 0,
    }
