"""Quadrotor physical parameter presets, inertia composition, and the
device-resident `DynamicsParams` pytree.

Host-side (NumPy) setup code: the composite-rigid-body inertia model
(reference: gym_art/quadrotor_multi/inertia.py), the named quad presets
(quad_models.py), and domain-randomization samplers
(quadrotor_randomization.py).  All of it runs once per (re)configuration and
produces a flat pytree of arrays that the jitted dynamics kernel consumes —
no Python objects cross into the device path.
"""
from __future__ import annotations

import copy
import dataclasses
from typing import Any

import numpy as np
from flax import struct

GRAV = 9.81
EPS = 1e-6


# ---------------------------------------------------------------------------
# Presets (reference: gym_art/quadrotor_multi/quad_models.py)
# ---------------------------------------------------------------------------

def crazyflie_params() -> dict:
    """Crazyflie 2.x physical parameters (quad_models.py:1-42)."""
    return {
        "geom": {
            "body": {"l": 0.03, "w": 0.03, "h": 0.004, "m": 0.005},
            "payload": {"l": 0.035, "w": 0.02, "h": 0.008, "m": 0.01},
            "arms": {"l": 0.022, "w": 0.005, "h": 0.005, "m": 0.001},
            "motors": {"h": 0.02, "r": 0.0035, "m": 0.0015},
            "propellers": {"h": 0.002, "r": 0.022, "m": 0.00075},
            "motor_pos": {"xyz": [0.065 / 2, 0.065 / 2, 0.0]},
            "arms_pos": {"angle": 45.0, "z": 0.0},
            "payload_pos": {"xy": [0.0, 0.0], "z_sign": 1},
        },
        "damp": {"vel": 0.0, "omega_quadratic": 0.0},
        "noise": {"thrust_noise_ratio": 0.05},
        "motor": {
            "thrust_to_weight": 1.9,
            "assymetry": [1.0, 1.0, 1.0, 1.0],
            "torque_to_thrust": 0.006,
            "linearity": 1.0,
            "C_drag": 0.0,
            "C_roll": 0.0,
            "damp_time_up": 0.15,
            "damp_time_down": 0.15,
        },
    }


def defaultquad_params() -> dict:
    """AscTec-Hummingbird-like default quad (quad_models.py:45-85)."""
    return {
        "geom": {
            "body": {"l": 0.1, "w": 0.1, "h": 0.085, "m": 0.5},
            "payload": {"l": 0.12, "w": 0.12, "h": 0.04, "m": 0.1},
            "arms": {"l": 0.1, "w": 0.015, "h": 0.015, "m": 0.025},
            "motors": {"h": 0.02, "r": 0.025, "m": 0.02},
            "propellers": {"h": 0.001, "r": 0.1, "m": 0.009},
            "motor_pos": {"xyz": [0.12, 0.12, 0.0]},
            "arms_pos": {"angle": 45.0, "z": 0.0},
            "payload_pos": {"xy": [0.0, 0.0], "z_sign": -1},
        },
        "damp": {"vel": 0.0, "omega_quadratic": 0.0},
        "noise": {"thrust_noise_ratio": 0.05},
        "motor": {
            "thrust_to_weight": 2.8,
            "assymetry": [1.0, 1.0, 1.0, 1.0],
            "torque_to_thrust": 0.05,
            "linearity": 1.0,
            "C_drag": 0.0,
            "C_roll": 0.0,
            "damp_time_up": 0.0,
            "damp_time_down": 0.0,
        },
    }


def mediumquad_params() -> dict:
    """Medium quad preset (quad_models.py:88-128)."""
    return {
        "geom": {
            "body": {"l": 0.04, "w": 0.04, "h": 0.04, "m": 0.04},
            "payload": {"l": 0.06, "w": 0.015, "h": 0.015, "m": 0.029},
            "arms": {"l": 0.04, "w": 0.01, "h": 0.003, "m": 0.006},
            "motors": {"h": 0.013, "r": 0.007, "m": 0.006},
            "propellers": {"h": 0.007, "r": 0.035, "m": 0.0012},
            "motor_pos": {"xyz": [0.046, 0.046, 0.0]},
            "arms_pos": {"angle": 45.0, "z": 0.0},
            "payload_pos": {"xy": [0.0, 0.0], "z_sign": -1},
        },
        "damp": {"vel": 0.0, "omega_quadratic": 0.0},
        "noise": {"thrust_noise_ratio": 0.05},
        "motor": {
            "thrust_to_weight": 2.5,
            "assymetry": [1.0, 1.0, 1.0, 1.0],
            "torque_to_thrust": 0.05,
            "linearity": 1.0,
            "C_drag": 0.0,
            "C_roll": 0.0,
            "damp_time_up": 0.15,
            "damp_time_down": 0.15,
        },
    }


def crazyflie_lowinertia_params() -> dict:
    """Low-inertia Crazyflie variant (quad_models.py:135-177)."""
    p = crazyflie_params()
    p["geom"]["body"]["m"] = 0.014
    p["geom"]["arms"]["m"] = 0.0005
    p["geom"]["motors"]["m"] = 0.0005
    p["geom"]["propellers"]["m"] = 0.0000075
    return p


QUAD_PRESETS = {
    "Crazyflie": crazyflie_params,
    "CrazyflieLowInertia": crazyflie_lowinertia_params,
    "DefaultQuad": defaultquad_params,
    "MediumQuad": mediumquad_params,
}


def dict_update_existing(dic: dict, upd: dict) -> None:
    """Recursively overwrite existing keys only (quad_utils.py:245-250)."""
    for key in upd:
        if isinstance(dic.get(key), dict):
            dict_update_existing(dic[key], upd[key])
        else:
            dic[key] = upd[key]


# ---------------------------------------------------------------------------
# Composite-rigid-body inertia (reference: inertia.py)
# ---------------------------------------------------------------------------

def _box_inertia(l: float, w: float, h: float, m: float) -> np.ndarray:
    return np.diag([
        m / 12.0 * (h**2 + w**2),
        m / 12.0 * (l**2 + h**2),
        m / 12.0 * (w**2 + l**2),
    ])


def _cylinder_inertia(h: float, r: float, m: float) -> np.ndarray:
    a = m / 12.0 * (3 * r**2 + h**2)
    return np.diag([a, a, 0.5 * m * r**2])


def _rotate_inertia(inertia: np.ndarray, rot: np.ndarray) -> np.ndarray:
    return rot @ inertia @ rot.T


def _translate_inertia(inertia: np.ndarray, m: float, xyz: np.ndarray) -> np.ndarray:
    """Parallel-axis offset, replicating the reference's exact formula.

    NOTE: the reference has a quirk (inertia.py:29-36): the [0,2] off-diagonal
    term reuses I[0][1] instead of I[0][2].  For the diagonal-only inertias we
    compose (boxes/cylinders at axis-aligned poses after 45-degree arm
    rotation) the off-diagonals cancel in the total, so we keep the faithful
    formula to preserve numeric parity.
    """
    x, y, z = xyz
    out = np.zeros((3, 3))
    out[0, 0] = inertia[0, 0] + m * (y**2 + z**2)
    out[1, 1] = inertia[1, 1] + m * (x**2 + z**2)
    out[2, 2] = inertia[2, 2] + m * (x**2 + y**2)
    out[0, 1] = out[1, 0] = inertia[0, 1] + m * x * y
    out[0, 2] = out[2, 0] = inertia[0, 1] + m * x * z
    out[1, 2] = out[2, 1] = inertia[1, 2] + m * y * z
    return out


def _yaw_mat(alpha: float) -> np.ndarray:
    c, s = np.cos(alpha), np.sin(alpha)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def compute_quad_inertia(geom: dict, simplified: bool = False) -> dict:
    """Compose body/payload/arms/motors/props into total mass, COM-centered
    inertia tensor, and propeller (motor) positions.

    Mirrors QuadLink (inertia.py:182-310).  `simplified` corresponds to
    QuadLinkSimplified (two rods + massless props); we approximate it with the
    full model since training configs never enable it — kept as a flag for API
    parity.
    """
    del simplified  # full model used for both paths
    body, payload = geom["body"], geom["payload"]
    arms, motors, props = geom["arms"], geom["motors"], geom["propellers"]

    arm_angle = np.deg2rad(geom["arms_pos"]["angle"]) or 0.01
    motor_xyz = np.array(geom["motor_pos"]["xyz"], dtype=np.float64)
    delta_y = motor_xyz[1] - body["w"] / 2.0
    arm_l = arms.get("l", delta_y / np.sin(arm_angle))
    arm_xyz = np.array(
        [
            motor_xyz[0] - delta_y / (2 * np.tan(arm_angle)),
            motor_xyz[1] - delta_y / 2.0,
            geom["arms_pos"]["z"],
        ]
    )

    # X-configuration sign pattern, clockwise from front-right
    # (inertia.py:237-241).
    x_sign = np.array([1, -1, -1, 1], dtype=np.float64)
    y_sign = np.array([-1, -1, 1, 1], dtype=np.float64)
    sign_mx = np.stack([x_sign, y_sign, np.ones(4)])
    motors_coord = sign_mx * motor_xyz[:, None]
    props_coord = motors_coord.copy()
    props_coord[2, :] += motors["h"] / 2.0 + props["h"]
    arms_coord = sign_mx * arm_xyz[:, None]
    arm_angles = np.array([-arm_angle, arm_angle, -arm_angle, arm_angle])

    masses = [body["m"], payload["m"]]
    inertias = [
        _box_inertia(body["l"], body["w"], body["h"], body["m"]),
        _box_inertia(payload["l"], payload["w"], payload["h"], payload["m"]),
    ]
    poses = [
        np.zeros(3),
        np.array(
            list(geom["payload_pos"]["xy"])
            + [np.sign(geom["payload_pos"]["z_sign"]) * (body["h"] + payload["h"]) / 2.0]
        ),
    ]
    rots = [np.eye(3), np.eye(3)]
    for i in range(4):
        masses.append(arms["m"])
        inertias.append(_box_inertia(arm_l, arms["w"], arms["h"], arms["m"]))
        poses.append(arms_coord[:, i])
        rots.append(_yaw_mat(arm_angles[i]))
    for i in range(4):
        masses.append(motors["m"])
        inertias.append(_cylinder_inertia(motors["h"], motors["r"], motors["m"]))
        poses.append(motors_coord[:, i])
        rots.append(np.eye(3))
    for i in range(4):
        masses.append(props["m"])
        inertias.append(_cylinder_inertia(props["h"], props["r"], props["m"]))
        poses.append(props_coord[:, i])
        rots.append(np.eye(3))

    masses = np.array(masses)
    total_m = masses.sum()
    com = sum(m * p for m, p in zip(masses, poses)) / total_m
    total_inertia = np.zeros((3, 3))
    for m, inertia, pose, rot in zip(masses, inertias, poses, rots):
        total_inertia += _translate_inertia(_rotate_inertia(inertia, rot), m, pose - com)

    # Propeller thrust application points = motor positions, COM-relative
    # (inertia.py:306-310 uses motors_pos for prop_pos).
    prop_pos = (motors_coord.T - com)
    return {
        "mass": float(total_m),
        "inertia": np.diagonal(total_inertia).copy(),
        "prop_pos": prop_pos,
        "motor_xyz": motor_xyz,
        "arm": float(np.linalg.norm(motor_xyz[:2])),
    }


# ---------------------------------------------------------------------------
# DynamicsParams: everything the jitted step kernel needs
# ---------------------------------------------------------------------------

@struct.dataclass
class DynamicsParams:
    """Flat numeric parameters consumed by the dynamics kernel (a pytree).

    Fields are scalars / small arrays; `stack` turns a list of these into
    per-drone-batched arrays for domain randomization.  Derived quantities
    follow QuadrotorDynamics.update_model (quadrotor_dynamics.py:104-166).
    """

    mass: Any
    inertia: Any                 # (3,) diagonal inertia
    thrust_max: Any              # (4,)
    torque_max: Any              # (4,)
    prop_pos: Any                # (4,3)
    prop_crossproducts: Any      # (4,3)
    prop_ccw: Any                # (4,)
    motor_linearity: Any
    motor_tau_up: Any
    motor_tau_down: Any
    thrust_noise_ratio: Any
    vel_damp: Any
    damp_omega_quadratic: Any
    c_drag: Any
    c_roll: Any
    arm: Any
    torque_to_inertia: Any       # (3,) used by obs-space metadata only

    @classmethod
    def from_model(cls, model_params: dict, dt: float = 1.0 / 200) -> "DynamicsParams":
        geom = model_params["geom"]
        motor = model_params["motor"]
        derived = compute_quad_inertia(geom)
        mass, inertia = derived["mass"], derived["inertia"]
        assym = np.array(motor.get("assymetry", [1.0] * 4), dtype=np.float64)
        assym = assym * 4.0 / assym.sum()
        thrust_max = GRAV * mass * motor["thrust_to_weight"] * assym / 4.0
        torque_max = motor["torque_to_thrust"] * thrust_max
        prop_pos = derived["prop_pos"]
        prop_crossproducts = np.cross(prop_pos, np.array([0.0, 0.0, 1.0]))
        prop_ccw = np.array([-1.0, 1.0, -1.0, 1.0])

        prop_ccw_mx = np.zeros((3, 4))
        prop_ccw_mx[2, :] = prop_ccw
        g_omega = (1.0 / inertia)[:, None] * (
            thrust_max * prop_crossproducts.T + torque_max * prop_ccw_mx
        )
        tti = g_omega @ np.array(
            [[0.0, 0.0, 0.0], [0.0, 1.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0]]
        )
        tti = np.sum(tti, axis=1)

        return cls(
            mass=np.float64(mass),
            inertia=np.asarray(inertia, dtype=np.float64),
            thrust_max=thrust_max,
            torque_max=torque_max,
            prop_pos=prop_pos,
            prop_crossproducts=prop_crossproducts,
            prop_ccw=prop_ccw,
            motor_linearity=np.float64(motor["linearity"]),
            motor_tau_up=np.float64(4 * dt / (motor["damp_time_up"] + EPS)),
            motor_tau_down=np.float64(4 * dt / (motor["damp_time_down"] + EPS)),
            thrust_noise_ratio=np.float64(model_params["noise"]["thrust_noise_ratio"]),
            vel_damp=np.float64(model_params["damp"]["vel"]),
            damp_omega_quadratic=np.float64(model_params["damp"]["omega_quadratic"]),
            c_drag=np.float64(motor["C_drag"]),
            c_roll=np.float64(motor["C_roll"]),
            arm=np.float64(derived["arm"]),
            torque_to_inertia=tti,
        )

    def astype(self, dtype) -> "DynamicsParams":
        return DynamicsParams(
            **{
                f.name: np.asarray(getattr(self, f.name), dtype=dtype)
                for f in dataclasses.fields(self)
            }
        )

    @staticmethod
    def stack(items: list["DynamicsParams"]) -> "DynamicsParams":
        """Stack per-drone parameter sets along a new leading axis."""
        out = {}
        for f in dataclasses.fields(DynamicsParams):
            out[f.name] = np.stack([np.asarray(getattr(it, f.name)) for it in items])
        return DynamicsParams(**out)

    @staticmethod
    def tile(item: "DynamicsParams", n: int) -> "DynamicsParams":
        return DynamicsParams.stack([item] * n)


# ---------------------------------------------------------------------------
# Domain randomization (reference: quadrotor_randomization.py)
# ---------------------------------------------------------------------------

def check_quad_param_limits(params: dict, params_init: dict | None = None) -> dict:
    """Clamp sampled parameters to physical limits
    (quadrotor_randomization.py:16-46)."""
    p = params
    geom = p["geom"]
    body = geom["body"]
    body["w"] = body["l"] = float(np.clip(body["l"], 0.005, 0.3))
    body["h"] = float(np.clip(body["h"], 0.001, body["w"]))
    geom["motor_pos"]["xyz"][0] = float(
        np.clip(geom["motor_pos"]["xyz"][0], body["l"] / 2.0 + 0.005, 0.6)
    )
    geom["motor_pos"]["xyz"][1] = geom["motor_pos"]["xyz"][0]
    geom["payload_pos"]["xy"] = list(
        np.clip(geom["payload_pos"]["xy"], -body["l"] / 2.0, body["l"] / 2.0)
    )
    motor = p["motor"]
    motor["thrust_to_weight"] = float(np.clip(motor["thrust_to_weight"], 1.2, 5.0))
    motor["torque_to_thrust"] = float(np.clip(motor["torque_to_thrust"], 0.005, 1.0))
    motor["linearity"] = 1.0  # firmware non-linearity compensation (see ref WARN)
    motor["damp_time_up"] = float(np.clip(motor["damp_time_up"], 0.0, 1.0))
    motor["damp_time_down"] = float(np.clip(motor["damp_time_down"], 0.0, 1.0))
    p["noise"]["thrust_noise_ratio"] = float(np.clip(p["noise"]["thrust_noise_ratio"], 0.0, 0.3))
    p["damp"]["vel"] = float(np.clip(p["damp"]["vel"], 0.0, 1.0))
    p["damp"]["omega_quadratic"] = float(np.clip(p["damp"]["omega_quadratic"], 0.0, 1.0))
    return p


class ConstValueSampler:
    """Always returns the given params (quadrotor_randomization.py:371-377)."""

    def __init__(self, params: dict | None = None):
        self.params = params

    def sample(self, params: dict | None = None) -> dict:
        return copy.deepcopy(params if params is not None else self.params)


class RelativeSampler:
    """Perturb every leaf by +- noise_ratio relative noise
    (quadrotor_randomization.py:345-357, perturb_dyn_parameters:75-104)."""

    def __init__(self, params: dict | None = None, noise_ratio: float = 0.1,
                 sampler: str = "normal", rng: np.random.Generator | None = None):
        self.params = params
        self.noise_ratio = noise_ratio
        self.sampler = sampler
        self.rng = rng or np.random.default_rng()

    def _perturb(self, value):
        if isinstance(value, (list, tuple, np.ndarray)):
            return [self._perturb(v) for v in value]
        if not isinstance(value, (int, float)):
            return value
        if self.sampler == "normal":
            noise = self.rng.normal(0.0, self.noise_ratio)
        else:
            noise = self.rng.uniform(-self.noise_ratio, self.noise_ratio)
        return float(value) * (1.0 + noise)

    def sample(self, params: dict | None = None) -> dict:
        base = copy.deepcopy(params if params is not None else self.params)

        def walk(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v)
                else:
                    node[k] = self._perturb(v)

        walk(base)
        return check_quad_param_limits(base)


class AbsoluteSampler(RelativeSampler):
    """Perturb every leaf by absolute +- noise
    (quadrotor_randomization.py:359-369)."""

    def _perturb(self, value):
        if isinstance(value, (list, tuple, np.ndarray)):
            return [self._perturb(v) for v in value]
        if not isinstance(value, (int, float)):
            return value
        if self.sampler == "normal":
            noise = self.rng.normal(0.0, self.noise_ratio)
        else:
            noise = self.rng.uniform(-self.noise_ratio, self.noise_ratio)
        return float(value) + noise


class _PresetSampler:
    def __init__(self, factory):
        self._factory = factory

    def sample(self, params: dict | None = None) -> dict:
        return self._factory()


def Crazyflie(**kwargs):  # noqa: N802 - mirror reference sampler names
    return _PresetSampler(crazyflie_params)


def CrazyflieLowInertia(**kwargs):  # noqa: N802
    return _PresetSampler(crazyflie_lowinertia_params)


def DefaultQuad(**kwargs):  # noqa: N802
    return _PresetSampler(defaultquad_params)


def MediumQuad(**kwargs):  # noqa: N802
    return _PresetSampler(mediumquad_params)


class RandomQuad:
    """Fully random quad geometry (quadrotor_randomization.py:142-243).

    Samples a physically-plausible quad: body size, motor placement, masses
    proportional to volume with randomized density, and motor/damp params in
    the reference's documented ranges.
    """

    def __init__(self, rng: np.random.Generator | None = None, **kwargs):
        self.rng = rng or np.random.default_rng()

    def sample(self, params: dict | None = None) -> dict:
        rng = self.rng
        p = crazyflie_params()
        geom = p["geom"]
        body_l = rng.uniform(0.005, 0.3)
        geom["body"] = {
            "l": body_l,
            "w": body_l,
            "h": rng.uniform(0.001, body_l),
            "m": 0.0,
        }
        geom["body"]["m"] = 600.0 * rng.uniform(0.5, 2.0) * (
            geom["body"]["l"] * geom["body"]["w"] * geom["body"]["h"]
        )
        motor_x = rng.uniform(body_l / 2.0 + 0.005, 0.6)
        geom["motor_pos"] = {"xyz": [motor_x, motor_x, 0.0]}
        geom["payload"]["m"] = geom["body"]["m"] * rng.uniform(0.3, 1.0)
        geom["arms"]["l"] = motor_x * np.sqrt(2.0) * rng.uniform(0.5, 1.0)
        p["motor"]["thrust_to_weight"] = rng.uniform(1.8, 2.5)
        p["motor"]["torque_to_thrust"] = rng.uniform(0.005, 0.025)
        p["motor"]["damp_time_up"] = rng.uniform(0.1, 0.2)
        p["motor"]["damp_time_down"] = p["motor"]["damp_time_up"]
        p["damp"]["omega_quadratic"] = rng.uniform(0.0, 0.05)
        p["noise"]["thrust_noise_ratio"] = rng.uniform(0.01, 0.05)
        return check_quad_param_limits(p)


DYN_SAMPLERS = {
    "Crazyflie": Crazyflie,
    "CrazyflieLowInertia": CrazyflieLowInertia,
    "DefaultQuad": DefaultQuad,
    "MediumQuad": MediumQuad,
    "RandomQuad": RandomQuad,
    "RelativeSampler": RelativeSampler,
    "AbsoluteSampler": AbsoluteSampler,
    "ConstValueSampler": ConstValueSampler,
}


def make_dynamics_params(quad: str = "Crazyflie",
                         dynamics_change: dict | None = None,
                         dyn_sampler_1: dict | None = None,
                         num_agents: int = 1, per_drone: bool = False,
                         dt: float = 1.0 / 200, seed: int = 0,
                         dtype=np.float32) -> DynamicsParams:
    """Build (optionally per-drone-randomized) dynamics parameters the way
    the reference env factory does (env_wrappers/quad_utils.py:20-35 +
    quadrotor_single.py:184-211): base sampler by quad name, `dynamics_change`
    dict update, then an optional perturbation sampler.

    per_drone=True samples an independent parameter set for every drone and
    stacks them along a leading axis (consumed by env_step's vmapped
    dynamics); this is the TPU equivalent of per-env dynamics randomization.
    """
    rng = np.random.default_rng(seed)
    base_sampler = DYN_SAMPLERS[quad]()
    if hasattr(base_sampler, "rng"):
        base_sampler.rng = rng

    sampler_1 = None
    if dyn_sampler_1 is not None:
        kwargs = dict(dyn_sampler_1)
        cls_name = kwargs.pop("class", kwargs.pop("type", None))
        sampler_1 = DYN_SAMPLERS[cls_name](rng=rng, **kwargs)

    def sample_one() -> DynamicsParams:
        model = base_sampler.sample()
        if dynamics_change is not None:
            dict_update_existing(model, copy.deepcopy(dynamics_change))
        if sampler_1 is not None:
            model = sampler_1.sample(model)
        check_quad_param_limits(model)
        return DynamicsParams.from_model(model, dt=dt).astype(dtype)

    if not per_drone:
        return sample_one()
    return DynamicsParams.stack([sample_one() for _ in range(num_agents)])
