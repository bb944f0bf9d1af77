"""Sensor noise model: on-device PRNG, fully batched.

Reference: gym_art/quadrotor_multi/sensor_noise.py (SensorNoise.add_noise
:112-170, RotorS-style gyro random walk :221-231).  The class+host-RNG design
becomes a parameter pytree + pure function; gyro bias is carried in the env
state pytree when the random-walk model is enabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from quadswarm_tpu.ops.rotations import (
    quat2rot, quat_from_small_angle, quat_mul, rot2quat,
)


@struct.dataclass
class SensorNoiseParams:
    """Defaults match SensorNoise.__init__ (sensor_noise.py:69-110) with
    bypass=False, i.e. the training configuration `sense_noise='default'`."""

    pos_norm_std: float = 0.005
    pos_unif_range: float = 0.0
    vel_norm_std: float = 0.01
    vel_unif_range: float = 0.0
    quat_norm_std: float = 0.0
    quat_unif_range: float = 0.0
    gyro_norm_std: float = 0.0
    gyro_noise_density: float = 0.000175
    gyro_random_walk: float = 0.0105
    gyro_bias_correlation_time: float = 1000.0
    acc_static_noise_std: float = 0.002
    acc_dynamic_noise_ratio: float = 0.005
    bypass: bool = struct.field(pytree_node=False, default=False)


def apply_noise(params: SensorNoiseParams, pos, vel, rot, omega, acc,
                pos_noise, vel_noise, omega_noise, theta, acc_noise):
    """Deterministic half of the noise model: apply PRE-SAMPLED noise vectors
    exactly like the reference's add_noise arithmetic (sensor_noise.py:
    126-169).  Split out so parity tests can inject the reference's recorded
    noise tape (tests/test_reference_parity.py) and so the sampling backend
    (host np.random there, jax.random here) is interchangeable."""
    noisy_pos = pos + pos_noise
    noisy_vel = vel + vel_noise
    noisy_omega = omega + omega_noise
    quat = rot2quat(rot)
    noisy_rot = quat2rot(quat_mul(quat, quat_from_small_angle(theta)))
    noisy_acc = acc + acc_noise
    return noisy_pos, noisy_vel, noisy_rot, noisy_omega, noisy_acc


def add_noise(params: SensorNoiseParams, key: jax.Array,
              pos: jax.Array, vel: jax.Array, rot: jax.Array,
              omega: jax.Array, acc: jax.Array, dt: float,
              gyro_bias: jax.Array | None = None):
    """Noisy (pos, vel, rot, omega, acc[, gyro_bias']) given ground truth.

    Broadcasts over leading batch dims.  Matches add_noise
    (sensor_noise.py:112-170): gaussian+uniform position/velocity noise,
    small-angle quaternion rotation perturbation, gaussian gyro noise (or the
    RotorS random-walk model when gyro_norm_std != 0), accelerometer
    static+dynamic noise.
    """
    if params.bypass:
        return pos, vel, rot, omega, acc, gyro_bias

    batch = pos.shape[:-1]
    keys = jax.random.split(key, 10)
    dtype = pos.dtype

    def gauss(k, std):
        return std * jax.random.normal(k, batch + (3,), dtype)

    def unif(k, rng):
        return jax.random.uniform(k, batch + (3,), dtype, -rng, rng)

    pos_noise = gauss(keys[0], params.pos_norm_std) + unif(keys[1], params.pos_unif_range)
    vel_noise = gauss(keys[2], params.vel_norm_std) + unif(keys[3], params.vel_unif_range)

    if params.gyro_norm_std != 0.0 and gyro_bias is not None:
        # RotorS IMU random-walk bias model (sensor_noise.py:221-231)
        sigma_g_d = params.gyro_noise_density / jnp.sqrt(dt)
        tau = params.gyro_bias_correlation_time
        sigma_b_g_d = jnp.sqrt(-(sigma_g_d**2) * (tau / 2) * (jnp.exp(-2 * dt / tau) - 1.0))
        pi_g_d = jnp.exp(-dt / tau)
        gyro_bias = pi_g_d * gyro_bias + sigma_b_g_d * jax.random.normal(
            keys[4], batch + (3,), dtype)
        omega_noise = gyro_bias + params.gyro_random_walk * jax.random.normal(
            keys[5], batch + (3,), dtype)
    else:
        omega_noise = gauss(keys[4], params.gyro_noise_density)

    # Rotation noise: small-angle quaternion perturbation
    theta = (params.quat_norm_std * jax.random.normal(keys[6], batch + (3,), dtype)
             + jax.random.uniform(keys[7], batch + (3,), dtype,
                                  -params.quat_unif_range, params.quat_unif_range))

    acc_noise = (gauss(keys[8], params.acc_static_noise_std)
                 + acc * (params.acc_dynamic_noise_ratio
                          * jax.random.normal(keys[9], batch + (3,), dtype)))

    noisy_pos, noisy_vel, noisy_rot, noisy_omega, noisy_acc = apply_noise(
        params, pos, vel, rot, omega, acc,
        pos_noise, vel_noise, omega_noise, theta, acc_noise)
    return noisy_pos, noisy_vel, noisy_rot, noisy_omega, noisy_acc, gyro_bias
