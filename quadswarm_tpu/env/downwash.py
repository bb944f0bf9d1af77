"""Downwash aerodynamic interaction between stacked drones.

Reference: gym_art/quadrotor_multi/aerodynamics/downwash.py (cylinder force
model fitted to Neural-Swarm data).  The O(N^2) Python double loop becomes a
masked pairwise computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

XY_DOWNWASH = 0.1   # cylinder radius, m
Z_DOWNWASH = 0.7    # cylinder height below the upper drone, m
EPS = 1e-6


def apply_downwash(key: jax.Array, pos: jax.Array, vel: jax.Array,
                   omega: jax.Array, rot: jax.Array, dt: float):
    """Add downwash velocity/omega deltas; returns (vel, omega, applied (N,)).

    For each (source i, victim j) pair with j inside the cylinder below i:
      acc(d)   = (6/17) * (-10 d + 7) + U(-0.1, 0.1), clamped >= 1e-6
      omega(d) = 0.3 (d-1)^2 + U(-0.01, 0.01),        clamped >= 1e-6
    applied along the noisy negative body-z of the source
    (downwash.py:29-51, get_vel_omega_norm:54-66).

    The reference applies contributions sequentially per source drone; here a
    victim under several sources accumulates all contributions in one fused
    update (sum over sources) — same result, since the reference's `+=`
    updates commute.
    """
    n = pos.shape[0]
    dtype = pos.dtype
    k_acc, k_om, k_axis, k_dir = jax.random.split(key, 4)

    z_axis = rot[..., :, 2]                                  # (N, 3) body z, world frame
    rel = pos[None, :, :] - pos[:, None, :]                  # rel[i, j] = pos_j - pos_i
    dist = jnp.linalg.norm(rel, axis=-1)                     # (N, N)

    # Per-source random scalars (reference draws one uniform per source i)
    acc_noise = jax.random.uniform(k_acc, (n, 1), dtype, -0.1, 0.1)
    om_noise = jax.random.uniform(k_om, (n, 1), dtype, -0.01, 0.01)
    acc = jnp.maximum((6.0 / 17.0) * (-10.0 * dist + 7.0) + acc_noise, 1e-6)
    om_mag = jnp.maximum(0.3 * (dist - 1.0) ** 2 + om_noise, 1e-6)

    rel_z = jnp.einsum("ijk,ik->ij", rel, z_axis)            # component along source z
    rel_xy = jnp.sqrt(jnp.maximum(dist**2 - rel_z**2, 0.0))
    eye = jnp.eye(n, dtype=bool)
    in_cyl = (rel_z > -Z_DOWNWASH) & (rel_z < 0.0) & (rel_xy < XY_DOWNWASH) & ~eye

    # Per-source noisy downward axis and per-source random omega direction
    noisy_axis = z_axis + jax.random.uniform(k_axis, (n, 3), dtype, -0.1, 0.1)
    mag = jnp.linalg.norm(noisy_axis, axis=-1, keepdims=True)
    down_axis = -noisy_axis / jnp.where(mag == 0.0, mag + EPS, mag)
    dir_om = jax.random.uniform(k_dir, (n, 3), dtype, -1.0, 1.0)
    dmag = jnp.linalg.norm(dir_om, axis=-1, keepdims=True)
    dir_om = dir_om / jnp.where(dmag == 0.0, dmag + EPS, dmag)

    w = jnp.where(in_cyl, 1.0, 0.0)                          # (sources, victims)
    dvel = jnp.einsum("ij,ij,ik->jk", w, acc, down_axis) * dt
    domega = jnp.einsum("ij,ij,ik->jk", w, om_mag, dir_om) * dt
    applied = jnp.any(in_cyl, axis=0)
    return vel + dvel, omega + domega, applied
