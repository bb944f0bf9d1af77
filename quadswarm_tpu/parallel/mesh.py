"""Device-mesh helpers: env-batch sharding over ICI/DCN.

The reference scales rollouts with 36 CPU worker processes x 4 envs
(SURVEY.md §2.2); here thousands of vmapped envs shard over a 1-D `data` mesh
axis with `jax.sharding.NamedSharding` — XLA inserts the gradient psum over
ICI, per the standard JAX data-parallel recipe.  Multi-host extends the same
mesh over DCN via jax.distributed (same code path).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_env_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree with leading env-batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
