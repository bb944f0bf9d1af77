"""Multi-host initialization and mesh construction.

The reference's multi-machine story is "independent Slurm jobs" (SURVEY.md
§2.2); here a multi-host TPU slice is ONE training job: `jax.distributed`
brings up the cross-host runtime, the env batch shards over every chip in
the slice (ICI within a host, DCN across slices), and the learner's gradient
psum rides the same mesh.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (auto-detected on TPU pods; explicit for CPU multi-process tests).

    MUST run before anything touches the XLA backend — even jax.devices() /
    jax.process_count() would initialize it, so the already-initialized guard
    reads the distributed client state directly."""
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
        kwargs["num_processes"] = int(
            num_processes or os.environ.get("JAX_NUM_PROCESSES", 1))
        kwargs["process_id"] = int(
            process_id or os.environ.get("JAX_PROCESS_ID", 0))
        jax.distributed.initialize(**kwargs)
    else:
        try:
            jax.distributed.initialize()  # TPU metadata auto-detection
        except Exception:
            pass  # single-process


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) job."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_size(global_batch: int) -> int:
    """Per-host slice of a globally-sharded env batch."""
    pc = jax.process_count()
    assert global_batch % pc == 0, (global_batch, pc)
    return global_batch // pc
