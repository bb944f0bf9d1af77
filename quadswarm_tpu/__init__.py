"""quadswarm_tpu: TPU-native quadrotor swarm RL (reference: quad-swarm-rl).

Importing the package honors the JAX_PLATFORMS env var explicitly: hosted
TPU plugins may ignore the env var during backend autodetection, so
`JAX_PLATFORMS=cpu python -m quadswarm_tpu.training.train ...` would
otherwise silently initialize (or hang on) the TPU backend.  Setting the
config flag before any backend exists is equivalent and always respected.
"""
from __future__ import annotations

import os


def _honor_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        from jax._src import xla_bridge
        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # never make package import fail over a platform hint


_honor_jax_platforms_env()
