"""quadswarm_tpu: TPU-native quadrotor swarm RL (reference: quad-swarm-rl).

Importing the package makes the JAX_PLATFORMS env var effective on hosted
TPU images: their sitecustomize can override jax's platform config at
interpreter start (to the hosted plugin), which silently discards an
explicit `JAX_PLATFORMS=cpu python -m quadswarm_tpu...` request and hangs
CLI runs on an unavailable TPU backend.  We restore the user's requested
platform list, but ONLY when (a) the env var names a different platform set
than the current config, (b) the current config points at the hosted
plugin, and (c) no backend is initialized yet — so a script's own
`jax.config.update("jax_platforms", ...)` is never fought.
"""
from __future__ import annotations

import os


def _honor_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats or "axon" in plats:
        return  # unset, or explicitly requesting the hosted plugin
    try:
        import jax

        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            return
        cur = jax.config.jax_platforms or ""
        if "axon" in cur and set(cur.split(",")) != set(plats.split(",")):
            jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # never make package import fail over a platform hint


_honor_jax_platforms_env()
