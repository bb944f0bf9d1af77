"""Checkpoint save/load (flax msgpack serialization).

Replaces the reference's reliance on Sample Factory checkpoints
(SURVEY.md §5 checkpoint/resume): model params + optimizer state + counters
serialize to `checkpoint_*.msgpack` under the experiment dir; `latest`/`best`
selection mirrors SF's Learner.get_checkpoints.
"""
from __future__ import annotations

import glob
import os
import re

import jax
from flax import serialization


def checkpoint_dir(train_dir: str, experiment: str, policy_id: int = 0) -> str:
    return os.path.join(train_dir, experiment, f"checkpoint_p{policy_id}")


def save_checkpoint(path_dir: str, train_state, env_steps: int,
                    keep: int = 3, tag: str = "checkpoint",
                    extra=None) -> str:
    """`extra` is an optional auxiliary pytree saved alongside the train
    state (e.g. the input/return NormalizerState) so resume is exact."""
    os.makedirs(path_dir, exist_ok=True)
    payload = {
        "params": serialization.to_state_dict(jax.device_get(train_state.params)),
        "opt_state": serialization.to_state_dict(
            jax.device_get(train_state.opt_state)),
        "step": int(train_state.step),
        "env_steps": int(env_steps),
    }
    if extra is not None:
        payload["extra"] = serialization.to_state_dict(jax.device_get(extra))
    path = os.path.join(path_dir, f"{tag}_{env_steps:012d}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    old = sorted(glob.glob(os.path.join(path_dir, f"{tag}_*.msgpack")))
    for p in old[:-keep]:
        os.remove(p)
    return path


def get_checkpoints(path_dir: str, tag: str = "checkpoint") -> list[str]:
    return sorted(glob.glob(os.path.join(path_dir, f"{tag}_*.msgpack")))


def load_checkpoint(path: str, train_state=None, extra=None):
    """Return the raw payload dict; if `train_state` given, restore into it.
    With `extra` (a template pytree), also restore and return the auxiliary
    state saved by save_checkpoint(extra=...) — 3-tuple return."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if train_state is None:
        return payload
    restored = train_state.replace(
        params=serialization.from_state_dict(train_state.params, payload["params"]),
        opt_state=serialization.from_state_dict(train_state.opt_state,
                                                payload["opt_state"]),
        step=payload["step"],
    )
    if extra is not None:
        extra_restored = (serialization.from_state_dict(extra, payload["extra"])
                          if "extra" in payload else extra)
        return restored, payload["env_steps"], extra_restored
    return restored, payload["env_steps"]


def latest_checkpoint(path_dir: str) -> str | None:
    cps = get_checkpoints(path_dir)
    return cps[-1] if cps else None


def env_steps_of(path: str) -> int:
    m = re.search(r"_(\d+)\.msgpack$", path)
    return int(m.group(1)) if m else 0
