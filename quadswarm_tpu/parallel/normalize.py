"""Running mean-std input/return normalization as pure pytree state.

Implements Sample Factory's `--normalize_input` / `--normalize_returns`
learner features (the one SF surface previously warn-ignored; every
reference baseline sets both False — /root/reference/swarm_rl/runs/
quad_multi_mix_baseline.py:17-18 — so defaults match the reference runs).

Semantics (SF 2.x RunningMeanStd, re-derived for a jitted trainer):

- `normalize_input`: observations are standardized with running per-feature
  mean/var and clipped to +-5 before the encoder, in BOTH rollout inference
  and the learner's recompute.  Stats update once per iteration from the
  freshly collected rollout obs, before the SGD phase (the learner-side
  update SF does per batch).
- `normalize_returns`: the critic learns in NORMALIZED return space.  Value
  predictions are denormalized (v * std + mean) wherever they act as
  bootstraps/baselines in reward space (GAE, V-trace); the value loss
  compares the raw (normalized-space) prediction against normalized
  returns, with the old-value clip converted into the same space.  Return
  stats update from each iteration's GAE returns before SGD.

The update is Chan et al.'s parallel-variance combine, so sequential batch
updates equal the stats of the concatenated data (tested against a NumPy
oracle in tests/test_normalize.py).

State lives beside TrainState in the Trainer and serializes into
checkpoints (utils/checkpoint.py `extra` payload), keeping resume exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array   # (dim,) or scalar ()
    var: jax.Array
    count: jax.Array  # scalar ()

    @classmethod
    def create(cls, dim: int | None = None, dtype=jnp.float32):
        shape = () if dim is None else (dim,)
        return cls(mean=jnp.zeros(shape, dtype), var=jnp.ones(shape, dtype),
                   count=jnp.asarray(1e-4, dtype))

    def update(self, x: jax.Array) -> "RunningMeanStd":
        """Fold a batch (leading axes arbitrary, trailing axes match mean)
        into the running stats (parallel-variance combine)."""
        x = x.astype(self.mean.dtype)
        axes = tuple(range(x.ndim - self.mean.ndim))
        batch_mean = jnp.mean(x, axis=axes)
        batch_var = jnp.var(x, axis=axes)
        batch_count = x.size // max(self.mean.size, 1)
        delta = batch_mean - self.mean
        total = self.count + batch_count
        new_mean = self.mean + delta * batch_count / total
        m2 = (self.var * self.count + batch_var * batch_count
              + delta ** 2 * self.count * batch_count / total)
        return self.replace(mean=new_mean, var=m2 / total, count=total)

    def update_masked(self, x: jax.Array, w: jax.Array) -> "RunningMeanStd":
        """Fold only the rows of `x` with weight 1 in `w` into the stats.

        `x` is (B,) + mean.shape, `w` is (B,) in {0, 1}.  Equals `update()`
        restricted to the selected rows (weighted batch moments into the
        same Chan combine); with no selected rows the stats are unchanged.
        Used by mixed-policy PBT, where each policy's normalizer sees only
        its own agents' samples from the shared env batch."""
        x = x.astype(self.mean.dtype)
        w = w.astype(self.mean.dtype)
        batch_count = jnp.sum(w)
        denom = jnp.maximum(batch_count, 1.0)
        wb = w.reshape(w.shape + (1,) * self.mean.ndim)
        batch_mean = jnp.sum(wb * x, axis=0) / denom
        batch_var = jnp.sum(wb * (x - batch_mean) ** 2, axis=0) / denom
        delta = batch_mean - self.mean
        total = self.count + batch_count
        new_mean = self.mean + delta * batch_count / total
        m2 = (self.var * self.count + batch_var * batch_count
              + delta ** 2 * self.count * batch_count / total)
        new = self.replace(mean=new_mean, var=m2 / total, count=total)
        empty = batch_count == 0
        return jax.tree.map(lambda a, b: jnp.where(empty, a, b), self, new)

    def std(self) -> jax.Array:
        return jnp.sqrt(self.var + 1e-8)

    def normalize(self, x: jax.Array, clip: float | None = 5.0) -> jax.Array:
        y = (x - self.mean) / self.std()
        if clip is not None:
            y = jnp.clip(y, -clip, clip)
        return y.astype(x.dtype)

    def denormalize(self, y: jax.Array) -> jax.Array:
        return (y * self.std() + self.mean).astype(y.dtype)


@struct.dataclass
class NormalizerState:
    """Optional obs/return normalizers; None fields = feature disabled
    (an empty pytree subtree, free under jit)."""
    obs: RunningMeanStd | None = None
    ret: RunningMeanStd | None = None


def make_norm_state(normalize_input: bool, normalize_returns: bool,
                    obs_dim: int) -> NormalizerState:
    return NormalizerState(
        obs=RunningMeanStd.create(obs_dim) if normalize_input else None,
        ret=RunningMeanStd.create() if normalize_returns else None)


def normalize_obs(norm: NormalizerState | None, obs_flat: jax.Array):
    if norm is not None and norm.obs is not None:
        return norm.obs.normalize(obs_flat)
    return obs_flat


def denormalize_value(norm: NormalizerState | None, value: jax.Array):
    if norm is not None and norm.ret is not None:
        return norm.ret.denormalize(value)
    return value
