"""Dormant-neuron scoring + recycling (ReDo) utilities.

Reference: swarm_rl/models/weight_recycler.py:5-13 — a single
`estimate_neuron_score` helper (mean |activation| per neuron), unused by the
trainer.  Here the same score is provided for flax activations, plus the
recycle step the reference stubbed out: re-initialize the in/out weights of
dormant neurons (Sokar et al., "The Dormant Neuron Phenomenon in Deep RL",
ICML 2023), written as pure functions over param pytrees.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_neuron_score(activation: jax.Array, normalize: bool = False) -> jax.Array:
    """Mean |activation| over all leading (batch) axes; one score per neuron
    (weight_recycler.py:5-13)."""
    reduce_axes = tuple(range(activation.ndim - 1))
    score = jnp.mean(jnp.abs(activation), axis=reduce_axes)
    if normalize:
        score = score / (jnp.mean(score) + 1e-9)
    return score


def dormant_mask(activation: jax.Array, tau: float = 0.025) -> jax.Array:
    """Neurons whose normalized score falls below tau (ReDo eq. 1)."""
    return estimate_neuron_score(activation, normalize=True) <= tau


def recycle_dense_pair(key: jax.Array, w_in: jax.Array, b_in: jax.Array,
                       w_out: jax.Array, mask: jax.Array):
    """Re-initialize dormant units of a Dense layer: incoming columns get a
    fresh LeCun-normal draw, bias and outgoing rows are zeroed, so the
    recycled unit restarts learning without perturbing the function.

    w_in: (d_in, d_hidden), b_in: (d_hidden,), w_out: (d_hidden, d_out),
    mask: (d_hidden,) bool — True = recycle.
    """
    fresh = jax.nn.initializers.lecun_normal()(key, w_in.shape, w_in.dtype)
    w_in = jnp.where(mask[None, :], fresh, w_in)
    b_in = jnp.where(mask, 0.0, b_in)
    w_out = jnp.where(mask[:, None], 0.0, w_out)
    return w_in, b_in, w_out
