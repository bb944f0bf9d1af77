"""Attention heat-map from a trained checkpoint.

`python -m quadswarm_tpu.analysis.attention --train_dir ... --experiment ...`

The reference's paper figure (paper/attn_heatmap.py) plots hand-transcribed
attention constants; here the weights are extracted live: roll the
deterministic policy for one episode, capture the CoRL neighbor-attention
softmax via flax ``sow`` intermediates, map each neighbor slot back to the
agent it holds that tick (`env/neighbors.neighbor_indices`), and average the
resulting (N, N) who-attends-to-whom matrix over the episode.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def episode_attention(env_cfg, dyn, model, params, key, max_ticks: int = 0):
    """Mean (N, N) attention matrix over one episode: row i = how much
    drone i's neighbor encoder attends to each other drone (rows sum to 1;
    diagonal is 0 — self is not a neighbor token)."""
    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.env.multi import env_reset, env_step
    from quadswarm_tpu.env.neighbors import neighbor_indices

    n = env_cfg.num_agents
    k = env_cfg.num_use_neighbor_obs
    if k <= 0:
        raise ValueError("attention heat-map needs neighbor obs "
                         "(quads_neighbor_visible_num > 0)")

    @jax.jit
    def policy_with_attn(params, obs):
        (mean, _, _), inter = model.apply(params, obs,
                                          mutable=["intermediates"])
        attn = inter["intermediates"]["actor_encoder"]["neighbor_encoder"][
            "attn"][0]
        return mean, attn

    step = jax.jit(lambda s, a, kk: env_step(env_cfg, dyn, s, a, kk))

    key, kr = jax.random.split(key)
    state, obs = jax.jit(lambda kk: env_reset(env_cfg, dyn, kk))(kr)
    ticks = max_ticks if max_ticks > 0 else env_cfg.ep_len
    acc = np.zeros((n, n), np.float64)
    rows = np.arange(n)[:, None]
    for _ in range(int(ticks)):
        actions, attn = policy_with_attn(params, obs)
        idx = neighbor_indices(state.dyn.pos, state.dyn.vel, k)
        a = np.asarray(attn, np.float64)          # (N, k)
        np.add.at(acc, (np.broadcast_to(rows, (n, k)), np.asarray(idx)), a)
        key, kt = jax.random.split(key)
        state, obs, _, dones, _ = step(
            state, actions.astype(env_cfg.dtype), kt)
        if bool(np.asarray(dones)[0]):
            break
    return acc / np.maximum(acc.sum(axis=1, keepdims=True), 1e-12)


def plot_heatmap(matrix: np.ndarray, out: str, title: str = "Attention weights"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from quadswarm_tpu.utils.render import QUAD_COLORS

    n = matrix.shape[0]
    fig, ax = plt.subplots(figsize=(4.2, 3.6))
    im = ax.imshow(matrix, cmap="Reds", vmin=0.0,
                   vmax=max(0.66, float(matrix.max())))
    labels = [QUAD_COLORS[i % len(QUAD_COLORS)] for i in range(n)]
    ax.set_xticks(range(n), labels, rotation=45, ha="right", fontsize=7)
    ax.set_yticks(range(n), labels, fontsize=7)
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out, bbox_inches="tight", pad_inches=0.02)
    plt.close(fig)


def main(argv=None) -> int:
    import argparse
    import json

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_dir", default="train_dir")
    parser.add_argument("--experiment", default="quad_swarm_tpu")
    parser.add_argument("--out", default="attn_heatmap.png")
    parser.add_argument("--max_ticks", default=0, type=int,
                        help="0 = one full episode")
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from quadswarm_tpu.training.config import (
        env_config_from_args, load_cfg, model_from_args,
    )
    from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
    from quadswarm_tpu.utils.checkpoint import (
        checkpoint_dir, latest_checkpoint, load_checkpoint,
    )

    exp_dir = os.path.join(args.train_dir, args.experiment)
    cfg = load_cfg(exp_dir)
    env_cfg = env_config_from_args(cfg)
    if cfg.quads_neighbor_encoder_type != "attention":
        raise ValueError("attention heat-map needs "
                         "--quads_neighbor_encoder_type=attention "
                         f"(experiment used {cfg.quads_neighbor_encoder_type})")
    model = model_from_args(cfg, env_cfg)
    dyn = DynamicsParams.from_model(crazyflie_params(),
                                    dt=env_cfg.dt).astype(np.float32)
    key = jax.random.PRNGKey(args.seed)
    key, ki = jax.random.split(key)
    params = model.init(ki, jnp.zeros((1, env_cfg.obs_dim)))
    cp = latest_checkpoint(checkpoint_dir(args.train_dir, args.experiment))
    if cp is None:
        print("WARNING: no checkpoint found, using random init")
    else:
        payload = load_checkpoint(cp)
        params = serialization.from_state_dict(params, payload["params"])
        print(f"checkpoint loaded from {cp}")

    matrix = episode_attention(env_cfg, dyn, model, params, key,
                               max_ticks=args.max_ticks)
    plot_heatmap(matrix, args.out,
                 title=f"Attention weights ({args.experiment})")
    print(json.dumps({"out": args.out,
                      "mean_offdiag": float(
                          matrix.sum() / (matrix.shape[0] ** 2
                                          - matrix.shape[0]))}))
    print(f"heat-map -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
