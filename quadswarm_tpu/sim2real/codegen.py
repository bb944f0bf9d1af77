"""Sim2real: serialize a trained flax actor into dependency-free C for
Crazyflie firmware deployment.

Reference: swarm_rl/sim2real/{sim2real.py,code_blocks.py} — trained weights
become static C arrays walked by nested loops with tanhf activations, exposed
as `networkEvaluate(control_t_n*, const float* state_array)`.  This module
generates the same artifact from flax params:

  * `generate_c_model`           — plain MLP chain (single-drone policies)
  * `generate_c_model_attention` — self/neighbor/obstacle encoders + a
    hand-rolled single-head attention block (sim2real encoder variant)

Parity is asserted by compiling with g++ and ctypes-comparing against the
flax forward pass (see tests/test_sim2real.py, mirroring
swarm_rl/sim2real/tests/unit_tests.py).
"""
from __future__ import annotations

import os

import numpy as np

CONTROL_STRUCT = """
typedef struct control_t_n {
    float thrust_0;
    float thrust_1;
    float thrust_2;
    float thrust_3;
} control_t_n;
"""

HEADERS_FIRMWARE = """#include "network_evaluate.h"
#include <math.h>
"""

HEADERS_TESTING = """#include <math.h>
%s
extern "C" void networkEvaluate(control_t_n* control_n, const float* state_array);
""" % CONTROL_STRUCT


def _f(v: float) -> str:
    s = f"{v:.9g}"
    if "." not in s and "e" not in s and "inf" not in s and "nan" not in s:
        s += ".0"
    return s + "f"


def _c_array_2d(name: str, arr: np.ndarray) -> str:
    rows = ",\n    ".join(
        "{" + ", ".join(_f(v) for v in row) + "}" for row in arr)
    return (f"static const float {name}[{arr.shape[0]}][{arr.shape[1]}] = "
            + "{\n    " + rows + "\n};\n")


def _c_array_1d(name: str, arr: np.ndarray) -> str:
    vals = ", ".join(_f(v) for v in arr)
    return f"static const float {name}[{arr.shape[0]}] = {{{vals}}};\n"


def flatten_mlp_chain(params: dict, path: list[str]) -> list[tuple[np.ndarray, np.ndarray]]:
    """Extract (kernel, bias) pairs for the Dense layers under `path`,
    in declaration order (Dense_0, Dense_1, ...)."""
    node = params
    for p in path:
        node = node[p]
    layers = []
    names = sorted([k for k in node if k.startswith("Dense_")],
                   key=lambda s: int(s.split("_")[1]))
    for name in names:
        layers.append((np.asarray(node[name]["kernel"]),
                       np.asarray(node[name]["bias"])))
    return layers


def actor_mlp_layers(variables: dict) -> list[tuple[np.ndarray, np.ndarray]]:
    """The actor forward chain of a no-neighbor 'corl' ActorCritic:
    self_encoder Dense_0/Dense_1 (tanh) -> feed_forward (tanh) ->
    action_head (linear)."""
    p = variables["params"]
    enc = p["actor_encoder"]
    layers = flatten_mlp_chain({"e": enc["self_encoder"]}, ["e"])
    layers.append((np.asarray(enc["feed_forward"]["kernel"]),
                   np.asarray(enc["feed_forward"]["bias"])))
    layers.append((np.asarray(p["action_head"]["kernel"]),
                   np.asarray(p["action_head"]["bias"])))
    return layers


def generate_c_model(layers: list[tuple[np.ndarray, np.ndarray]],
                     output_path: str | None = None,
                     testing: bool = False) -> str:
    """Emit the MLP-chain C source (reference generate_c_model,
    sim2real.py:570-673): all layers tanh except the last (linear)."""
    num_layers = len(layers)
    src = HEADERS_TESTING if testing else HEADERS_FIRMWARE
    structure = ("static const int structure[" + str(num_layers) + "][2] = {"
                 + ",".join("{%d, %d}" % (k.shape[0], k.shape[1])
                            for k, _ in layers) + "};\n")
    src += structure
    for i, (k, b) in enumerate(layers):
        src += _c_array_2d(f"layer_{i}_w", k)
        src += _c_array_1d(f"layer_{i}_b", b)
        src += f"static float output_{i}[{k.shape[1]}];\n"

    body = ""
    for i in range(num_layers):
        inp = "state_array" if i == 0 else f"output_{i - 1}"
        act = "" if i == num_layers - 1 else f"output_{i}[i] = tanhf(output_{i}[i]);"
        body += f"""
    for (int i = 0; i < structure[{i}][1]; i++) {{
        output_{i}[i] = 0;
        for (int j = 0; j < structure[{i}][0]; j++) {{
            output_{i}[i] += {inp}[j] * layer_{i}_w[j][i];
        }}
        output_{i}[i] += layer_{i}_b[i];
        {act}
    }}
"""
    last = num_layers - 1
    extern = 'extern "C" ' if testing else ""
    src += f"""
{extern}void networkEvaluate(control_t_n* control_n, const float* state_array) {{{body}
    control_n->thrust_0 = output_{last}[0];
    control_n->thrust_1 = output_{last}[1];
    control_n->thrust_2 = output_{last}[2];
    control_n->thrust_3 = output_{last}[3];
}}
"""
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with open(output_path, "w") as f:
            f.write(src)
    return src


# ---------------------------------------------------------------------------
# Attention (sim2real single-head) variant
# ---------------------------------------------------------------------------

def attention_actor_parts(variables: dict) -> dict:
    """Extract the sim2real attention actor's weight groups
    (QuadSingleHeadAttentionEncoder equivalent, quad_multi_model.py:203-247)."""
    p = variables["params"]
    enc = p["actor_encoder"]

    def dense(node):
        return np.asarray(node["kernel"]), np.asarray(node["bias"])

    def dense_nobias(node):
        return np.asarray(node["kernel"])

    return {
        "self_embed": flatten_mlp_chain({"e": enc["self_embed"]}, ["e"]),
        "neighbor_embed": flatten_mlp_chain({"e": enc["neighbor_embed"]}, ["e"]),
        "obstacle_embed": flatten_mlp_chain({"e": enc["obstacle_embed"]}, ["e"]),
        "w_qs": dense_nobias(enc["attention"]["w_qs"]),
        "w_ks": dense_nobias(enc["attention"]["w_ks"]),
        "w_vs": dense_nobias(enc["attention"]["w_vs"]),
        "fc": dense_nobias(enc["attention"]["fc"]),
        "ln_scale": np.asarray(enc["attention"]["LayerNorm_0"]["scale"]),
        "ln_bias": np.asarray(enc["attention"]["LayerNorm_0"]["bias"]),
        "feed_forward": dense(enc["feed_forward"]),
        "action_head": dense(p["action_head"]),
    }


def _emit_mlp(src_name: str, dst_name: str, layers, prefix: str) -> tuple[str, str]:
    decls, body = "", ""
    for i, (k, b) in enumerate(layers):
        decls += _c_array_2d(f"{prefix}_{i}_w", k)
        decls += _c_array_1d(f"{prefix}_{i}_b", b)
        out = dst_name if i == len(layers) - 1 else f"{prefix}_out_{i}"
        if out != dst_name:
            decls += f"static float {out}[{k.shape[1]}];\n"
        inp = src_name if i == 0 else f"{prefix}_out_{i - 1}"
        body += f"""
    for (int i = 0; i < {k.shape[1]}; i++) {{
        {out}[i] = 0;
        for (int j = 0; j < {k.shape[0]}; j++) {{
            {out}[i] += {inp}[j] * {prefix}_{i}_w[j][i];
        }}
        {out}[i] = tanhf({out}[i] + {prefix}_{i}_b[i]);
    }}
"""
    return decls, body


def generate_c_model_attention(parts: dict, self_dim: int, neighbor_dim: int,
                               obstacle_dim: int,
                               output_path: str | None = None,
                               testing: bool = False) -> str:
    """Emit the single-head-attention actor in fixed-size C (reference
    generate_c_model_attention, sim2real.py:493-567 + code_blocks.py:142-370).

    Token layout matches the flax model: tokens[0] = neighbor embed,
    tokens[1] = obstacle embed; self embed bypasses attention.
    """
    d = parts["w_qs"].shape[0]
    src = HEADERS_TESTING if testing else HEADERS_FIRMWARE
    src += f"""
static const int D_MODEL = {d};
static const int NUM_TOKENS = 2;
static float self_embed[{d}];
static float tokens[2][{d}];
static float q_out[2][{d}];
static float k_out[2][{d}];
static float v_out[2][{d}];
static float attn[2][2];
static float attn_out[2][{d}];
static float fc_out[2][{d}];
static float fused_in[{3 * d}];
"""
    decls_self, body_self = _emit_mlp("state_array", "self_embed",
                                      parts["self_embed"], "se")
    decls_nb, body_nb = _emit_mlp(f"(state_array + {self_dim})", "tokens[0]",
                                  parts["neighbor_embed"], "nb")
    decls_ob, body_ob = _emit_mlp(
        f"(state_array + {self_dim + neighbor_dim})", "tokens[1]",
        parts["obstacle_embed"], "ob")
    src += decls_self + decls_nb + decls_ob
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        src += _c_array_2d(name, parts[name])
    src += _c_array_1d("ln_scale", parts["ln_scale"])
    src += _c_array_1d("ln_bias", parts["ln_bias"])
    ff_k, ff_b = parts["feed_forward"]
    src += _c_array_2d("ff_w", ff_k) + _c_array_1d("ff_b", ff_b)
    ah_k, ah_b = parts["action_head"]
    src += _c_array_2d("ah_w", ah_k) + _c_array_1d("ah_b", ah_b)
    src += f"static float ff_out[{ff_k.shape[1]}];\n"
    src += f"static float action_out[{ah_k.shape[1]}];\n"

    extern = 'extern "C" ' if testing else ""
    src += f"""
{extern}void networkEvaluate(control_t_n* control_n, const float* state_array) {{
{body_self}{body_nb}{body_ob}
    // single-head attention over the 2 tokens
    for (int t = 0; t < 2; t++) {{
        for (int i = 0; i < D_MODEL; i++) {{
            q_out[t][i] = 0; k_out[t][i] = 0; v_out[t][i] = 0;
            for (int j = 0; j < D_MODEL; j++) {{
                q_out[t][i] += tokens[t][j] * w_qs[j][i];
                k_out[t][i] += tokens[t][j] * w_ks[j][i];
                v_out[t][i] += tokens[t][j] * w_vs[j][i];
            }}
        }}
    }}
    float scale = 1.0f / sqrtf((float)D_MODEL);
    for (int t = 0; t < 2; t++) {{
        float m = -1e30f;
        for (int u = 0; u < 2; u++) {{
            attn[t][u] = 0;
            for (int i = 0; i < D_MODEL; i++) attn[t][u] += q_out[t][i] * scale * k_out[u][i];
            if (attn[t][u] > m) m = attn[t][u];
        }}
        float s = 0;
        for (int u = 0; u < 2; u++) {{ attn[t][u] = expf(attn[t][u] - m); s += attn[t][u]; }}
        for (int u = 0; u < 2; u++) attn[t][u] /= s;
    }}
    for (int t = 0; t < 2; t++) {{
        for (int i = 0; i < D_MODEL; i++) {{
            attn_out[t][i] = 0;
            for (int u = 0; u < 2; u++) attn_out[t][i] += attn[t][u] * v_out[u][i];
        }}
    }}
    // fc + residual + layernorm
    for (int t = 0; t < 2; t++) {{
        for (int i = 0; i < D_MODEL; i++) {{
            fc_out[t][i] = 0;
            for (int j = 0; j < D_MODEL; j++) fc_out[t][i] += attn_out[t][j] * fc[j][i];
            fc_out[t][i] += tokens[t][i];
        }}
        float mean = 0;
        for (int i = 0; i < D_MODEL; i++) mean += fc_out[t][i];
        mean /= D_MODEL;
        float var = 0;
        for (int i = 0; i < D_MODEL; i++) var += (fc_out[t][i] - mean) * (fc_out[t][i] - mean);
        var /= D_MODEL;
        float inv = 1.0f / sqrtf(var + 1e-6f);
        for (int i = 0; i < D_MODEL; i++)
            fc_out[t][i] = (fc_out[t][i] - mean) * inv * ln_scale[i] + ln_bias[i];
    }}
    // fuse [self, token0, token1] -> feed_forward (tanh) -> action head
    for (int i = 0; i < D_MODEL; i++) {{
        fused_in[i] = self_embed[i];
        fused_in[D_MODEL + i] = fc_out[0][i];
        fused_in[2 * D_MODEL + i] = fc_out[1][i];
    }}
    for (int i = 0; i < {ff_k.shape[1]}; i++) {{
        ff_out[i] = 0;
        for (int j = 0; j < {ff_k.shape[0]}; j++) ff_out[i] += fused_in[j] * ff_w[j][i];
        ff_out[i] = tanhf(ff_out[i] + ff_b[i]);
    }}
    for (int i = 0; i < {ah_k.shape[1]}; i++) {{
        action_out[i] = 0;
        for (int j = 0; j < {ah_k.shape[0]}; j++) action_out[i] += ff_out[j] * ah_w[j][i];
        action_out[i] += ah_b[i];
    }}
    control_n->thrust_0 = action_out[0];
    control_n->thrust_1 = action_out[1];
    control_n->thrust_2 = action_out[2];
    control_n->thrust_3 = action_out[3];
}}
"""
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with open(output_path, "w") as f:
            f.write(src)
    return src


def flax_to_c_model(variables: dict, output_path: str,
                    encoder_type: str = "corl", self_dim: int = 18,
                    neighbor_dim: int = 36, obstacle_dim: int = 9,
                    testing: bool = False) -> str:
    """Top-level export (reference torch_to_c_model, sim2real.py:47-57)."""
    if encoder_type == "attention":
        parts = attention_actor_parts(variables)
        return generate_c_model_attention(parts, self_dim, neighbor_dim,
                                          obstacle_dim, output_path, testing)
    layers = actor_mlp_layers(variables)
    return generate_c_model(layers, output_path, testing)


def main(argv=None) -> int:
    """CLI (reference sim2real.py:29-43,687: --torch_model_dir/--output_dir
    --model_type): load a trained experiment's config + latest checkpoint
    and emit the dependency-free C actor."""
    import argparse
    import json
    import os

    p = argparse.ArgumentParser("quadswarm_tpu.sim2real")
    p.add_argument("--model_dir", required=True,
                   help="experiment dir (train_dir/<experiment>) with "
                        "config.json + checkpoint_p0/")
    p.add_argument("--output_dir", default="c_models")
    p.add_argument("--output_model_name", default="model.c")
    p.add_argument("--model_type", choices=["single", "attention"],
                   default="single",
                   help="single: MLP-chain actor; attention: the sim2real "
                        "single-head-attention encoder")
    p.add_argument("--testing", default=False,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from quadswarm_tpu.training.config import (
        env_config_from_args, model_from_args,
    )
    from quadswarm_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    with open(os.path.join(args.model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    ns = argparse.Namespace(**cfg_dict)
    env_cfg = env_config_from_args(ns)
    model = model_from_args(ns, env_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env_cfg.obs_dim)))
    cp = latest_checkpoint(os.path.join(args.model_dir, "checkpoint_p0"))
    if cp is None:
        raise SystemExit(f"no checkpoint under {args.model_dir}")
    from flax import serialization
    payload = load_checkpoint(cp)
    params = serialization.from_state_dict(params, payload["params"])

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, args.output_model_name)
    flax_to_c_model(
        jax.device_get(params), out,
        encoder_type="attention" if args.model_type == "attention" else "corl",
        self_dim=18, testing=args.testing)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
