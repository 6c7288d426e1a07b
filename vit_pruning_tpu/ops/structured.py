"""Structured pruning: attention-head and MLP-channel pruning.

Reference plumbing: `ModifiedViTAttention.prune_heads`
(pradeep/key_considerations.py:114-132) and the head_mask threading through
every forward (himanshu/model_utils.py:216-220). BASELINE.json config 4:
"Structured head/channel pruning masks on MHA+MLP, DeiT-Base".

Two levels:
  * soft masks — `head_mask` [L, H] multiplies attention probabilities
    (models.vit.vit_forward), `channel_mask` zeroes MLP hidden units; used
    during sensitivity analysis / mask search. No speedup by itself.
  * physical slicing — `prune_heads` / `prune_mlp_channels` rebuild the
    param tree with the pruned units REMOVED. Smaller matmuls => real MXU
    savings; the functional param layout makes this a pure pytree map.

Head importance scoring from head-averaged |attention| toward CLS is
provided for mask search.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vit_pruning_tpu.configs import ViTConfig


def apply_channel_mask(params: dict, channel_mask: jnp.ndarray) -> dict:
    """Soft-zero MLP hidden channels: channel_mask [L, M] in {0,1}.

    Zeroing fc1's output columns (weight and bias) is exactly equivalent to
    masking the hidden activation (GELU(0)=0 flows through fc2).
    """
    p = jax.tree.map(lambda a: a, params)  # shallow copy of the tree
    fc1 = params["layers"]["mlp"]["fc1"]
    p["layers"] = dict(params["layers"])
    p["layers"]["mlp"] = dict(params["layers"]["mlp"])
    p["layers"]["mlp"]["fc1"] = {
        "w": fc1["w"] * channel_mask[:, None, :],
        "b": fc1["b"] * channel_mask,
    }
    return p


def prune_heads(
    params: dict, config: ViTConfig, keep_heads: Sequence[Sequence[int]]
) -> tuple:
    """Physically remove attention heads. keep_heads[i] = head indices kept
    at layer i (must all have the same count for static shapes).

    Returns (new_params, new_config with num_heads=len(keep_heads[0])).
    Equivalent to HF prune_heads (pradeep/key_considerations.py:114-132) but
    as a pure function over the param pytree.
    """
    counts = {len(h) for h in keep_heads}
    if len(counts) != 1:
        raise ValueError("all layers must keep the same number of heads (static shapes)")
    kept = counts.pop()
    hd = config.head_dim
    d = config.hidden_size

    layers = params["layers"]
    keep = np.asarray([sorted(h) for h in keep_heads])  # [L, kept]

    def col_idx(layer_heads):
        return np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in layer_heads])

    idx = np.stack([col_idx(h) for h in keep])  # [L, kept*hd]
    idx_j = jnp.asarray(idx)

    def take_cols(a):  # [L, D, D] -> [L, D, kept*hd]
        return jax.vmap(lambda m, i: m[:, i])(a, idx_j)

    def take_rows(a):  # [L, D, D] -> [L, kept*hd, D]
        return jax.vmap(lambda m, i: m[i, :])(a, idx_j)

    def take_bias(a):  # [L, D] -> [L, kept*hd]
        return jax.vmap(lambda v, i: v[i])(a, idx_j)

    new_attn = {
        name: {"w": take_cols(layers["attn"][name]["w"]), "b": take_bias(layers["attn"][name]["b"])}
        for name in ("q", "k", "v")
    }
    new_attn["o"] = {
        "w": take_rows(layers["attn"]["o"]["w"]),
        "b": layers["attn"]["o"]["b"],
    }

    new_params = dict(params)
    new_params["layers"] = dict(layers)
    new_params["layers"]["attn"] = new_attn
    # hidden stays D; q/k/v now project D -> kept*hd. mha and the fused
    # megakernel derive head_dim from the actual projection width;
    # attn_head_dim records it explicitly so config.head_dim stays truthful
    # (key-based predictors reshape by it, and the forward path can reject
    # a params/config geometry mismatch).
    return new_params, config.replace(num_heads=kept, attn_head_dim=hd)


def prune_mlp_channels(
    params: dict, keep_channels: Sequence[Sequence[int]]
) -> dict:
    """Physically remove MLP hidden channels. keep_channels[i] = kept unit
    indices at layer i (equal counts across layers)."""
    counts = {len(c) for c in keep_channels}
    if len(counts) != 1:
        raise ValueError("all layers must keep the same number of channels")
    idx = jnp.asarray([sorted(c) for c in keep_channels])  # [L, K]

    mlp = params["layers"]["mlp"]
    new_mlp = {
        "fc1": {
            "w": jax.vmap(lambda m, i: m[:, i])(mlp["fc1"]["w"], idx),
            "b": jax.vmap(lambda v, i: v[i])(mlp["fc1"]["b"], idx),
        },
        "fc2": {
            "w": jax.vmap(lambda m, i: m[i, :])(mlp["fc2"]["w"], idx),
            "b": mlp["fc2"]["b"],
        },
    }
    new_params = dict(params)
    new_params["layers"] = dict(params["layers"])
    new_params["layers"]["mlp"] = new_mlp
    return new_params


def channel_importance(params: dict) -> np.ndarray:
    """Weight-magnitude importance per MLP hidden unit, per layer [L, M]:
    ||fc1[:, j]|| * ||fc2[j, :]|| — the unit's input gain times its output
    gain (standard magnitude criterion for structured channel pruning).
    Data-free, so it applies to any checkpoint."""
    fc1 = params["layers"]["mlp"]["fc1"]["w"]  # [L, D, M]
    fc2 = params["layers"]["mlp"]["fc2"]["w"]  # [L, M, D]
    return np.asarray(
        jnp.linalg.norm(fc1, axis=1) * jnp.linalg.norm(fc2, axis=2)
    )


def head_importance(params: dict, pixel_values: jnp.ndarray, config: ViTConfig) -> np.ndarray:
    """Mean CLS-row attention mass per head, per layer [L, H] — the natural
    importance score for head-mask search (the M7 target generalized to
    heads, pradeep/using_attention.py:194-195)."""
    from vit_pruning_tpu.models.vit import _layer_slice, embed, vit_layer

    x = embed(pixel_values, params["embed"], config)
    scores = []
    for i in range(config.num_layers):
        lp = _layer_slice(params["layers"], i)
        x, probs = vit_layer(x, lp, config, return_probs=True)
        scores.append(probs[:, :, 0, 1:].sum(-1).mean(0))  # [H]
    return np.asarray(jnp.stack(scores))
