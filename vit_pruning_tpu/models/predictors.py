"""Skip-predictor heads — every predictor family in the reference, as
functional pytrees.

Reference inventory (SURVEY.md §2.1):
  cls_mlp      — MLP([CLS ⊕ token]) -> sigmoid  [2D, 64, 1]
                 (M1/M2: cls_mlp.py:45-54, himanshu/model_utils.py:28-37;
                  also the M7 attention-score head, using_attention.py:64-80)
  token_mlp    — MLP(token) [D, 64, 1]           (M12, pradeep/final.py:36-45)
  common_mlp   — one token_mlp shared across all layers
                 (M6, himanshu/common_mlp_model_utils.py:76-87)
  compressor   — per-token encoder D->128->64->16, flatten all N tokens,
                 MLP [N*16, 512, N] emitting all scores at once
                 (M4, himanshu/all_in_one_model_utils.py:14-51)
  shared_compressor — same, but a single compressor shared across layers
                 (M5, all_in_one_same_compressor_utils.py:113-124)
  cnn          — per-token compress D->256->64->16 then a conv scorer over
                 the 14x14 patch grid (spatially-aware)
                 (M16, recap/convprad3.py:507-557; the reference's CNN wiring
                  is internally inconsistent — we build the intended version:
                  grid conv over compressed token features -> N scores)
  bottleneck   — MLP [D, 32, D, 32, 1]; the middle D-dim activation doubles
                 as a cheap approximation of the layer output for skipped
                 tokens (M17, recap/prad_final_code.py:146-196)

All heads emit post-sigmoid scores in (0, 1), shape [B, N] (patch tokens
only; CLS never scored). Per-layer parameters are stacked with a leading [L]
axis; shared parts are stored once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig


# --- small functional MLP ----------------------------------------------------

def _init_linear(key, fan_in, fan_out, std=0.02):
    return {
        "w": jax.random.truncated_normal(key, -2.0, 2.0, (fan_in, fan_out)) * std,
        "b": jnp.zeros((fan_out,)),
    }


def _init_mlp(key, sizes):
    keys = jax.random.split(key, len(sizes) - 1)
    return {f"l{i}": _init_linear(keys[i], sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)}


def _apply_mlp(params, x, final_sigmoid=True, hidden_act=jax.nn.relu):
    n = len(params)
    for i in range(n):
        p = params[f"l{i}"]
        x = x @ p["w"] + p["b"]
        if i < n - 1:
            x = hidden_act(x)
        elif final_sigmoid:
            x = jax.nn.sigmoid(x)
    return x


# --- init --------------------------------------------------------------------

def init_predictor_params(
    key: jax.Array, config: ViTConfig, pcfg: PruneConfig
) -> Optional[dict]:
    """Build the predictor pytree for all layers (None for predictor='none').

    Naming contract: top-level keys prefixed 'shared_' hold ONE set of
    weights used at every layer; all other top-level subtrees are stacked
    [L, ...] on their leading axis. parallel/pipeline.py keys its per-stage
    sharding specs on this prefix — keep it when adding predictor kinds.
    """
    kind = pcfg.predictor
    if kind == "none":
        return None

    d = config.hidden_size
    n = config.num_patches
    h = pcfg.predictor_hidden
    L = config.num_layers
    layer_keys = jax.random.split(key, L + 1)

    def stack(fn):
        per = [fn(layer_keys[i]) for i in range(L)]
        return jax.tree.map(lambda *a: jnp.stack(a), *per)

    if kind == "cls_mlp":
        return {"mlp": stack(lambda k: _init_mlp(k, [2 * d, h, 1]))}
    if kind == "token_mlp":
        return {"mlp": stack(lambda k: _init_mlp(k, [d, h, 1]))}
    if kind == "common_mlp":
        return {"shared_mlp": _init_mlp(layer_keys[L], [d, h, 1])}
    if kind == "compressor":
        return {
            "compress": stack(lambda k: _init_mlp(k, [d, 128, 64, 16])),
            "flat": stack(lambda k: _init_mlp(k, [n * 16, 512, n])),
        }
    if kind == "shared_compressor":
        return {
            "shared_compress": _init_mlp(layer_keys[L], [d, 128, 64, 16]),
            "flat": stack(lambda k: _init_mlp(k, [n * 16, 512, n])),
        }
    if kind == "cnn":
        def cnn_init(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {
                "compress": _init_mlp(k1, [d, 256, 64, 16]),
                # 3x3 convs over the patch grid, HWIO layout
                "conv1": {
                    "w": jax.random.truncated_normal(k2, -2.0, 2.0, (3, 3, 16, 8)) * 0.1,
                    "b": jnp.zeros((8,)),
                },
                "conv2": {
                    "w": jax.random.truncated_normal(k3, -2.0, 2.0, (3, 3, 8, 1)) * 0.1,
                    "b": jnp.zeros((1,)),
                },
            }
        return {"cnn": stack(cnn_init)}
    if kind == "bottleneck":
        return {"mlp": stack(lambda k: _init_mlp(k, [d, 32, d, 32, 1]))}
    if kind == "cls_cosine":
        return {}  # parameter-free heuristic (M10)
    if kind == "key_cosine":
        return {}  # parameter-free heuristic (M9)
    if kind == "key_mlp":
        # reference key_mlp is [64, 768, 384, 1] on head-averaged keys
        # (himanshu/midlayer.py:250-330); generalized to this config's dims
        hd = config.head_dim
        return {"key_mlp": stack(lambda k: _init_mlp(k, [hd, d, d // 2, 1]))}
    raise ValueError(f"unknown predictor kind {kind!r}")


def init_updatenet_params(key: jax.Array, config: ViTConfig) -> dict:
    """M18 UpdateNet [2D -> D/2 -> D] (pradeep/old codes/updateNet.py:26-37),
    one per layer, stacked."""
    d = config.hidden_size
    keys = jax.random.split(key, config.num_layers)
    per = [_init_mlp(k, [2 * d, d // 2, d]) for k in keys]
    return jax.tree.map(lambda *a: jnp.stack(a), *per)


def apply_updatenet(un_params: dict, layer_idx: int, hidden_states: jnp.ndarray) -> jnp.ndarray:
    """Learned residual update for skipped tokens from [token ⊕ CLS]."""
    patches = hidden_states[:, 1:]
    cls = jnp.broadcast_to(hidden_states[:, 0:1], patches.shape)
    inp = jnp.concatenate([patches, cls], axis=-1)
    return _apply_mlp(_slice_layer(un_params, layer_idx), inp, final_sigmoid=False)


# --- apply ---------------------------------------------------------------------

def _slice_layer(tree, i: int):
    return jax.tree.map(lambda a: a[i], tree)


def apply_predictor(
    pred_params: dict,
    layer_idx: int,
    hidden_states: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    layer_params: Optional[dict] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Score patch tokens at one layer.

    hidden_states: [B, S, D] (CLS at position 0). layer_params: the encoder
    layer's params (needed by 'key_mlp' to form attention-key vectors).
    Returns (scores [B, N] in (0,1), extras) — extras carries e.g. the
    bottleneck's middle activation used as the skipped-token approximation.
    """
    kind = pcfg.predictor
    patches = hidden_states[:, 1:]  # [B, N, D]
    extras: dict = {}

    if kind == "cls_mlp":
        # MLP([CLS ⊕ token]) (model_utils.py:62-63) WITHOUT materializing the
        # [B, N, 2D] concat: split the first weight into its CLS rows and
        # token rows — concat([c, t]) @ W == c @ W[:D] + t @ W[D:], and the
        # CLS term is one [B, 1, H] row broadcast over all patches.
        p = _slice_layer(pred_params["mlp"], layer_idx)
        d = hidden_states.shape[-1]
        w0 = p["l0"]["w"]
        hidden = (
            hidden_states[:, 0:1] @ w0[:d] + patches @ w0[d:] + p["l0"]["b"]
        )
        hidden = jax.nn.relu(hidden)
        rest = {f"l{i - 1}": p[f"l{i}"] for i in range(1, len(p))}
        scores = _apply_mlp(rest, hidden)[..., 0]
    elif kind == "token_mlp":
        scores = _apply_mlp(_slice_layer(pred_params["mlp"], layer_idx), patches)[..., 0]
    elif kind == "common_mlp":
        scores = _apply_mlp(pred_params["shared_mlp"], patches)[..., 0]
    elif kind in ("compressor", "shared_compressor"):
        comp = (
            pred_params["shared_compress"]
            if kind == "shared_compressor"
            else _slice_layer(pred_params["compress"], layer_idx)
        )
        lat = _apply_mlp(comp, patches, final_sigmoid=False)  # [B, N, 16]
        flat = lat.reshape(lat.shape[0], -1)  # [B, N*16]
        scores = _apply_mlp(_slice_layer(pred_params["flat"], layer_idx), flat)  # [B, N]
    elif kind == "cnn":
        p = _slice_layer(pred_params["cnn"], layer_idx)
        lat = _apply_mlp(p["compress"], patches, final_sigmoid=False, hidden_act=jax.nn.relu)
        g = config.grid_size
        grid = lat.reshape(lat.shape[0], g, g, -1)  # NHWC
        y = jax.lax.conv_general_dilated(
            grid, p["conv1"]["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv1"]["b"]
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, p["conv2"]["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv2"]["b"]
        scores = jax.nn.sigmoid(y.reshape(y.shape[0], -1))  # [B, N]
    elif kind == "bottleneck":
        p = _slice_layer(pred_params["mlp"], layer_idx)
        h1 = jax.nn.relu(patches @ p["l0"]["w"] + p["l0"]["b"])      # [B, N, 32]
        middle = jax.nn.relu(h1 @ p["l1"]["w"] + p["l1"]["b"])       # [B, N, D]
        h3 = jax.nn.relu(middle @ p["l2"]["w"] + p["l2"]["b"])       # [B, N, 32]
        scores = jax.nn.sigmoid(h3 @ p["l3"]["w"] + p["l3"]["b"])[..., 0]
        # the middle activation approximates (layer(x) - x) for skipped tokens
        # (recap/prad_final_code.py:176-183: output[~mask] = middle + hidden)
        extras["approx_residual"] = middle
    elif kind == "cls_cosine":
        # M10 (pradeep/adv_testing_ideas.py:51-100): tokens MOST similar to
        # CLS are skippable; keep-score = 1 - normalized cosine
        cls = hidden_states[:, 0:1]
        dot = jnp.sum(patches * cls, axis=-1)
        nrm = jnp.linalg.norm(patches, axis=-1) * jnp.linalg.norm(cls, axis=-1)
        cos01 = (dot / jnp.maximum(nrm, 1e-12) + 1.0) / 2.0
        scores = 1.0 - cos01
    elif kind == "key_mlp":
        # M8/M9: head-averaged attention-key vectors as the predictor input
        # (find_k_values, pradeep/key_considerations.py:148-175). Keys are
        # formed from this layer's own Wk on the pre-LN'd input.
        if layer_params is None:
            raise ValueError("predictor 'key_mlp' needs layer_params")
        from vit_pruning_tpu.models.vit import layer_norm

        h = layer_norm(hidden_states, layer_params["ln1"], config.layernorm_eps)
        keys = h @ layer_params["attn"]["k"]["w"] + layer_params["attn"]["k"]["b"]
        b_, s_, _ = keys.shape
        keys = keys.reshape(b_, s_, config.num_heads, config.head_dim).mean(axis=2)
        scores = _apply_mlp(_slice_layer(pred_params["key_mlp"], layer_idx), keys[:, 1:])[..., 0]
        extras["keys"] = keys
    elif kind == "key_cosine":
        # M9's decision rule (pradeep/key_considerations.py:330-346): run the
        # full layer once, form head-averaged key vectors from the layer's
        # INPUT and from its OUTPUT with the same ln1/Wk (find_k_values,
        # :148-175 — the output keys stand in for "the next layer's keys").
        # MaskIt (:280-298) sets mask = cos(key_next, key_cur) > threshold and
        # the reference PROCESSES mask-True tokens — i.e. tokens whose keys
        # stayed SIMILAR are processed; changed keys are skipped. We reproduce
        # that orientation exactly: score = (cos + 1)/2, keep = score >=
        # mlp_threshold, so mlp_threshold = (reference sim_threshold + 1)/2
        # reproduces the reference cut. The dense layer output is returned in
        # extras['dense_out'] so the caller can reuse it (oracle pass / M3).
        if layer_params is None:
            raise ValueError("predictor 'key_cosine' needs layer_params")
        from vit_pruning_tpu.models.vit import layer_norm, vit_layer

        def _avg_keys(h):
            hn = layer_norm(h, layer_params["ln1"], config.layernorm_eps)
            k = hn @ layer_params["attn"]["k"]["w"] + layer_params["attn"]["k"]["b"]
            b_, s_, _ = k.shape
            return k.reshape(b_, s_, config.num_heads, config.head_dim).mean(axis=2)

        dense_out = vit_layer(hidden_states, layer_params, config, quant="none")
        k_cur = _avg_keys(hidden_states)
        k_next = _avg_keys(dense_out)
        dot = jnp.sum(k_next * k_cur, axis=-1)
        nrm = jnp.linalg.norm(k_next, axis=-1) * jnp.linalg.norm(k_cur, axis=-1)
        cos01 = (dot / jnp.maximum(nrm, 1e-12) + 1.0) / 2.0
        scores = cos01[:, 1:]  # patch tokens (CLS kept by framework invariant)
        extras["dense_out"] = dense_out
    else:
        raise ValueError(f"predictor kind {kind!r} has no apply rule")

    return scores, extras


def predictor_param_filter(path_leaf: str) -> bool:
    """True for predictor params — used by freeze policies (see train.freeze)."""
    return path_leaf.startswith("predictor")
