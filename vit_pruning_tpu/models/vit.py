"""From-scratch ViT/DeiT forward pass in JAX (functional, pytree params).

Numerically equivalent to the reference's substrate — HuggingFace
`transformers` ViT (pre-LN blocks, erf-exact GELU, layernorm eps 1e-12,
learned position embeddings, CLS token) with a linear classifier on the CLS
token after the final layernorm (ModifiedViTModel, himanshu/model_utils.py:183-259).

Params are plain nested dicts of jnp arrays so they serialize trivially,
convert cleanly from torch state_dicts, and take `jax.sharding` annotations
without framework ceremony.

Param tree:
  {
    'embed': {'patch': {'w' [C*P*P, D], 'b' [D]},
              'cls' [1, 1, D], 'pos' [1, S, D]},
    'layers': [ {  # one per encoder layer, stacked along axis 0
        'ln1': {'g', 'b'}, 'attn': {'q','k','v','o': {'w','b'}},
        'ln2': {'g', 'b'}, 'mlp': {'fc1': {'w','b'}, 'fc2': {'w','b'}},
    } ],   # stored stacked: each leaf has a leading [L] axis (lax.scan-ready)
    'ln_f': {'g', 'b'},
    'head': {'w' [D, num_labels], 'b'},
  }
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import ViTConfig
from vit_pruning_tpu.ops.attention import mha
from vit_pruning_tpu.ops.patch_embed import patch_embed


# --- Primitive blocks -------------------------------------------------------

def layer_norm(x: jnp.ndarray, params: dict, eps: float) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["g"] + params["b"]


def mlp_block(x: jnp.ndarray, params: dict, use_pallas: bool = False) -> jnp.ndarray:
    """HF ViTIntermediate + ViTOutput: Linear -> GELU(erf) -> Linear."""
    if use_pallas:
        from vit_pruning_tpu.ops.pallas.mlp import fused_mlp

        b, s, d = x.shape
        y = fused_mlp(
            x.reshape(b * s, d),
            params["fc1"]["w"], params["fc1"]["b"],
            params["fc2"]["w"], params["fc2"]["b"],
        )
        return y.reshape(b, s, d)
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def vit_layer(
    x: jnp.ndarray,
    params: dict,
    config: ViTConfig,
    token_mask: Optional[jnp.ndarray] = None,
    head_mask: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
    use_pallas: bool = False,
    quant: Optional[str] = None,
):
    """One pre-LN transformer block (HF ViTLayer ordering).

    token_mask [B, S] bool restricts attention keys/values to kept tokens —
    the static-shape equivalent of running the layer on the gathered subset
    (himanshu/model_utils.py:91). Outputs at masked positions are computed
    but meaningless; callers overwrite them with the residual passthrough.

    quant: 'none' | 'int8' | None. None reads the module-global serving-quant
    mode AT TRACE TIME (see ops/dispatch.set_serving_quant); entry points
    that build persistent jitted callables must resolve and pass it
    explicitly so mode changes retrace.
    """
    from vit_pruning_tpu.ops.dispatch import attention_kernel_enabled, serving_quant

    qw = params["attn"]["q"]["w"].shape[-1]
    if qw != config.attn_width:
        # trace-time geometry check: head-pruned params under the original
        # config (or vice versa) would otherwise silently split heads at
        # the wrong width and run with wrong numerics. prune_heads returns
        # the matching config (num_heads=kept, attn_head_dim preserved).
        raise ValueError(
            f"attention projection width {qw} != config.num_heads "
            f"({config.num_heads}) x config.head_dim ({config.head_dim}); "
            f"use the ViTConfig returned by prune_heads for pruned params"
        )
    if quant is None:
        quant = serving_quant()
    quant = quant == "int8" and head_mask is None and not return_probs
    if use_pallas and head_mask is None and not return_probs:
        if quant:
            # int8 serving megakernel (ops/pallas/layer_int8.py). Weight
            # quantization is jnp ops on loop-invariant params — XLA's LICM
            # hoists it out of serving loops, so it costs once per dispatch.
            from vit_pruning_tpu.ops.pallas.layer_int8 import fused_vit_layer_int8
            from vit_pruning_tpu.ops.quant import quantize_layer_params

            return fused_vit_layer_int8(
                x, quantize_layer_params(params), config.num_heads,
                eps=config.layernorm_eps, token_mask=token_mask,
            )
        # whole-layer fused megakernel: minimal HBM traffic (the model is
        # bandwidth-bound on this chip — see ops/pallas/layer.py). The
        # differentiable wrapper makes it usable under grad (backward
        # recomputes through the jnp reference).
        from vit_pruning_tpu.ops.pallas.layer import differentiable_fused_layer

        return differentiable_fused_layer(config.num_heads, config.layernorm_eps)(
            x, params, token_mask
        )
    if quant and not use_pallas:
        # XLA path with quantization on: the jnp int8 serving reference —
        # what quality.py uses to measure the int8 accuracy delta
        from vit_pruning_tpu.ops.quant import int8_vit_layer_ref, quantize_layer_params

        return int8_vit_layer_ref(
            x, quantize_layer_params(params), config, token_mask=token_mask
        )

    h = layer_norm(x, params["ln1"], config.layernorm_eps)
    attn = mha(
        h,
        params["attn"],
        config.num_heads,
        token_mask=token_mask,
        head_mask=head_mask,
        return_probs=return_probs,
        use_pallas=use_pallas and attention_kernel_enabled(),
    )
    if return_probs:
        attn, probs = attn
    x = x + attn
    h = layer_norm(x, params["ln2"], config.layernorm_eps)
    x = x + mlp_block(h, params["mlp"], use_pallas=use_pallas)
    if return_probs:
        return x, probs
    return x


def embed(pixel_values: jnp.ndarray, params: dict, config: ViTConfig) -> jnp.ndarray:
    """Patch projection + CLS token + position embeddings -> [B, S, D]."""
    b, c, h, w = pixel_values.shape
    if (c, h, w) != (config.num_channels, config.image_size, config.image_size):
        raise ValueError(
            f"pixel_values {pixel_values.shape} does not match config "
            f"(expected [B, {config.num_channels}, {config.image_size}, {config.image_size}])"
        )
    x = patch_embed(pixel_values, params["patch"], config.patch_size)
    cls = jnp.broadcast_to(params["cls"], (x.shape[0], 1, config.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos"].astype(x.dtype)


# --- Full model --------------------------------------------------------------

def _layer_slice(layers: dict, i: int) -> dict:
    return jax.tree.map(lambda a: a[i], layers)


def vit_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    head_mask: Optional[jnp.ndarray] = None,
    output_hidden_states: bool = False,
    use_pallas: Optional[bool] = None,
    quant: Optional[str] = None,
    remat: bool = False,
):
    """Dense forward. Returns dict(logits, cls, last_hidden[, hidden_states]).

    head_mask: [L, H] float or None (HF get_head_mask semantics,
    himanshu/model_utils.py:220).
    use_pallas: None = auto (Pallas TPU kernels for inference on TPU).
    quant: serving quantization mode; None = read the global at trace time.
    remat: checkpoint the scanned layer body (training memory lever; the
    head_mask/hidden-states python-loop branch is inference-only and
    ignores it).
    """
    if use_pallas is None:
        from vit_pruning_tpu.ops.dispatch import use_pallas as _resolve

        use_pallas = _resolve()
    if quant is None:
        from vit_pruning_tpu.ops.dispatch import serving_quant

        quant = serving_quant()
    x = embed(pixel_values, params["embed"], config)

    hidden_states = [x] if output_hidden_states else None
    if output_hidden_states or head_mask is not None:
        # python loop (still one compiled program; L is static)
        for i in range(config.num_layers):
            hm = head_mask[i] if head_mask is not None else None
            x = vit_layer(x, _layer_slice(params["layers"], i), config, head_mask=hm,
                          use_pallas=use_pallas, quant=quant)
            if output_hidden_states:
                hidden_states.append(x)
    else:
        from vit_pruning_tpu.ops.pallas.model import (
            differentiable_fused_encoder,
            encoder_weights_fit,
        )

        from vit_pruning_tpu.ops.dispatch import encoder_fusion_enabled

        itemsize = jax.tree.leaves(params["layers"])[0].dtype.itemsize
        if use_pallas and encoder_fusion_enabled() and encoder_weights_fit(
            config.num_layers, config.hidden_size, config.mlp_dim, itemsize
        ):
            # whole-encoder megakernel: activations stay VMEM-resident
            # across all layers (one launch, one x-in/x-out HBM round trip)
            x = differentiable_fused_encoder(
                config.num_heads, config.layernorm_eps
            )(x, params["layers"], None)
        else:
            def body(carry, layer_params):
                return vit_layer(carry, layer_params, config, use_pallas=use_pallas,
                                 quant=quant), None

            if remat:
                # one checkpointed scan body instead of num_layers unrolled
                # remat'd copies: same memory behavior, ~L x smaller HLO —
                # the unrolled ViT-L train graph reproducibly crashed the
                # remote compile helper (r5, broken pipe after ~25 min)
                body = jax.checkpoint(body)
            x, _ = jax.lax.scan(body, x, params["layers"])

    x = layer_norm(x, params["ln_f"], config.layernorm_eps)
    cls = x[:, 0]
    logits = cls @ params["head"]["w"] + params["head"]["b"]
    out = {"logits": logits, "cls": cls, "last_hidden": x}
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out


# --- Initialization -----------------------------------------------------------

def _linear_init(key, fan_in: int, fan_out: int, std: float = 0.02) -> dict:
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.truncated_normal(kw, -2.0, 2.0, (fan_in, fan_out)) * std,
        "b": jnp.zeros((fan_out,)),
    }


def init_vit_params(key: jax.Array, config: ViTConfig) -> dict:
    """Random init matching HF ViT defaults (trunc-normal 0.02, zeros bias)."""
    d = config.hidden_size
    keys = jax.random.split(key, 8)

    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "attn": {
                "q": _linear_init(ks[0], d, d),
                "k": _linear_init(ks[1], d, d),
                "v": _linear_init(ks[2], d, d),
                "o": _linear_init(ks[3], d, d),
            },
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "mlp": {
                "fc1": _linear_init(ks[4], d, config.mlp_dim),
                "fc2": _linear_init(ks[5], config.mlp_dim, d),
            },
        }

    layer_keys = jax.random.split(keys[0], config.num_layers)
    per_layer = [layer_init(k) for k in layer_keys]
    layers = jax.tree.map(lambda *a: jnp.stack(a), *per_layer)

    return {
        "embed": {
            "patch": _linear_init(keys[1], config.patch_dim, d),
            "cls": jax.random.truncated_normal(keys[2], -2.0, 2.0, (1, 1, d)) * 0.02,
            "pos": jax.random.truncated_normal(keys[3], -2.0, 2.0, (1, config.seq_len, d))
            * 0.02,
        },
        "layers": layers,
        "ln_f": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "head": _linear_init(keys[4], d, config.num_labels),
    }


def param_count(params: dict) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(params))
