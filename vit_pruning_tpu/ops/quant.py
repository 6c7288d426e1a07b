"""int8 serving quantization: ground-truth jnp ops + param preparation.

Scheme (standard production ViT PTQ):
  * weights: symmetric per-output-channel int8 (scale = amax/127 per column),
    quantized once at model-load time;
  * activations: symmetric dynamic per-row (per-token) int8, quantized
    on the fly right before each weight matmul;
  * matmul: int8 x int8 -> int32 accumulation (the v5e MXU runs int8 at 2x
    bf16 throughput: 394 TOPS vs 197 TFLOPS), dequantized by
    row_scale * col_scale;
  * attention (QK^T softmax PV), layernorms, GELU, residuals stay in the
    serving dtype (bf16/f32) — the weight matmuls carry ~85% of the FLOPs.

The reference has no quantization story (fp32 torch end to end); this is a
TPU-serving capability on top of its models. `int8_vit_layer_ref` is the
semantics ground truth the Pallas kernel (ops/pallas/layer_int8.py) is
parity-tested against, and what the quality gate uses to measure the int8
accuracy delta on the XLA path.

All functions are jit-safe and exact: int8 x int8 -> int32 dot_general is
integer-exact on every backend.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import ViTConfig


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8. w: [K, N] -> (int8 [K, N], f32 [N])."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8. x: [..., K] -> (int8 [..., K], f32 [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(
    x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray, b: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Dynamic-activation int8 linear: returns f32 [..., N]."""
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * wscale
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out


def quantize_layer_params(params: dict) -> dict:
    """Quantize one layer's weight matrices (q/k/v/o, fc1/fc2); biases,
    layernorms stay float. Works on stacked [L, K, N] weights too (vmapped)."""

    def qmat(leaf):
        if leaf.ndim == 2:
            return quantize_weight(leaf)
        return jax.vmap(quantize_weight)(leaf)

    out = jax.tree.map(lambda a: a, params)  # shallow copy of structure
    for path in (("attn", "q"), ("attn", "k"), ("attn", "v"), ("attn", "o"),
                 ("mlp", "fc1"), ("mlp", "fc2")):
        node = out
        for k in path[:-1]:
            node = node[k]
        lin = dict(node[path[-1]])
        lin["wq"], lin["wscale"] = qmat(lin.pop("w"))
        node[path[-1]] = lin
    return out


def int8_vit_layer_ref(
    x: jnp.ndarray,
    qparams: dict,
    config: ViTConfig,
    token_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ground-truth int8 serving layer (pre-LN ViT block, HF ordering —
    models/vit.py::vit_layer with every weight matmul int8-quantized).

    qparams: output of quantize_layer_params for ONE layer.
    """
    from vit_pruning_tpu.models.vit import layer_norm
    from vit_pruning_tpu.ops.attention import (
        _merge_heads,
        _split_heads,
        attention_probs,
    )

    a = qparams["attn"]
    h = layer_norm(x, qparams["ln1"], config.layernorm_eps)
    q = int8_linear(h, a["q"]["wq"], a["q"]["wscale"], a["q"]["b"]).astype(x.dtype)
    k = int8_linear(h, a["k"]["wq"], a["k"]["wscale"], a["k"]["b"]).astype(x.dtype)
    v = int8_linear(h, a["v"]["wq"], a["v"]["wscale"], a["v"]["b"]).astype(x.dtype)
    q, k, v = (_split_heads(t, config.num_heads) for t in (q, k, v))
    probs = attention_probs(q, k, token_mask)
    ctx = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, v))
    attn = int8_linear(ctx, a["o"]["wq"], a["o"]["wscale"], a["o"]["b"])
    x1 = x + attn.astype(x.dtype)
    h2 = layer_norm(x1, qparams["ln2"], config.layernorm_eps)
    m = qparams["mlp"]
    h1 = int8_linear(h2, m["fc1"]["wq"], m["fc1"]["wscale"], m["fc1"]["b"])
    g = jax.nn.gelu(h1, approximate=x.dtype == jnp.bfloat16)
    m2 = int8_linear(g.astype(x.dtype), m["fc2"]["wq"], m["fc2"]["wscale"], m["fc2"]["b"])
    return x1 + m2.astype(x.dtype)
