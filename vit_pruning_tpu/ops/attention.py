"""Multi-head attention with token-validity and head masks — jnp reference.

The reference uses HF `ViTSelfAttention` and skips tokens by gathering kept
tokens per image in a Python loop (himanshu/model_utils.py:88-91) — B ragged
attention launches per layer per step. On TPU that is replaced by a single
static-shape masked attention: invalid tokens are excluded from the softmax
via additive -inf on key columns, which is mathematically identical to
running attention over only the kept tokens (their query rows are discarded
by the caller's residual passthrough).

A Pallas fused kernel with the same contract lives in
`vit_pruning_tpu.ops.pallas.attention`; this file is the semantics reference
every kernel is tested against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large finite negative: avoids NaNs from (-inf) - (-inf)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def attention_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    token_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax attention probabilities [B, H, S, S].

    q, k: [B, H, S, hd].  token_mask: [B, S] bool, True = valid key.
    """
    head_dim = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
    if token_mask is not None:
        bias = jnp.where(token_mask[:, None, None, :], 0.0, NEG_INF).astype(logits.dtype)
        logits = logits + bias
    return jax.nn.softmax(logits, axis=-1)


def mha(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    token_mask: Optional[jnp.ndarray] = None,
    head_mask: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
    use_pallas: bool = False,
):
    """Full multi-head self-attention block (QKV proj -> attn -> out proj).

    params: {'q': {'w','b'}, 'k': {...}, 'v': {...}, 'o': {...}} with
    w: [D, D] (input-major: y = x @ w + b), matching torch Linear transposed.

    token_mask: [B, S] bool — True means the token participates as a key/value.
        Query rows of invalid tokens still produce outputs; callers discard
        them via the residual passthrough (exactly the reference's scatter-back,
        himanshu/model_utils.py:91).
    head_mask: [H] or [B, H] float — multiplies attention probabilities,
        matching HF's head_mask semantics (1.0 = keep head).
    """
    # fused QKV: one [B*S, D] @ [D, 3D] matmul instead of three
    wqkv = jnp.concatenate([params["q"]["w"], params["k"]["w"], params["v"]["w"]], axis=1)
    bqkv = jnp.concatenate([params["q"]["b"], params["k"]["b"], params["v"]["b"]])
    qkv = x @ wqkv + bqkv
    q, k, v = (_split_heads(t, num_heads) for t in jnp.split(qkv, 3, axis=-1))

    if use_pallas and not return_probs and head_mask is None:
        from vit_pruning_tpu.ops.pallas.attention import fused_attention

        ctx = fused_attention(q, k, v, token_mask)
        return _merge_heads(ctx) @ params["o"]["w"] + params["o"]["b"]

    probs = attention_probs(q, k, token_mask)
    if head_mask is not None:
        hm = head_mask if head_mask.ndim == 2 else head_mask[None, :]
        probs = probs * hm[:, :, None, None].astype(probs.dtype)

    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = _merge_heads(ctx) @ params["o"]["w"] + params["o"]["b"]
    if return_probs:
        return out, probs
    return out
