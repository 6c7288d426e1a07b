"""Fused multi-head attention Pallas kernel with token-validity masking.

One program per batch element: loads q/k/v [H, S, hd] into VMEM and computes
softmax(q k^T / sqrt(hd) + mask) v for all heads on-chip — the [H, S, S]
probability tensor never touches HBM (for DeiT-S/224 at B=256 the naive path
materializes ~119 MB of probabilities per layer).

ViT sequences are short (<= 257 tokens), so no K/V streaming is needed: a
whole batch element (H*S*hd floats, ~450 KB for ViT-B) fits in VMEM. Padding
rows and masked-out tokens are excluded via additive -inf on key columns —
the same contract as ops.attention.mha (the tested reference semantics;
the static-shape replacement of himanshu/model_utils.py:88-91's ragged
gather). head_dim stays unpadded (it is the block's last dim, equal to the
array dim, which Mosaic allows) so no MXU work is wasted.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, s: int, h: int):
    if mask_ref is not None:
        key_valid = mask_ref[0, :, :] != 0  # [1, S]
    else:
        key_valid = None

    for head in range(h):  # static unroll; H is small
        q = q_ref[0, head].astype(jnp.float32)  # [S, hd]
        k = k_ref[0, head].astype(jnp.float32)
        v = v_ref[0, head].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [S, S]

        if key_valid is not None:
            logits = jnp.where(key_valid, logits, NEG_INF)

        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        o_ref[0, head] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    token_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(hd)) v with optional key-validity mask.

    q, k, v: [B, H, S, hd]. token_mask: [B, S] bool (True = valid key) or None.
    Returns [B, H, S, hd] in q.dtype. Rows of invalid tokens contain garbage
    by contract — callers overwrite them with the residual passthrough.
    """
    b, h, s, hd = q.shape
    scale = 1.0 / (hd ** 0.5)

    qkv_spec = pl.BlockSpec(
        (1, h, s, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if token_mask is not None:
        mp = token_mask.astype(jnp.int32)[:, None, :]  # [B, 1, S]
        in_specs.append(
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mp)
        kernel = functools.partial(_attn_kernel, scale=scale, s=s, h=h)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _attn_kernel(qr, kr, vr, None, orf, **kw),
            scale=scale, s=s, h=h,
        )

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, h, s, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s * s * hd,
            bytes_accessed=4 * b * h * s * hd * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
    )(*args)
