"""Whole-encoder fused Pallas kernel: all L transformer layers in one launch.

The per-layer megakernel (ops/pallas/layer.py) already keeps each layer's
intermediates in VMEM, but still pays x-in + x-out HBM traffic per layer
(2·B·S·D per layer — e.g. ~1.9 GB per DeiT-S batch-512 dense forward) plus a
kernel launch per layer. Here the activation block stays RESIDENT in VMEM
across all layers: HBM traffic drops to x-in + x-out once, plus the weights
(fetched once per launch — constant index maps). This is the idiomatic TPU
shape for a small model: weights fit in VMEM (DeiT-T ~11 MB, DeiT-S ~43 MB in
bf16 vs 128 MB VMEM on v5e), so the whole depth is one compute-bound program.

Applies to inference segments at a fixed sequence length: the dense forward,
and the progressive-compaction serving path between token drops
(models/pruned_vit.py::progressive_topk_forward). ViT-B's weights (~170 MB
bf16) do not fit — callers must check `encoder_weights_fit()` and fall back
to the per-layer kernel.

Reference anchor: this fuses the reference's entire ViTEncoder loop
(himanshu/model_utils.py:133-181) into one TPU program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_pruning_tpu.ops.pallas.mlp import _gelu
from vit_pruning_tpu.ops.pallas.layer import _layer_norm_f32, _round_up, NEG_INF


def encoder_weights_fit(num_layers: int, d: int, m: int, itemsize: int = 2,
                        budget_bytes: int = 96 * 1024 * 1024) -> bool:
    """Can all layer weights stay VMEM-resident (leaving room for the
    activation working set)?"""
    per_layer = 4 * d * d + 2 * d * m  # qkv+o + fc1+fc2 (biases negligible)
    return num_layers * per_layer * itemsize < budget_bytes


@functools.lru_cache(maxsize=None)
def differentiable_fused_encoder(num_heads: int, eps: float, interpret: bool = False):
    """fused_vit_encoder with a custom VJP: forward runs the whole-encoder
    Pallas kernel, backward recomputes through the jnp layer loop
    (rematerialization, same pattern as differentiable_fused_layer)."""
    from vit_pruning_tpu.models import vit as vit_mod
    from vit_pruning_tpu.ops.attention import mha

    def _ref(x, layers, token_mask):
        L = jax.tree.leaves(layers)[0].shape[0]
        for i in range(L):
            p = jax.tree.map(lambda a: a[i], layers)
            h = vit_mod.layer_norm(x, p["ln1"], eps)
            x1 = x + mha(h, p["attn"], num_heads, token_mask=token_mask)
            h2 = vit_mod.layer_norm(x1, p["ln2"], eps)
            x = x1 + vit_mod.mlp_block(h2, p["mlp"])
        return x

    @jax.custom_vjp
    def f(x, layers, token_mask):
        return fused_vit_encoder(
            x, layers, num_heads, eps=eps, token_mask=token_mask,
            interpret=interpret,
        )

    def f_fwd(x, layers, token_mask):
        return f(x, layers, token_mask), (x, layers, token_mask)

    def f_bwd(res, g):
        x, layers, token_mask = res
        _, vjp = jax.vjp(lambda x_, p_: _ref(x_, p_, token_mask), x, layers)
        dx, dp = vjp(g)
        return dx, dp, None

    f.defvjp(f_fwd, f_bwd)
    return f


def _encoder_kernel(
    x_ref, mask_ref,
    ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2g_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    ctx_ref,
    *, L: int, bt: int, s: int, s_real: int, h: int, hd: int, d: int,
    eps: float, scale: float,
):
    kw = h * hd
    x = x_ref[:].reshape(bt * s, d).astype(jnp.float32)

    if mask_ref is not None:
        key_ok_rows = [mask_ref[b, :, :] != 0 for b in range(bt)]  # [1, S] each
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        key_ok_rows = [col < s_real] * bt

    for l in range(L):
        h1 = _layer_norm_f32(
            x, ln1g_ref[l].astype(jnp.float32), ln1b_ref[l].astype(jnp.float32), eps
        )
        qkv = jnp.dot(
            h1.astype(wqkv_ref.dtype), wqkv_ref[l],
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[l].astype(jnp.float32)
        qkv = qkv.astype(x_ref.dtype)

        for b in range(bt):
            rows = pl.ds(b * s, s)
            key_ok = key_ok_rows[b]
            for head in range(h):
                q = qkv[b * s:(b + 1) * s, head * hd:(head + 1) * hd]
                k = qkv[b * s:(b + 1) * s, kw + head * hd:kw + (head + 1) * hd]
                v = qkv[b * s:(b + 1) * s, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                logits = jnp.where(key_ok, logits, NEG_INF)
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
                ctx_ref[rows, pl.ds(head * hd, hd)] = jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                ).astype(ctx_ref.dtype)

        attn_out = jnp.dot(
            ctx_ref[:], wo_ref[l], preferred_element_type=jnp.float32
        ) + bo_ref[l].astype(jnp.float32)
        x1 = x + attn_out

        h2 = _layer_norm_f32(
            x1, ln2g_ref[l].astype(jnp.float32), ln2b_ref[l].astype(jnp.float32), eps
        )
        m1 = jnp.dot(
            h2.astype(w1_ref.dtype), w1_ref[l], preferred_element_type=jnp.float32
        ) + b1_ref[l].astype(jnp.float32)
        m1 = _gelu(m1).astype(w2_ref.dtype)
        m2 = jnp.dot(m1, w2_ref[l], preferred_element_type=jnp.float32) \
            + b2_ref[l].astype(jnp.float32)
        x = x1 + m2

    o_ref[:] = x.astype(o_ref.dtype).reshape(bt, s, d)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "block_b", "interpret")
)
def fused_vit_encoder(
    x: jnp.ndarray,
    layers: dict,
    num_heads: int,
    eps: float = 1e-12,
    token_mask: Optional[jnp.ndarray] = None,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """All encoder layers fused in one Pallas launch (inference path).

    x: [B, S, D]; layers: the stacked per-layer param tree (each leaf has a
    leading [L] axis); token_mask: [B, S] bool or None, applied at EVERY
    layer (static masks only — per-layer predictor masks need the per-layer
    kernel).
    """
    b, s, d = x.shape
    a = layers["attn"]
    L = a["q"]["w"].shape[0]
    kv_width = a["q"]["w"].shape[2]
    hd = kv_width // num_heads
    scale = 1.0 / (hd ** 0.5)
    m = layers["mlp"]["fc1"]["w"].shape[2]

    if block_b == 0:
        block_b = 8
    bt = min(block_b, b)
    while b % bt:
        bt -= 1

    s_pad = _round_up(s, 8)
    if s_pad != s:
        x = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])
        if token_mask is not None:
            token_mask = jnp.pad(token_mask, [(0, 0), (0, s_pad - s)])

    wqkv = jnp.concatenate([a["q"]["w"], a["k"]["w"], a["v"]["w"]], axis=2)  # [L, D, 3K]
    bqkv = jnp.concatenate(
        [a["q"]["b"], a["k"]["b"], a["v"]["b"]], axis=1
    ).reshape(L, 1, 3 * kv_width)

    def vec(t, n):
        return t.reshape(L, 1, n)

    weights = [
        vec(layers["ln1"]["g"], d), vec(layers["ln1"]["b"], d),
        wqkv, bqkv,
        a["o"]["w"], vec(a["o"]["b"], d),
        vec(layers["ln2"]["g"], d), vec(layers["ln2"]["b"], d),
        layers["mlp"]["fc1"]["w"], vec(layers["mlp"]["fc1"]["b"], m),
        layers["mlp"]["fc2"]["w"], vec(layers["mlp"]["fc2"]["b"], d),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0,) * w_ndim, memory_space=pltpu.VMEM)
        for w in weights
        for w_ndim in [w.ndim]
    ]

    in_specs = [pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if token_mask is not None:
        in_specs.append(
            pl.BlockSpec((bt, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(token_mask.astype(jnp.int32)[:, None, :])
        kernel = _encoder_kernel
    else:
        def kernel(x_ref, *rest, **kw):
            return _encoder_kernel(x_ref, None, *rest, **kw)
    in_specs.extend(w_specs)
    args.extend(weights)

    out = pl.pallas_call(
        functools.partial(
            kernel, L=L, bt=bt, s=s_pad, s_real=s, h=num_heads, hd=hd, d=d,
            eps=eps, scale=scale,
        ),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt * s_pad, kv_width), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * b * s_pad * d * (3 * d + d + 2 * m)
                       + 4 * b * num_heads * s_pad * s_pad * hd),
            bytes_accessed=(2 * b * s_pad * d + L * (4 * d * d + 2 * d * m))
            * x.dtype.itemsize,
            transcendentals=L * b * s_pad * (m + num_heads * s_pad),
        ),
    )(*args)
    return out[:, :s]
