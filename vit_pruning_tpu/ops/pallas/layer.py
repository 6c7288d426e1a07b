"""Whole-transformer-layer fused Pallas kernel.

Motivation (measured on this chip): the model is HBM-bandwidth-bound — the
effective bandwidth is ~170 GB/s while individual matmuls run near MXU peak.
XLA's per-op execution writes QKV, attention probabilities, context, and the
MLP intermediate to HBM every layer (~600 MB/layer for DeiT-S at B=256).
This kernel runs LN1 -> fused QKV -> per-head attention -> output projection
-> residual -> LN2 -> MLP -> residual entirely in VMEM: HBM traffic drops to
x-in + x-out + weights (~83 MB/layer), the theoretical minimum.

Grid: (B / BT,) — BT images per program. All layer weights are VMEM-resident
(constant index maps => DMA'd once per layer call). Token masking (skip-mode
pruning) enters as additive -inf on key columns, identical to the
ops.attention.mha contract.

The sequence is padded to a multiple of 8 rows (sublane alignment) by the
wrapper; padded rows are masked out of every softmax and sliced off on
return.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_pruning_tpu.ops.pallas.mlp import _gelu, _gelu_tanh

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block_b(b: int, d: int, itemsize: int, start: int = 8) -> int:
    """Default batch block, shrunk for wide models where bt=8 overflows VMEM.

    Calibrated table, not a model (compiler stack temporaries dominate the
    scoped-VMEM footprint and their reuse is opaque): the fixed bt=8
    default overflowed the ~102 MB scoped-VMEM stack by 284 KB at f32 x
    hidden-768 x S_pad-200 (the deit_base @224 quality-gate eval step,
    round 3), while every bf16 bench config through ViT-L fits at bt=8.
    ViT-H/14 bf16 (d=1280, mlp 5120, S_pad 264) needs 163.9 MB at bt=8
    (round 4, dense bench row) — the staged2 logits scratch alone is
    bt*16*264*264 f32 = 35.7 MB and the resident weights 39 MB; bt=4
    halves everything but the weights. So: bf16/int8 keep bt=8 through
    d=1024, bt=4 at d>=1280; f32 drops to 4 at d>=768, 2 at d>=1024,
    1 at d>=1280.
    """
    bt = start
    if itemsize >= 4 and d >= 768:
        bt = min(start, 4 if d < 1024 else (2 if d < 1280 else 1))
    elif d >= 1280:
        bt = min(start, 4)
    bt = min(bt, b)
    while b % bt:
        bt -= 1
    return bt


def _layer_norm_f32(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _kernel(
    x_ref, mask_ref,
    ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2g_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    ctx_ref,  # scratch [BT*S, KW] (KW = num_heads * head_dim, == D unless heads are pruned)
    logits_ref,  # scratch [BT*H*S, S] f32 (attn_impl='staged*' only; else (8, 128) dummy)
    p_ref,  # scratch [BT*H*S, S] in x dtype ('staged2' only; else (8, 128) dummy)
    *, bt: int, s: int, s_real: int, h: int, hd: int, d: int, eps: float, scale: float,
    attn_impl: str = "staged2", ablate: str = "none",
):
    # `ablate` is measurement-only instrumentation (scripts/kernel_lab.py):
    # it skips a section to attribute kernel time (never used by model code).
    kw = h * hd
    x = x_ref[:].reshape(bt * s, d).astype(jnp.float32)

    # LN1 + fused QKV projection (one big MXU matmul)
    h1 = _layer_norm_f32(x, ln1g_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32), eps)
    qkv = jnp.dot(
        h1.astype(wqkv_ref.dtype), wqkv_ref[:], preferred_element_type=jnp.float32
    ) + bqkv_ref[:].astype(jnp.float32)  # [BT*S, 3D]
    # attention dots run in the input dtype (bf16 on the MXU at full rate;
    # fp32 inputs keep fp32 dots) with fp32 accumulation + fp32 softmax —
    # standard flash-attention numerics
    qkv = qkv.astype(x_ref.dtype)

    if ablate in ("attn", "attn_mlp"):
        ctx_ref[:] = qkv[:, :kw]
    elif ablate == "qkv":
        # skip the QKV matmul AND attention: isolates the base
        # (x io + LN + O-proj + MLP) when compared with 'attn' — must
        # precede the attn_impl branches or it is unreachable under the
        # default staged2 implementation
        ctx_ref[:] = h1[:, :kw].astype(ctx_ref.dtype)
    elif attn_impl == "staged2":
        # 'staged' plus two VPU cuts: (1) probabilities are stored
        # UNNORMALIZED in the input dtype (half the scratch traffic of the
        # f32 store), (2) the per-row softmax denominator rides the PV matmul
        # as an appended ones column, so normalization becomes one reciprocal
        # multiply on the [S, hd] context instead of a divide over [S, S].
        for b in range(bt):
            if mask_ref is not None:
                key_ok = mask_ref[b, :, :] != 0  # [1, S]
            else:
                key_ok = None
            for head in range(h):
                q = qkv[b * s:(b + 1) * s, head * hd:(head + 1) * hd]
                k = qkv[b * s:(b + 1) * s, kw + head * hd:kw + (head + 1) * hd]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if key_ok is not None:
                    logits = jnp.where(key_ok, logits, NEG_INF)
                logits_ref[pl.ds((b * h + head) * s, s), :] = logits
        logits = logits_ref[:]
        if mask_ref is None:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            logits = jnp.where(col < s_real, logits, NEG_INF)
        if ablate == "noexp":  # measurement: softmax exp cost in isolation
            p_ref[:] = (logits * 1e-4).astype(p_ref.dtype)
        else:
            p_ref[:] = jnp.exp(
                logits - jnp.max(logits, axis=-1, keepdims=True)
            ).astype(p_ref.dtype)
        ones_col = jnp.ones((s, 1), dtype=qkv.dtype)
        for b in range(bt):
            rows = pl.ds(b * s, s)
            for head in range(h):
                v = qkv[b * s:(b + 1) * s, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
                vv = jnp.concatenate([v, ones_col], axis=1)  # [S, hd+1]
                p_bh = p_ref[pl.ds((b * h + head) * s, s), :].astype(qkv.dtype)
                out = jnp.dot(p_bh, vv, preferred_element_type=jnp.float32)
                ctx_ref[rows, pl.ds(head * hd, hd)] = (
                    out[:, :hd] * (1.0 / out[:, hd:hd + 1])
                ).astype(ctx_ref.dtype)
    elif attn_impl == "staged":
        # three homogeneous stages instead of BT*H interleaved MXU/VPU
        # blocks: (1) all QK^T dots into one logits scratch, (2) ONE
        # vectorized masked softmax over [BT*H*S, S], (3) all PV dots.
        # De-interleaving keeps the MXU busy through stage 1/3 and lets the
        # softmax vectorize across every (image, head) row at once.
        for b in range(bt):
            if mask_ref is not None:
                key_ok = mask_ref[b, :, :] != 0  # [1, S]
            else:
                key_ok = None
            for head in range(h):
                q = qkv[b * s:(b + 1) * s, head * hd:(head + 1) * hd]
                k = qkv[b * s:(b + 1) * s, kw + head * hd:kw + (head + 1) * hd]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if key_ok is not None:
                    logits = jnp.where(key_ok, logits, NEG_INF)
                logits_ref[pl.ds((b * h + head) * s, s), :] = logits
        logits = logits_ref[:]
        if mask_ref is None:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            logits = jnp.where(col < s_real, logits, NEG_INF)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        logits_ref[:] = p / jnp.sum(p, axis=-1, keepdims=True)
        for b in range(bt):
            rows = pl.ds(b * s, s)
            for head in range(h):
                v = qkv[b * s:(b + 1) * s, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
                p_bh = logits_ref[pl.ds((b * h + head) * s, s), :].astype(qkv.dtype)
                ctx_ref[rows, pl.ds(head * hd, hd)] = jnp.dot(
                    p_bh, v, preferred_element_type=jnp.float32
                ).astype(ctx_ref.dtype)
    elif attn_impl == "packed":
        # Cross-image packed attention for SHORT sequences (the composed/
        # ultra presets' live lengths, 17-66 + CLS): at S_pad << 128 each
        # per-(image, head) [S, S] dot lights up a few percent of the MXU
        # tile. Packing the whole batch block into ONE [BT*S, BT*S]
        # block-diagonal dot per head costs bt x the logits FLOPs but runs
        # at near-full tile occupancy; the block-diagonal mask (same-image
        # rows/cols only) keeps the semantics exactly those of per-image
        # attention. Replaces the reference's ragged per-image loop
        # (himanshu/model_utils.py:88-91) at the opposite extreme: one
        # matmul for the whole block instead of one launch per image.
        n_rows = bt * s
        row_img = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_rows), 0) // s
        col_img = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_rows), 1) // s
        key_ok = row_img == col_img
        if mask_ref is not None:
            key_ok = key_ok & (mask_ref[:].reshape(1, n_rows) != 0)
        else:
            col_pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_rows), 1) % s
            key_ok = key_ok & (col_pos < s_real)
        ones_col = jnp.ones((n_rows, 1), dtype=qkv.dtype)
        for head in range(h):
            q = qkv[:, head * hd:(head + 1) * hd]
            k = qkv[:, kw + head * hd:kw + (head + 1) * hd]
            v = qkv[:, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(key_ok, logits, NEG_INF)
            p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
            # staged2-style fused denominator: ride the PV matmul as an
            # appended ones column, normalize with one reciprocal multiply
            vv = jnp.concatenate([v, ones_col], axis=1)
            out = jnp.dot(p.astype(qkv.dtype), vv,
                          preferred_element_type=jnp.float32)
            ctx_ref[:, pl.ds(head * hd, hd)] = (
                out[:, :hd] * (1.0 / out[:, hd:hd + 1])
            ).astype(ctx_ref.dtype)
    elif attn_impl == "batched":
        # head-batched attention: two batched dot_generals with (image, head)
        # folded into ONE batch dim (Mosaic's tpu.matmul supports exactly one)
        # instead of BT*H unrolled [S, hd] dots
        q3 = qkv[:, 0 * kw:1 * kw].reshape(bt, s, h, hd).transpose(0, 2, 1, 3).reshape(bt * h, s, hd)
        k3 = qkv[:, 1 * kw:2 * kw].reshape(bt, s, h, hd).transpose(0, 2, 1, 3).reshape(bt * h, s, hd)
        v3 = qkv[:, 2 * kw:3 * kw].reshape(bt, s, h, hd).transpose(0, 2, 1, 3).reshape(bt * h, s, hd)
        logits = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [BT*H, S, S]
        if mask_ref is not None:
            key_ok = jnp.repeat(mask_ref[:, :, :] != 0, h, axis=0)  # [BT*H, 1, S]
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
            key_ok = col < s_real
        logits = jnp.where(key_ok, logits, NEG_INF)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
        ctx3 = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BT*H, S, hd]
        ctx_ref[:] = (
            ctx3.reshape(bt, h, s, hd).transpose(0, 2, 1, 3)
            .reshape(bt * s, kw).astype(ctx_ref.dtype)
        )
    else:
        f32 = attn_impl == "unrolled_f32"
        # per-image, per-head attention, accumulated into ctx scratch
        for b in range(bt):
            rows = pl.ds(b * s, s)
            if mask_ref is not None:
                key_ok = mask_ref[b, :, :] != 0  # [1, S]
            else:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
                key_ok = col < s_real
            for head in range(h):
                q = qkv[b * s:(b + 1) * s, head * hd:(head + 1) * hd]
                k = qkv[b * s:(b + 1) * s, kw + head * hd:kw + (head + 1) * hd]
                v = qkv[b * s:(b + 1) * s, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
                if f32:
                    q, k, v = (t.astype(jnp.float32) for t in (q, k, v))

                if ablate == "dots":  # slicing only: no matmuls, no softmax
                    ctx_ref[rows, pl.ds(head * hd, hd)] = (q + k + v).astype(ctx_ref.dtype)
                    continue
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                if ablate == "softmax":  # dots without exp/normalize
                    p = logits * 0.001
                else:
                    logits = jnp.where(key_ok, logits, NEG_INF)
                    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                    p = jnp.exp(logits)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                if not f32:
                    p = p.astype(qkv.dtype)
                ctx_ref[rows, pl.ds(head * hd, hd)] = jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                ).astype(ctx_ref.dtype)

    # output projection + residual
    attn_out = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    x1 = x + attn_out  # [BT*S, D] f32

    if ablate in ("mlp", "attn_mlp"):
        o_ref[:] = x1.astype(o_ref.dtype).reshape(bt, s, d)
        return

    # LN2 + MLP + residual
    h2 = _layer_norm_f32(x1, ln2g_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32), eps)
    m1 = jnp.dot(
        h2.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    # tanh-approx GELU when the activation is about to be rounded to bf16
    # anyway (approximation error < bf16 rounding); erf-exact for fp32
    gelu = _gelu_tanh if o_ref.dtype == jnp.bfloat16 else _gelu
    if ablate == "nogelu":  # measurement: GELU transcendental cost
        m1 = (m1 * 0.5).astype(w2_ref.dtype)
    else:
        m1 = gelu(m1).astype(w2_ref.dtype)
    m2 = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)

    o_ref[:] = (x1 + m2).astype(o_ref.dtype).reshape(bt, s, d)


@functools.lru_cache(maxsize=None)
def differentiable_fused_layer(num_heads: int, eps: float, interpret: bool = False,
                               attn_impl: str = "staged2"):
    """fused_vit_layer with a custom VJP: forward runs the Pallas megakernel,
    backward recomputes through the jnp reference layer and differentiates
    that (rematerialization — the standard trade for fused forwards). Token
    masks are non-differentiable.

    Returns f(x, params, token_mask) -> y. Cached per (heads, eps).
    """
    from vit_pruning_tpu.models import vit as vit_mod
    from vit_pruning_tpu.ops.attention import mha

    def _ref(x, params, token_mask):
        # jnp reference path with matching semantics (no pallas, no probs)
        h = vit_mod.layer_norm(x, params["ln1"], eps)
        attn = mha(h, params["attn"], num_heads, token_mask=token_mask)
        x1 = x + attn
        h2 = vit_mod.layer_norm(x1, params["ln2"], eps)
        return x1 + vit_mod.mlp_block(h2, params["mlp"])

    @jax.custom_vjp
    def f(x, params, token_mask):
        return fused_vit_layer(
            x, params, num_heads, eps=eps, token_mask=token_mask,
            interpret=interpret, attn_impl=attn_impl,
        )

    def f_fwd(x, params, token_mask):
        return f(x, params, token_mask), (x, params, token_mask)

    def f_bwd(res, g):
        x, params, token_mask = res
        _, vjp = jax.vjp(lambda x_, p_: _ref(x_, p_, token_mask), x, params)
        dx, dp = vjp(g)
        return dx, dp, None

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "block_b", "interpret", "attn_impl", "ablate")
)
def fused_vit_layer(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    eps: float = 1e-12,
    token_mask: Optional[jnp.ndarray] = None,
    block_b: int = 0,
    interpret: bool = False,
    attn_impl: str = "staged2",
    ablate: str = "none",
) -> jnp.ndarray:
    """One pre-LN ViT block, fully fused. Same semantics as models.vit.vit_layer.

    x: [B, S, D]; params: the per-layer dict {'ln1','attn','ln2','mlp'};
    token_mask: [B, S] bool or None. block_b=8 measured best across sequence
    lengths (larger blocks blow up the unrolled per-head attention loops);
    the default shrinks it when the estimated VMEM footprint would overflow
    the ~102 MB scoped limit (f32 at DeiT-B geometry and up — see
    _auto_block_b).
    """
    b, s, d = x.shape
    # head_dim from the actual projection width: supports physically
    # head-pruned models where q/k/v project D -> kept_heads * hd != D
    kv_width = params["attn"]["q"]["w"].shape[1]
    hd = kv_width // num_heads
    scale = 1.0 / (hd ** 0.5)
    s_pad = _round_up(s, 8)
    if block_b == 0:
        bt = _auto_block_b(b, d, x.dtype.itemsize)
    else:
        bt = min(block_b, b)
        while b % bt:
            bt -= 1

    if s_pad != s:
        x = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])
        if token_mask is not None:
            token_mask = jnp.pad(token_mask, [(0, 0), (0, s_pad - s)])

    a = params["attn"]
    wqkv = jnp.concatenate([a["q"]["w"], a["k"]["w"], a["v"]["w"]], axis=1)
    bqkv = jnp.concatenate([a["q"]["b"], a["k"]["b"], a["v"]["b"]]).reshape(1, 3 * kv_width)
    m = params["mlp"]["fc1"]["w"].shape[1]

    def vec(t, n):
        return t.reshape(1, n)

    weights = [
        vec(params["ln1"]["g"], d), vec(params["ln1"]["b"], d),
        wqkv, bqkv,
        a["o"]["w"], vec(a["o"]["b"], d),
        vec(params["ln2"]["g"], d), vec(params["ln2"]["b"], d),
        params["mlp"]["fc1"]["w"], vec(params["mlp"]["fc1"]["b"], m),
        params["mlp"]["fc2"]["w"], vec(params["mlp"]["fc2"]["b"], d),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights  # all weights are 2D, constant index => DMA'd once
    ]

    in_specs = [pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if token_mask is not None:
        # 3D mask [B, 1, S_pad]: the (1, s_pad) trailing block dims equal the
        # array dims, so any bt is a legal block size
        in_specs.append(
            pl.BlockSpec((bt, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(token_mask.astype(jnp.int32)[:, None, :])
        kernel = _kernel
    else:
        def kernel(x_ref, *rest, **kw):
            return _kernel(x_ref, None, *rest, **kw)
    in_specs.extend(w_specs)
    args.extend(weights)

    out = pl.pallas_call(
        functools.partial(
            kernel, bt=bt, s=s_pad, s_real=s, h=num_heads, hd=hd, d=d,
            eps=eps, scale=scale, attn_impl=attn_impl, ablate=ablate,
        ),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * s_pad, kv_width), x.dtype),
            pltpu.VMEM(
                (bt * num_heads * s_pad, s_pad)
                if attn_impl in ("staged", "staged2") else (8, 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (bt * num_heads * s_pad, s_pad) if attn_impl == "staged2" else (8, 128),
                x.dtype,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * d * (3 * d + d + 2 * m) + 4 * b * num_heads * s_pad * s_pad * hd,
            bytes_accessed=(2 * b * s_pad * d + 4 * d * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=b * s_pad * (m + num_heads * s_pad),
        ),
    )(*args)
    return out[:, :s]


# --- Last-layer CLS epilogue fusion (VERDICT r2 #5) --------------------------
#
# The serving path's classifier consumes ONLY the CLS token, so the last
# encoder layer's per-token work is mostly dead: K/V projections need every
# token (CLS attends over them), but Q/attention/O-proj/MLP matter for the
# CLS row alone, and the final layernorm + classifier head can ride the same
# kernel. This folds the last layer + final-LN + head into one launch that
# emits logits directly — removing the full-sequence MLP of the last layer
# (~60% of its FLOPs), the separate final-LN/classifier dispatches, and the
# last layer's [B, S, D] output round trip to HBM.
#
# Mathematically identical to vit_layer -> layer_norm -> head[CLS] (CLS
# attention still sees the full K/V set); parity-tested in tests/test_pallas.py.

def _cls_head_kernel(
    x_ref,
    ln1g_ref, ln1b_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    ln2g_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    lnfg_ref, lnfb_ref, wh_ref, bh_ref,
    o_ref,
    ctx_ref,  # scratch [BT, KW] f32
    *, bt: int, s: int, s_real: int, h: int, hd: int, d: int, eps: float,
    scale: float,
):
    kw = h * hd
    x = x_ref[:].reshape(bt * s, d).astype(jnp.float32)

    # LN1 everywhere (K/V need every token); Q only for the CLS rows
    h1 = _layer_norm_f32(
        x, ln1g_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32), eps
    )
    kv = jnp.dot(
        h1.astype(wkv_ref.dtype), wkv_ref[:], preferred_element_type=jnp.float32
    ) + bkv_ref[:].astype(jnp.float32)  # [BT*S, 2KW]
    kv = kv.astype(x_ref.dtype)
    h1_cls = h1.reshape(bt, s, d)[:, 0, :]  # [BT, D]
    q_cls = (
        jnp.dot(h1_cls.astype(wq_ref.dtype), wq_ref[:],
                preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype)  # [BT, KW]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    key_ok = col < s_real
    for b in range(bt):
        k_b = kv[b * s:(b + 1) * s, :kw]
        v_b = kv[b * s:(b + 1) * s, kw:2 * kw]
        for head in range(h):
            q = q_cls[b:b + 1, head * hd:(head + 1) * hd]       # [1, hd]
            k = k_b[:, head * hd:(head + 1) * hd]               # [S, hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                           # [1, S]
            logits = jnp.where(key_ok, logits, NEG_INF)
            p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(kv.dtype)
            v = v_b[:, head * hd:(head + 1) * hd]               # [S, hd]
            ctx_ref[b:b + 1, pl.ds(head * hd, hd)] = jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )

    attn = jnp.dot(
        ctx_ref[:].astype(wo_ref.dtype), wo_ref[:],
        preferred_element_type=jnp.float32,
    ) + bo_ref[:].astype(jnp.float32)                            # [BT, D]
    x1 = x.reshape(bt, s, d)[:, 0, :] + attn

    h2 = _layer_norm_f32(
        x1, ln2g_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32), eps
    )
    m1 = jnp.dot(
        h2.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    gelu = _gelu_tanh if x_ref.dtype == jnp.bfloat16 else _gelu
    m1 = gelu(m1).astype(w2_ref.dtype)
    x2 = x1 + jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)

    yn = _layer_norm_f32(
        x2, lnfg_ref[:].astype(jnp.float32), lnfb_ref[:].astype(jnp.float32), eps
    )
    o_ref[:] = (
        jnp.dot(yn.astype(wh_ref.dtype), wh_ref[:],
                preferred_element_type=jnp.float32)
        + bh_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "block_b", "interpret")
)
def fused_vit_layer_cls_logits(
    x: jnp.ndarray,
    params: dict,
    lnf: dict,
    head: dict,
    num_heads: int,
    eps: float = 1e-12,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Last encoder layer + final layernorm + classifier, CLS-only, fused.

    x: [B, S, D] (the last layer's input); params: that layer's dict;
    lnf/head: the model's 'ln_f' and 'head' trees. Returns logits
    [B, num_labels] == vit_layer(x) |> layer_norm |> head on CLS.
    """
    b, s, d = x.shape
    kv_width = params["attn"]["q"]["w"].shape[1]
    hd = kv_width // num_heads
    scale = 1.0 / (hd ** 0.5)
    labels = head["w"].shape[1]
    s_pad = _round_up(s, 8)
    if block_b == 0:
        bt = _auto_block_b(b, d, x.dtype.itemsize)
    else:
        bt = min(block_b, b)
        while b % bt:
            bt -= 1
    # Sublane rule: the [bt, labels] logits block's second-to-last dim must
    # be a multiple of 8 or equal b. _auto_block_b returns 4 at d>=1280 (VMEM
    # sizing for the FULL layer kernel's [bt*h*s, s] attention scratch); this
    # kernel has no such scratch (CLS-only Q/attn/MLP, ~45MB at ViT-H bt=8),
    # so promote rather than crash (bench_full ViT-H rows, r5).
    if bt % 8 and bt != b:
        bt = 8 if b % 8 == 0 else b

    if s_pad != s:
        x = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])

    a = params["attn"]
    wkv = jnp.concatenate([a["k"]["w"], a["v"]["w"]], axis=1)
    bkv = jnp.concatenate([a["k"]["b"], a["v"]["b"]]).reshape(1, 2 * kv_width)
    m = params["mlp"]["fc1"]["w"].shape[1]

    def vec(t, n):
        return t.reshape(1, n)

    weights = [
        vec(params["ln1"]["g"], d), vec(params["ln1"]["b"], d),
        a["q"]["w"], vec(a["q"]["b"], kv_width),
        wkv, bkv,
        a["o"]["w"], vec(a["o"]["b"], d),
        vec(params["ln2"]["g"], d), vec(params["ln2"]["b"], d),
        params["mlp"]["fc1"]["w"], vec(params["mlp"]["fc1"]["b"], m),
        params["mlp"]["fc2"]["w"], vec(params["mlp"]["fc2"]["b"], d),
        vec(lnf["g"], d), vec(lnf["b"], d),
        head["w"], vec(head["b"], labels),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    out = pl.pallas_call(
        functools.partial(
            _cls_head_kernel, bt=bt, s=s_pad, s_real=s, h=num_heads, hd=hd,
            d=d, eps=eps, scale=scale,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] + w_specs,
        out_specs=pl.BlockSpec((bt, labels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, labels), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, kv_width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * d * 2 * kv_width
            + 2 * b * (d * kv_width + kv_width * d + 2 * d * m + d * labels)
            + 4 * b * num_heads * s_pad * hd,
            bytes_accessed=(b * s_pad * d + 4 * d * d + 2 * d * m
                            + d * labels) * x.dtype.itemsize,
            transcendentals=b * (m + num_heads * s_pad),
        ),
    )(x, *weights)
    return out


# --- Fused bucketed mask-mode layer (r3) -------------------------------------
#
# The unfused bucketed path (models/pruned_vit.py::bucketed_masked_layer)
# pays per-layer HBM round trips: one-hot gather to the capacity bucket,
# the layer kernel, one-hot scatter back, and a full-length select — ~1.3
# ms/layer of pure data movement at DeiT-S B=512 on top of the ~1.3 ms
# compacted layer, capping mask mode near 1.05x the staged2 dense. This
# kernel does gather -> staged2 layer at capacity -> masked scatter (+
# identity passthrough for skipped tokens) in ONE launch: HBM traffic is
# one full-length x-in/x-out + weights, compute runs at the bucket capacity.
#
# Semantics: identical to P @ x -> vit_layer(token_mask=valid-rows) -> P^T
# (kept rows only) -> where(kept, ., x). Used by bucketed_masked_layer when
# a static capacity bound (cap_hint: mask_budget / top_k / random budget) is
# known; parity-tested in tests/test_pallas.py and scripts/tpu_parity.py.

def _bucketed_kernel(
    x_ref, dest_ref, kept_ref,
    ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2g_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    xc_ref,      # scratch [BT*CAP, D] x dtype — compacted input
    ctx_ref,     # scratch [BT*CAP, KW]
    logits_ref,  # scratch [BT*H*CAP, CAP] f32
    p_ref,       # scratch [BT*H*CAP, CAP] x dtype
    *, bt: int, s: int, cap: int, h: int, hd: int, d: int, eps: float,
    scale: float,
):
    kw = h * hd
    x = x_ref[:].reshape(bt * s, d)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cap, s), 0)

    # in-VMEM one-hot gather: xc[b] = P_b @ x_b (P exact in any dtype)
    for b in range(bt):
        P = (dest_ref[b, :, :] == rows_i).astype(x.dtype)  # [cap, S]
        xc_ref[pl.ds(b * cap, cap), :] = jnp.dot(
            P, x[b * s:(b + 1) * s, :], preferred_element_type=jnp.float32
        ).astype(xc_ref.dtype)

    xc = xc_ref[:].astype(jnp.float32)  # [BT*CAP, D]
    h1 = _layer_norm_f32(
        xc, ln1g_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32), eps
    )
    qkv = jnp.dot(
        h1.astype(wqkv_ref.dtype), wqkv_ref[:], preferred_element_type=jnp.float32
    ) + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(x_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    for b in range(bt):
        counts_b = jnp.sum(kept_ref[b, :, :])
        key_ok = col < counts_b  # [1, CAP]
        for head in range(h):
            q = qkv[b * cap:(b + 1) * cap, head * hd:(head + 1) * hd]
            k = qkv[b * cap:(b + 1) * cap, kw + head * hd:kw + (head + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(key_ok, logits, NEG_INF)
            logits_ref[pl.ds((b * h + head) * cap, cap), :] = logits
    p_ref[:] = jnp.exp(
        logits_ref[:] - jnp.max(logits_ref[:], axis=-1, keepdims=True)
    ).astype(p_ref.dtype)
    ones_col = jnp.ones((cap, 1), dtype=qkv.dtype)
    for b in range(bt):
        rows = pl.ds(b * cap, cap)
        for head in range(h):
            v = qkv[b * cap:(b + 1) * cap, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
            vv = jnp.concatenate([v, ones_col], axis=1)
            p_bh = p_ref[pl.ds((b * h + head) * cap, cap), :].astype(qkv.dtype)
            out = jnp.dot(p_bh, vv, preferred_element_type=jnp.float32)
            ctx_ref[rows, pl.ds(head * hd, hd)] = (
                out[:, :hd] * (1.0 / out[:, hd:hd + 1])
            ).astype(ctx_ref.dtype)

    attn_out = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    x1 = xc + attn_out

    h2 = _layer_norm_f32(
        x1, ln2g_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32), eps
    )
    m1 = jnp.dot(
        h2.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    gelu = _gelu_tanh if o_ref.dtype == jnp.bfloat16 else _gelu
    m1 = gelu(m1).astype(w2_ref.dtype)
    m2 = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    yc = (x1 + m2).astype(x_ref.dtype)  # [BT*CAP, D]

    # masked scatter + identity passthrough: out = Ps^T @ yc + (1-kept) * x
    for b in range(bt):
        kept_row = kept_ref[b, :, :]  # [1, S] int32
        Ps = ((dest_ref[b, :, :] == rows_i) & (kept_row != 0)).astype(x.dtype)
        back = jax.lax.dot_general(
            Ps, yc[b * cap:(b + 1) * cap, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, D]
        keep_col = jnp.transpose(kept_row).astype(jnp.float32)  # [S, 1]
        xb = x[b * s:(b + 1) * s, :].astype(jnp.float32)
        o_ref[b] = (back + (1.0 - keep_col) * xb).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("cap", "num_heads", "eps", "block_b", "interpret")
)
def fused_vit_layer_bucketed(
    x: jnp.ndarray,
    params: dict,
    dest: jnp.ndarray,
    kept: jnp.ndarray,
    cap: int,
    num_heads: int,
    eps: float = 1e-12,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bucketed mask-mode layer, fully fused.

    x: [B, S, D]; dest: [B, S] int32 compacted row ids (kept-first stable
    order, as built by bucketed_masked_layer); kept: [B, S] bool. cap must
    statically bound every image's kept count. Returns [B, S, D]: layer
    output at kept positions, identity at skipped positions.
    """
    b, s, d = x.shape
    kv_width = params["attn"]["q"]["w"].shape[1]
    hd = kv_width // num_heads
    scale = 1.0 / (hd ** 0.5)
    s_pad = _round_up(s, 8)
    cap_pad = _round_up(cap, 8)
    if block_b == 0:
        bt = _auto_block_b(b, d, x.dtype.itemsize)
    else:
        bt = min(block_b, b)
        while b % bt:
            bt -= 1
    if s_pad != s:
        x = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])
        # padded positions: dest out of range (never gathered), not kept
        dest = jnp.pad(dest, [(0, 0), (0, s_pad - s)], constant_values=s_pad + cap_pad)
        kept = jnp.pad(kept, [(0, 0), (0, s_pad - s)])

    a = params["attn"]
    wqkv = jnp.concatenate([a["q"]["w"], a["k"]["w"], a["v"]["w"]], axis=1)
    bqkv = jnp.concatenate([a["q"]["b"], a["k"]["b"], a["v"]["b"]]).reshape(1, 3 * kv_width)
    m = params["mlp"]["fc1"]["w"].shape[1]

    def vec(t, n):
        return t.reshape(1, n)

    weights = [
        vec(params["ln1"]["g"], d), vec(params["ln1"]["b"], d),
        wqkv, bqkv,
        a["o"]["w"], vec(a["o"]["b"], d),
        vec(params["ln2"]["g"], d), vec(params["ln2"]["b"], d),
        params["mlp"]["fc1"]["w"], vec(params["mlp"]["fc1"]["b"], m),
        params["mlp"]["fc2"]["w"], vec(params["mlp"]["fc2"]["b"], d),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    out = pl.pallas_call(
        functools.partial(
            _bucketed_kernel, bt=bt, s=s_pad, cap=cap_pad, h=num_heads, hd=hd,
            d=d, eps=eps, scale=scale,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * cap_pad, d), x.dtype),
            pltpu.VMEM((bt * cap_pad, kv_width), x.dtype),
            pltpu.VMEM((bt * num_heads * cap_pad, cap_pad), jnp.float32),
            pltpu.VMEM((bt * num_heads * cap_pad, cap_pad), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cap_pad * d * (3 * d + d + 2 * m)
            + 4 * b * num_heads * cap_pad * cap_pad * hd
            + 4 * b * cap_pad * s_pad * d,
            bytes_accessed=(2 * b * s_pad * d + 4 * d * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=b * cap_pad * (m + num_heads * cap_pad),
        ),
    )(x, dest.astype(jnp.int32)[:, None, :], kept.astype(jnp.int32)[:, None, :], *weights)
    return out[:, :s]
