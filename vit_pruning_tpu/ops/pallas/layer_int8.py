"""int8 whole-layer fused Pallas kernel (serving path).

Same fusion schedule as ops/pallas/layer.py (`staged2` attention), with every
weight matmul (QKV, O-proj, fc1, fc2) running int8 x int8 -> int32 on the
MXU. The v5e MXU executes int8 at 2x bf16 throughput (394 TOPS vs 197
TFLOPS) and the weight matmuls carry ~85% of a ViT layer's FLOPs, so the
layer-time ceiling is ~0.6x the bf16 kernel.

Quantization scheme == ops/quant.py (the parity reference):
  * weights: per-output-channel symmetric int8, prepared once at load time
    by quant.quantize_layer_params;
  * activations: dynamic per-row symmetric int8, computed in-kernel on the
    VPU right before each matmul (amax -> scale -> round/clip);
  * dequant: int32 * row_scale * col_scale (+bias) in f32.
Attention core (QK^T, softmax, PV), layernorms, GELU and residuals stay in
the serving dtype — standard production ViT PTQ.

The reference has no quantization (fp32 torch end to end,
himanshu/model_utils.py); this is a TPU-serving capability on top of it.
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


def _layer_norm_f32(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _rowquant(x):
    """f32 [T, K] -> (int8 [T, K], f32 row scale [T, 1]). Matches
    quant.quantize_rows exactly (round-nearest-even)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _kernel(
    x_ref, mask_ref,
    ln1g_ref, ln1b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref,
    wo_ref, so_ref, bo_ref,
    ln2g_ref, ln2b_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    o_ref,
    ctx_ref,     # scratch [BT*S, KW] x dtype
    logits_ref,  # scratch [BT*H*S, S] f32
    p_ref,       # scratch [BT*H*S, S] x dtype
    *, bt: int, s: int, s_real: int, h: int, hd: int, d: int,
    eps: float, scale: float,
):
    kw = h * hd
    x = x_ref[:].reshape(bt * s, d).astype(jnp.float32)

    # LN1 -> row-quant -> int8 QKV matmul -> dequant
    h1 = _layer_norm_f32(x, ln1g_ref[:].astype(jnp.float32),
                         ln1b_ref[:].astype(jnp.float32), eps)
    q8, rs = _rowquant(h1)
    acc = jax.lax.dot_general(
        q8, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = (acc.astype(jnp.float32) * rs * sqkv_ref[:]
           + bqkv_ref[:].astype(jnp.float32))
    qkv = qkv.astype(x_ref.dtype)

    # staged2 attention (ops/pallas/layer.py): all QK^T dots -> one
    # vectorized softmax with the denominator folded into PV as a ones column
    for b in range(bt):
        key_ok = mask_ref[b, :, :] != 0 if mask_ref is not None else None
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
    p_ref[:] = jnp.exp(
        logits - jnp.max(logits, axis=-1, keepdims=True)
    ).astype(p_ref.dtype)
    ones_col = jnp.ones((s, 1), dtype=qkv.dtype)
    for b in range(bt):
        rows = pl.ds(b * s, s)
        for head in range(h):
            v = qkv[b * s:(b + 1) * s, 2 * kw + head * hd:2 * kw + (head + 1) * hd]
            vv = jnp.concatenate([v, ones_col], axis=1)
            p_bh = p_ref[pl.ds((b * h + head) * s, s), :].astype(qkv.dtype)
            out = jnp.dot(p_bh, vv, preferred_element_type=jnp.float32)
            ctx_ref[rows, pl.ds(head * hd, hd)] = (
                out[:, :hd] * (1.0 / out[:, hd:hd + 1])
            ).astype(ctx_ref.dtype)

    # int8 output projection + residual
    c8, crs = _rowquant(ctx_ref[:].astype(jnp.float32))
    acc = jax.lax.dot_general(
        c8, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    attn_out = (acc.astype(jnp.float32) * crs * so_ref[:]
                + bo_ref[:].astype(jnp.float32))
    x1 = x + attn_out

    # LN2 -> int8 fc1 -> GELU -> int8 fc2 -> residual
    h2 = _layer_norm_f32(x1, ln2g_ref[:].astype(jnp.float32),
                         ln2b_ref[:].astype(jnp.float32), eps)
    h8, hrs = _rowquant(h2)
    acc = jax.lax.dot_general(
        h8, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m1 = acc.astype(jnp.float32) * hrs * s1_ref[:] + b1_ref[:].astype(jnp.float32)
    gelu = _gelu_tanh if o_ref.dtype == jnp.bfloat16 else _gelu
    # round through the serving dtype before quantizing (matches the jnp
    # reference, which hands the activation around in x.dtype)
    m8, mrs = _rowquant(gelu(m1).astype(x_ref.dtype).astype(jnp.float32))
    acc = jax.lax.dot_general(
        m8, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m2 = acc.astype(jnp.float32) * mrs * s2_ref[:] + b2_ref[:].astype(jnp.float32)

    o_ref[:] = (x1 + m2).astype(o_ref.dtype).reshape(bt, s, d)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "block_b", "interpret")
)
def fused_vit_layer_int8(
    x: jnp.ndarray,
    qparams: dict,
    num_heads: int,
    eps: float = 1e-12,
    token_mask: Optional[jnp.ndarray] = None,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pre-LN ViT block with int8 weight matmuls. Same contract as
    ops.pallas.layer.fused_vit_layer; qparams from quant.quantize_layer_params
    (one layer's slice: wq int8 + wscale f32 per linear)."""
    b, s, d = x.shape
    a = qparams["attn"]
    kv_width = a["q"]["wq"].shape[1]
    hd = kv_width // num_heads
    scale = 1.0 / (hd ** 0.5)
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

    wqkv = jnp.concatenate([a["q"]["wq"], a["k"]["wq"], a["v"]["wq"]], axis=1)
    sqkv = jnp.concatenate(
        [a["q"]["wscale"], a["k"]["wscale"], a["v"]["wscale"]]
    ).reshape(1, 3 * kv_width)
    bqkv = jnp.concatenate([a["q"]["b"], a["k"]["b"], a["v"]["b"]]).reshape(1, 3 * kv_width)
    m = qparams["mlp"]["fc1"]["wq"].shape[1]

    def vec(t, n):
        return t.reshape(1, n)

    weights = [
        vec(qparams["ln1"]["g"], d), vec(qparams["ln1"]["b"], d),
        wqkv, sqkv, bqkv,
        a["o"]["wq"], vec(a["o"]["wscale"], d), vec(a["o"]["b"], d),
        vec(qparams["ln2"]["g"], d), vec(qparams["ln2"]["b"], d),
        qparams["mlp"]["fc1"]["wq"], vec(qparams["mlp"]["fc1"]["wscale"], m),
        vec(qparams["mlp"]["fc1"]["b"], m),
        qparams["mlp"]["fc2"]["wq"], vec(qparams["mlp"]["fc2"]["wscale"], d),
        vec(qparams["mlp"]["fc2"]["b"], d),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    in_specs = [pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if token_mask is not None:
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
            eps=eps, scale=scale,
        ),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * s_pad, kv_width), x.dtype),
            pltpu.VMEM((bt * num_heads * s_pad, s_pad), jnp.float32),
            pltpu.VMEM((bt * num_heads * s_pad, s_pad), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * d * (3 * d + d + 2 * m)
            + 4 * b * num_heads * s_pad * s_pad * hd,
            bytes_accessed=(2 * b * s_pad * d * x.dtype.itemsize
                            + (4 * d * d + 2 * d * m)),
            transcendentals=b * s_pad * (m + num_heads * s_pad),
        ),
    )(*args)
    return out[:, :s]
