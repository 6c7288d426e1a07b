"""Fused transformer-MLP Pallas kernel: gelu(x @ W1 + b1) @ W2 + b2.

The intermediate [T, mlp_dim] activation (4x the hidden size) never reaches
HBM. Both weight matrices stay VMEM-resident across the whole grid (their
BlockSpec index is constant, so they are DMA'd once), and token tiles stream
through them — for ViT-sized layers (D<=1024, M<=4096 bf16: <=16 MB... ViT-B
fp32 is blocked over M instead, see below) this is the minimal-HBM-traffic
schedule: weights read once, activations read+written once.

Grid: (token_tiles,) when the weights fit in VMEM, else
(token_tiles, mlp_blocks) with an fp32 accumulator scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7): Pallas TPU has no
    erf/erfc primitive, so it is built from exp."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_tanh(x):
    """GPT-2 tanh-approximate GELU. |gelu_tanh - gelu_erf| <= ~1e-3 absolute,
    below bf16 resolution at the same magnitude (bf16 eps at |x|=2 is 1.6e-2)
    — used by the megakernel only when the activation is cast straight to
    bf16; the fp32 path keeps erf-exact GELU for bit-level parity."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _gelu(x):
    # erf-exact GELU (jax.nn.gelu lowers to erfc, unimplemented in Pallas TPU)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel_resident(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[:].astype(jnp.float32))
    out = jnp.dot(h, w2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[:] = (out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_kernel_blocked(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[:].astype(jnp.float32))
    part = jnp.dot(h, w2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part + b2_ref[:].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_m", "interpret"))
def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    block_t: int = 512,
    block_m: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [T, D] -> gelu(x @ w1 + b1) @ w2 + b2, fused.

    w1 [D, M], w2 [M, D]. block_m=0 (default) keeps the full weights
    VMEM-resident when they fit (<= ~8 MB), else falls back to M-blocking.
    """
    t, d = x.shape
    m = w1.shape[1]
    block_t = _round_up(block_t, 8)
    t_pad = _round_up(t, block_t)
    xp = jnp.pad(x, [(0, t_pad - t), (0, 0)])
    b2r = b2.reshape(1, d)

    weight_bytes = 2 * d * m * x.dtype.itemsize
    if block_m == 0 and weight_bytes <= 8 * 1024 * 1024:
        out = pl.pallas_call(
            _mlp_kernel_resident,
            grid=(t_pad // block_t,),
            in_specs=[
                pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, d), x.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * t_pad * d * m,
                bytes_accessed=(2 * t_pad * d + 2 * d * m) * x.dtype.itemsize,
                transcendentals=t_pad * m,
            ),
        )(xp, w1, b1.reshape(1, m), w2, b2r)
        return out[:t]

    block_m = _round_up(block_m or 512, 128)
    m_pad = _round_up(m, block_m)
    w1p = jnp.pad(w1, [(0, 0), (0, m_pad - m)])
    b1p = jnp.pad(b1, [(0, m_pad - m)]).reshape(1, m_pad)
    w2p = jnp.pad(w2, [(0, m_pad - m), (0, 0)])

    out = pl.pallas_call(
        _mlp_kernel_blocked,
        grid=(t_pad // block_t, m_pad // block_m),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_pad * d * m_pad,
            bytes_accessed=(t_pad * d * 2 + d * m_pad * 2) * x.dtype.itemsize,
            transcendentals=t_pad * m_pad,
        ),
    )(xp, w1p, b1p, w2p, b2r)
    return out[:t]
