"""Fused patch-embedding Pallas kernels: normalize + project + position add.

STATUS: kept as DOCUMENTED NEGATIVES, not production kernels — both wrappers
below (embed_u8, embed_fused) measured 4-5x slower than XLA's embedding
programs on v5e (5.44 vs 1.07 ms and 5.55 vs 1.40 ms per batch-512) and were
replaced by `serving.embed_from_u8` / `models.vit.embed` (the patch
extraction's index shuffle defeats the fusion: it materializes the
[B, N, C*P*P] patch matrix in HBM, which the strided-conv formulation never
builds). See each wrapper's docstring and RESULTS.md.

The conv-as-matmul patch embedding (ops/patch_embed.py) as a TPU kernel that
also folds in the image normalization ((x/255 - mean)/std) and the position
-embedding add, so raw uint8 patches go straight to embeddings without a
normalized float copy of the image ever reaching HBM (~77 MB per batch-256
at 224²). The patch extraction itself is a pure index shuffle done on the
uint8 bytes by XLA (cheap); the kernel owns everything arithmetic.

Weights ([C*P*P, D], ~1.2 MB bf16 for ViT-B) stay VMEM-resident across the
token-tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_pruning_tpu.data.preprocess import VIT_MEAN, VIT_STD
from vit_pruning_tpu.ops.patch_embed import extract_patches


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _embed_kernel(p_ref, w_ref, b_ref, pos_ref, o_ref, *, scale: float, shift: float):
    x = p_ref[:].astype(jnp.float32) * scale + shift  # fused (u8/255 - m)/s
    y = jnp.dot(
        x.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:].astype(jnp.float32)
    o_ref[:] = (y + pos_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def fused_patch_embed_u8(
    patches_u8: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    pos: jnp.ndarray,
    mean: float = VIT_MEAN,
    std: float = VIT_STD,
    block_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, N, C*P*P] uint8 patches -> [B, N, D] embeddings (+ per-patch pos).

    pos: [N, D] position embeddings for the PATCH tokens (CLS handled by the
    caller). Normalization: ((x/255) - mean) / std folded into one affine.
    """
    bsz, n, pd = patches_u8.shape
    d = w.shape[1]
    scale = 1.0 / (255.0 * std)
    shift = -mean / std

    t = bsz * n
    t_pad = _round_up(t, block_t)
    # Mosaic has no uint8->float cast; bf16 represents 0..255 exactly and
    # still halves the traffic of a float32 normalized copy
    flat = patches_u8.reshape(t, pd).astype(jnp.bfloat16)
    flat = jnp.pad(flat, [(0, t_pad - t), (0, 0)])
    # per-row position embedding: tile over batch, pad
    pos_rows = jnp.broadcast_to(pos[None], (bsz, n, d)).reshape(t, d)
    pos_rows = jnp.pad(pos_rows, [(0, t_pad - t), (0, 0)])

    out = pl.pallas_call(
        functools.partial(_embed_kernel, scale=scale, shift=shift),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, pd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), w.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * pd * d,
            bytes_accessed=t_pad * pd + (t_pad + pd) * d * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(flat, w, b.reshape(1, d), pos_rows)
    return out[:t].reshape(bsz, n, d)


def embed_u8(pixel_values_u8: jnp.ndarray, embed_params: dict, config, interpret=False):
    """Full embedding path from raw uint8 [B, C, H, W]: extract -> fused
    normalize+project+pos -> prepend CLS (+ its position embedding).

    DOCUMENTED NEGATIVE, superseded by `serving.embed_from_u8` (XLA
    normalize -> strided conv): dispatch-corrected on v5e this kernel path
    measures 5.44 ms/batch-512 vs 1.07 ms for the XLA program
    (scripts/embed_probe.py u8 rows) — extract_patches materializes the
    [B, N, C*P*P] uint8 patch tensor through HBM as a pallas_call input,
    which XLA's conv emitter never does. Kept in-tree with parity tests as
    the recorded experiment (same lesson as fused_patch_embed_f below)."""
    patches = extract_patches(pixel_values_u8, config.patch_size)  # uint8 shuffle
    pos = embed_params["pos"][0]  # [S, D]
    x = fused_patch_embed_u8(
        patches,
        embed_params["patch"]["w"],
        embed_params["patch"]["b"],
        pos[1:],
        interpret=interpret,
    )
    cls = (embed_params["cls"][0] + pos[:1]).astype(x.dtype)  # [1, D]
    cls = jnp.broadcast_to(cls[None], (x.shape[0], 1, x.shape[-1]))
    return jnp.concatenate([cls, x], axis=1)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def fused_patch_embed_f(
    patches: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    pos: jnp.ndarray,
    block_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Float-input variant of fused_patch_embed_u8. MEASURED NEGATIVE
    RESULT (r3, B=512 DeiT-S bf16): 5.55 ms vs 1.40 ms for the plain XLA
    embed — XLA fuses patch-transpose + projection + pos-add into the matmul
    without ever materializing the [B, N, C*P*P] patch tensor or the
    broadcast position rows, both of which a pallas_call input forces into
    HBM. Kept for the record and for the u8 path's structure; the float
    serving path uses models.vit.embed (see pruned_vit.progressive_topk_forward).
    The u8 variant still wins on its own terms: its input is 4x smaller and
    the normalize-affine prevents the XLA conv fusion."""
    bsz, n, pd = patches.shape
    d = w.shape[1]
    t = bsz * n
    t_pad = _round_up(t, block_t)
    flat = jnp.pad(patches.reshape(t, pd), [(0, t_pad - t), (0, 0)])
    pos_rows = jnp.broadcast_to(pos[None], (bsz, n, d)).reshape(t, d)
    pos_rows = jnp.pad(pos_rows, [(0, t_pad - t), (0, 0)])

    out = pl.pallas_call(
        functools.partial(_embed_kernel, scale=1.0, shift=0.0),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, pd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), w.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * pd * d,
            bytes_accessed=(t_pad * pd + (t_pad + pd) * d) * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(flat, w, b.reshape(1, d), pos_rows)
    return out[:t].reshape(bsz, n, d)


def embed_fused(pixel_values: jnp.ndarray, embed_params: dict, config, interpret=False):
    """Float-pixel fused embedding: extract -> fused project+pos -> CLS.
    Same contract as models.vit.embed (preprocessed float pixels in)."""
    patches = extract_patches(pixel_values, config.patch_size)
    pos = embed_params["pos"][0]  # [S, D]
    x = fused_patch_embed_f(
        patches,
        embed_params["patch"]["w"],
        embed_params["patch"]["b"],
        pos[1:].astype(embed_params["patch"]["w"].dtype),
        interpret=interpret,
    )
    cls = (embed_params["cls"][0] + pos[:1]).astype(x.dtype)  # [1, D]
    cls = jnp.broadcast_to(cls[None], (x.shape[0], 1, x.shape[-1]))
    return jnp.concatenate([cls, x], axis=1)
