"""Patch embedding as conv-as-matmul.

HF ViT uses Conv2d(C, D, kernel=P, stride=P) (upstream of the reference; the
reference imports it via `ViTModel.embeddings`). On TPU a strided conv with
kernel==stride is exactly a reshape + one big matmul, which maps straight
onto the MXU: extract non-overlapping P×P patches, flatten each in (c, kh, kw)
order (the Conv2d weight layout), and multiply by the [C*P*P, D] matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, N, C*P*P] with (c, kh, kw) flattening order.

    The flattening order matches torch Conv2d weight layout [D, C, P, P] so a
    converted weight can be used directly: out = patches @ w.reshape(D, -1).T.
    """
    b, c, h, w = pixel_values.shape
    gh, gw = h // patch_size, w // patch_size
    x = pixel_values.reshape(b, c, gh, patch_size, gw, patch_size)
    # -> [B, gh, gw, C, P, P]
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, gh * gw, c * patch_size * patch_size)


def patch_embed(pixel_values: jnp.ndarray, params: dict, patch_size: int) -> jnp.ndarray:
    """Patch projection: [B, C, H, W] -> [B, N, D].

    params: {'w': [C*P*P, D], 'b': [D]}.
    """
    patches = extract_patches(pixel_values, patch_size)
    return patches @ params["w"] + params["b"]
