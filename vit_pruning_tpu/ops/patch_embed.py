"""Patch embedding: conv-as-matmul reference + strided-conv fast path.

HF ViT uses Conv2d(C, D, kernel=P, stride=P) (upstream of the reference; the
reference imports it via `ViTModel.embeddings`). Two mathematically identical
implementations:

  * `matmul` — extract non-overlapping P×P patches, flatten each in
    (c, kh, kw) order (the Conv2d weight layout), and multiply by the
    [C*P*P, D] matrix. This is the semantics/bit-parity reference (the HF
    bit-match tests run it), but the 6-D transpose materializes a [B, N,
    C*P*P] tensor through HBM.
  * `conv` — `lax.conv_general_dilated` with kernel==stride. On TPU, XLA's
    conv emitter fuses the patch extraction into the MXU feed: measured
    0.54 ms vs the matmul form's 1.15 ms per 512-image DeiT-S batch
    (dispatch-corrected, scripts/embed_probe.py) — the embed was the largest
    controllable fixed cost in the serving decomposition (RESULTS.md).

`impl='auto'` picks conv on TPU backends and matmul elsewhere. The choice is
read at TRACE time (like every static config here): a jitted closure bakes
in the backend it was traced for, which is stable within a process. The two
impls differ only by float accumulation order (parity-tested at f32/bf16
tolerances in tests/test_pallas.py).
"""

from __future__ import annotations

import jax
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


def patch_embed(
    pixel_values: jnp.ndarray, params: dict, patch_size: int, impl: str = "auto"
) -> jnp.ndarray:
    """Patch projection: [B, C, H, W] -> [B, N, D].

    params: {'w': [C*P*P, D], 'b': [D]}. impl: 'auto' | 'matmul' | 'conv'.
    """
    if impl == "auto":
        impl = "conv" if jax.default_backend() not in ("cpu",) else "matmul"
    if impl == "conv":
        b, c, h, w = pixel_values.shape
        d = params["w"].shape[1]
        w4 = params["w"].reshape(c, patch_size, patch_size, d).transpose(3, 0, 1, 2)
        y = jax.lax.conv_general_dilated(
            pixel_values, w4.astype(pixel_values.dtype),
            window_strides=(patch_size, patch_size), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
        )
        return y.reshape(b, -1, d) + params["b"]
    patches = extract_patches(pixel_values, patch_size)
    return patches @ params["w"] + params["b"]
