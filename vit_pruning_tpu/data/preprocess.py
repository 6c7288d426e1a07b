"""ViT image preprocessing, bit-matching HF `ViTImageProcessor` semantics.

The reference preprocesses every sample through
`AutoImageProcessor.from_pretrained(...)` (himanshu/main_model_utils.py:58):
resize to 224x224 (PIL bilinear), rescale by 1/255, normalize with
mean=std=0.5 per channel, CHW layout.

Two paths:
  * `vit_preprocess`   — pure jnp (resize via jax.image), jit-able, used in
                         the input pipeline on device. Upsampling CIFAR 32->224
                         with bilinear matches PIL to ~1e-2 per pixel.
  * `pil_preprocess`   — exact HF-processor numerics on the host. Uniform
                         uint8 batches dispatch to the native C++ kernel
                         (vit_pruning_tpu/native — PIL-bit-exact fixed-point
                         resampling fused with normalize+CHW, multithreaded;
                         parity guaranteed by tests/test_native.py); anything
                         else falls back to the per-image PIL loop with
                         identical results.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

VIT_MEAN = 0.5
VIT_STD = 0.5


def vit_preprocess(
    images: jnp.ndarray, size: int = 224, mean: float = VIT_MEAN, std: float = VIT_STD
) -> jnp.ndarray:
    """[B, H, W, 3] uint8/float (0..255) -> [B, 3, size, size] normalized float32."""
    x = images.astype(jnp.float32)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), method="bilinear")
    x = x / 255.0
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)


def pil_preprocess(
    images, size: int = 224, mean: float = VIT_MEAN, std: float = VIT_STD,
    _force_pil: bool = False,
) -> np.ndarray:
    """Exact HF-processor path (PIL-bilinear numerics), host-side.

    images: list of HxWx3 uint8 arrays or PIL Images (or an [N,H,W,3] array).
    Returns [B, 3, size, size] float32. Uniform uint8 ndarray batches take the
    bit-identical native C++ fast path; `_force_pil` pins the per-image PIL
    loop (tests compare the two).
    """
    from PIL import Image

    if not isinstance(images, np.ndarray):
        images = list(images)  # accept generators/iterators (single pass)
    if not _force_pil and np.isscalar(mean) and np.isscalar(std):
        batch = None
        if isinstance(images, np.ndarray):
            batch = images
        elif (
            len(images)
            and all(isinstance(im, np.ndarray) for im in images)
            and len({im.shape for im in images}) == 1
        ):
            batch = np.stack(images)
        if (
            batch is not None
            and batch.dtype == np.uint8
            and batch.ndim == 4
            and batch.shape[-1] == 3
        ):
            from vit_pruning_tpu import native

            if native.available():
                return native.preprocess(batch, size=size, mean=mean, std=std)

    out = []
    for im in images:
        if not isinstance(im, Image.Image):
            im = Image.fromarray(np.asarray(im).astype(np.uint8))
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        a = np.asarray(im, dtype=np.float32) / 255.0
        a = (a - mean) / std
        out.append(a.transpose(2, 0, 1))
    return np.stack(out)
