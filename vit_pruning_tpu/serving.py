"""Serving entry point: raw uint8 images -> logits, fully fused.

The deployment path: uint8 pixels transfer to the device (4x less PCIe/HBM
traffic than float32), the fused Pallas embed kernel normalizes + projects
them (ops/pallas/embed.py), and the progressive-compaction pruned encoder
classifies. The headline benchmark measures the float-input progressive path
(both sides fed identically); `bench.py --serving` measures this uint8 path,
whose win is host->device transfer, not on-chip time.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.pruned_vit import progressive_topk_forward
from vit_pruning_tpu.ops.pallas.embed import embed_u8


def serving_forward(
    params: dict,
    pixels_u8: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    use_pallas: Optional[bool] = None,
    quant: Optional[str] = None,
    logits_only: bool = True,
    interpret: bool = False,
):
    """pixels_u8: [B, C, H, W] uint8 (0..255). Returns the progressive
    forward's output dict (logits, keep_masks, scores; + cls/last_hidden
    when logits_only=False).

    logits_only=True (default — this IS the deployment entry) additionally
    fuses the last layer + final-LN + classifier into a CLS-only kernel on
    the Pallas path (ops/pallas/layer.py).
    quant: serving quantization mode ('none'/'int8'); None reads the
    dispatch global at trace time."""
    if pixels_u8.dtype != jnp.uint8:
        raise ValueError(f"serving_forward expects uint8 pixels, got {pixels_u8.dtype}")
    x0 = embed_u8(pixels_u8, params["backbone"]["embed"], config, interpret=interpret)
    return progressive_topk_forward(
        params, None, config, pcfg, use_pallas=use_pallas, quant=quant, x0=x0,
        logits_only=logits_only,
    )
