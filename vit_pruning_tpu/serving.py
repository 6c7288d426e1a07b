"""Serving entry point: raw uint8 images -> logits, fully fused.

The deployment path: uint8 pixels transfer to the device (4x less PCIe/HBM
traffic than float32), the fused Pallas embed kernel normalizes + projects
them (ops/pallas/embed.py), and the progressive-compaction pruned encoder
classifies. The headline benchmark measures the float-input progressive path
(both sides fed identically); `bench.py --serving` measures this uint8 path,
whose win is host->device transfer, not on-chip time.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
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


def export_serving(
    params: dict,
    config: ViTConfig,
    pcfg: PruneConfig,
    batch_size: int,
    path: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    quant: str = "none",
    interpret: bool = False,
):
    """Serialize the serving forward as a portable StableHLO artifact.

    The deployment story the reference lacks entirely (its serving is a
    Streamlit process importing torch, interIIT/final_interiit.py): here the
    whole uint8->logits program — embed kernel, progressive compaction,
    CLS-epilogue classifier — is staged out once with `jax.export` and can be
    reloaded (`load_exported`) or handed to any StableHLO runtime (e.g. a
    C++ PJRT host) with no Python model code or param pytree at serve time;
    weights are baked into the artifact's calling convention as inputs.

    Pallas kernels lower to `tpu_custom_call` — portable across same-platform
    runtimes but not across platforms, so the export pins the current
    platform and disables only that safety check.

    Returns the `jax.export.Exported`; when `path` is given also writes the
    serialized bytes there.
    """
    from jax import export as jexport

    def fwd(p, u8):
        return serving_forward(
            p, u8, config, pcfg, use_pallas=use_pallas, quant=quant,
            logits_only=True, interpret=interpret,
        )["logits"]

    side = config.image_size
    u8_spec = jax.ShapeDtypeStruct((batch_size, 3, side, side), jnp.uint8)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exp = jexport.export(
        jax.jit(fwd),
        disabled_checks=[jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
    )(p_spec, u8_spec)
    if path is not None:
        with open(path, "wb") as f:
            f.write(exp.serialize())
    return exp


def load_exported(path: str) -> Callable:
    """Reload an `export_serving` artifact: returns `f(params, pixels_u8) ->
    logits`, jittable and shape/dtype-checked against the export."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call
