"""Serving entry point: raw uint8 images -> logits.

The deployment path: uint8 pixels transfer to the device (4x less PCIe/HBM
traffic than float32), XLA normalizes + patch-projects them in one fused
strided-conv program (embed_from_u8 below — it replaced the Pallas u8 embed
kernel, which measured 5x slower; see its docstring), and the
progressive-compaction pruned encoder classifies. The headline benchmark
measures the float-input progressive path (both sides fed identically);
`bench.py --serving` measures this uint8 path, whose extra win over the
headline is host->device transfer, not on-chip time.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.data.preprocess import VIT_MEAN, VIT_STD
from vit_pruning_tpu.models.pruned_vit import progressive_topk_forward
from vit_pruning_tpu.ops.patch_embed import patch_embed


def embed_from_u8(
    pixels_u8: jnp.ndarray, embed_params: dict, config: ViTConfig,
    impl: str = "auto",
) -> jnp.ndarray:
    """uint8 [B, C, H, W] -> embeddings [B, S, D] (normalize + patch
    projection + position add + CLS), all in XLA.

    This replaced the fused Pallas u8 embed kernel (ops/pallas/embed.py) as
    the serving embed: dispatch-corrected on v5e the kernel measures 5.44
    ms/batch-512 vs 1.07 ms for normalize -> strided-conv -> pos-add here
    (scripts/embed_probe.py u8 rows) — the same lesson as the float embed
    fusion: the patch index shuffle a pallas_call input needs forces HBM
    materialization that XLA's conv emitter never performs. The uint8
    host->device transfer win (4x less traffic than float32) is identical
    on both paths since normalization happens on device either way.
    """
    w_dtype = embed_params["patch"]["w"].dtype
    x = (pixels_u8.astype(jnp.float32) / 255.0 - VIT_MEAN) / VIT_STD
    y = patch_embed(x.astype(w_dtype), embed_params["patch"],
                    config.patch_size, impl=impl)
    pos = embed_params["pos"]
    y = y + pos[:, 1:]
    cls = (embed_params["cls"] + pos[:, :1]).astype(y.dtype)
    cls = jnp.broadcast_to(cls, (y.shape[0], 1, y.shape[-1]))
    return jnp.concatenate([cls, y], axis=1)


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
    dispatch global at trace time.
    `interpret` is accepted for API stability (the embed is pure XLA now —
    see embed_from_u8 — so nothing is left to interpret off-TPU)."""
    del interpret
    if pixels_u8.dtype != jnp.uint8:
        raise ValueError(f"serving_forward expects uint8 pixels, got {pixels_u8.dtype}")
    x0 = embed_from_u8(pixels_u8, params["backbone"]["embed"], config)
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
