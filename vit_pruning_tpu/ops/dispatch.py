"""Kernel dispatch: Pallas TPU kernels vs jnp/XLA reference.

Global mode, settable by callers (bench, serving) or scoped via context
manager:
  'auto'   — Pallas on TPU backends for inference-shaped calls, XLA elsewhere
  'pallas' — force Pallas (errors off-TPU unless interpret)
  'xla'    — force the jnp reference path (always differentiable)

The jnp implementations remain the semantics ground truth; Pallas kernels
are validated against them in tests/test_pallas.py. Training runs the fused
layer via `differentiable_fused_layer` (ops/pallas/layer.py — @jax.custom_vjp
whose backward recomputes through the jnp reference; grad parity in
tests/test_pallas.py); ops without a custom VJP fall back to XLA.
"""

from __future__ import annotations

import contextlib

import jax

_MODE = "auto"


def set_kernel_mode(mode: str):
    global _MODE
    if mode not in ("auto", "pallas", "xla"):
        raise ValueError(f"kernel mode {mode!r} not in ('auto', 'pallas', 'xla')")
    _MODE = mode


def get_kernel_mode() -> str:
    return _MODE


@contextlib.contextmanager
def kernel_mode(mode: str):
    prev = _MODE
    set_kernel_mode(mode)
    try:
        yield
    finally:
        set_kernel_mode(prev)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def use_pallas(differentiable_needed: bool = False) -> bool:
    """Should the current op use its Pallas kernel?"""
    if _MODE == "xla":
        return False
    if differentiable_needed:
        return False
    if _MODE == "pallas":
        return True
    return _on_tpu()


_ENCODER_FUSION = None


def set_encoder_fusion(enabled: bool):
    """Opt into the whole-encoder megakernel (ops/pallas/model.py)."""
    global _ENCODER_FUSION
    _ENCODER_FUSION = bool(enabled)


def encoder_fusion_enabled() -> bool:
    """Whole-encoder fusion is OPT-IN (env VIT_PRUNING_TPU_ENCODER=1 or
    set_encoder_fusion): measured equal to the per-layer megakernel on v5e
    (both compute-bound; inter-layer HBM x-io is fully overlapped) while its
    first compile costs ~12 minutes on the remote-compile relay."""
    if _ENCODER_FUSION is not None:
        return _ENCODER_FUSION
    import os

    return os.environ.get("VIT_PRUNING_TPU_ENCODER") == "1"


def attention_kernel_enabled() -> bool:
    """The standalone fused-attention kernel currently loses to XLA's fused
    attention at ViT shapes (the win needs the whole-layer megakernel);
    'auto' keeps it off, 'pallas' forces it on."""
    return _MODE == "pallas"


_QUANT = "none"


def set_serving_quant(mode: str):
    """Serving quantization: 'none' (bf16/f32) or 'int8' (dynamic-activation
    int8 weight matmuls — ops/quant.py scheme). Applies to inference layer
    calls (Pallas int8 megakernel on TPU, jnp int8 reference on XLA). The
    training path (pruned_vit_forward with train/compute_oracle) forces
    quant off — int8 matmuls have no useful gradient (round/clip are
    zero-derivative), so training always runs unquantized.

    TRACING: this global is read when a function is TRACED, not when it is
    called. Library entry points thread the mode as an explicit traced
    argument (vit_layer/vit_forward/pruned_vit_forward `quant=`, and
    ModifiedViTModel re-reads it per call), so mode changes retrace
    correctly. A user-owned `jax.jit` closure that calls these with
    quant=None bakes in whichever mode was active at first trace — pass
    `quant=serving_quant()` explicitly (or use quant_mode around the FIRST
    call only) for persistent jitted callables."""
    global _QUANT
    if mode not in ("none", "int8"):
        raise ValueError(f"serving quant {mode!r} not in ('none', 'int8')")
    _QUANT = mode


def serving_quant() -> str:
    return _QUANT


@contextlib.contextmanager
def quant_mode(mode: str):
    prev = _QUANT
    set_serving_quant(mode)
    try:
        yield
    finally:
        set_serving_quant(prev)
