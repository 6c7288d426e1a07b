"""vit_pruning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for dynamic
per-layer token (patch) skipping in Vision Transformers.

Re-designed from scratch for TPU with the capability surface of the reference
repo `himanshukumargupta11012/ViT-pruning` (see SURVEY.md): a from-scratch
ViT/DeiT forward pass (patch-embed as conv-as-matmul, fused-QKV MHA, MLP),
learned per-layer skip predictors trained against a cosine/Euclidean
similarity oracle or CLS-attention scores, static-shape mask / top-k
gather-compaction pruning execution, a phased train/eval harness, data
pipelines with HF-processor-equivalent preprocessing, mesh parallelism via
jax.sharding, and the full visualization suite.

Layout:
    configs    — typed model / pruning / run configs (the reference used
                 constants-in-file, himanshu/hi_main.py:88-108)
    models     — ViT/DeiT forward, predictor heads, pruned encoder
    ops        — attention / MLP / patch-embed / masking ops (jnp reference
                 implementations + Pallas TPU kernels)
    parallel   — mesh construction, sharding rules, pjit train/eval steps
    train      — losses, freeze policies, phased trainer, metrics, logging
    data       — CIFAR-100 / ImageFolder pipelines, ViT image preprocessing
    viz        — heatmaps, blackout montages, demo app
"""

__version__ = "0.1.0"

from vit_pruning_tpu.configs import (  # noqa: F401
    ViTConfig,
    PruneConfig,
    PREDICTOR_KINDS,
    PRUNE_MODES,
    vit_base_patch16_224,
    vit_tiny,
    deit_tiny,
    deit_small,
    deit_base,
)
