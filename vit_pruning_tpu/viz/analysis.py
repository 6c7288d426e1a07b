"""Cosine-similarity analysis + training-curve plots (V7, V8).

Reference: himanshu/cosine_sim_visual.ipynb (per-layer token in/out cosine
similarity distributions — the figure motivating the whole skip approach) and
plots.ipynb (train/test accuracy-loss dual-axis curves).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp


def layer_similarity_profile(params, pixel_values, config) -> np.ndarray:
    """Per-layer distribution of token in/out cosine similarity [L, B, N].

    Runs the dense model, collecting hidden states, and computes the cosine
    similarity of each patch token before/after each layer — the V7 analysis.
    """
    from vit_pruning_tpu.models.vit import vit_forward

    out = vit_forward(params, pixel_values, config, output_hidden_states=True)
    hs = out["hidden_states"]  # L+1 tensors [B, S, D]
    sims = []
    for i in range(config.num_layers):
        a, b = hs[i][:, 1:], hs[i + 1][:, 1:]
        dot = jnp.sum(a * b, axis=-1)
        nrm = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        sims.append(dot / jnp.maximum(nrm, 1e-12))
    return np.asarray(jnp.stack(sims))


def plot_similarity_distributions(sims: np.ndarray, out_path: str = "images/cosineSim.png"):
    """Violin/box view of per-layer in/out similarity (figure V7)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    L = sims.shape[0]
    data = [sims[i].reshape(-1) for i in range(L)]
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.violinplot(data, showmedians=True)
    ax.set_xlabel("Layer")
    ax.set_ylabel("cos(token in, token out)")
    ax.set_title("Per-layer token input/output cosine similarity")
    ax.set_xticks(range(1, L + 1), [str(i) for i in range(L)])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return out_path


def plot_training_curves(
    histories: dict,
    out_path: str = "images/train.png",
    metric: str = "accuracy",
):
    """Dual-axis accuracy/loss curves for named runs (plots.ipynb cells 0-2).

    histories: {run_name: {'accuracy': [...], 'loss': [...]}}.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(9, 5))
    ax2 = ax1.twinx()
    for name, h in histories.items():
        epochs = np.arange(1, len(h[metric]) + 1)
        ax1.plot(epochs, h[metric], marker="o", label=f"{name} {metric}")
        if "loss" in h:
            ax2.plot(epochs, h["loss"], linestyle="--", alpha=0.5, label=f"{name} loss")
    ax1.set_xlabel("Epoch")
    ax1.set_ylabel(metric)
    ax2.set_ylabel("loss")
    ax1.legend(loc="lower right")
    fig.suptitle("Training curves")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return out_path
