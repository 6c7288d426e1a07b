"""Token-skip scoring, selection, and compaction ops — all static-shape.

These replace the reference's per-image ragged gather loop
(himanshu/model_utils.py:88-91) and side-channel mask attributes with
explicit, jit-compatible ops:

  * similarity_oracle   — the cosine/Euclidean "would this token change?"
                          teacher signal (himanshu/model_utils.py:96-101)
  * threshold/topk keep masks — M2 thresholding (model_utils.py:66) and the
                          M7 fixed top-k selection (pradeep/using_attention.py:136-147)
  * neighbor_average    — 8-neighbor refresh of previously-skipped tokens
                          (model_utils.py:15-16,47-51)
  * gather_compact / scatter_back — fixed-K compaction so the layer runs on a
                          [B, K+1, D] dense sequence (one XLA program)
  * confusion_counts    — 2x2 predictor-vs-oracle confusion matrix in-graph
                          (replaces the sklearn GPU->CPU sync, model_utils.py:111-113)

Mask convention everywhere: **True = keep (process the token)**, matching the
reference's `boolean_mask`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --- Oracle ---------------------------------------------------------------

def similarity_oracle(
    x_in: jnp.ndarray,
    x_out: jnp.ndarray,
    alpha: float = 0.3,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Per-token similarity of a token before/after a full layer pass.

    Exact formula of himanshu/model_utils.py:96-101:
        cos  = (cosine_similarity(out, in) + 1) / 2
        eucl = ||out - in||^2 / ||out||^2
        sim  = alpha * cos + (1 - alpha) * 1 / (1 + eucl)

    x_in, x_out: [..., D] (patch tokens only — callers strip CLS).
    Returns sim in [0, 1]-ish, shape [...].
    High similarity => the layer barely changed the token => skippable.
    """
    dot = jnp.sum(x_out * x_in, axis=-1)
    nrm = jnp.linalg.norm(x_out, axis=-1) * jnp.linalg.norm(x_in, axis=-1)
    cos = (dot / jnp.maximum(nrm, eps) + 1.0) / 2.0
    out_sq = jnp.sum(x_out * x_out, axis=-1)
    eucl = jnp.sum((x_out - x_in) ** 2, axis=-1) / jnp.maximum(out_sq, eps)
    dist_sim = 1.0 / (1.0 + eucl)
    return alpha * cos + (1.0 - alpha) * dist_sim


# --- Keep-mask construction -------------------------------------------------

def threshold_keep_mask(scores: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """True where predictor score >= threshold (model_utils.py:66)."""
    return scores >= threshold


def topk_keep_mask(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep the k highest-scoring patch tokens per image.

    scores: [B, N]. Returns (mask [B, N] bool, indices [B, k] int32) — the
    static-shape equivalent of torch.topk + scatter_
    (pradeep/using_attention.py:136-147).
    """
    _, idx = jax.lax.top_k(scores, k)
    mask = jnp.zeros(scores.shape, dtype=bool)
    mask = jax.vmap(lambda m, i: m.at[i].set(True))(mask, idx)
    return mask, idx


def rank_keep_mask(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask of the k highest-scoring tokens per image, sort/scatter-free.

    Selects the SAME set as topk_keep_mask (ties broken toward the lower
    index, matching jax.lax.top_k) but computes it as a pairwise-comparison
    rank — token i is kept iff fewer than k tokens beat it. XLA fuses the
    [*, N, N] comparison into a streaming VPU reduction, avoiding both the
    top_k sort and the vmapped dynamic scatter, which are the expensive
    pieces of per-layer re-decide selection on TPU at serving shapes (the
    same family of cost as the ~2 ms/layer dynamic gather/scatter that
    motivated one-hot compaction). Use when only the mask is needed;
    topk_keep_mask when the sorted indices are too.
    """
    n = scores.shape[-1]
    s_i = scores[..., :, None]
    s_j = scores[..., None, :]
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    beats = (s_j > s_i) | ((s_j == s_i) & (idx_j < idx_i))
    return beats.sum(-1) < k


def random_keep_mask(rng: jax.Array, batch: int, n: int, keep: int) -> jnp.ndarray:
    """Uniformly-random keep mask with a fixed per-layer budget.

    The M14 control baseline (pradeep/old codes/random_pruning.py:22-69).
    """
    noise = jax.random.uniform(rng, (batch, n))
    return rank_keep_mask(noise, keep)


def add_cls_keep(patch_mask: jnp.ndarray) -> jnp.ndarray:
    """Prepend an always-True CLS column: [B, N] -> [B, N+1].

    (cls_col, model_utils.py:67-68; CLS is never skipped.)
    """
    cls_col = jnp.ones((patch_mask.shape[0], 1), dtype=bool)
    return jnp.concatenate([cls_col, patch_mask], axis=1)


# --- Neighbor averaging -----------------------------------------------------

def neighbor_index_table(grid: int) -> np.ndarray:
    """8-neighbor index table over the patch grid, clamped at the borders.

    The reference builds this with flat offsets [-1,1,-15,-13,-14,13,14,15]
    clamped to [0,195] (himanshu/model_utils.py:15-16) — note its ±15/±13
    offsets assume a 14-wide row and its clamp wraps across rows. We build
    the *intended* table from 2-D grid coordinates (true 8-neighborhood,
    border-clamped), which is the well-defined version of the same idea.

    Returns [N, 8] int32 of patch indices (0-based, CLS excluded).
    """
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij"), -1)
    coords = coords.reshape(-1, 2)  # [N, (row, col)]
    offsets = np.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    )
    nbr = coords[:, None, :] + offsets[None, :, :]  # [N, 8, 2]
    nbr = np.clip(nbr, 0, grid - 1)
    return (nbr[..., 0] * grid + nbr[..., 1]).astype(np.int32)


def neighbor_average(
    patches: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    weight: float,
    source_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Blend each patch token with the mean of its grid neighbors.

    patches: [B, N, D]; neighbor_idx: [N, 8]; weight in [0, 1]
    (`avg_threshold`, himanshu/model_utils.py:51).
    source_mask: [B, N] bool — if given, only neighbors with True contribute
    (the reference zeroes previously-*kept* neighbors so skipped-token values
    diffuse; model_utils.py:49). Tokens whose neighborhood is empty keep
    their own value.
    """
    nbrs = patches[:, neighbor_idx, :]  # [B, N, 8, D]
    if source_mask is None:
        mean = nbrs.mean(axis=2)
    else:
        w = source_mask[:, neighbor_idx].astype(patches.dtype)  # [B, N, 8]
        cnt = w.sum(axis=2, keepdims=True)  # [B, N, 1]
        mean = (nbrs * w[..., None]).sum(axis=2) / jnp.maximum(cnt, 1.0)
        mean = jnp.where(cnt > 0, mean, patches)
    return patches * (1.0 - weight) + mean * weight


# --- Compaction --------------------------------------------------------------

def compact_indices(keep_mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the first k kept tokens per row (stable order).

    keep_mask: [B, S] bool with (by construction) >= k True entries when used
    with fixed-budget modes. Returns [B, k] int32 sorted ascending, so the
    compacted sequence preserves token order (CLS stays first).
    """
    s = keep_mask.shape[-1]
    lead = keep_mask.shape[:-1]
    mask2 = keep_mask.reshape(-1, s)  # rank-generic: flatten leading axes
    pos = jax.lax.broadcasted_iota(jnp.int32, mask2.shape, 1)
    # kept-first stable order WITHOUT a sort: each position's destination
    # rank is its running count within its class (kept ranks first, skipped
    # ranks appended after all kept) — two cumsums + one scatter, much
    # cheaper than argsort on TPU
    kept = mask2.astype(jnp.int32)
    counts = kept.sum(axis=-1, keepdims=True)
    kept_rank = jnp.cumsum(kept, axis=-1) - 1
    skip_rank = counts + jnp.cumsum(1 - kept, axis=-1) - 1
    dest = jnp.where(mask2, kept_rank, skip_rank)  # [B, S] permutation
    order = jnp.zeros(mask2.shape, jnp.int32)
    order = jax.vmap(lambda o, d, p: o.at[d].set(p))(order, dest, pos)
    return order[:, :k].astype(jnp.int32).reshape(*lead, k)


def gather_compact(x: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens: x [B, S, D], indices [B, K] -> [B, K, D]."""
    return jnp.take_along_axis(x, indices[..., None], axis=1)


def scatter_back(x: jnp.ndarray, indices: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Write processed tokens back to their original positions.

    x [B, S, D] (the passthrough/residual copy), indices [B, K],
    values [B, K, D]. Equivalent of `output[i][mask[i]] = processed`
    (himanshu/model_utils.py:91) with static shapes.
    """
    def one(row_x, row_idx, row_val):
        return row_x.at[row_idx].set(row_val)

    return jax.vmap(one)(x, indices, values)


# --- Metrics -----------------------------------------------------------------

def confusion_counts(true_labels: jnp.ndarray, pred_labels: jnp.ndarray) -> jnp.ndarray:
    """2x2 confusion matrix [[TN, FP], [FN, TP]] — rows true, cols predicted.

    Matches sklearn.metrics.confusion_matrix(..., labels=[0, 1]) as used at
    himanshu/model_utils.py:111-113, but stays on-device (no host sync).
    """
    t = true_labels.astype(jnp.int32).reshape(-1)
    p = pred_labels.astype(jnp.int32).reshape(-1)
    tn = jnp.sum((1 - t) * (1 - p))
    fp = jnp.sum((1 - t) * p)
    fn = jnp.sum(t * (1 - p))
    tp = jnp.sum(t * p)
    return jnp.array([[tn, fp], [fn, tp]], dtype=jnp.int32)
