"""Loss functions for skip predictors and classification.

Exactly the reference's loss menu:
  * class-balanced BCEWithLogits vs oracle labels (himanshu/model_utils.py:103-108)
  * MSE(cosine similarity, 1 - score)            (cls_mlp.py:91-96)
  * MSE(score, mean CLS->patch attention)        (pradeep/using_attention.py:209-220)
  * focal-weighted BCE                           (himanshu/main_model_utils.py:15-38)
  * cross-entropy for classification             (main_model_utils.py:102)

Fidelity note: the reference feeds *post-sigmoid* predictor scores into
BCEWithLogitsLoss (model_utils.py:65,108 — a double squashing). We replicate
that: `weighted_bce_oracle` treats the (0,1) score as the logit, so trained
thresholds (mlp_threshold=0.5) transfer unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray, labels: jnp.ndarray, pos_weight: jnp.ndarray | float = 1.0
) -> jnp.ndarray:
    """Mean BCE-with-logits with torch pos_weight semantics.

    l = -[pos_weight * y * log σ(x) + (1 - y) * log(1 - σ(x))]
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(per)


def weighted_bce_oracle(scores: jnp.ndarray, keep_labels: jnp.ndarray) -> jnp.ndarray:
    """The M2 predictor loss (model_utils.py:103-108), with one deliberate
    deviation: the reference's `labels = boolean_mask[:, 1:]` trains BCE
    against the predictor's OWN thresholded mask (a self-consistency loss
    that reinforces whatever the predictor already says); we train against
    the similarity-oracle keep labels, which is what the surrounding
    confusion-matrix/accuracy machinery (model_utils.py:109-113) measures
    the predictor against. Documented in PARITY.md (M2) alongside the
    double-sigmoid fidelity note.

    scores: [B, N] post-sigmoid predictor outputs (used as logits — see module
    docstring). keep_labels: [B, N] bool, True = oracle says process.
    pos_weight = mean(labels) / (1 - mean(labels)): down-weights the majority
    "keep" class.
    """
    labels = keep_labels.astype(scores.dtype)
    focal_alpha = jnp.mean(labels)
    pos_weight = focal_alpha / (1.0 - focal_alpha + 1e-16)
    return bce_with_logits(scores, labels, pos_weight)


def focal_loss(
    probs: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """Focal binary loss on probabilities (main_model_utils.py:15-38)."""
    targets = targets.astype(probs.dtype)
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    bce = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    pt = p * targets + (1.0 - p) * (1.0 - targets)
    w = (1.0 - pt) ** gamma
    loss = alpha * targets * w * bce + (1.0 - alpha) * (1.0 - targets) * w * bce
    return jnp.mean(loss)


def mse_cosine_loss(scores: jnp.ndarray, cos_similarity: jnp.ndarray) -> jnp.ndarray:
    """M1: MSE(cos_sim, 1 - score) (cls_mlp.py:91-96).

    High similarity => token skippable => score should be low.
    cos_similarity is detached upstream (the teacher).
    """
    return jnp.mean((cos_similarity - (1.0 - scores)) ** 2)


def mse_attention_loss(scores: jnp.ndarray, attn_target: jnp.ndarray) -> jnp.ndarray:
    """M7: regress the head-averaged CLS->patch attention row
    (using_attention.py:209-220)."""
    return jnp.mean((scores - attn_target) ** 2)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def distillation_kl(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 2.0,
) -> jnp.ndarray:
    """Hinton KD: T^2 * KL(softmax(t/T) || softmax(s/T)).

    Not in the reference (its recovery phase is plain CE fine-tuning,
    hi_main.py:167-168); used by the harness's optional teacher to recover
    accuracy after structured pruning — the M19 parallel unpruned stream
    (mukunda/deit.py:241-305) already establishes the dense-teacher idea.
    """
    t = jax.nn.log_softmax(teacher_logits / temperature, axis=-1)
    s = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    return temperature**2 * jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1))
