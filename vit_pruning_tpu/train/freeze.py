"""Freeze policies as optax gradient masks.

The reference toggles `requires_grad` over module subsets
(ModifiedViTModel.{vit_mlp_train, vit_train, mlp_train, classifier_train,
classifier_mlp_train}, himanshu/model_utils.py:261-300) and builds a new Adam
over trainable params each phase (main_model_utils.py:119). Here a policy is
a boolean pytree mask fed to `optax.masked` — functionally identical, and the
whole train step stays one compiled program.
"""

from __future__ import annotations

import jax
import optax

POLICIES = (
    "vit_mlp_train",      # everything trainable             (model_utils.py:261-263)
    "vit_train",          # backbone only, predictors frozen (:265-273)
    "mlp_train",          # predictors only                  (:275-282)
    "classifier_train",   # classifier head only             (:285-289)
    "classifier_mlp_train",  # head + predictors             (:291-300)
)


def _fill(tree, value: bool):
    return jax.tree.map(lambda _: value, tree)


def freeze_mask(params: dict, policy: str) -> dict:
    """Boolean pytree: True = trainable under `policy`.

    Predictor-adjacent trees (the M18 'updatenet' corrector) follow the
    predictor's trainability.
    """
    if policy not in POLICIES:
        raise ValueError(f"policy {policy!r} not in {POLICIES}")
    backbone = params["backbone"]
    pred = params.get("predictor")

    if policy == "vit_mlp_train":
        bb, pd = _fill(backbone, True), _fill(pred, True)
    elif policy == "vit_train":
        bb, pd = _fill(backbone, True), _fill(pred, False)
    elif policy == "mlp_train":
        bb, pd = _fill(backbone, False), _fill(pred, True)
    elif policy == "classifier_train":
        bb = _fill(backbone, False)
        bb["head"] = _fill(backbone["head"], True)
        pd = _fill(pred, False)
    else:  # classifier_mlp_train
        bb = _fill(backbone, False)
        bb["head"] = _fill(backbone["head"], True)
        pd = _fill(pred, True)
    mask = {"backbone": bb, "predictor": pd}
    for extra in params:
        if extra not in mask:
            pred_trainable = policy in ("vit_mlp_train", "mlp_train", "classifier_mlp_train")
            mask[extra] = _fill(params[extra], pred_trainable)
    return mask


def policy_for_loss_type(loss_type: str) -> str:
    """Phase dispatch of main_model_utils.py:108-113."""
    return {
        "cosine": "mlp_train",
        "classification": "vit_train",
        "both": "vit_mlp_train",
    }.get(loss_type, "vit_mlp_train")


def masked_adam(
    params: dict, policy: str, lr, clip_norm: float = None
) -> optax.GradientTransformation:
    """Adam over the policy-selected subset (main_model_utils.py:119).

    Frozen leaves get zero updates (optax.masked alone would pass raw
    gradients through for unmasked leaves).

    lr: a float or an optax schedule (e.g. warmup-cosine for from-scratch
    ViT training). clip_norm: optional global-norm gradient clipping before
    Adam (the standard ViT-from-scratch stabilizer; None = off, preserving
    the original update rule byte-for-byte).
    """
    labels = jax.tree.map(
        lambda trainable: "train" if trainable else "freeze",
        freeze_mask(params, policy),
    )
    train_tx = optax.adam(lr)
    if clip_norm is not None:
        train_tx = optax.chain(optax.clip_by_global_norm(clip_norm), train_tx)
    return optax.multi_transform(
        {"train": train_tx, "freeze": optax.set_to_zero()}, labels
    )


def per_predictor_adam(
    params: dict, lr: float, lr_scales=None, policy: str = "mlp_train"
) -> optax.GradientTransformation:
    """M19's per-MLP optimizers (mukunda/deit.py:131-156: each NeuralNet owns
    `torch.optim.Adam(self.parameters())` and steps on its own loss).

    Adam is elementwise and each predictor's loss only reaches its own
    parameters (oracle targets are stop-gradient'd), so N independent Adams
    with equal hyperparameters are mathematically identical to one Adam over
    the stacked predictor tree — which is what masked_adam builds. This
    constructor makes the per-predictor structure explicit and adds the one
    thing a shared optimizer cannot express: per-predictor learning rates.

    lr_scales: optional [num_layers] multipliers applied to each predictor's
    update along the stacked leading axis (None = all 1.0, == masked_adam).
    """
    base = masked_adam(params, policy, lr)
    if lr_scales is None:
        return base
    import jax.numpy as jnp

    scales = jnp.asarray(lr_scales)

    def scale_predictor_updates(updates, state, params=None):
        del params

        def scale_leaf(u):
            if u.ndim >= 1 and u.shape[0] == scales.shape[0]:
                return u * scales.reshape((-1,) + (1,) * (u.ndim - 1))
            return u

        scaled = dict(updates)
        if updates.get("predictor") is not None:
            # per-layer scaling applies only to the stacked-[L, ...]
            # subtrees; 'shared_'-prefixed keys hold ONE set of weights used
            # at every layer (init_predictor_params naming contract, same as
            # parallel/pipeline.py's sharding) and a shared leaf can
            # coincidentally have leading dim == L
            scaled["predictor"] = {
                k: (sub if k.startswith("shared_")
                    else jax.tree.map(scale_leaf, sub))
                for k, sub in updates["predictor"].items()
            }
        return scaled, state

    scaler = optax.GradientTransformation(lambda p: optax.EmptyState(), scale_predictor_updates)
    return optax.chain(base, scaler)
