"""Phased train/eval harness.

The reference's L3 layer (himanshu/main_model_utils.py): `train()` with loss
mixing ('classification' / 'cosine' / 'both' / 'alternate'), freeze-policy
dispatch, per-epoch eval with per-layer skip/CM tables, best-checkpoint
saving; `test()` with full_testing oracle instrumentation. Phases are driven
exactly like hi_main.py:161-168: phase 1 'cosine' (predictor only, lr 1e-3),
phase 2 'classification' (backbone, lr 1e-5).

TPU redesign: the loss mixing and the predictor losses are computed inside
ONE jitted train step (the reference re-walks module attributes per batch on
host); eval accumulates confusion counts on device and transfers 4 ints per
layer per batch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward
from vit_pruning_tpu.train.freeze import masked_adam, policy_for_loss_type
from vit_pruning_tpu.train.losses import cross_entropy, distillation_kl
from vit_pruning_tpu.train.metrics import EvalAccumulator, MLPTracker
from vit_pruning_tpu.checkpoint import BestCheckpoint

COSINE_LOSS_RATIO = 1.0  # main_model_utils.py:103

# metrics in total_loss_fn's dict that are COUNTS (summed across gradient-
# accumulation microbatches); everything else is a batch mean (averaged).
# Keep in sync with the metrics dict below.
SUM_METRICS = ("confusion",)


def total_loss_fn(
    params: dict,
    batch: dict,
    config: ViTConfig,
    pcfg: PruneConfig,
    loss_type: str,
    rng: Optional[jax.Array],
    remat: bool = False,
    distill=None,
):
    """Loss mixing of main_model_utils.py:141-165.

    distill: optional (teacher_params, teacher_config, weight, temperature)
    — replaces the classification term with
    (1-w)*CE + w*KD(teacher logits); the teacher runs dense (mode='none')
    under stop_gradient.

    The 'classification' phase never reads pred_loss, so its forward skips
    the per-layer oracle dense pass entirely (oracle=False — VERDICT r3 #6:
    the instrumented fine-tune step paid a full second forward per layer for
    a loss term it discarded); masks still come from the predictor on the
    static-shape training paths. Its metrics therefore carry no
    pred_loss/confusion — eval still reports both.
    """
    with_oracle = loss_type != "classification"
    out = pruned_vit_forward(
        params, batch["pixel_values"], config, pcfg, train=True,
        oracle=with_oracle, rng=rng, remat=remat,
    )
    cls_loss = cross_entropy(out["logits"], batch["labels"])
    if distill is not None and loss_type in ("classification", "both"):
        t_params, t_config, w, temp = distill
        t_logits = jax.lax.stop_gradient(
            pruned_vit_forward(
                t_params, batch["pixel_values"], t_config,
                PruneConfig(mode="none", predictor="none"),
            )["logits"]
        )
        cls_loss = (1.0 - w) * cls_loss + w * distillation_kl(
            out["logits"], t_logits, temp
        )
    if loss_type == "classification":
        total = cls_loss
        pred_loss = jnp.zeros(())
    else:
        pred_loss = out["aux"]["pred_loss"].sum()  # Σ layer.loss (:145-148)
        if loss_type == "cosine":
            total = pred_loss
        elif loss_type == "both":
            total = cls_loss + COSINE_LOSS_RATIO * pred_loss
        else:
            raise ValueError(f"loss_type {loss_type!r}")
    metrics = {
        "loss": total,
        "cls_loss": cls_loss,
        "pred_loss": pred_loss,
        "accuracy": jnp.mean((out["logits"].argmax(-1) == batch["labels"]).astype(jnp.float32)),
    }
    if with_oracle:
        # per-layer predictor-vs-oracle confusion counts, feeding the M19
        # per-predictor running accuracy tracker (mukunda/deit.py:183-229).
        # COUNTS, not a mean — listed in SUM_METRICS for grad accumulation.
        metrics["confusion"] = out["aux"]["confusion"]
    return total, metrics


def make_train_step(
    config: ViTConfig,
    pcfg: PruneConfig,
    loss_type: str,
    optimizer: optax.GradientTransformation,
    compute_dtype=None,
    remat: bool = False,
    distill=None,
    accum_steps: int = 1,
    detach_cosine: Optional[bool] = None,
) -> Callable:
    """One jitted optimization step: (params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    detach_cosine: force the detached-trajectory predictor phase on/off
    (None = automatic — on for eligible 'cosine' configs; see the comment at
    the fast path below). The equivalence test pins both settings.

    compute_dtype (e.g. jnp.bfloat16) runs the forward/backward in reduced
    precision while params, gradients, and optimizer state stay float32
    (mixed precision: the cast is part of the differentiated graph, so
    gradients land in float32 automatically).

    accum_steps > 1 runs gradient accumulation: the batch is split into
    `accum_steps` equal microbatches along axis 0 and walked with lax.scan,
    so peak activation memory is one microbatch's while the update is the
    full-batch gradient (all loss terms are batch means, so the microbatch
    average equals the full-batch value; per-layer confusion COUNTS are
    summed). One optimizer update per call, identical semantics to
    accum_steps=1 up to float reassociation (tested).
    """

    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def loss_fn(p, b, r):
        if compute_dtype is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
            b = dict(b, pixel_values=b["pixel_values"].astype(compute_dtype))
        return total_loss_fn(p, b, config, pcfg, loss_type, r,
                             remat=remat, distill=distill)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Detached-trajectory predictor phase (VERDICT r3 #6; reference anchor:
    # M19 trains its predictors on DETACHED inputs, mukunda/deit.py:158-231).
    # In the 'cosine' phase only predictor params receive updates, and they
    # reach the loss ONLY through each layer's scores — the encoder
    # trajectory is constant w.r.t. them (masks are boolean thresholds, and
    # oracle targets are stop-gradient'd). So: run the instrumented forward
    # ONCE with no AD, cache each layer's input and training target, then
    # differentiate just the per-layer score computation — the backward pass
    # through every (masked + dense-oracle) layer pair disappears. Gradients
    # are identical (tests/test_harness.py detached-equivalence test).
    # Excluded: predictors whose params feed the trajectory differentiably
    # (bottleneck's approximation, updatenet's residual), neighbor averaging
    # (scores are computed on the averaged input, which the cached inputs
    # are not), and grad accumulation (the generic scan path handles it).
    detached_cosine = (
        loss_type == "cosine"
        and accum_steps == 1
        and pcfg.predictor in ("cls_mlp", "token_mlp", "common_mlp",
                               "compressor", "shared_compressor", "cnn",
                               "key_mlp")
        and pcfg.skip_correction != "updatenet"
        and pcfg.avg_threshold == 0.0
    ) if detach_cosine is None else detach_cosine
    if detached_cosine:
        from vit_pruning_tpu.models.predictors import apply_predictor
        from vit_pruning_tpu.models.pruned_vit import _is_active, _layer_slice
        from vit_pruning_tpu.train.losses import (
            focal_loss,
            mse_attention_loss,
            mse_cosine_loss,
            weighted_bce_oracle,
        )

        def layer_target(aux, i):
            if pcfg.loss == "bce_oracle":
                return aux["oracle_keep"][i], weighted_bce_oracle
            if pcfg.loss == "focal":
                return aux["oracle_keep"][i], lambda s, t: focal_loss(
                    s, t, alpha=pcfg.focal_alpha, gamma=pcfg.focal_gamma)
            if pcfg.loss == "mse_attention":
                return aux["attn_target"][i], mse_attention_loss
            return aux["cos_target"][i], mse_cosine_loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def detached_step(params, opt_state, batch, rng):
            p_fwd = params
            if compute_dtype is not None:
                p_fwd = jax.tree.map(lambda a: a.astype(compute_dtype), params)
                pv = batch["pixel_values"].astype(compute_dtype)
            else:
                pv = batch["pixel_values"]
            out = jax.lax.stop_gradient(pruned_vit_forward(
                p_fwd, pv, config, pcfg, train=True, rng=rng,
                return_layer_inputs=True,
            ))
            xs, aux = out["layer_inputs"], out["aux"]

            def pred_loss_fn(pred_params):
                pp = pred_params
                if compute_dtype is not None:
                    pp = jax.tree.map(lambda a: a.astype(compute_dtype), pp)
                total = jnp.zeros(())
                for i in range(config.num_layers):
                    if not _is_active(pcfg, i):
                        continue
                    lp = _layer_slice(p_fwd["backbone"]["layers"], i)
                    scores, _ = apply_predictor(pp, i, xs[i], config, pcfg,
                                                layer_params=lp)
                    target, fn = layer_target(aux, i)
                    total = total + fn(scores, target)
                return total

            pred_total, pred_grads = jax.value_and_grad(pred_loss_fn)(
                params["predictor"])
            grads = jax.tree.map(jnp.zeros_like, params)
            grads["predictor"] = pred_grads
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "loss": pred_total,
                "cls_loss": cross_entropy(out["logits"], batch["labels"]),
                "pred_loss": pred_total,
                "accuracy": jnp.mean(
                    (out["logits"].argmax(-1) == batch["labels"]).astype(
                        jnp.float32)),
                "confusion": aux["confusion"],
            }
            return params, opt_state, metrics

        return detached_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        if accum_steps == 1:
            (_, metrics), grads = grad_fn(params, batch, rng)
        else:
            bsz = batch["labels"].shape[0]
            if bsz % accum_steps:
                raise ValueError(
                    f"batch size {bsz} not divisible by accum_steps {accum_steps}")
            mb = bsz // accum_steps
            micro = jax.tree.map(
                lambda a: a.reshape((accum_steps, mb) + a.shape[1:]), batch)
            rngs = jax.random.split(rng, accum_steps)
            # zero-initialized carry from eval_shape: ONE copy of the
            # forward+backward graph (inside scan), not an unrolled first
            # microbatch plus a scan body
            first = jax.tree.map(lambda a: a[0], micro)
            (_, m_shape), g_shape = jax.eval_shape(grad_fn, params, first, rngs[0])
            zeros = lambda tree: jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree)

            def body(carry, inp):
                g_acc, m_acc = carry
                b_i, r_i = inp
                (_, m), g = grad_fn(params, b_i, r_i)
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, m_acc, m),
                ), None

            (g_sum, m_sum), _ = jax.lax.scan(
                body, (zeros(g_shape), zeros(m_shape)), (micro, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
            # means average; count metrics stay summed (full-batch counts)
            metrics = {
                k: (v if k in SUM_METRICS else v / accum_steps)
                for k, v in m_sum.items()
            }
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_eval_step(config: ViTConfig, pcfg: PruneConfig, full_testing: bool) -> Callable:
    """(params, batch) -> dict of device scalars/arrays for EvalAccumulator.

    full_testing=True adds the oracle pass + confusion counts, exactly like
    `model(inputs, compute_cosine=True)` (main_model_utils.py:248-249).
    """

    @jax.jit
    def step(params, batch):
        out = pruned_vit_forward(
            params, batch["pixel_values"], config, pcfg,
            compute_oracle=full_testing, rng=jax.random.PRNGKey(0),
        )
        res = {
            "correct": jnp.sum(out["logits"].argmax(-1) == batch["labels"]),
            "keep_masks": out["keep_masks"],
        }
        if full_testing:
            res["confusion"] = out["aux"]["confusion"]
        return res

    return step


def evaluate(
    params: dict,
    batches,
    config: ViTConfig,
    pcfg: PruneConfig,
    full_testing: bool = False,
    log: Optional[Callable[[str], None]] = None,
    eval_step: Optional[Callable] = None,
):
    """test() equivalent (main_model_utils.py:235-300).

    Returns (accuracy, mlp_accuracy, EvalAccumulator).
    """
    if eval_step is None:
        eval_step = make_eval_step(config, pcfg, full_testing)
    acc = EvalAccumulator(config.num_layers)
    for batch in batches:
        res = eval_step(params, batch)
        acc.update(
            correct=np.asarray(res["correct"]),
            batch=batch["labels"].shape[0],
            confusion=np.asarray(res["confusion"]) if full_testing else None,
            keep_masks=np.asarray(res["keep_masks"]),
        )
    if log is not None and full_testing:
        log(acc.report())
    elif log is not None:
        log(f"Overall accuracy: {acc.accuracy:.2%}\n")
    return acc.accuracy, acc.mlp_accuracy, acc


def train(
    params: dict,
    train_batches,
    test_batches,
    config: ViTConfig,
    pcfg: PruneConfig,
    *,
    num_epochs: int = 10,
    loss_type: str = "both",
    lr: float = 1e-4,
    log: Optional[Callable[[str], None]] = None,
    best: Optional[BestCheckpoint] = None,
    seed: int = 0,
    full_testing: bool = True,
    state_dir: Optional[str] = None,
    viz_dir: Optional[str] = None,
    compute_dtype=None,
    remat: bool = False,
    distill=None,
    per_layer_lr_scales=None,
    clip_norm: float = None,
    accum_steps: int = 1,
) -> dict:
    """One training phase (main_model_utils.py:100-191). Returns params.

    accum_steps: gradient accumulation — split each batch into this many
    microbatches inside the jitted step (see make_train_step); trains large
    effective batches within one microbatch's activation memory.

    distill: optional (teacher_params, teacher_config, weight, temperature)
    forwarded to the train step (see total_loss_fn).

    per_layer_lr_scales: optional [num_layers] multipliers — M19's
    per-predictor optimizers (mukunda/deit.py:131-156): predictor-only
    phases use per_predictor_adam with one effective lr per layer's head.

    loss_type 'alternate' switches mlp/vit phases on epoch % 3
    (main_model_utils.py:125-129).

    state_dir: if set, {'params','opt_state','epoch'} is checkpointed after
    every epoch and training resumes exactly from an existing state — the
    reference only saved params (optimizer restarted on resume,
    hi_main.py:138-139).
    viz_dir: if set, blackout-mask montages of the first test batch are
    dumped every epoch (the V9 live training viz, mukunda/deit.py:93-128).
    """
    import os

    from vit_pruning_tpu.checkpoint import restore_checkpoint, save_checkpoint

    log = log or (lambda s: None)
    rng = jax.random.PRNGKey(seed)

    def build(loss_t, policy=None):
        pol = policy or policy_for_loss_type(loss_t)
        if per_layer_lr_scales is not None and pol == "mlp_train":
            from vit_pruning_tpu.train.freeze import per_predictor_adam

            opt = per_predictor_adam(params, lr, per_layer_lr_scales, policy=pol)
        else:
            opt = masked_adam(params, pol, lr, clip_norm=clip_norm)
        return opt, make_train_step(config, pcfg, loss_t, opt,
                                    compute_dtype=compute_dtype, remat=remat,
                                    distill=distill, accum_steps=accum_steps)

    start_epoch = 0
    state_path = (
        os.path.join(os.path.abspath(state_dir), f"state_{loss_type}")
        if state_dir else None
    )
    if loss_type != "alternate":
        optimizer, step = build(loss_type)
        opt_state = optimizer.init(params)
        if state_path and os.path.exists(state_path):
            state = restore_checkpoint(
                state_path,
                {"params": params, "opt_state": opt_state, "epoch": 0},
            )
            params, opt_state = state["params"], state["opt_state"]
            start_epoch = int(state["epoch"]) + 1
            log(f"resumed from {state_path} at epoch {start_epoch}")
    elif state_path and os.path.exists(state_path):
        # alternate rebuilds its optimizer every epoch (main_model_utils.py:
        # 125-129), so exact resume needs only params + the epoch counter
        state = restore_checkpoint(state_path, {"params": params, "epoch": 0})
        params = state["params"]
        start_epoch = int(state["epoch"]) + 1
        log(f"resumed from {state_path} at epoch {start_epoch}")
    eval_step = make_eval_step(config, pcfg, full_testing)

    for epoch in range(start_epoch, num_epochs):
        if loss_type == "alternate":
            phase = "cosine" if epoch % 3 == 0 else "classification"
            optimizer, step = build(phase)
            opt_state = optimizer.init(params)

        if hasattr(train_batches, "set_epoch"):
            train_batches.set_epoch(epoch)  # epoch-pinned shuffle => exact resume
        epoch_rng = jax.random.fold_in(rng, epoch)

        running, nb = 0.0, 0
        tracker = MLPTracker(config.num_layers)
        import time as _time

        t_epoch = _time.perf_counter()
        for batch in train_batches:
            epoch_rng, sub = jax.random.split(epoch_rng)
            params, opt_state, metrics = step(params, opt_state, batch, sub)
            running += float(metrics["loss"])
            if "confusion" in metrics:
                tracker.update(np.asarray(metrics["confusion"]))
            nb += 1
        t_epoch = _time.perf_counter() - t_epoch
        log(f"epoch {epoch}: {nb} steps in {t_epoch:.1f}s "
            f"({1e3 * t_epoch / max(nb, 1):.1f} ms/step incl. host+compile)")
        if tracker.samples.sum() > 0:
            log(tracker.report() + "\n")

        val_acc, mlp_acc, _ = evaluate(
            params, test_batches, config, pcfg,
            full_testing=full_testing, log=log, eval_step=eval_step,
        )
        if best is not None:
            best.update(val_acc, params)
        if state_path:
            if loss_type != "alternate":
                save_checkpoint(
                    state_path,
                    {"params": params, "opt_state": opt_state, "epoch": epoch},
                )
            else:
                save_checkpoint(state_path, {"params": params, "epoch": epoch})
        if viz_dir:
            from vit_pruning_tpu.viz.blackout import training_mask_dump

            vb = next(iter(test_batches))
            vout = pruned_vit_forward(params, vb["pixel_values"], config, pcfg)
            training_mask_dump(
                [np.asarray(img) for img in vb["pixel_values"][:2]],
                np.asarray(vout["keep_masks"]),
                config.patch_size, viz_dir, step=epoch,
            )
        log(f"Test accuracy after {epoch + 1} epochs: {val_acc:.2%}\n")

    if best is not None:
        log(f"Best accuracy: {best.best_accuracy * 100}%\n")
    return params


def phased_train(
    params: dict,
    train_batches,
    test_batches,
    config: ViTConfig,
    pcfg: PruneConfig,
    *,
    train_type: str = "both",          # 'mlp' | 'vit' | 'both' | 'none' (hi_main.py:91)
    loss_types=("cosine", "classification"),
    num_epochs=(10, 10),
    lrs=(1e-3, 1e-5),
    log: Optional[Callable[[str], None]] = None,
    best: Optional[BestCheckpoint] = None,
    full_testing: bool = True,
    compute_dtype=None,
    per_layer_lr_scales=None,
    accum_steps: int = 1,
) -> dict:
    """The hi_main.py:161-168 two-phase schedule. compute_dtype=jnp.bfloat16
    runs forward/backward in bf16 with fp32 master params (~6.5x faster
    predictor phase on v5e). per_layer_lr_scales applies M19's per-predictor
    learning rates to the predictor phase (see train()). accum_steps>1
    gradient-accumulates over microbatches in both phases."""
    log = log or (lambda s: None)
    acc0 = evaluate(params, test_batches, config, pcfg, full_testing=full_testing, log=log)
    log(f"Test accuracy at starting: {acc0[:2]}")

    if train_type in ("mlp", "both"):
        params = train(
            params, train_batches, test_batches, config, pcfg,
            num_epochs=num_epochs[0], loss_type=loss_types[0], lr=lrs[0],
            log=log, best=best, full_testing=full_testing,
            compute_dtype=compute_dtype,
            per_layer_lr_scales=per_layer_lr_scales,
            accum_steps=accum_steps,
        )
    if train_type in ("vit", "both"):
        params = train(
            params, train_batches, test_batches, config, pcfg,
            num_epochs=num_epochs[1], loss_type=loss_types[1], lr=lrs[1],
            log=log, best=None, full_testing=full_testing,
            compute_dtype=compute_dtype, accum_steps=accum_steps,
        )
    return params
