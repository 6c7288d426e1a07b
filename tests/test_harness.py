"""Harness: freeze policies actually freeze, phases train, checkpoints
round-trip, metrics/flops/run-name formats hold."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params
from vit_pruning_tpu.train.freeze import freeze_mask, masked_adam, POLICIES
from vit_pruning_tpu.train.harness import (
    evaluate,
    make_train_step,
    phased_train,
    train,
)
from vit_pruning_tpu.utils.flops import pruned_vit_flops, vit_flops
from vit_pruning_tpu.utils.run_logging import encode_run_name, append_stats
from vit_pruning_tpu.checkpoint import save_checkpoint, restore_checkpoint

CFG = ViTConfig(
    image_size=16, patch_size=8, hidden_size=32, num_layers=2,
    num_heads=2, mlp_dim=64, num_labels=4,
)
PCFG = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle")


def _data(n=64, bs=16):
    images, labels = synthetic_dataset(n=n, image_size=16, num_labels=4)
    return Batches(images, labels, batch_size=bs, image_size=16, shuffle=True)


def _flat_diff(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return [float(jnp.abs(x - y).max()) for x, y in zip(la, lb)]


@pytest.mark.parametrize("policy", POLICIES)
def test_freeze_policies(policy):
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    optimizer = masked_adam(params, policy, lr=1e-2)
    step = make_train_step(CFG, PCFG, "both", optimizer)
    opt_state = optimizer.init(params)
    batch = next(iter(_data()))
    before = jax.tree.map(lambda a: a.copy(), params)
    new_params, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(1))

    mask = freeze_mask(before, policy)
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0, before, new_params)
    for m, mv, leafpath in zip(
        jax.tree.leaves(mask), jax.tree.leaves(moved),
        [str(p) for p, _ in jax.tree_util.tree_leaves_with_path(mask)],
    ):
        if not m:
            assert not mv, f"frozen leaf moved under {policy}: {leafpath}"
    # at least one trainable leaf actually moved
    trainable_moved = [mv for m, mv in zip(jax.tree.leaves(mask), jax.tree.leaves(moved)) if m]
    assert any(trainable_moved)


def test_masked_adam_schedule_and_clip():
    # the deit_small-scale dense recipe: warmup-cosine schedule + global-norm
    # clipping through masked_adam must still zero frozen leaves and must
    # clip (first-step |update| bounded by lr even for huge gradients)
    import optax

    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-2, 2, 10, 1e-4)
    opt = masked_adam(params, "vit_mlp_train", sched, clip_norm=1.0)
    opt_state = opt.init(params)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 1e6), params)
    updates, _ = opt.update(grads, opt_state, params)
    mask = freeze_mask(params, "vit_mlp_train")
    for m, u in zip(jax.tree.leaves(mask), jax.tree.leaves(updates)):
        mx = float(jnp.abs(u).max())
        if not m:
            assert mx == 0.0
        else:
            assert mx <= 1e-2 + 1e-6  # clipped then scaled by step-0 lr (=0 at warmup start)


def test_cosine_phase_trains_predictor():
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data()
    from vit_pruning_tpu.train.harness import total_loss_fn

    batch = next(iter(data))
    loss0 = float(total_loss_fn(params, batch, CFG, PCFG, "cosine", jax.random.PRNGKey(0))[0])
    params = train(
        params, data, data, CFG, PCFG,
        num_epochs=2, loss_type="cosine", lr=1e-3, full_testing=True,
    )
    loss1 = float(total_loss_fn(params, batch, CFG, PCFG, "cosine", jax.random.PRNGKey(0))[0])
    assert loss1 < loss0


def test_classification_phase_learns_synthetic():
    pcfg = PruneConfig(mode="none", predictor="none")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    data = _data(n=128, bs=32)
    acc0, _, _ = evaluate(params, data, CFG, pcfg)
    params = train(
        params, data, data, CFG, pcfg,
        num_epochs=3, loss_type="classification", lr=1e-3, full_testing=False,
    )
    acc1, _, _ = evaluate(params, data, CFG, pcfg)
    assert acc1 > max(acc0, 0.5)  # synthetic classes are separable


def test_phased_train_smoke(tmp_path):
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data()
    lines = []
    from vit_pruning_tpu.checkpoint import BestCheckpoint

    best = BestCheckpoint(str(tmp_path), "run")
    params = phased_train(
        params, data, data, CFG, PCFG,
        train_type="both", num_epochs=(1, 1), lrs=(1e-3, 1e-5),
        log=lines.append, best=best,
    )
    text = "\n".join(lines)
    assert "Skip ratio" in text and "MLP accuracy" in text
    assert "Confusion matrix for each layer" in text
    assert best.best_accuracy > 0


def test_alternate_loss_type():
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data(n=32, bs=16)
    params = train(
        params, data, data, CFG, PCFG,
        num_epochs=2, loss_type="alternate", lr=1e-3, full_testing=False,
    )


def test_checkpoint_roundtrip(tmp_path):
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    zeroed = jax.tree.map(jnp.zeros_like, params)
    restored = restore_checkpoint(path, zeroed)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flops_accounting():
    dense = vit_flops(CFG)
    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", top_k=2)
    pruned = pruned_vit_flops(CFG, pcfg)
    assert 0 < pruned < dense
    # live-token override
    measured = pruned_vit_flops(CFG, pcfg, tokens_per_layer=[3, 3])
    assert 0 < measured < dense


def test_run_name_and_stats(tmp_path):
    name = encode_run_name(
        "desc", "both", "model_utils", ["cosine", "classification"],
        [1e-3, 1e-5], 0.9, 0.5, 0.0, 32, None, None, 16,
        timestamp="2026-01-01_00-00-00",
    )
    assert name == (
        "2026-01-01_00-00-00_desc_both_model_utils_loss-cosine^classification"
        "_lr-0.001^1e-05_st-0.9_mt-0.5_at-0.0_bs-32_trs-None_tes-None_nw-16"
    )
    csv = str(tmp_path / "stats.csv")
    append_stats(csv, name, 0.9, 0.8)
    append_stats(csv, name, 0.91, 0.81)
    lines = open(csv).read().strip().split("\n")
    assert lines[0] == "Model, Accuracy, MLP Accuracy"
    assert len(lines) == 3


def test_train_resume_exact(tmp_path):
    """Resume restores optimizer state + epoch (improves on the reference,
    which restarted the optimizer; hi_main.py:138-139)."""
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data(n=32, bs=16)
    sd = str(tmp_path / "state")

    # run 2 epochs in one go
    p_full = train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=2, loss_type="cosine", lr=1e-3, full_testing=False,
        state_dir=str(tmp_path / "full"),
    )
    # run 1 epoch, then resume for the 2nd
    p1 = train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=1, loss_type="cosine", lr=1e-3, full_testing=False,
        state_dir=sd,
    )
    p2 = train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=2, loss_type="cosine", lr=1e-3, full_testing=False,
        state_dir=sd,
    )
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p2))
    ]
    assert max(diffs) < 1e-6  # identical trajectory


def test_training_viz_dumps(tmp_path):
    """V9: per-epoch blackout mask dumps during training."""
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data(n=32, bs=16)
    train(
        params, data, data, CFG, PCFG,
        num_epochs=1, loss_type="cosine", lr=1e-3, full_testing=False,
        viz_dir=str(tmp_path / "viz"),
    )
    files = list((tmp_path / "viz").iterdir())
    assert len(files) == 2  # two tracked images
    assert all(f.name.startswith("step0_img") for f in files)


def test_mixed_precision_train_step():
    """bf16 compute, fp32 master params/grads."""
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    optimizer = masked_adam(params, "vit_mlp_train", 1e-3)
    step = make_train_step(CFG, PCFG, "both", optimizer, compute_dtype=jnp.bfloat16)
    batch = next(iter(_data()))
    before = jax.tree.map(lambda a: np.asarray(a).copy(), params)
    p2, _, metrics = step(params, optimizer.init(params), batch, jax.random.PRNGKey(1))
    params = before
    assert np.isfinite(float(metrics["loss"]))
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(p2))
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2))
    )
    assert moved > 0


def test_alternate_resume_exact(tmp_path):
    """loss_type='alternate' checkpoints too (params + epoch; the optimizer
    is rebuilt every epoch by design, main_model_utils.py:125-129)."""
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    data = _data(n=32, bs=16)
    sd = str(tmp_path / "alt")

    p_full = train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=2, loss_type="alternate", lr=1e-3, full_testing=False,
        state_dir=str(tmp_path / "alt_full"),
    )
    train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=1, loss_type="alternate", lr=1e-3, full_testing=False,
        state_dir=sd,
    )
    p2 = train(
        jax.tree.map(lambda a: a.copy(), params), data, data, CFG, PCFG,
        num_epochs=2, loss_type="alternate", lr=1e-3, full_testing=False,
        state_dir=sd,
    )
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p2))
    ]
    assert max(diffs) < 1e-6


def test_mlp_tracker_matches_reference_aggregation():
    """M19 track_mlp_loss semantics (mukunda/deit.py:183-229): running
    per-predictor sample counts, positives, and per-class accuracies."""
    import numpy as np

    from vit_pruning_tpu.train.metrics import MLPTracker

    t = MLPTracker(num_layers=2)
    # layer 0: 3 skip-correct, 1 skip-wrong, 4 keep-correct, 2 keep-wrong
    c1 = np.array([[[3, 1], [2, 4]], [[5, 0], [0, 5]]])
    t.update(c1)
    t.update(c1)  # running aggregate over two steps
    assert t.samples.tolist() == [20, 20]
    assert t.positives.tolist() == [12, 10]
    np.testing.assert_allclose(t.accuracy, [(6 + 8) / 20, 1.0])
    np.testing.assert_allclose(t.class_accuracy[0], [3 / 4, 4 / 6])
    np.testing.assert_allclose(t.class_accuracy[1], [1.0, 1.0])
    assert "mlp_0" in t.report() and "keep_acc" in t.report()


def test_distillation_kl_zero_at_teacher_and_positive_otherwise():
    from vit_pruning_tpu.train.losses import distillation_kl

    logits = jnp.asarray(np.random.RandomState(0).randn(8, 10).astype(np.float32))
    assert float(distillation_kl(logits, logits)) == pytest.approx(0.0, abs=1e-6)
    other = logits + jnp.asarray(np.random.RandomState(1).randn(8, 10).astype(np.float32))
    assert float(distillation_kl(other, logits)) > 0.0


def test_distilled_train_step_pulls_student_toward_teacher():
    """With distill weight 1.0 the classification term is pure KD: the loss
    must equal the KL to the dense teacher's logits and decrease over steps."""
    from vit_pruning_tpu.train.freeze import masked_adam, policy_for_loss_type

    teacher = init_pruned_vit_params(jax.random.PRNGKey(7), CFG, PCFG)
    params = init_pruned_vit_params(jax.random.PRNGKey(8), CFG, PCFG)
    opt = masked_adam(params, policy_for_loss_type("classification"), 1e-3)
    step = make_train_step(
        CFG, PCFG, "classification", opt,
        distill=(teacher, CFG, 1.0, 2.0),
    )
    opt_state = opt.init(params)
    batch = next(iter(_data()))
    losses = []
    for i in range(8):
        params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["cls_loss"]))
    assert losses[-1] < losses[0]


def test_per_layer_mlp_threshold_controls_each_layer():
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle",
                       mlp_threshold=(2.0, -1.0))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    out = pruned_vit_forward(params, x, CFG, pcfg)
    keep = np.asarray(out["keep_masks"])  # [L, B, S]
    assert not keep[0, :, 1:].any()  # sigmoid scores < 2 always
    assert keep[1].all()             # scores > -1 always


def test_prune_config_json_roundtrip_per_layer_thresholds():
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle",
                       sim_threshold=(0.1, 0.9), mlp_threshold=(0.4, 0.6))
    restored = PruneConfig.from_json(pcfg.to_json())
    assert restored == pcfg
    assert isinstance(restored.sim_threshold, tuple)
    assert isinstance(restored.mlp_threshold, tuple)


def test_best_checkpoint_in_memory_survives_donated_steps():
    """BestCheckpoint(save_dir=None) must deep-copy: make_train_step donates
    its params buffers, so a stored reference would be deleted by the next
    step (regression: RuntimeError 'Array has been deleted')."""
    from vit_pruning_tpu.checkpoint import BestCheckpoint
    from vit_pruning_tpu.train.freeze import masked_adam, policy_for_loss_type

    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    opt = masked_adam(params, policy_for_loss_type("classification"), 1e-3)
    step = make_train_step(CFG, PCFG, "classification", opt)
    opt_state = opt.init(params)
    batch = next(iter(_data()))
    best = BestCheckpoint()
    for i in range(3):
        params, opt_state, _ = step(params, opt_state, batch, jax.random.PRNGKey(i))
        best.update(1.0 - 0.1 * i, params)  # first epoch is "best"
    # the stored best must still be readable after later donated steps
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(best.best_params))


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2/4 produce the same update + metrics as one full-batch
    step (all loss terms are batch means; confusion counts sum exactly)."""
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    batch = next(iter(_data(bs=16)))
    optimizer = masked_adam(params, "vit_mlp_train", lr=1e-2)
    rng = jax.random.PRNGKey(3)

    ref_step = make_train_step(CFG, PCFG, "both", optimizer)
    p_ref, _, m_ref = ref_step(
        jax.tree.map(lambda a: a.copy(), params), optimizer.init(params),
        batch, rng)
    for accum in (2, 4):
        step = make_train_step(CFG, PCFG, "both", optimizer, accum_steps=accum)
        p_acc, _, m_acc = step(
            jax.tree.map(lambda a: a.copy(), params), optimizer.init(params),
            batch, rng)
        # tolerance is ABSOLUTE vs the ~1e-2 Adam step: microbatch-sum
        # reassociation noise (~1e-7 on grads) passes through Adam's
        # eps floor as ~1e-5 wiggle on near-zero-gradient leaves
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_acc)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=0)
        np.testing.assert_array_equal(np.asarray(m_ref["confusion"]),
                                      np.asarray(m_acc["confusion"]))
        np.testing.assert_allclose(float(m_ref["loss"]), float(m_acc["loss"]),
                                   rtol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(CFG, PCFG, "both", optimizer, accum_steps=3)(
            params, optimizer.init(params), batch, rng)
    with pytest.raises(ValueError, match="accum_steps"):
        make_train_step(CFG, PCFG, "both", optimizer, accum_steps=0)


@pytest.mark.parametrize("loss", ["bce_oracle", "mse_cosine", "mse_attention", "focal"])
@pytest.mark.parametrize("mode", ["mask", "topk"])
def test_detached_cosine_step_matches_generic(mode, loss):
    """The detached-trajectory predictor step (VERDICT r3 #6) must produce
    the SAME parameter update as the generic backprop-through-everything
    step: in the 'cosine' phase gradients reach predictor params only
    through each layer's scores, so caching the trajectory is exact."""
    pcfg = PruneConfig(mode=mode, predictor="cls_mlp", loss=loss, top_k=2)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    batch = next(iter(_data()))
    rng = jax.random.PRNGKey(3)

    results = []
    for detach in (False, True):
        p = jax.tree.map(lambda a: a.copy(), params)
        optimizer = masked_adam(p, "mlp_train", lr=1e-2)
        step = make_train_step(CFG, pcfg, "cosine", optimizer,
                               detach_cosine=detach)
        new_p, _, metrics = step(p, optimizer.init(p), batch, rng)
        results.append((new_p, metrics))
    (p_gen, m_gen), (p_det, m_det) = results
    np.testing.assert_allclose(float(m_gen["pred_loss"]),
                               float(m_det["pred_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_gen), jax.tree.leaves(p_det)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_classification_step_skips_oracle_and_matches_loss():
    """The classification phase's train step must (a) carry no
    confusion/oracle metrics (the oracle dense passes are skipped — VERDICT
    r3 #6) and (b) optimize the same CE loss as before: one step's cls_loss
    equals the instrumented forward's CE on the same batch."""
    from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward
    from vit_pruning_tpu.train.losses import cross_entropy

    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, PCFG)
    batch = next(iter(_data()))
    optimizer = masked_adam(params, "vit_train", lr=1e-3)
    step = make_train_step(CFG, PCFG, "classification", optimizer)
    _, _, metrics = step(jax.tree.map(lambda a: a.copy(), params),
                         optimizer.init(params), batch, jax.random.PRNGKey(1))
    assert "confusion" not in metrics
    assert float(metrics["pred_loss"]) == 0.0
    out = pruned_vit_forward(params, batch["pixel_values"], CFG, PCFG,
                             train=True, rng=jax.random.PRNGKey(1))
    want = float(cross_entropy(out["logits"], batch["labels"]))
    np.testing.assert_allclose(float(metrics["cls_loss"]), want, rtol=1e-5)


def test_oracle_override_skips_aux_but_keeps_training_paths():
    """pruned_vit_forward(train=True, oracle=False) returns no aux yet
    executes the training (re-decide, static-shape) paths: masks must
    byte-match the instrumented forward's."""
    from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward

    for mode in ("mask", "topk", "topk_prog", "random"):
        pcfg = PruneConfig(mode=mode, predictor="cls_mlp", loss="bce_oracle",
                           top_k=2)
        params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
        batch = next(iter(_data()))
        rng = jax.random.PRNGKey(5)
        fast = pruned_vit_forward(params, batch["pixel_values"], CFG, pcfg,
                                  train=True, oracle=False, rng=rng)
        full = pruned_vit_forward(params, batch["pixel_values"], CFG, pcfg,
                                  train=True, rng=rng)
        assert "aux" not in fast and "aux" in full
        np.testing.assert_array_equal(np.asarray(fast["keep_masks"]),
                                      np.asarray(full["keep_masks"]))
        np.testing.assert_allclose(np.asarray(fast["logits"], np.float32),
                                   np.asarray(full["logits"], np.float32),
                                   rtol=1e-5, atol=1e-5)
