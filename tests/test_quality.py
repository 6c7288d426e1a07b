"""quality.py driver logic: the mask serving preset (bench.py's
`--mode mask --mask_budget --mask_calibrate` row) and its calibration.

The training-free pieces run for real (threshold calibration, mask-mode
serving forward); the expensive train/measure phases are faked so the test
exercises the preset wiring — headline-weight reuse, serving-config swap,
gates, JSON shape — in seconds.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.pruned_vit import (
    init_pruned_vit_params,
    pruned_vit_forward,
)

CFG = ViTConfig(image_size=16, patch_size=4, hidden_size=32, num_layers=4,
                num_heads=2, mlp_dim=64, num_labels=8)


def test_calibrate_serving_mask_threshold_pins_keep_rate_and_budget():
    from quality import calibrate_serving_mask_threshold

    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", top_k=8)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3, 16, 16))
    mt = calibrate_serving_mask_threshold(
        params, {"pixel_values": x}, CFG, pcfg, keep_rate=0.5)
    assert len(mt) == CFG.num_layers

    budget = 8  # n=16 patches -> 50% cap
    serve = pcfg.replace(mode="mask", mlp_threshold=mt, mask_budget=budget,
                         keep_schedule=None)
    out = pruned_vit_forward(params, x, CFG, serve)
    masks = np.asarray(out["keep_masks"])  # [L, B, S]
    # the budget cap is strict per image at every layer (CLS excluded)
    assert masks[:, :, 1:].sum(-1).max() <= budget
    # thresholds were calibrated to ~50% keep; allow cascade drift + the cap
    density = masks[:, :, 1:].mean()
    assert 0.2 <= density <= 0.62


def test_quality_mask_preset_serves_headline_weights(monkeypatch, capsys):
    """--preset all: the mask preset must reuse the trained headline weights
    (no third training run) and be measured on the swapped serving config
    (mode='mask', calibrated thresholds, mask_budget cap)."""
    import quality

    calls = {"trained": [], "train_params": [], "measured": [],
             "measured_params": []}

    def fake_train_and_eval(config, pcfg, train_b, test_b, args, log,
                            base_params=None, structured=False, teacher=None):
        params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
        calls["trained"].append(pcfg.mode)
        calls["train_params"].append(params)
        acc_structural = 0.88 if structured else None
        if pcfg.keep_schedule:  # report the schedule's own target skip
            from vit_pruning_tpu.configs import schedule_live

            live = schedule_live(pcfg.keep_schedule, config.num_patches)
            skip = 1.0 - (sum(live) / len(live)) / (config.num_patches + 1)
        else:
            skip = 0.5
        # structured mse_attention presets are gated on their weakest drop
        # layer's attention-mass capture (predictor_capture_min)
        extra = {"predictor_capture_min": 0.9} if structured else {}
        return (0.9, 0.9, 0.9, skip, acc_structural, params, extra)

    def fake_measure_preset(params, eval_cfg, pcfg, train_b, test_b, args,
                            log, structured):
        calls["measured"].append(pcfg)
        calls["measured_params"].append(params)
        return (0.9, 0.9, 0.9, 0.5, None, params, {})

    monkeypatch.setattr(quality, "train_and_eval", fake_train_and_eval)
    monkeypatch.setattr(quality, "measure_preset", fake_measure_preset)

    from vit_pruning_tpu.ops.dispatch import set_kernel_mode

    try:
        rc = quality.main([
            "--preset", "all", "--train_size", "64", "--test_size", "32",
            "--batch", "16",
        ])
    finally:
        set_kernel_mode("auto")
    assert rc == 0
    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # exactly four training runs: dense, headline, composed, ultra — NOT mask
    assert calls["trained"] == ["none", "topk", "topk_prog", "topk_prog"]
    # measure_preset called once (mask); headline/composed measure inside
    # train_and_eval
    assert len(calls["measured"]) == 1
    serve = calls["measured"][0]
    assert serve.mode == "mask" and serve.mask_budget is not None
    assert isinstance(serve.mlp_threshold, tuple)
    assert len(serve.mlp_threshold) == 6  # gate model layers
    # the mask preset served the HEADLINE's weights (train call #1)
    assert calls["measured_params"][0] is calls["train_params"][1]

    m = results["presets"]["mask"]
    assert m["serving_config"]["mode"] == "mask"
    n = 64  # gate model: 32/4 grid
    assert m["serving_config"]["mask_budget"] == n // 2
    assert set(m["gates"]) >= {"delta", "delta_int8", "skip", "predictor"}
    assert results["pass"] is True


def test_cached_synthetic_roundtrip_byte_identical():
    """The npz dataset cache must return byte-identical arrays to a fresh
    build — the cached 224 dataset feeds gates whose checkpoints were trained
    on the uncached build."""
    import quality
    from vit_pruning_tpu.data.datasets import synthetic_localized_dataset

    orig = quality._cached_synthetic

    kw = dict(seed=3, label_noise=0.1, signal_patches=8, cell=4)
    fresh = synthetic_localized_dataset(32, 32, 16, **kw)

    # first call builds + writes, second call reads the cache
    import hashlib
    key = hashlib.sha1(f"v1:32:32:16:3:0.1:8:4".encode()).hexdigest()[:16]
    cache_file = f"/tmp/synth_localized_{key}.npz"
    if os.path.exists(cache_file):
        os.remove(cache_file)
    built = orig(32, 32, 16, **kw)
    assert os.path.exists(cache_file)
    cached = orig(32, 32, 16, **kw)
    for a, b in zip(fresh, built):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(fresh, cached):
        np.testing.assert_array_equal(a, b)
    os.remove(cache_file)


def test_build_task_bench_scale_models():
    """--gate_model deit_small/deit_base resolve to the exact geometries
    bench.py measures (the gate and the throughput claims must attach to the
    same model); the dataset/batcher scale with the config."""
    import argparse

    from quality import build_task

    # 64px -> a 4x4 grid of 16px patches, the smallest grid that fits the
    # task's >=8 signal patches
    base = dict(image_size=64, data_path=None, train_size=32, test_size=32,
                batch=16, label_noise=0.1)
    for name, dims in (("deit_small", (384, 12, 6, 1536)),
                       ("deit_base", (768, 12, 12, 3072)),
                       ("vit_large", (1024, 24, 16, 4096))):
        args = argparse.Namespace(gate_model=name, **base)
        config, train_b, test_b = build_task(args)
        assert (config.hidden_size, config.num_layers, config.num_heads,
                config.mlp_dim) == dims
        assert config.num_labels == 128 and config.image_size == 64
        b = next(iter(train_b))
        assert b["pixel_values"].shape == (16, 3, 64, 64)


def test_merge_results_preserves_presets_at_both_levels():
    """A --preset headline rerun must not drop previously recorded presets —
    at the top level (no --section) just like inside a section."""
    from quality import merge_results

    silent = lambda *a: None
    run1 = {"dense_top1": 0.9, "presets": {"composed": {"pass": True}},
            "pass": True}
    run2 = {"dense_top1": 0.9, "presets": {"headline": {"pass": True}},
            "pass": True}

    # top level (no --section)
    f = dict(run1)
    f["old_section"] = {"presets": {"x": {"pass": False}}, "pass": False}
    merge_results(f, run2, None, silent)
    assert set(f["presets"]) == {"composed", "headline"}
    assert f["pass"] is True
    assert f["old_section"]["presets"] == {"x": {"pass": False}}  # untouched

    # a failing rerun flips the merged pass
    run3 = {"dense_top1": 0.9, "presets": {"headline": {"pass": False}},
            "pass": False}
    merge_results(f, run3, None, silent)
    assert set(f["presets"]) == {"composed", "headline"}
    assert f["pass"] is False

    # section level
    g = {"s": dict(run1)}
    merge_results(g, run2, "s", silent)
    assert set(g["s"]["presets"]) == {"composed", "headline"}
    assert g["s"]["pass"] is True

    # mixed dense baselines are flagged
    run4 = {"dense_top1": 0.8, "presets": {"mask": {"pass": True,
                                                    "dense_top1": 0.8}},
            "pass": True}
    g["s"]["presets"]["headline"]["dense_top1"] = 0.9
    merge_results(g, run4, "s", silent)
    assert g["s"]["mixed_dense_baselines"] == [0.8, 0.9]


def test_per_predictor_adam_skips_shared_subtrees():
    """Per-layer lr scales must not touch 'shared_'-prefixed predictor
    subtrees (one set of weights for every layer), even when a shared leaf's
    leading dim coincidentally equals num_layers."""
    import jax
    import jax.numpy as jnp

    from vit_pruning_tpu.train.freeze import masked_adam, per_predictor_adam

    L = 3
    params = {
        "backbone": {"w": jnp.ones((4, 4))},
        "predictor": {
            "mlp": {"w": jnp.ones((L, 5, 5))},          # stacked [L, ...]
            "shared_net": {"b": jnp.ones((L,))},        # shared, dim == L!
        },
    }
    grads = jax.tree.map(jnp.ones_like, params)
    scales = (1.0, 2.0, 4.0)

    tx = per_predictor_adam(params, 1e-3, lr_scales=scales)
    state = tx.init(params)
    upd, _ = tx.update(grads, state, params)
    base = masked_adam(params, "mlp_train", 1e-3)
    upd0, _ = base.update(grads, base.init(params), params)

    stacked = np.asarray(upd["predictor"]["mlp"]["w"])
    ref = np.asarray(upd0["predictor"]["mlp"]["w"])
    for i, s in enumerate(scales):
        np.testing.assert_allclose(stacked[i], ref[i] * s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["predictor"]["shared_net"]["b"]),
                               np.asarray(upd0["predictor"]["shared_net"]["b"]),
                               rtol=1e-6)


def test_quality_merge_dropped_flag_flips_topk_prog_presets(monkeypatch, capsys):
    """--merge_dropped serves topk_prog presets with merge compaction: the
    composed preset trains/measures under merge_dropped=True, while the
    32x32 gate's headline ('topk' mode) and the mask preset's swapped
    serving config are left merge-free (nothing to merge)."""
    import quality

    calls = {"pcfgs": []}

    def fake_train_and_eval(config, pcfg, train_b, test_b, args, log,
                            base_params=None, structured=False, teacher=None):
        params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
        calls["pcfgs"].append(pcfg)
        acc_structural = 0.88 if structured else None
        if pcfg.keep_schedule:
            from vit_pruning_tpu.configs import schedule_live

            live = schedule_live(pcfg.keep_schedule, config.num_patches)
            skip = 1.0 - (sum(live) / len(live)) / (config.num_patches + 1)
        else:
            skip = 0.5
        extra = {"predictor_capture_min": 0.9} if structured else {}
        return (0.9, 0.9, 0.9, skip, acc_structural, params, extra)

    def fake_measure_preset(params, eval_cfg, pcfg, train_b, test_b, args,
                            log, structured):
        calls["pcfgs"].append(pcfg)
        return (0.9, 0.9, 0.9, 0.5, None, params, {})

    monkeypatch.setattr(quality, "train_and_eval", fake_train_and_eval)
    monkeypatch.setattr(quality, "measure_preset", fake_measure_preset)

    from vit_pruning_tpu.ops.dispatch import set_kernel_mode

    try:
        rc = quality.main([
            "--preset", "all", "--merge_dropped", "--train_size", "64",
            "--test_size", "32", "--batch", "16",
        ])
    finally:
        set_kernel_mode("auto")
    assert rc == 0
    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    by_mode = {}
    for pc in calls["pcfgs"]:
        by_mode.setdefault(pc.mode, pc)
    assert by_mode["topk_prog"].merge_dropped is True       # composed
    assert by_mode["topk"].merge_dropped is False           # gate headline
    assert by_mode["mask"].merge_dropped is False           # mask serving
    assert results["presets"]["composed"]["serving_config"]["merge_dropped"] is True
    assert results["presets"]["headline"]["serving_config"]["merge_dropped"] is False


def test_measure_preset_merge_ablation_records_both_variants():
    """measure_preset's merge ablation: --merge_dropped gates the merged
    config and records pruned_top1_nomerge; --merge_ablation gates the
    unmerged config and records pruned_top1_merged. merge_gain is
    merged - unmerged in both orientations, from ONE set of weights."""
    from types import SimpleNamespace

    import quality

    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       loss="mse_attention", top_k=8,
                       keep_schedule=(8, 4, 0, 0))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3, 16, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, CFG.num_labels)
    test_b = [{"pixel_values": x, "labels": y}]

    logs = []
    out = {}
    for flag in ("merge_dropped", "merge_ablation"):
        args = SimpleNamespace(merge_ablation=(flag == "merge_ablation"))
        pc = pcfg.replace(merge_dropped=(flag == "merge_dropped"))
        acc, acc_i8, mlp_acc, skip, acc_s, _, extra = quality.measure_preset(
            params, CFG, pc, test_b, test_b, args, logs.append,
            structured=False)
        out[flag] = (acc, extra)

    acc_m, extra_m = out["merge_dropped"]
    acc_u, extra_u = out["merge_ablation"]
    # gated accuracy is the variant pcfg selects; the other is recorded
    assert extra_m["pruned_top1_nomerge"] == pytest.approx(acc_u, abs=1e-4)
    assert extra_u["pruned_top1_merged"] == pytest.approx(acc_m, abs=1e-4)
    # merge_gain orientation is identical in both runs
    assert extra_m["merge_gain"] == pytest.approx(extra_u["merge_gain"], abs=1e-4)
    assert extra_m["merge_gain"] == pytest.approx(acc_m - acc_u, abs=1e-4)


def test_structured_preset_inherits_trained_predictor(monkeypatch):
    """Composed/ultra presets INHERIT the headline's trained predictor
    instead of re-training fresh heads at the deep schedule (r5: fresh
    re-training collapses attention-mass capture 0.97->0.42 on the
    distributed task). The inherited weights must ride through structural
    pruning untouched, the predictor phase must be skipped, and
    --fresh_structured_predictor must restore the old recipe."""
    from types import SimpleNamespace

    import quality

    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       loss="mse_attention", top_k=8,
                       keep_schedule=(8, 4, 4, 2))
    base = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    # sentinel: the trained predictor's weights are all 7.0
    base["predictor"] = jax.tree.map(
        lambda a: jnp.full_like(a, 7.0), base["predictor"])

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16, 16))
    y = jnp.zeros((8,), jnp.int32)
    batches = [{"pixel_values": x, "labels": y}]

    train_calls = []

    def fake_train(params, train_b, test_b, config, pc, *, loss_type,
                   **kw):
        train_calls.append(loss_type)
        return params

    captured = {}

    def fake_measure(params, eval_cfg, pc, train_b, test_b, args, log,
                     structured):
        captured["params"] = params
        return (0.9, 0.9, 0.9, 0.5, 0.9, params, {})

    import vit_pruning_tpu.train.harness as harness

    monkeypatch.setattr(harness, "train", fake_train)
    monkeypatch.setattr(quality, "measure_preset", fake_measure)

    args = SimpleNamespace(bf16=False, gate_model="gate", epochs=2,
                           pred_epochs=2, pred_lr=3e-3, recover_epochs=1,
                           fresh_structured_predictor=False)
    quality.train_and_eval(CFG, pcfg, batches, batches, args,
                           lambda *a: None, base_params=base,
                           structured=True, teacher=None)
    # predictor phase skipped: only the recovery fine-tune trains
    assert train_calls == ["classification"]
    pred = captured["params"]["predictor"]
    assert all(bool(jnp.all(l == 7.0)) for l in jax.tree.leaves(pred)), \
        "inherited predictor weights were re-initialized"
    # the backbone WAS structurally pruned (half heads / half channels)
    q_w = captured["params"]["backbone"]["layers"]["attn"]["q"]["w"]
    assert q_w.shape[-1] == CFG.hidden_size // 2

    # the escape hatch restores the old fresh-heads recipe
    train_calls.clear()
    args.fresh_structured_predictor = True
    quality.train_and_eval(CFG, pcfg, batches, batches, args,
                           lambda *a: None, base_params=base,
                           structured=True, teacher=None)
    assert train_calls == ["cosine", "classification"]
    pred = captured["params"]["predictor"]
    assert not all(bool(jnp.all(l == 7.0)) for l in jax.tree.leaves(pred))
