"""Harness utilities: sweep, housekeeping, profiling."""

import os

import numpy as np
import pytest

import jax

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset
from vit_pruning_tpu.utils.housekeeping import (
    export_test_images,
    pick_device,
    remove_unwanted,
)
from vit_pruning_tpu.utils.profiling import complexity_report, throughput
from vit_pruning_tpu.utils.sweep import grid, sweep

CFG = ViTConfig(
    image_size=16, patch_size=8, hidden_size=32, num_layers=2,
    num_heads=2, mlp_dim=64, num_labels=4,
)


def test_grid():
    g = grid(sim_threshold=[0.85, 0.9], mode=["mask", "topk"])
    assert len(g) == 4
    assert {"sim_threshold", "mode"} == set(g[0])


def test_sweep_runs():
    images, labels = synthetic_dataset(n=32, image_size=16, num_labels=4)
    data = Batches(images, labels, batch_size=16, image_size=16)
    df = sweep(
        grid(sim_threshold=[0.9], mlp_threshold=[0.4, 0.6]),
        CFG,
        PruneConfig(mode="mask", predictor="cls_mlp"),
        data, data,
        train_type="mlp", num_epochs=(1, 0),
    )
    assert len(df) == 2
    assert {"accuracy", "mlp_accuracy", "mean_skip"} <= set(df.columns)


def test_remove_unwanted(tmp_path):
    logs = tmp_path / "logs"
    models = tmp_path / "models"
    logs.mkdir(); models.mkdir()
    (logs / "short.txt").write_text("one line\n")
    (logs / "long.txt").write_text("\n".join(["line"] * 20))
    (models / "short").mkdir()
    (models / "long").mkdir()
    removed = remove_unwanted(str(logs), str(models), min_lines=10)
    assert removed == ["short"]
    assert not (logs / "short.txt").exists()
    assert not (models / "short").exists()
    assert (logs / "long.txt").exists() and (models / "long").exists()


def test_export_test_images(tmp_path):
    images, labels = synthetic_dataset(n=10, image_size=16)
    img_dir, label_path = export_test_images(images, labels, str(tmp_path / "td"), limit=5)
    assert len(os.listdir(img_dir)) == 5
    lines = open(label_path).read().strip().split("\n")
    assert len(lines) == 5 and lines[0].startswith("img_00000.png ")


def test_pick_device():
    assert pick_device() in jax.devices()


def test_throughput_and_complexity():
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2)
    r = throughput(f, (jnp.ones((4, 4)),), batch_size=4, iters=2, warmup=1)
    assert r["images_per_sec"] > 0
    rep = complexity_report(CFG, PruneConfig(mode="topk", top_k=2), images_per_sec=100.0)
    assert "Dense FLOPs/image" in rep and "Pruned FLOPs/image" in rep


def test_html_log_sink(tmp_path):
    from vit_pruning_tpu.utils.run_logging import RunLogger

    log = RunLogger("run1", str(tmp_path), quiet=True, html=True)
    log("hello <world>")
    log.close()
    html = open(tmp_path / "run1.html").read()
    assert "hello &lt;world&gt;" in html and "<html>" in html


def test_composed_schedule_and_live_counts():
    from vit_pruning_tpu.configs import composed_schedule, schedule_live

    s = composed_schedule(196, 12)
    assert s == (130,) + (65,) * 4 + (32,) * 7
    live = schedule_live(s, 196)
    assert live == (131,) + (66,) * 4 + (33,) * 7
    # short models: no negative repeats (regression — the old inline literal
    # silently truncated for num_layers < 5)
    s3 = composed_schedule(64, 3)
    assert len(s3) == 3 and all(v > 0 for v in s3)
    # 0 entries mean "no further drop" and live counts never grow
    assert schedule_live((10, 0, 4, 0), 64) == (11, 11, 5, 5)


def test_vit_large_config_geometry():
    """ViT-L/16 bench row (beyond the reference's largest model): the config
    must resolve to the published geometry and produce a valid 24-layer
    composed schedule — guards the bench.py --model vit_large wiring."""
    from vit_pruning_tpu.configs import composed_schedule, schedule_live, vit_large

    c = vit_large(num_labels=100)
    assert (c.hidden_size, c.num_layers, c.num_heads, c.mlp_dim) == (
        1024, 24, 16, 4096)
    assert c.image_size == 224 and c.patch_size == 16 and c.num_patches == 196
    assert c.hidden_size % c.num_heads == 0
    s = composed_schedule(c.num_patches, c.num_layers)
    assert len(s) == 24 and s == (130,) + (65,) * 4 + (32,) * 19
    live = schedule_live(s, c.num_patches)
    assert all(a >= b for a, b in zip(live, live[1:]))


def test_vit_huge_config_geometry():
    """ViT-H/14 bench row: published geometry (1280/32/16/5120, patch 14 ->
    256 patches, seq 257) and valid 32-layer composed/ultra schedules —
    guards the bench.py --model vit_huge wiring. head_dim is 80 (the only
    preset whose head width is not a power of two; the Pallas width parity
    test covers the kernels at that shape)."""
    from vit_pruning_tpu.configs import (
        composed_schedule, schedule_live, ultra_schedule, vit_huge)

    c = vit_huge(num_labels=100)
    assert (c.hidden_size, c.num_layers, c.num_heads, c.mlp_dim) == (
        1280, 32, 16, 5120)
    assert c.image_size == 224 and c.patch_size == 14
    assert c.num_patches == 256 and c.seq_len == 257 and c.head_dim == 80
    for sched_fn in (composed_schedule, ultra_schedule):
        s = sched_fn(c.num_patches, c.num_layers)
        assert len(s) == 32 and all(v >= 0 for v in s) and s[0] > 0
        live = schedule_live(s, c.num_patches)
        assert all(a >= b for a, b in zip(live, live[1:]))
        assert live[-1] >= 2  # CLS + at least one patch survives


def test_ultra_schedule_geometry():
    """ultra_schedule roughly halves composed's live counts at every depth,
    never emits zero keeps, and stays monotone."""
    from vit_pruning_tpu.configs import (
        composed_schedule, schedule_live, ultra_schedule)

    s = ultra_schedule(196, 12)
    assert s == (98,) + (32,) * 4 + (16,) * 7
    live = schedule_live(s, 196)
    comp = schedule_live(composed_schedule(196, 12), 196)
    assert all(a >= b for a, b in zip(live, live[1:]))
    assert all(u <= c for u, c in zip(live, comp))
    # tiny geometries degrade to >=1 keeps, not zero (which would mean
    # "no drop" to the scheduler and silently change semantics)
    s3 = ultra_schedule(10, 8)
    assert len(s3) == 8 and all(v >= 1 for v in s3)

def test_token50_schedules_mean_live_and_pin():
    """Every token50 candidate is a PURE token-skip schedule whose mean
    live-patch count over the encoder is num_patches/2 (up to integer
    rounding); the pinned token50_schedule is the measured sweep winner
    (uniform — token50_sweep.json) and must stay among the candidates."""
    from vit_pruning_tpu.configs import (
        schedule_live, token50_schedule, token50_schedules)

    for n, L in ((196, 12), (196, 24), (64, 6)):
        cands = token50_schedules(n, L)
        assert "uniform" in cands
        for name, s in cands.items():
            assert len(s) == L
            live = [v - 1 for v in schedule_live(s, n)]  # exclude CLS
            mean = sum(live) / len(live)
            assert abs(mean - n / 2) <= 2, (name, mean)
            # monotone: progressive compaction never re-adds tokens
            assert all(a >= b for a, b in zip(live, live[1:])), name
        assert token50_schedule(n, L) == cands["uniform"]
        assert cands["uniform"] == tuple([n // 2] + [0] * (L - 1))


def test_live_to_schedule_drops_only():
    """_live_to_schedule emits a drop entry only when the target shrinks;
    equal-or-larger targets become 0 (no-drop) entries."""
    from vit_pruning_tpu.configs import _live_to_schedule, schedule_live

    s = _live_to_schedule([196, 147, 147, 98, 98, 120], 196)
    assert s == (0, 147, 0, 98, 0, 0)
    assert schedule_live(s, 196) == (197, 148, 148, 99, 99, 99)


def test_pruned_vit_flops_topk_prog_uses_schedule():
    """topk_prog FLOPs follow the keep_schedule's live counts (the bench
    MFU fields divide throughput by exactly this); a schedule-free topk_prog
    config degrades to a single layer-0 drop to top_k."""
    from vit_pruning_tpu.configs import PruneConfig, ViTConfig, schedule_live
    from vit_pruning_tpu.utils.flops import pruned_vit_flops

    cfg = ViTConfig(image_size=32, patch_size=4, hidden_size=64, num_layers=4,
                    num_heads=4, mlp_dim=128, num_labels=10)
    sched = (32, 0, 16, 0)
    pc = PruneConfig(mode="topk_prog", predictor="cls_mlp", top_k=32,
                     keep_schedule=sched)
    want = pruned_vit_flops(
        cfg, pc, tokens_per_layer=schedule_live(sched, cfg.num_patches))
    assert pruned_vit_flops(cfg, pc) == want
    pc_flat = PruneConfig(mode="topk_prog", predictor="cls_mlp", top_k=32)
    flat = pruned_vit_flops(cfg, pc_flat)
    assert flat == pruned_vit_flops(
        cfg, pc_flat, tokens_per_layer=[33] * cfg.num_layers)
    # deeper schedule => strictly fewer FLOPs
    assert pruned_vit_flops(cfg, pc) < flat
