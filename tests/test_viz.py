"""Visualization suite: files render, shapes hold, contents sane."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, vit_tiny
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params, pruned_vit_forward
from vit_pruning_tpu.viz.blackout import (
    blackout_image,
    blackout_montage,
    layer_strips,
    skips_per_layer_chart,
)
from vit_pruning_tpu.viz.heatmaps import (
    mask_frequency,
    misclassified_heatmaps,
    skipped_heatmaps,
    to_skip_heatmaps,
)
from vit_pruning_tpu.viz.report import inference_report
from vit_pruning_tpu.viz.analysis import (
    layer_similarity_profile,
    plot_similarity_distributions,
    plot_training_curves,
)

CFG = vit_tiny()  # 32px, patch 8 -> 4x4 grid, 3 layers


@pytest.fixture(scope="module")
def run():
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    out = pruned_vit_forward(params, x, CFG, pcfg, compute_oracle=True,
                             rng=jax.random.PRNGKey(2))
    return params, x, out


def test_mask_frequency_shape():
    ev = np.random.rand(3, 8, 16) > 0.5
    f = mask_frequency(ev)
    assert f.shape == (3, 4, 4)
    assert 0 <= f.min() and f.max() <= 1


def test_heatmap_files(run, tmp_path):
    _, _, out = run
    km = np.asarray(out["keep_masks"])
    ok = np.asarray(out["aux"]["oracle_keep"])
    p1 = skipped_heatmaps(km, str(tmp_path / "sk"))
    p2 = to_skip_heatmaps(ok, str(tmp_path / "ts"))
    p3 = misclassified_heatmaps(km, ok, str(tmp_path / "mc"))
    for paths in (p1, p2, p3):
        assert len(paths) == CFG.num_layers
        assert all(os.path.getsize(p) > 1000 for p in paths)
    assert p1[0].endswith("layer_0_skipped_heatmap.png")


def test_blackout_paints_skipped():
    img = np.zeros((32, 32, 3))
    keep = np.ones(16, bool)
    keep[0] = False  # top-left patch skipped
    out = blackout_image(img, keep, patch_size=8)
    assert out[0, 0, 0] > 0.5  # painted red
    assert out[0, 0, 1] < 0.2
    assert out[16, 16, 0] == 0  # kept patch untouched


def test_montage_and_chart(run, tmp_path):
    _, x, out = run
    img = np.asarray(x[0])  # CHW
    km = np.asarray(out["keep_masks"])
    path = str(tmp_path / "montage.png")
    blackout_montage(img, km[:, 0], CFG.patch_size, out_path=path)
    assert os.path.getsize(path) > 1000
    fig, avg = skips_per_layer_chart(km, str(tmp_path / "chart.png"))
    assert avg.shape == (CFG.num_layers,)


def test_layer_strips(run):
    _, x, out = run
    strips = layer_strips(np.asarray(x[0]), np.asarray(out["keep_masks"])[:, 0],
                          CFG.patch_size)
    assert len(strips) == CFG.num_layers
    assert strips[0].shape == (32, 32, 3)


def test_inference_report(run, tmp_path):
    _, x, out = run
    imgs = [np.asarray(xi).transpose(1, 2, 0) for xi in x]
    path = inference_report(
        imgs, np.asarray(out["keep_masks"]), np.asarray(out["logits"]),
        CFG.patch_size, out_path=str(tmp_path / "report.html"),
    )
    html = open(path).read()
    assert "Token-skip inference report" in html
    assert html.count("data:image/png;base64") >= 5


def test_similarity_profile_and_plots(run, tmp_path):
    params, x, _ = run
    sims = layer_similarity_profile(params["backbone"], x, CFG)
    assert sims.shape == (CFG.num_layers, 4, CFG.num_patches)
    assert np.isfinite(sims).all() and np.abs(sims).max() <= 1.001
    p = plot_similarity_distributions(sims, str(tmp_path / "cs.png"))
    assert os.path.getsize(p) > 1000
    p = plot_training_curves(
        {"run_a": {"accuracy": [0.5, 0.6, 0.7], "loss": [2.0, 1.5, 1.2]}},
        str(tmp_path / "train.png"),
    )
    assert os.path.getsize(p) > 1000


def test_inference_report_class_names_and_batch_table(run, tmp_path):
    """V6 parity: class-name display + multi-image batch summary + top-5."""
    from vit_pruning_tpu.data.cifar100_labels import CIFAR100_FINE_LABELS

    _, x, out = run
    imgs = [np.asarray(xi).transpose(1, 2, 0) for xi in x]
    logits = np.asarray(out["logits"])
    names = CIFAR100_FINE_LABELS[: logits.shape[-1]]
    path = inference_report(
        imgs, np.asarray(out["keep_masks"]), logits, CFG.patch_size,
        class_names=names, out_path=str(tmp_path / "report.html"),
    )
    html = open(path).read()
    assert "Batch inference summary" in html
    assert "Top-5:" in html
    preds = logits.argmax(-1)
    for p in preds:
        assert names[p] in html
    assert "mean skip" in html
