"""CLI driver: smoke train -> checkpoint sidecar -> eval rebuilds the model."""

import json
import os

from vit_pruning_tpu.cli import main


def test_train_eval_roundtrip_with_config_sidecar(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "-d", "smoke_cli", "--preset", "smoke", "--quiet",
        "--models_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--csv_path", str(tmp_path / "stats.csv"),
    ])
    assert rc == 0
    models = [p for p in (tmp_path / "models").iterdir() if p.is_dir()]
    assert len(models) == 1
    sidecar = str(models[0]) + ".config.json"
    assert os.path.exists(sidecar)
    d = json.loads(open(sidecar).read())
    assert "vit" in d and "prune" in d

    # eval must rebuild the trained config from the sidecar even when the
    # --model flag disagrees (the advisor's num_labels-mismatch scenario)
    rc = main([
        "eval", "--checkpoint", str(models[0]), "--model", "vit_base",
        "--dataset", "synthetic", "--test_batch_size", "16",
    ])
    assert rc == 0


def test_export_checkpoint_to_torch(tmp_path, monkeypatch):
    """export: trained checkpoint -> HF torch state_dict that a matching
    ViTForImageClassification loads with strict=True."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "-d", "export_cli", "--preset", "smoke", "--quiet",
        "--models_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--csv_path", str(tmp_path / "stats.csv"),
    ])
    assert rc == 0
    ckpt = [p for p in (tmp_path / "models").iterdir() if p.is_dir()][0]
    out = tmp_path / "export" / "backbone.pth"
    rc = main(["export", "--checkpoint", str(ckpt), "--out", str(out)])
    assert rc == 0

    side = json.loads(open(str(ckpt) + ".config.json").read())["vit"]
    if isinstance(side, str):  # sidecar stores the dataclass's JSON string
        side = json.loads(side)
    hf = ViTForImageClassification(HFViTConfig(
        image_size=side["image_size"], patch_size=side["patch_size"],
        hidden_size=side["hidden_size"], num_hidden_layers=side["num_layers"],
        num_attention_heads=side["num_heads"], intermediate_size=side["mlp_dim"],
        num_labels=side["num_labels"],
    ))
    missing, unexpected = hf.load_state_dict(torch.load(out), strict=True)
    assert not missing and not unexpected


def test_per_layer_lr_scales_flag(tmp_path, monkeypatch):
    """M19 per-predictor lrs are reachable from the driver (VERDICT r2 #6)."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "-d", "m19_cli", "--preset", "smoke", "--quiet",
        "--train_type", "mlp", "--num_epochs", "1", "1",
        "--per_layer_lr_scales", "1.0", "0.5", "2.0",   # vit_tiny: 3 layers
        "--mask_budget", "8",
        "--models_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--csv_path", str(tmp_path / "stats.csv"),
    ])
    assert rc == 0
    # wrong count is a hard error, not a silent broadcast
    import pytest

    with pytest.raises(SystemExit):
        main([
            "train", "-d", "m19_bad", "--preset", "smoke", "--quiet",
            "--per_layer_lr_scales", "1.0",
            "--models_dir", str(tmp_path / "models"),
            "--log_dir", str(tmp_path / "logs"),
        ])
