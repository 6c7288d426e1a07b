"""Turnkey reproduction of the reference's headline CIFAR-100 experiment
(VERDICT r3 #4): the exact hi_main.py recipe — ViT-B/16 @224 from a
pretrained checkpoint, phase 1 'cosine' (predictor, lr 1e-3, 10 epochs),
phase 2 'classification' (backbone, lr 1e-5, 10 epochs), thresholds
st=0.9 / mt=0.5 / at=0 — with the reference's accuracy anchors asserted:
dense 89.85% at start, best pruned 88.91% (stats ledger
/root/reference/himanshu/stats.csv:12, hi_main.py:190 docstring; recipe
constants hi_main.py:88-108, phase dispatch :161-168).

This environment has zero egress and no CIFAR-100/checkpoint on disk, so
the full run cannot execute here — but the day data appears, ONE command
settles the north-star accuracy clause:

    python scripts/reproduce_reference.py \
        --data_path /path/with/cifar-100-python \
        --torch_checkpoint Ahmed9275/Vit-Cifar100 \
        --assert_anchors

Until then, `--fixture` rehearses the IDENTICAL flow end-to-end on the TPU
at the full model geometry (ViT-B/16 @224, random backbone) against a
locally synthesized CIFAR-100-FORMAT dataset (same pickle layout, same
loader), with shortened phases — proving every pipeline stage (pickle
loader, 32->224 preprocessing, weight surgery path, phased trainer,
full_testing eval, stats.csv append) executes at the real scale:

    python scripts/reproduce_reference.py --fixture --log_dir runs/reproduce_fixture
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reference anchors per dataset:
#   cifar100 — himanshu/stats.csv:12, hi_main.py:190 docstring
#   imagenet_folder — the reference's ImageNet-1k-val ImageFolder runs
#     (H5 loader, main_model_utils.py:64-95; logs
#     2025-04-30_14-45-30_no_mlp_imagenet_*.txt best dense 82.45%,
#     2025-04-30_12-04-10_mlp_full_imagenet_*.txt best pruned 80.16%)
ANCHORS = {
    "cifar100": (0.8985, 0.8891),
    "imagenet_folder": (0.8245, 0.8016),
}


def make_cifar100_fixture(root: str, n_train: int, n_test: int) -> str:
    """Synthesize a dataset in the EXACT cifar-100-python pickle layout
    (b'data' uint8 [N, 3072] CHW-flat + b'fine_labels'), 100 classes at
    32x32, from the quality gate's non-saturating localized task — so the
    rehearsal exercises the real loader byte-for-byte."""
    from vit_pruning_tpu.data.datasets import synthetic_localized_dataset

    base = os.path.join(root, "cifar-100-python")
    os.makedirs(base, exist_ok=True)
    for name, n, seed in (("train", n_train, 0), ("test", n_test, 1)):
        images, labels = synthetic_localized_dataset(
            n, image_size=32, num_labels=100, seed=seed, label_noise=0.1,
            signal_patches=8, cell=4)
        flat = images.transpose(0, 3, 1, 2).reshape(n, -1)  # HWC -> CHW flat
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump({b"data": flat, b"fine_labels": labels.tolist()}, f)
    return root


def make_imagefolder_fixture(root: str, n_train: int, n_test: int,
                             num_labels: int = 100) -> str:
    """Synthesize a class-per-subdirectory image tree in the EXACT layout
    the reference's ImageNet-val/TinyImageNet runs consume (ImageFolder,
    main_model_utils.py:64-95): <root>/{train,val}/<class>/<img>.png at
    64x64 (the TinyImageNet decode size, so the rehearsal also exercises
    the native batch resampler's uniform-shape fast path). Content comes
    from the quality gate's non-saturating localized task."""
    from PIL import Image

    from vit_pruning_tpu.data.datasets import synthetic_localized_dataset

    for split, n, seed in (("train", n_train, 0), ("val", n_test, 1)):
        images, labels = synthetic_localized_dataset(
            n, image_size=64, num_labels=num_labels, seed=seed,
            label_noise=0.1, signal_patches=8, cell=8)
        for i in range(n):
            cdir = os.path.join(root, split, f"class_{labels[i]:04d}")
            os.makedirs(cdir, exist_ok=True)
            Image.fromarray(images[i]).save(
                os.path.join(cdir, f"img_{i:06d}.png"))
    return root


def load_backbone(args, config, pcfg):
    """Initial weights exactly like the reference (hi_main.py:122-137):
    pretrained HF checkpoint with 'vit.'-prefix surgery and strict=False
    semantics (predictor heads + classifier start random when absent)."""
    import jax

    from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params

    params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
    src = args.torch_checkpoint
    if not src:
        return params, "random init (no --torch_checkpoint; fixture rehearsal)"
    from vit_pruning_tpu.models.convert import (
        load_hf_vit,
        strip_prefix,
        torch_state_dict_to_params,
    )

    if os.path.isfile(src) and src.endswith((".pth", ".pt", ".bin")):
        import torch

        sd = torch.load(src, map_location="cpu")
        sd = sd.get("state_dict", sd)
        params["backbone"] = torch_state_dict_to_params(
            strip_prefix(sd), config)
        return params, f"torch state_dict {src}"
    # HF hub name or local HF directory (e.g. Ahmed9275/Vit-Cifar100)
    params["backbone"], _ = load_hf_vit(src, config)
    return params, f"HF checkpoint {src}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default=None,
                    help="dir containing cifar-100-python/ (cifar100) or "
                    "train/ + val/ class subtrees (imagenet_folder)")
    ap.add_argument("--dataset", choices=["cifar100", "imagenet_folder"],
                    default="cifar100",
                    help="which reference dataset flow to run: the CIFAR-100 "
                    "pickle loader (hi_main.py:48-53 recipe, anchors "
                    "89.85/88.91) or the ImageNet-val/TinyImageNet "
                    "ImageFolder loader (H5, main_model_utils.py:64-95, "
                    "anchors 82.45/80.16 with google/vit-base-patch16-224)")
    ap.add_argument("--torch_checkpoint", default=None,
                    help="pretrained weights: HF name/dir (Ahmed9275/"
                    "Vit-Cifar100) or a .pth state_dict")
    ap.add_argument("--fixture", action="store_true",
                    help="synthesize a CIFAR-100-format fixture and rehearse "
                    "the identical flow at full ViT-B/16 @224 geometry")
    ap.add_argument("--assert_anchors", action="store_true",
                    help="assert the reference anchors: dense start >= "
                    "89.85%% - tol, final pruned >= 88.91%% - tol")
    ap.add_argument("--anchor_tol", type=float, default=0.005)
    # reference recipe constants (hi_main.py:88-108) — overridable for the
    # fixture rehearsal only
    ap.add_argument("--epochs", type=int, nargs=2, default=[10, 10])
    ap.add_argument("--lrs", type=float, nargs=2, default=[1e-3, 1e-5])
    ap.add_argument("--train_batch", type=int, default=32)
    ap.add_argument("--test_batch", type=int, default=128)
    ap.add_argument("--train_size", type=int, default=None)
    ap.add_argument("--test_size", type=int, default=None)
    ap.add_argument("--sim_threshold", type=float, default=0.9)
    ap.add_argument("--mlp_threshold", type=float, default=0.5)
    ap.add_argument("--avg_threshold", type=float, default=0.0)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 mixed-precision phases (fp32 master params); "
                    "the reference trains fp32 — use for wall-clock only")
    ap.add_argument("--log_dir", default=None,
                    help="tee output to <log_dir>/<run-name>.txt (the "
                    "reference's logs/ convention)")
    ap.add_argument("--stats_csv", default="stats.csv")
    args = ap.parse_args(argv)

    if not args.fixture and not args.data_path:
        ap.error("need --data_path (real run) or --fixture (rehearsal)")
    anchor_dense, anchor_pruned = ANCHORS[args.dataset]
    if args.fixture:
        if args.data_path is None:
            args.data_path = f"/tmp/reproduce_fixture_data_{args.dataset}"
        if args.dataset == "cifar100":
            if not os.path.isdir(
                    os.path.join(args.data_path, "cifar-100-python")):
                print("synthesizing CIFAR-100-format fixture…", flush=True)
                make_cifar100_fixture(args.data_path, n_train=2048, n_test=512)
        else:
            if not os.path.isdir(os.path.join(args.data_path, "train")):
                print("synthesizing ImageFolder fixture…", flush=True)
                make_imagefolder_fixture(args.data_path,
                                         n_train=2048, n_test=512)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vit_pruning_tpu.checkpoint import BestCheckpoint
    from vit_pruning_tpu.configs import PruneConfig, vit_base_patch16_224
    from vit_pruning_tpu.data.datasets import (
        DeviceBatches,
        load_cifar100,
        load_image_folder,
    )
    from vit_pruning_tpu.train.harness import evaluate, phased_train
    from vit_pruning_tpu.utils.run_logging import (
        RunLogger,
        append_stats,
        encode_run_name,
    )

    if args.dataset == "cifar100":
        tr = load_cifar100(args.data_path, train=True, size=args.train_size)
        te = load_cifar100(args.data_path, train=False, size=args.test_size)
        num_labels = 100
    else:
        # the reference's ImageFolder flow (H5): one class per subdirectory,
        # decode + resize to 224 host-side (TinyImageNetDataset semantics)
        tr = load_image_folder(args.data_path, split="train",
                               size=args.train_size)
        te = load_image_folder(args.data_path, split="val",
                               size=args.test_size)
        num_labels = int(max(int(tr[1].max()), int(te[1].max())) + 1)

    config = vit_base_patch16_224(num_labels=num_labels)
    pcfg = PruneConfig(
        mode="mask", predictor="cls_mlp", loss="bce_oracle",
        sim_threshold=args.sim_threshold, mlp_threshold=args.mlp_threshold,
        avg_threshold=args.avg_threshold,
    )

    run_name = encode_run_name(
        model_desc="reproduce_reference_" + args.dataset
        + ("_fixture" if args.fixture else ""),
        train_type="both", variant="vit_pruning_tpu",
        loss_types=("cosine", "classification"),
        lrs=tuple(args.lrs), sim_threshold=args.sim_threshold,
        mlp_threshold=args.mlp_threshold, avg_threshold=args.avg_threshold,
        batch_size=args.train_batch, train_size=args.train_size,
        test_size=args.test_size,
    )
    logger = RunLogger(run_name, log_dir=args.log_dir) if args.log_dir else print
    log = (lambda s: logger(str(s)))
    log(f"run: {run_name}")
    log(f"devices: {jax.devices()}")

    log(f"data ({args.dataset}): {len(tr[1])} train / {len(te[1])} test "
        f"({num_labels} classes) from {args.data_path}")
    train_b = DeviceBatches(*tr, batch_size=args.train_batch, image_size=224,
                            shuffle=True, seed=42)
    test_b = DeviceBatches(*te, batch_size=args.test_batch, image_size=224)

    params, src = load_backbone(args, config, pcfg)
    log(f"backbone: {src}")

    import jax.numpy as jnp

    # dense baseline at start — the reference's 'Test accuracy at starting'
    # with st high enough that nothing skips == the 89.85% anchor when the
    # Ahmed9275 checkpoint is loaded
    t0 = time.time()
    dense_acc, _, _ = evaluate(
        params, test_b, config, PruneConfig(mode="none", predictor="none"),
        full_testing=False)
    log(f"dense top-1 at start: {dense_acc:.4f} ({time.time() - t0:.0f}s) "
        f"[anchor {anchor_dense:.4f} with the reference checkpoint]")
    if args.assert_anchors:
        assert dense_acc >= anchor_dense - args.anchor_tol, (
            f"dense start {dense_acc:.4f} below anchor "
            f"{anchor_dense:.4f} - {args.anchor_tol}")

    best = BestCheckpoint()
    params = phased_train(
        params, train_b, test_b, config, pcfg,
        train_type="both", loss_types=("cosine", "classification"),
        num_epochs=tuple(args.epochs), lrs=tuple(args.lrs),
        log=log, best=best, full_testing=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )

    acc, mlp_acc, _ = evaluate(params, test_b, config, pcfg,
                               full_testing=True, log=log)
    log(f"final pruned top-1: {acc:.4f}, predictor-vs-oracle: {mlp_acc:.4f} "
        f"[anchor {anchor_pruned:.4f}]")
    append_stats(args.stats_csv, run_name, acc, mlp_acc)
    if args.assert_anchors:
        assert acc >= anchor_pruned - args.anchor_tol, (
            f"final pruned {acc:.4f} below anchor {anchor_pruned:.4f} - "
            f"{args.anchor_tol}")
        log("ANCHORS PASS")
    print(json.dumps({
        "run": run_name, "dataset": args.dataset,
        "dense_top1_start": round(float(dense_acc), 4),
        "pruned_top1": round(float(acc), 4),
        "mlp_accuracy": round(float(mlp_acc), 4),
        "fixture": bool(args.fixture),
        "anchors_asserted": bool(args.assert_anchors),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
