"""Accuracy-delta quality gate (SURVEY §7 step 8).

Trains a dense baseline and a 50%-skip pruned model on the same (synthetic,
deterministic) dataset, then reports top-1 delta, predictor-vs-oracle
accuracy, and measured skip ratio. Gate: pruned top-1 within --max_drop of
dense. With real data (CIFAR-100 under --data_path) the same flow reproduces
the reference's quality anchor (89.85% dense / 88.91% pruned, BASELINE.md).

Prints one JSON line on stdout; detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.data.datasets import Batches, load_cifar100, synthetic_dataset
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params
from vit_pruning_tpu.train.harness import evaluate, phased_train


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", type=float, default=0.5)
    ap.add_argument("--max_drop", type=float, default=0.005)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--train_size", type=int, default=1024)
    ap.add_argument("--test_size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--data_path", default=None, help="CIFAR-100 dir (else synthetic)")
    args = ap.parse_args()

    config = ViTConfig(
        image_size=32, patch_size=4, hidden_size=128, num_layers=6,
        num_heads=4, mlp_dim=256, num_labels=10,
    )  # 64 patches; big enough for pruning to matter, small enough to train fast

    if args.data_path:
        config = config.replace(num_labels=100)
        tr = load_cifar100(args.data_path, train=True, size=args.train_size)
        te = load_cifar100(args.data_path, train=False, size=args.test_size)
    else:
        tr = synthetic_dataset(args.train_size, config.image_size, config.num_labels, seed=0)
        te = synthetic_dataset(args.test_size, config.image_size, config.num_labels, seed=1)
    train_b = Batches(*tr, batch_size=args.batch, image_size=config.image_size,
                      shuffle=True, seed=42)
    test_b = Batches(*te, batch_size=args.batch, image_size=config.image_size)

    k = max(1, int(round(config.num_patches * (1.0 - args.skip))))

    def run(pcfg, train_type):
        params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
        params = phased_train(
            params, train_b, test_b, config, pcfg,
            train_type=train_type,
            num_epochs=(args.epochs, args.epochs), lrs=(1e-3, 1e-3),
            full_testing=pcfg.mode != "none",
        )
        acc, mlp_acc, a = evaluate(
            params, test_b, config, pcfg, full_testing=pcfg.mode != "none"
        )
        return acc, mlp_acc, a

    log("training dense baseline…")
    dense_acc, _, _ = run(PruneConfig(mode="none", predictor="none"), "vit")

    log("training pruned model (50% top-k)…")
    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", loss="bce_oracle", top_k=k)
    pruned_acc, mlp_acc, a = run(pcfg, "both")

    drop = dense_acc - pruned_acc
    result = {
        "metric": f"top1_delta_at_{int(args.skip * 100)}pct_skip",
        "dense_top1": round(dense_acc, 4),
        "pruned_top1": round(pruned_acc, 4),
        "delta": round(drop, 4),
        "predictor_accuracy": round(mlp_acc, 4),
        "measured_skip": round(float(a.measured_skip_per_layer.mean()), 4),
        "gate_max_drop": args.max_drop,
        "pass": bool(drop <= args.max_drop),
        "dataset": "cifar100" if args.data_path else "synthetic",
    }
    log(result)
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
