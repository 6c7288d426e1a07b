"""Worked example: train a cls_mlp skip predictor, evaluate, visualize.

The hi_main.py flow (phase 1 predictor training against the similarity
oracle, phase 2 backbone fine-tune) on a small config. Runs anywhere
(CPU-friendly sizes); swap in `vit_base_patch16_224()` + CIFAR-100 data +
an HF checkpoint for the full reproduction:

    python examples/train_skip_predictor.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vit_pruning_tpu.configs import PruneConfig, vit_tiny
from vit_pruning_tpu.checkpoint import BestCheckpoint
from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params, pruned_vit_forward
from vit_pruning_tpu.train.harness import evaluate, phased_train
from vit_pruning_tpu.utils.run_logging import RunLogger, append_stats, encode_run_name
from vit_pruning_tpu.viz import skipped_heatmaps, skips_per_layer_chart


def main():
    config = vit_tiny(num_labels=10)
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle",
                       sim_threshold=0.9, mlp_threshold=0.5)

    run_name = encode_run_name(
        "example", "both", "mask-cls_mlp", ["cosine", "classification"],
        [1e-3, 1e-5], pcfg.sim_threshold, pcfg.mlp_threshold, 0.0, 16, 128, 64,
    )
    log = RunLogger(run_name, log_dir="logs")

    images, labels = synthetic_dataset(n=128, image_size=config.image_size,
                                       num_labels=10, seed=0)
    timages, tlabels = synthetic_dataset(n=64, image_size=config.image_size,
                                         num_labels=10, seed=1)
    train_b = Batches(images, labels, batch_size=16, image_size=config.image_size,
                      shuffle=True)
    test_b = Batches(timages, tlabels, batch_size=16, image_size=config.image_size)

    params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
    best = BestCheckpoint("models", run_name)

    params = phased_train(
        params, train_b, test_b, config, pcfg,
        train_type="both", num_epochs=(2, 1), lrs=(1e-3, 1e-5),
        log=log, best=best,
    )

    accuracy, mlp_accuracy, acc = evaluate(
        params, test_b, config, pcfg, full_testing=True, log=log
    )
    append_stats("stats.csv", run_name, accuracy, mlp_accuracy)

    # visualization artifacts
    batch = next(iter(test_b))
    out = pruned_vit_forward(params, batch["pixel_values"], config, pcfg,
                             compute_oracle=True, rng=jax.random.PRNGKey(0))
    skipped_heatmaps(out["keep_masks"], "viz_out/skipped_heatmaps")
    skips_per_layer_chart(out["keep_masks"], "viz_out/skips_per_layer.png")
    log(f"done: accuracy={accuracy:.2%} predictor-accuracy={mlp_accuracy:.2%}")


if __name__ == "__main__":
    main()
