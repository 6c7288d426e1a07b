"""BASELINE config 5: end-to-end phased training of DeiT-S on the TPU.

Phase 1 (predictor, 'cosine') then phase 2 (bf16 fine-tune with remat,
'classification'), with per-epoch blackout mask dumps (V9) and exact resume
exercised: phase 1 runs 1 epoch, is interrupted, and resumes into epoch 2
from the state checkpoint. Artifacts land in runs/config5/.

Reproducible command:  python scripts/config5_run.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_pruning_tpu.configs import PruneConfig, deit_small
from vit_pruning_tpu.data.datasets import Batches, synthetic_localized_dataset
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params
from vit_pruning_tpu.train.harness import evaluate, train

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "runs", "config5")


def main():
    os.makedirs(OUT, exist_ok=True)
    logf = open(os.path.join(OUT, "log.txt"), "w")

    def log(s):
        print(s, file=sys.stderr, flush=True)
        print(s, file=logf, flush=True)

    config = deit_small(num_labels=100)
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle")
    tr = synthetic_localized_dataset(2048, config.image_size, 100, seed=0, cell=16)
    te = synthetic_localized_dataset(512, config.image_size, 100, seed=1, cell=16)
    train_b = Batches(*tr, batch_size=128, image_size=config.image_size,
                      shuffle=True, seed=42)
    test_b = Batches(*te, batch_size=128, image_size=config.image_size)

    params = init_pruned_vit_params(jax.random.PRNGKey(42), config, pcfg)
    log(f"devices: {jax.devices()}")

    # --- phase 1: predictor ('cosine'), fp32, with resume exercised ---------
    t0 = time.time()
    params1 = train(
        jax.tree.map(lambda a: a.copy(), params), train_b, test_b, config, pcfg,
        num_epochs=1, loss_type="cosine", lr=1e-3, log=log, full_testing=True,
        state_dir=os.path.join(OUT, "state"),
    )
    log(f"phase-1 epoch 1 done in {time.time() - t0:.1f}s; resuming for epoch 2…")
    params = train(
        jax.tree.map(lambda a: a.copy(), params), train_b, test_b, config, pcfg,
        num_epochs=2, loss_type="cosine", lr=1e-3, log=log, full_testing=True,
        state_dir=os.path.join(OUT, "state"),  # resumes from epoch 1 state
        viz_dir=os.path.join(OUT, "viz"),
    )
    del params1

    # --- phase 2: bf16 fine-tune with remat ---------------------------------
    t0 = time.time()
    params = train(
        params, train_b, test_b, config, pcfg,
        num_epochs=2, loss_type="classification", lr=1e-4, log=log,
        full_testing=True, compute_dtype=jnp.bfloat16, remat=True,
        state_dir=os.path.join(OUT, "state_ft"),
        viz_dir=os.path.join(OUT, "viz"),
    )
    log(f"phase-2 (bf16+remat) done in {time.time() - t0:.1f}s")

    acc, mlp_acc, a = evaluate(params, test_b, config, pcfg, full_testing=True, log=log)
    log(f"final: top1={acc:.4f} mlp_acc={mlp_acc:.4f} "
        f"skip={float(a.measured_skip_per_layer.mean()):.3f}")
    logf.close()


if __name__ == "__main__":
    main()
