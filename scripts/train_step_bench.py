"""Training-step wall-clock at the config5 geometry (VERDICT r3 #6): the
oracle-instrumented fine-tune step measured 541 ms vs 35 ms un-instrumented
in round 3 (RESULTS.md §Training) because every phase paid a per-layer dense
oracle pass and full backprop regardless of whether the phase's loss read
them. Round 4 split the work by phase:

  - 'classification' skips the oracle passes entirely
    (pruned_vit_forward(oracle=False) — the CE loss never read pred_loss);
  - 'cosine' trains predictors on a DETACHED trajectory (one instrumented
    no-AD forward caches layer inputs + targets; AD runs only through the
    score heads), update-equivalent to the generic step
    (tests/test_harness.py::test_detached_cosine_step_matches_generic).

Round 5 closes the last sliver (SURVEY §7 hard part d): the 'both'-loss
step used to compute the oracle's dense pass INSIDE the jax.checkpoint'd
layer, so the backward recomputed a full dense forward per layer for zero
gradient (every consumer stop-grads it). The oracle targets are now hoisted
outside the remat/AD scope (models/pruned_vit.py::_hoisted_oracle_targets):
'both' pays exactly one no-AD dense forward. This script measures the r4
structure (monkeypatched back in) against the r5 default, same run.

All phases measured old path vs new, same run, same batch — DeiT-S @224,
bs128, mask mode (scripts/config5_run.py geometry; reference anchor for the
double forward: himanshu/model_utils.py:95-101). Writes
scripts/train_step_bench.json.

    python scripts/train_step_bench.py
"""

import json
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
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params
from vit_pruning_tpu.train.harness import make_train_step, masked_adam


def time_step(step, params, opt_state, batch, iters=8, warmup=2):
    """ms/step. The step donates (params, opt_state), so each iteration
    chains the previous outputs (real training does the same); host-syncing
    a metric scalar per iteration is the only reliable fence on the axon
    relay (CLAUDE.md — block_until_ready doesn't synchronize here)."""
    p = jax.tree.map(jnp.asarray, params)
    o = jax.tree.map(jnp.asarray, opt_state)
    times = []
    for i in range(warmup + iters):
        rng = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        p, o, m = step(p, o, batch, rng)
        np.asarray(m["loss"])
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    return float(np.median(times)) * 1e3


def main():
    config = deit_small(num_labels=100)
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), config, pcfg)
    params_h = jax.tree.map(np.asarray, params)  # host copies (donation)
    x = np.random.RandomState(0).rand(128, 3, 224, 224).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 100, (128,))
    batch = {"pixel_values": jnp.asarray(x), "labels": jnp.asarray(y)}

    rows = []

    def run(name, loss_type, freeze, **kw):
        opt = masked_adam(params, freeze, lr=1e-4)
        step = make_train_step(config, pcfg, loss_type, opt, **kw)
        ostate = jax.tree.map(np.asarray, opt.init(params))
        ms = time_step(step, params_h, ostate, batch)
        row = {"phase": name, "ms_per_step": round(ms, 1),
               "img_per_sec": round(128e3 / ms, 1)}
        rows.append(row)
        print(row, flush=True)
        return ms

    # phase 1 (predictor, 'cosine', fp32 — the reference's recipe dtype)
    old_cos = run("cosine fp32 generic (r3 path)", "cosine", "mlp_train",
                  detach_cosine=False)
    new_cos = run("cosine fp32 detached (r4 default)", "cosine", "mlp_train")
    run("cosine bf16 detached", "cosine", "mlp_train",
        compute_dtype=jnp.bfloat16)

    # phase 2 (fine-tune, 'classification', bf16 + remat — config5 setting);
    # the r3 path forced the oracle's per-layer dense pass into this step
    # (541 ms recorded, RESULTS.md). Same-run instrumented CONTROL:
    # loss_type='both' keeps the oracle instrumentation in the forward (and
    # under remat, in the backward recompute) — a slight upper bound on the
    # r3 step (it also differentiates pred_loss; those grads are zeroed by
    # the vit_train freeze policy).
    # r4 control: force the oracle dense pass back INSIDE the remat'd layer
    # (the pre-r5 structure — the backward then recomputes a full dense
    # forward per layer for zero gradient)
    from vit_pruning_tpu.models import pruned_vit as _pv

    _hoist_orig = _pv._hoistable_oracle
    _pv._hoistable_oracle = lambda pcfg_: False
    try:
        old_ft = run("fine-tune bf16+remat instrumented 'both' (r4: oracle "
                     "inside remat)", "both", "vit_train",
                     compute_dtype=jnp.bfloat16, remat=True)
    finally:
        _pv._hoistable_oracle = _hoist_orig
    hoist_ft = run("fine-tune bf16+remat instrumented 'both' (r5: hoisted "
                   "oracle targets)", "both", "vit_train",
                   compute_dtype=jnp.bfloat16, remat=True)
    new_ft = run("fine-tune bf16+remat 'classification' (r4: oracle skipped)",
                 "classification", "vit_train",
                 compute_dtype=jnp.bfloat16, remat=True)
    run("fine-tune bf16 'classification' no remat", "classification",
        "vit_train", compute_dtype=jnp.bfloat16)

    out = {"model": "deit_small", "image_size": 224, "batch": 128,
           "prune_config": {"mode": pcfg.mode, "predictor": pcfg.predictor,
                            "loss": pcfg.loss},
           "devices": [str(d) for d in jax.devices()],
           "speedup_cosine": round(old_cos / new_cos, 2),
           "speedup_finetune_vs_instrumented": round(old_ft / new_ft, 2),
           "speedup_both_hoisted_vs_r4": round(old_ft / hoist_ft, 2),
           "both_overhead_vs_classification": round(hoist_ft / new_ft, 3),
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_step_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
