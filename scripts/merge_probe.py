"""Same-run TPU cost probe for PruneConfig.merge_dropped (ToMe-flavored
compaction) on the two flagship serving presets: headline (DeiT-S topk_prog
top_k=98) and composed (structured + deep schedule). Run on the real chip:

    python scripts/merge_probe.py

Prints ms/batch and img/s for merge on/off per preset on stderr.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import amortized, log, timeit


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vit_pruning_tpu.configs import (
        PruneConfig, composed_schedule, deit_small, ultra_schedule)
    from vit_pruning_tpu.models.pruned_vit import (
        init_pruned_vit_params, progressive_topk_forward)
    from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

    batch, inner, iters = 512, 8, 5
    config = deit_small(num_labels=100)
    n = config.num_patches
    params0 = init_pruned_vit_params(
        jax.random.PRNGKey(0), config,
        PruneConfig(mode="mask", predictor="cls_mlp"))
    xb = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224),
                           jnp.bfloat16)

    def run(tag, cfg, pcfg, params):
        fn = amortized(
            lambda p, v: progressive_topk_forward(
                p, v, cfg, pcfg, logits_only=True)["logits"], inner)
        t = timeit(fn, (params, xb), iters) / inner
        log(f"{tag}: {t * 1e3:.2f} ms/batch  {batch / t:.0f} img/s")
        return t

    # headline preset
    hp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params0)
    for merge in (False, True):
        pc = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                         loss="mse_attention", top_k=98, merge_dropped=merge)
        run(f"headline merge={merge}", config, pc, hp)

    # composed preset
    csched = composed_schedule(n, config.num_layers)
    bb, c_config = prune_heads(
        params0["backbone"], config,
        [list(range(0, config.num_heads, 2))] * config.num_layers)
    params0["backbone"] = prune_mlp_channels(
        bb, [list(range(0, config.mlp_dim, 2))] * config.num_layers)
    cp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params0)
    for merge in (False, True):
        pc = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                         loss="mse_attention", top_k=csched[0],
                         keep_schedule=csched, merge_dropped=merge)
        run(f"composed merge={merge}", c_config, pc, cp)

    # ultra preset (same structural pruning, ~halved live token counts —
    # the schedule merge_dropped is meant to make accuracy-viable)
    usched = ultra_schedule(n, config.num_layers)
    for merge in (False, True):
        pc = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                         loss="mse_attention", top_k=usched[0],
                         keep_schedule=usched, merge_dropped=merge)
        run(f"ultra merge={merge}", c_config, pc, cp)


if __name__ == "__main__":
    main()
