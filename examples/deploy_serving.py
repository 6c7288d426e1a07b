"""Worked example: the deployment serving path, end to end.

Takes a (trained) model and serves raw uint8 images through the fastest
configuration this framework offers:

  1. uint8 pixels -> fused Pallas embed kernel (4x less host->device traffic
     than float32; `serving.serving_forward`);
  2. progressive top-k compaction (the sequence physically shrinks per the
     keep schedule — the >=3x composed configuration);
  3. optionally int8 weight matmuls (`set_serving_quant('int8')`), whose
     accuracy delta quality.py gates.

Runs anywhere (CPU-friendly sizes; kernels fall back to the jnp reference
off-TPU):

    python examples/deploy_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, vit_tiny
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params
from vit_pruning_tpu.ops.dispatch import quant_mode
from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels
from vit_pruning_tpu.serving import serving_forward


def main():
    config = vit_tiny(num_labels=100)
    n = config.num_patches  # 196
    # composed preset: structured halving + deep token schedule
    from vit_pruning_tpu.configs import composed_schedule

    schedule = composed_schedule(n, config.num_layers)
    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       loss="mse_attention", top_k=schedule[0],
                       keep_schedule=schedule)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), config, pcfg)
    # in deployment: params = restore_checkpoint(...) / convert_torch_state_dict(...)
    bb, served_config = prune_heads(
        params["backbone"], config,
        [list(range(0, config.num_heads, 2))] * config.num_layers)
    params["backbone"] = prune_mlp_channels(
        bb, [list(range(0, config.mlp_dim, 2))] * config.num_layers)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    images = np.random.RandomState(0).randint(
        0, 256, (8, 3, config.image_size, config.image_size), np.uint8)

    interpret = jax.default_backend() == "cpu"  # Pallas interpret mode off-TPU

    fn = jax.jit(lambda p, x: serving_forward(
        p, x, served_config, pcfg, interpret=interpret)["logits"])
    logits = fn(params, jnp.asarray(images))
    print("bf16 serving logits:", logits.shape, logits.dtype)

    with quant_mode("int8"):
        fn8 = jax.jit(lambda p, x: serving_forward(
            p, x, served_config, pcfg, interpret=interpret)["logits"])
        logits8 = fn8(params, jnp.asarray(images))
    drift = float(jnp.linalg.norm(logits8.astype(jnp.float32) - logits.astype(jnp.float32))
                  / jnp.linalg.norm(logits.astype(jnp.float32)))
    print(f"int8 serving logits: {logits8.shape}; relative drift {drift:.4f}")
    agree = float((logits8.argmax(-1) == logits.argmax(-1)).mean())
    print(f"argmax agreement bf16 vs int8: {agree:.2%}")

    # 4. stage the whole program out as a StableHLO artifact: the serve-time
    #    host needs no model code, only jax.export.deserialize + the weights
    from vit_pruning_tpu.serving import export_serving, load_exported

    art = "/tmp/vit_serving.stablehlo"
    export_serving(params, served_config, pcfg, batch_size=8, path=art,
                   interpret=interpret)
    exported_logits = load_exported(art)(params, jnp.asarray(images))
    print(f"exported artifact {art}: bit-identical =",
          bool((exported_logits == logits).all()))


if __name__ == "__main__":
    main()
