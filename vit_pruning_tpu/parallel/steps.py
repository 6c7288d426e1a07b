"""pjit'ed train/eval steps over a device mesh.

Data parallelism = batch sharding over 'data' (the fine-tune path's gradient
all-reduce emerges from sharding propagation — the TPU equivalent of the
all-reduce the reference never got to, SURVEY.md §2.4). Tensor parallelism =
the Megatron-style param shardings in sharding.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward
from vit_pruning_tpu.parallel.sharding import batch_pspecs, resolve_pspecs
from vit_pruning_tpu.train.harness import total_loss_fn


def _named(mesh, tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree, is_leaf=lambda x: isinstance(x, P)
    )


def make_parallel_train_step(
    config: ViTConfig,
    pcfg: PruneConfig,
    loss_type: str,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params_like: dict,
) -> Callable:
    """(params, opt_state, batch, rng) -> (params, opt_state, metrics),
    compiled once over the mesh. Callers shard params/batch with
    shard_params/shard_batch; opt_state inherits param shardings."""
    params_sh = _named(mesh, resolve_pspecs(params_like, mesh))
    # opt_state shardings are left to the compiler (None): Adam moments
    # mirror param shapes and get laid out with the params.
    batch_sh = _named(mesh, batch_pspecs())
    rep = NamedSharding(mesh, P())

    def step(params, opt_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: total_loss_fn(p, batch, config, pcfg, loss_type, rng),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(
        step,
        in_shardings=(params_sh, None, batch_sh, rep),
        out_shardings=(params_sh, None, None),
        donate_argnums=(0, 1),
    )


def make_parallel_eval_step(
    config: ViTConfig,
    pcfg: PruneConfig,
    mesh: Mesh,
    params_like: dict,
    full_testing: bool = False,
) -> Callable:
    params_sh = _named(mesh, resolve_pspecs(params_like, mesh))
    batch_sh = _named(mesh, batch_pspecs())

    def step(params, batch):
        out = pruned_vit_forward(
            params, batch["pixel_values"], config, pcfg,
            compute_oracle=full_testing, rng=jax.random.PRNGKey(0),
        )
        res = {
            "correct": (out["logits"].argmax(-1) == batch["labels"]).sum(),
            "keep_masks": out["keep_masks"],
        }
        if full_testing:
            res["confusion"] = out["aux"]["confusion"]
        return res

    return jax.jit(step, in_shardings=(params_sh, batch_sh))
