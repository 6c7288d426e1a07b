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


def opt_state_shardings(
    optimizer: optax.GradientTransformation, params_like: dict, params_sh, rep
):
    """Shardings for the optimizer state: Adam moments (and any other
    state tree that mirrors the params pytree) take the corresponding
    param's sharding; scalars (step counts, empty states) are replicated.

    Without this, `in_shardings=None` lets the compiler choose — plausibly
    replicating the moments of model-sharded params, which would multiply
    optimizer memory by the model-axis size.
    """
    from jax.tree_util import tree_flatten_with_path, tree_map_with_path

    flat = dict(tree_flatten_with_path(params_sh)[0])

    def params_mirroring(node):
        # a subtree whose dict paths mirror the params tree (Adam mu/nu);
        # masked holes contribute no leaves and need no sharding
        return tree_map_with_path(lambda path, _leaf: flat.get(path, rep), node)

    def rec(node):
        if isinstance(node, dict):
            if set(node) == set(params_like):
                return params_mirroring(node)
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "_fields"):  # namedtuple (optax states)
            return type(node)(*(rec(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        return rep

    return rec(jax.eval_shape(optimizer.init, params_like))


def _zero1_spec(arr, spec: P, mesh: Mesh) -> P:
    """ZeRO-1 moment spec: additionally shard over 'data' on the first
    unsharded axis that divides the data-axis size. Param specs that
    already use 'model' keep those placements (ZeRO composes with tp);
    leaves with no divisible axis stay at the param's sharding."""
    nd = mesh.shape.get("data", 1)
    if nd == 1:
        return spec
    entries = list(spec) + [None] * (arr.ndim - len(spec))
    for dim, axis in enumerate(entries):
        if axis is not None:
            continue
        if arr.shape[dim] >= nd and arr.shape[dim] % nd == 0:
            entries[dim] = "data"
            return P(*entries)
    return spec


def zero1_pspecs(params_like: dict, mesh: Mesh) -> dict:
    """Optimizer-moment PartitionSpecs for ZeRO-1: each param's resolved
    spec with 'data' added on a divisible axis (see _zero1_spec)."""
    resolved = resolve_pspecs(params_like, mesh)
    return jax.tree.map(
        lambda a, s: _zero1_spec(a, s, mesh), params_like, resolved,
        is_leaf=lambda x: isinstance(x, P),
    )


def _opt_shardings(optimizer, params_like: dict, mesh: Mesh, zero1: bool):
    params_sh = _named(mesh, resolve_pspecs(params_like, mesh))
    rep = NamedSharding(mesh, P())
    moment_sh = (_named(mesh, zero1_pspecs(params_like, mesh))
                 if zero1 else params_sh)
    return opt_state_shardings(optimizer, params_like, moment_sh, rep)


def init_sharded_opt_state(
    optimizer: optax.GradientTransformation, params: dict, mesh: Mesh,
    zero1: bool = False,
):
    """optimizer.init placed with the parallel step's opt-state shardings.

    Required for zero1=True: a plain optimizer.init(params) inherits the
    params' shardings (moments replicated where params are), which the
    zero1 step's in_shardings reject for committed arrays."""
    opt_sh = _opt_shardings(optimizer, params, mesh, zero1)
    return jax.jit(optimizer.init, out_shardings=opt_sh)(params)


def make_parallel_train_step(
    config: ViTConfig,
    pcfg: PruneConfig,
    loss_type: str,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params_like: dict,
    zero1: bool = False,
) -> Callable:
    """(params, opt_state, batch, rng) -> (params, opt_state, metrics),
    compiled once over the mesh. Callers shard params/batch with
    shard_params/shard_batch; opt_state inherits param shardings.

    zero1=True shards the Adam moments over the 'data' axis as well
    (ZeRO-1 via GSPMD: the moment shardings make XLA reduce-scatter the
    grads into per-shard updates and all-gather the applied params —
    optimizer memory drops ~data-axis-fold for replicated params with no
    manual collectives). The reference has no distributed training at all
    (SURVEY §2.4); this is the TPU-native scale-out of its single-GPU Adam
    fine-tune (himanshu/hi_main.py:161-168)."""
    params_sh = _named(mesh, resolve_pspecs(params_like, mesh))
    batch_sh = _named(mesh, batch_pspecs())
    rep = NamedSharding(mesh, P())
    # Adam moments explicitly co-sharded with their params (not left to the
    # compiler, which could replicate moments of model-sharded params);
    # under ZeRO-1 they additionally shard over 'data' — init the state
    # with init_sharded_opt_state(..., zero1=True) in that case
    opt_sh = _opt_shardings(optimizer, params_like, mesh, zero1)

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
        in_shardings=(params_sh, opt_sh, batch_sh, rep),
        out_shardings=(params_sh, opt_sh, None),
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


def make_parallel_serving_step(
    config: ViTConfig,
    pcfg: PruneConfig,
    mesh: Mesh,
    params_like: dict,
) -> Callable:
    """Scale-out deployment forward: uint8 [B, C, H, W] -> logits, batch-
    sharded over 'data' with the same Megatron param shardings as eval —
    serving scales over a slice exactly like the fine-tune path does (the
    reference has no multi-device story at all, SURVEY.md §2.4)."""
    from vit_pruning_tpu.serving import serving_forward

    params_sh = _named(mesh, resolve_pspecs(params_like, mesh))
    u8_sh = NamedSharding(mesh, P("data"))

    def step(params, pixels_u8):
        return serving_forward(params, pixels_u8, config, pcfg,
                               logits_only=True)["logits"]

    return jax.jit(step, in_shardings=(params_sh, u8_sh))
