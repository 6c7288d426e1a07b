"""Sharding rules: which param axes map to which mesh axes.

Megatron-style tensor parallelism for the transformer blocks:
  * QKV projections column-parallel (output dim = heads sharded over 'model')
  * attention output projection row-parallel (input dim sharded)
  * MLP fc1 column-parallel, fc2 row-parallel
  * embeddings / layernorms / predictor heads replicated (tiny)
  * classifier column-parallel over labels
Batch is sharded over 'data'. XLA inserts the psum/reduce-scatter collectives
from these annotations — nothing manual.

Layer params are stacked with a leading [L] axis (models/vit.py), so every
layer rule gets a leading None.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _layer_pspecs() -> dict:
    col = {"w": P(None, None, "model"), "b": P(None, "model")}   # leading L axis
    row = {"w": P(None, "model", None), "b": P(None)}
    ln = {"g": P(None), "b": P(None)}
    return {
        "ln1": ln,
        "attn": {"q": col, "k": col, "v": col, "o": row},
        "ln2": dict(ln),
        "mlp": {"fc1": dict(col), "fc2": dict(row)},
    }


def param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree matching a pruned-ViT param tree
    ({'backbone':..., 'predictor':...}) or a bare backbone tree."""

    def replicate(tree):
        return jax.tree.map(lambda _: P(), tree)

    def backbone_specs(bb):
        return {
            "embed": replicate(bb["embed"]),
            "layers": _layer_pspecs(),
            "ln_f": replicate(bb["ln_f"]),
            "head": {"w": P(None, "model"), "b": P("model")},
        }

    if "backbone" in params:
        specs = {"backbone": backbone_specs(params["backbone"])}
        for k in params:
            if k != "backbone":
                specs[k] = replicate(params[k])  # predictor / updatenet: tiny
        return specs
    return backbone_specs(params)


def batch_pspecs() -> dict:
    return {"pixel_values": P("data"), "labels": P("data")}


def _named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def _divisible(arr, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else axis
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if arr.shape[dim] % size != 0:
            return False
    return True


def resolve_pspecs(params: dict, mesh: Mesh) -> dict:
    """param_pspecs with replication fallback for any leaf whose dims don't
    divide the mesh axes (e.g. a 10-class head on a 4-way model axis)."""
    return jax.tree.map(
        lambda a, s: s if _divisible(a, s, mesh) else P(),
        params,
        param_pspecs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put the param tree with tensor-parallel shardings."""
    return jax.device_put(params, _named(mesh, resolve_pspecs(params, mesh)))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a batch with data-parallel sharding."""
    return jax.device_put(batch, _named(mesh, batch_pspecs()))
