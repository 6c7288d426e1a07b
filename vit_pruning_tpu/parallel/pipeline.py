"""Pipeline parallelism over encoder layers (GPipe schedule, shard_map +
ppermute over a 'stage' mesh axis).

The reference has no distributed execution at all (SURVEY §2.4), and ViT-B
fits comfortably on one chip — pipeline parallelism is NOT needed for the
reference workload. This module exists so the framework's parallel surface
covers the standard axes (dp via batch sharding, tp via Megatron shardings
in parallel/sharding.py, pp here): larger models scale without a redesign.

Design: the [L, ...] stacked layer weights are sharded on their leading
(layer) axis across `stage` devices — each device holds L/stages contiguous
layers. Microbatches stream through the classic GPipe schedule: at step t,
stage s processes microbatch (t - s); activations hop stage->stage+1 via
`lax.ppermute` over ICI. Total steps = microbatches + stages - 1; bubble
fraction = (stages-1)/(microbatches+stages-1).

Everything is a single compiled XLA program: the schedule is a
`lax.fori_loop`, stage identity comes from `lax.axis_index`, and the
hop is one collective-permute per step — the canonical TPU pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vit_pruning_tpu.configs import ViTConfig
from vit_pruning_tpu.models.vit import _layer_slice, embed, layer_norm, vit_layer


def make_stage_mesh(stages: int, data: int = 1, devices=None) -> Mesh:
    """('stage',) mesh, or ('stage', 'data') when data > 1 — pipeline
    composed with batch data parallelism (each stage row holds `data`
    devices that split every microbatch)."""
    devices = list(devices if devices is not None else jax.devices())
    n = stages * data
    if n > len(devices):
        raise ValueError(f"pipeline mesh {stages}x{data} needs {n} devices, "
                         f"have {len(devices)}")
    if data == 1:
        arr = mesh_utils.create_device_mesh((stages,), devices=devices[:n])
        return Mesh(arr, ("stage",))
    arr = mesh_utils.create_device_mesh((stages, data), devices=devices[:n])
    return Mesh(arr, ("stage", "data"))


def pipeline_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    mesh: Mesh,
    num_microbatches: int = 4,
) -> jnp.ndarray:
    """Dense ViT forward with encoder layers pipelined across mesh('stage').

    Returns logits [B, num_labels]. num_microbatches must divide B.
    Embed and the classifier head run replicated (they are a tiny fraction
    of the FLOPs); only the L encoder layers are staged.
    """
    stages = mesh.shape["stage"]
    L = config.num_layers
    if L % stages:
        raise ValueError(f"{L} layers do not split into {stages} equal stages")
    per_stage = L // stages
    b = pixel_values.shape[0]
    if b % num_microbatches:
        raise ValueError(f"batch {b} not divisible by {num_microbatches} microbatches")
    mb = b // num_microbatches

    x = embed(pixel_values, params["embed"], config)  # [B, S, D] replicated
    s_len, d = x.shape[1], x.shape[2]
    mbs = x.reshape(num_microbatches, mb, s_len, d)

    layers = params["layers"]  # stacked [L, ...]

    # pp x dp composition: with a ('stage','data') mesh each microbatch is
    # additionally batch-sharded over 'data'; the stage hop (ppermute) and
    # the final broadcast (psum) name only 'stage', so data shards pipeline
    # independently side by side
    has_data = "data" in mesh.axis_names
    mb_spec = P(None, "data") if has_data else P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("stage"), mb_spec),
        out_specs=mb_spec,
    )
    def run(local_layers, mbs):
        # local_layers leaves: [per_stage, ...]; mbs [M, mb(/data), S, D]
        mb_local = mbs.shape[1]
        stage = jax.lax.axis_index("stage")
        M = num_microbatches
        T = M + stages - 1
        fwd = [(i, (i + 1) % stages) for i in range(stages)]

        def stage_compute(x):
            def body(i, h):
                return vit_layer(h, _layer_slice(local_layers, i), config)
            return jax.lax.fori_loop(0, per_stage, body, x)

        def step(t, carry):
            buf, out = carry
            # stage 0 injects microbatch t (clipped; masked out when t >= M)
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            x = jnp.where(stage == 0, inject, buf)
            y = stage_compute(x)
            # the last stage finished microbatch (t - (stages-1)) at step t
            done_idx = jnp.clip(t - (stages - 1), 0, M - 1)
            valid = (t >= stages - 1) & (stage == stages - 1)
            cur = jax.lax.dynamic_index_in_dim(out, done_idx, axis=0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), done_idx, axis=0)
            buf = jax.lax.ppermute(y, "stage", fwd)
            return buf, out

        # the loop carry becomes varying (over stage via ppermute, over data
        # via the data-sharded microbatches), so the zero initializers must
        # be cast to 'varying' for shard_map's manual-axes typing
        buf0 = jax.lax.pcast(jnp.zeros((mb_local, s_len, d), mbs.dtype),
                             tuple(mesh.axis_names), to="varying")
        # zeros_like(mbs) already varies over 'data'; add only 'stage'
        out0 = jax.lax.pcast(jnp.zeros_like(mbs), ("stage",), to="varying")
        _, out = jax.lax.fori_loop(0, T, step, (buf0, out0))
        # only the last stage holds real outputs; broadcast via psum of a
        # masked contribution (out_specs=P() expects replicated values)
        return jax.lax.psum(
            jnp.where(stage == stages - 1, out, jnp.zeros_like(out)), "stage"
        )

    out = run(layers, mbs)  # [M, mb, S, D]
    h = out.reshape(b, s_len, d)
    # classifier tail matches models/vit.py::vit_forward (the ground truth)
    h = layer_norm(h, params["ln_f"], config.layernorm_eps)
    return h[:, 0] @ params["head"]["w"] + params["head"]["b"]
