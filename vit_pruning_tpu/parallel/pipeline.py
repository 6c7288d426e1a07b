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


def make_stage_mesh(stages: int, data: int = 1, model: int = 1,
                    devices=None) -> Mesh:
    """('stage',) mesh, or composed with other axes: ('stage', 'data') for
    pp x dp (each stage row holds `data` devices splitting every
    microbatch), ('stage', 'model') for pp x tp (each stage's layers run
    Megatron-sharded across `model` devices — see tp_vit_layer). data and
    model are mutually exclusive here (a 3-axis pp x tp x dp mesh is a
    straightforward extension, not needed for the reference workload)."""
    if data > 1 and model > 1:
        raise ValueError("compose 'data' or 'model' with 'stage', not both")
    devices = list(devices if devices is not None else jax.devices())
    n = stages * data * model
    if n > len(devices):
        raise ValueError(f"pipeline mesh needs {n} devices, have {len(devices)}")
    if data == 1 and model == 1:
        arr = mesh_utils.create_device_mesh((stages,), devices=devices[:n])
        return Mesh(arr, ("stage",))
    second = "data" if data > 1 else "model"
    arr = mesh_utils.create_device_mesh(
        (stages, max(data, model)), devices=devices[:n])
    return Mesh(arr, ("stage", second))


def tp_vit_layer(x: jnp.ndarray, lp: dict, config: ViTConfig) -> jnp.ndarray:
    """One pre-LN transformer block, Megatron-tensor-parallel over mesh axis
    'model' INSIDE a shard_map manual region (the pipeline stage body):
    q/k/v projections column-sharded (each device holds num_heads/model
    heads), attention per local head, output projection row-sharded with a
    psum over 'model', then fc1 column-sharded / fc2 row-sharded with the
    second psum — two ICI all-reduces per layer, the canonical Megatron
    pattern. The automatic-partitioning equivalent lives in
    parallel/sharding.py (pjit shardings for the dp x tp train step); this
    manual form exists because the pipeline body is already manual
    (shard_map + ppermute), where XLA's automatic propagation is unavailable.

    Numerics match models/vit.py::vit_layer up to the float reassociation of
    the two psums (dryrun-verified against the single-device forward).
    """
    from vit_pruning_tpu.models.vit import layer_norm

    b, s, d = x.shape
    hd = config.head_dim
    h = layer_norm(x, lp["ln1"], config.layernorm_eps)
    q = h @ lp["attn"]["q"]["w"] + lp["attn"]["q"]["b"]
    k = h @ lp["attn"]["k"]["w"] + lp["attn"]["k"]["b"]
    v = h @ lp["attn"]["v"]["w"] + lp["attn"]["v"]["b"]
    hloc = q.shape[-1] // hd  # local heads on this 'model' shard

    def split(t):
        return t.reshape(b, s, hloc, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
    logits = logits / jnp.sqrt(hd).astype(x.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, hloc * hd)
    # row-sharded o-proj: partial products all-reduce over 'model'; the bias
    # is replicated, so it is added AFTER the psum (once, not model times)
    x = x + jax.lax.psum(ctx @ lp["attn"]["o"]["w"], "model") + lp["attn"]["o"]["b"]
    h2 = layer_norm(x, lp["ln2"], config.layernorm_eps)
    m = jax.nn.gelu(h2 @ lp["mlp"]["fc1"]["w"] + lp["mlp"]["fc1"]["b"],
                    approximate=False)
    return x + jax.lax.psum(m @ lp["mlp"]["fc2"]["w"], "model") + lp["mlp"]["fc2"]["b"]


def _pp_tp_layer_specs() -> dict:
    """PartitionSpecs for stacked [L, ...] layer weights on a
    ('stage','model') mesh: layer axis over 'stage', Megatron column/row
    sharding over 'model' (column = output dim for q/k/v/fc1, row = input
    dim for o/fc2; their biases replicate — added once after the psum)."""
    col = {"w": P("stage", None, "model"), "b": P("stage", "model")}
    row = {"w": P("stage", "model", None), "b": P("stage", None)}
    ln = {"g": P("stage", None), "b": P("stage", None)}
    return {"ln1": ln,
            "attn": {"q": col, "k": col, "v": col, "o": row},
            "ln2": ln,
            "mlp": {"fc1": col, "fc2": row}}


def pipeline_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    mesh: Mesh,
    num_microbatches: int = 4,
    use_pallas: bool | None = None,
    quant: str | None = None,
) -> jnp.ndarray:
    """Dense ViT forward with encoder layers pipelined across mesh('stage').

    Returns logits [B, num_labels]. num_microbatches must divide B.
    Embed and the classifier head run replicated (they are a tiny fraction
    of the FLOPs); only the L encoder layers are staged.

    use_pallas/quant default to the dispatch-module resolution (Pallas on
    TPU, serving-quant global) — resolved HERE so the stage computation
    matches the single-chip entry points; pass them explicitly when wrapping
    this in a persistent jax.jit closure (ops/dispatch.set_serving_quant's
    tracing note).
    """
    if use_pallas is None:
        from vit_pruning_tpu.ops.dispatch import use_pallas as _resolve

        use_pallas = _resolve()
    if quant is None:
        from vit_pruning_tpu.ops.dispatch import serving_quant

        quant = serving_quant()
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
    # independently side by side.
    # pp x tp composition: with a ('stage','model') mesh each stage's layers
    # run Megatron-sharded over 'model' (tp_vit_layer — two psums/layer over
    # ICI); microbatches replicate over 'model'.
    has_data = "data" in mesh.axis_names
    has_model = "model" in mesh.axis_names
    mb_spec = P(None, "data") if has_data else P()
    if has_model:
        n_model = mesh.shape["model"]
        if config.num_heads % n_model or config.mlp_dim % n_model:
            raise ValueError(
                f"tp over 'model'={n_model} needs num_heads "
                f"({config.num_heads}) and mlp_dim ({config.mlp_dim}) "
                "divisible by it")
    layers_spec = _pp_tp_layer_specs() if has_model else P("stage")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(layers_spec, mb_spec),
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
                lp = _layer_slice(local_layers, i)
                if has_model:
                    return tp_vit_layer(h, lp, config)
                return vit_layer(h, lp, config,
                                 use_pallas=use_pallas, quant=quant)
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
        # zeros_like(mbs) already varies over 'data'; add 'stage' (and
        # 'model' — the carry becomes model-varying typed via buf)
        out0 = jax.lax.pcast(
            jnp.zeros_like(mbs),
            tuple(a for a in mesh.axis_names if a != "data"), to="varying")
        _, out = jax.lax.fori_loop(0, T, step, (buf0, out0))
        # only the last stage holds real outputs; broadcast via psum of a
        # masked contribution (out_specs=P() expects replicated values).
        # Under tp the model shards hold identical outputs (every layer ends
        # in a psum over 'model'), so exactly ONE shard contributes.
        sel = stage == stages - 1
        if has_model:
            sel = sel & (jax.lax.axis_index("model") == 0)
            return jax.lax.psum(
                jnp.where(sel, out, jnp.zeros_like(out)), ("stage", "model"))
        return jax.lax.psum(
            jnp.where(sel, out, jnp.zeros_like(out)), "stage"
        )

    out = run(layers, mbs)  # [M, mb, S, D]
    h = out.reshape(b, s_len, d)
    # classifier tail matches models/vit.py::vit_forward (the ground truth)
    h = layer_norm(h, params["ln_f"], config.layernorm_eps)
    return h[:, 0] @ params["head"]["w"] + params["head"]["b"]


def pruned_pipeline_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    pcfg,
    mesh: Mesh,
    num_microbatches: int = 4,
    use_pallas: bool | None = None,
    quant: str | None = None,
) -> jnp.ndarray:
    """topk_prog serving forward with encoder layers pipelined over
    mesh('stage') — the pruned counterpart of `pipeline_forward` (VERDICT r2
    #7: pipeline the progressive-compaction path).

    The progressive schedule shrinks the sequence at drop layers
    (models/pruned_vit.py::progressive_topk_forward), so different stages run
    at different static sequence lengths. SPMD needs one program for all
    devices, so each stage's computation (its drops + its layers, at its own
    static lengths) is one branch of a `lax.switch` selected by
    `lax.axis_index('stage')` — every branch is statically shaped, each
    device executes only its own, and the inter-stage hop buffer is padded to
    the full sequence length (the padding costs HBM copies, not layer FLOPs;
    each stage computes at its true compacted length).

    Drops may fall anywhere (stage boundaries need NOT align with
    keep_schedule compaction points — a mid-stage drop is static within that
    stage's branch). Selection semantics are shared with the single-chip path
    via `progressive_drop`; `pcfg.merge_dropped` is honored too (token sizes
    ride the hop buffer as one extra feature column, see below). Layer weights and per-layer (stacked) predictor
    heads are sharded over 'stage' on their leading [L] axis; shared
    predictor parts replicate. Composes with data parallelism over a
    ('stage','data') mesh exactly like `pipeline_forward`.

    Returns logits [B, num_labels].
    """
    from vit_pruning_tpu.models.pruned_vit import (
        _is_active,
        merge_dropped_tokens,
        progressive_drop,
    )
    from vit_pruning_tpu.models.vit import _layer_slice as _slice

    if pcfg.mode != "topk_prog":
        raise ValueError(f"pruned pipeline serves mode='topk_prog', got {pcfg.mode!r}")
    # resolve kernel/quant dispatch at this entry point, like the single-chip
    # serving paths (pruned_vit_forward) — see pipeline_forward's docstring
    if use_pallas is None:
        from vit_pruning_tpu.ops.dispatch import use_pallas as _resolve

        use_pallas = _resolve()
    if quant is None:
        from vit_pruning_tpu.ops.dispatch import serving_quant

        quant = serving_quant()
    stages = mesh.shape["stage"]
    L = config.num_layers
    if L % stages:
        raise ValueError(f"{L} layers do not split into {stages} equal stages")
    per_stage = L // stages
    b = pixel_values.shape[0]
    if b % num_microbatches:
        raise ValueError(f"batch {b} not divisible by {num_microbatches} microbatches")
    mb = b // num_microbatches

    backbone = params["backbone"]
    pred = params.get("predictor")

    x = embed(pixel_values, backbone["embed"], config)  # [B, S, D] replicated
    s_len, d = x.shape[1], x.shape[2]
    # merge_dropped: token sizes (merge weights) ride the inter-stage hop
    # buffer as one extra feature column ([..., d]), initialised to 1 —
    # ppermute/where/update logic is unchanged, only the channel dim grows
    merge = bool(getattr(pcfg, "merge_dropped", False))
    if merge:
        x = jnp.concatenate([x, jnp.ones(x.shape[:2] + (1,), x.dtype)], -1)
    dm = x.shape[2]
    mbs = x.reshape(num_microbatches, mb, s_len, dm)

    # static drop pattern — the exact decision loop of progressive_topk_forward
    schedule = pcfg.keep_schedule or tuple([pcfg.top_k] + [0] * (L - 1))
    schedule = tuple(min(k, s_len - 1) if k else 0 for k in schedule)
    drop_at, in_len = [], []   # in_len[g] = live length entering layer g
    cur = s_len
    for g in range(L):
        in_len.append(cur)
        k_g = schedule[g]
        dg = bool(k_g) and (k_g < cur - 1) and _is_active(pcfg, g)
        drop_at.append(dg)
        if dg:
            cur = k_g + 1
    final_len = cur
    stage_in = [in_len[s * per_stage] for s in range(stages)]

    has_data = "data" in mesh.axis_names
    mb_spec = P(None, "data") if has_data else P()
    # stacked per-layer leaves ([L, ...]) shard over 'stage'; shared leaves
    # (e.g. common_mlp's one MLP) replicate
    layers_spec = jax.tree.map(lambda _: P("stage"), backbone["layers"])
    # predictor subtrees are stacked [L, ...] per layer EXCEPT the ones
    # init_predictor_params names with a 'shared_' prefix (one set of weights
    # used at every layer) — key the sharding on that naming contract, not on
    # leaf shapes (a shared leaf can coincidentally have leading dim == L)
    pred_spec = None if pred is None else {
        k: jax.tree.map(lambda _, spec=(P() if k.startswith("shared_")
                                        else P("stage")): spec, sub)
        for k, sub in pred.items()
    }

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(layers_spec, pred_spec, mb_spec),
        out_specs=mb_spec,
    )
    def run(local_layers, local_pred, mbs):
        mb_local = mbs.shape[1]
        stage = jax.lax.axis_index("stage")
        M = num_microbatches
        T = M + stages - 1
        fwd = [(i, (i + 1) % stages) for i in range(stages)]

        def make_branch(s):
            l0 = s * per_stage

            def br(x_pad):
                x = x_pad[:, : stage_in[s], :d]
                sizes = x_pad[:, : stage_in[s], d] if merge else None
                for j in range(per_stage):
                    g = l0 + j
                    lp = _slice(local_layers, j)
                    if drop_at[g]:
                        x_full = x
                        x, scores, _ = progressive_drop(
                            x, local_pred, j, schedule[g], config, pcfg,
                            layer_params=lp,
                        )
                        if merge:
                            x, sizes = merge_dropped_tokens(
                                x_full, x, scores, schedule[g], sizes)
                    x = vit_layer(x, lp, config, use_pallas=use_pallas,
                                  quant=quant)
                if merge:
                    x = jnp.concatenate([x, sizes[..., None]], -1)
                return jnp.pad(x, ((0, 0), (0, s_len - x.shape[1]), (0, 0)))

            return br

        branches = [make_branch(s) for s in range(stages)]

        def stage_compute(x):
            return jax.lax.switch(stage, branches, x)

        def step(t, carry):
            buf, out = carry
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            x = jnp.where(stage == 0, inject, buf)
            y = stage_compute(x)
            done_idx = jnp.clip(t - (stages - 1), 0, M - 1)
            valid = (t >= stages - 1) & (stage == stages - 1)
            cur_out = jax.lax.dynamic_index_in_dim(out, done_idx, axis=0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur_out), done_idx, axis=0)
            buf = jax.lax.ppermute(y, "stage", fwd)
            return buf, out

        buf0 = jax.lax.pcast(jnp.zeros((mb_local, s_len, dm), mbs.dtype),
                             tuple(mesh.axis_names), to="varying")
        out0 = jax.lax.pcast(jnp.zeros_like(mbs), ("stage",), to="varying")
        _, out = jax.lax.fori_loop(0, T, step, (buf0, out0))
        return jax.lax.psum(
            jnp.where(stage == stages - 1, out, jnp.zeros_like(out)), "stage"
        )

    out = run(backbone["layers"], pred, mbs)  # [M, mb, S(padded), D(+1)]
    h = out.reshape(b, s_len, dm)[:, :final_len, :d]
    h = layer_norm(h, backbone["ln_f"], config.layernorm_eps)
    return h[:, 0] @ backbone["head"]["w"] + backbone["head"]["b"]
