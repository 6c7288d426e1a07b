"""Pruned ViT: per-layer dynamic token skipping with static shapes.

This is the TPU-native redesign of the reference's ModifiedViTModel /
ModifiedViTEncoder / ModifiedViTLayer (himanshu/model_utils.py:19-259).
The reference's per-image ragged gather loop (model_utils.py:88-91 — B
separate attention launches per layer) is replaced by two static-shape
execution modes that compile to a single XLA program:

  mask   — all tokens stay resident; skipped tokens are excluded from the
           attention softmax via a key-validity mask and carried through the
           residual unchanged. Numerically identical to the reference's
           gather/scatter (softmax over the same kept-key set).
  topk   — fixed-budget compaction (M7, pradeep/using_attention.py:136-152):
           keep the top-k scored patches + CLS, gather to a dense
           [B, K+1, D] sequence, run the layer, scatter back. Static K =>
           real FLOP savings on the MXU.
  oracle — ground-truth masking from the similarity oracle itself (M3/M11
           upper-bound studies): the dense pass IS computed, kept positions
           take its output, skipped positions keep their input.
  random — per-layer random keep budgets (M14 control baseline).

Per-layer masks, scores, losses and confusion counts are explicit outputs
(an `aux` pytree), replacing the reference's side-channel module attributes
(`.loss`, `.boolean_mask`, `.mlp_confusion_matrix`; model_utils.py:108-113).

Training-time oracle: like the reference, the full (dense) layer output is
computed alongside the pruned one (model_utils.py:95-101) — but here it is
computed *once* and reused as the similarity-oracle input, the CLS-attention
target (M7) and, in oracle mode, the actual output. Teacher signals are
stop-gradient'd: phase training freezes the backbone anyway
(main_model_utils.py:108-113), and this keeps the compiled train step lean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.predictors import (
    apply_predictor,
    apply_updatenet,
    init_predictor_params,
    init_updatenet_params,
)
from vit_pruning_tpu.models.vit import (
    embed,
    init_vit_params,
    layer_norm,
    vit_forward,
    vit_layer,
)
from vit_pruning_tpu.ops.masking import (
    add_cls_keep,
    compact_indices,
    confusion_counts,
    gather_compact,
    neighbor_average,
    neighbor_index_table,
    random_keep_mask,
    rank_keep_mask,
    scatter_back,
    similarity_oracle,
    threshold_keep_mask,
    topk_keep_mask,
)
from vit_pruning_tpu.train.losses import (
    focal_loss,
    mse_attention_loss,
    mse_cosine_loss,
    weighted_bce_oracle,
)


def init_pruned_vit_params(key: jax.Array, config: ViTConfig, pcfg: PruneConfig) -> dict:
    """{'backbone': ViT params, 'predictor': predictor params or None}.

    Matches the reference's init: backbone from (converted) pretrained
    weights, predictor heads random (hi_main.py:130-137 strict=False load).
    Use models.convert.torch_state_dict_to_params to fill 'backbone'.
    """
    kb, kp, ku = jax.random.split(key, 3)
    params = {
        "backbone": init_vit_params(kb, config),
        "predictor": init_predictor_params(kp, config, pcfg),
    }
    if pcfg.skip_correction == "updatenet":
        params["updatenet"] = init_updatenet_params(ku, config)
    return params


def _layer_slice(layers: dict, i: int) -> dict:
    return jax.tree.map(lambda a: a[i], layers)


def _is_active(pcfg: PruneConfig, i: int) -> bool:
    """mlp_needed_arr equivalent (model_utils.py:126-131)."""
    if pcfg.mode == "none":
        return False
    return pcfg.active_layers is None or i in pcfg.active_layers


def _bucket_caps(s: int) -> tuple:
    """Static capacity ladder for bucketed mask-mode execution: 24-step
    multiples from ~3/8 of the sequence up to full length."""
    lo = max(16, ((int(s * 0.375) + 15) // 16) * 16)
    # 24-step ladder: each extra cap is another Pallas compile (~2-9 min on
    # the remote-compile relay), so granularity trades compile time for the
    # last few percent of FLOP tracking
    return tuple(sorted(set(range(lo, s, 24)) | {s}))


def bucketed_masked_layer(
    x: jnp.ndarray,
    layer_params: dict,
    mask: jnp.ndarray,
    config: ViTConfig,
    use_pallas: bool = False,
    quant: str = "none",
    cap_hint: Optional[int] = None,
    passthrough: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mask-mode layer with REAL compute savings (SURVEY §7 hard part (b)).

    cap_hint: a statically-known upper bound on per-image kept counts (e.g.
    mask_budget+1 / the random budget+1) added to the capacity ladder, so
    capped configs run at their EXACT capacity instead of the next 24-step
    rung (99 vs 104 at the 50% headline budget).

    passthrough: value carried by SKIPPED tokens (None = identity, i.e. x).
    The returned tensor is FINISHED — kept rows hold the layer output,
    skipped rows hold the passthrough — so callers must not re-select. On
    the fused-kernel path an identity passthrough is baked into the kernel's
    scatter, skipping a ~230 MB/layer full-length select pass.

    Exact mask semantics (each kept token attends over exactly the kept-key
    set, reference himanshu/model_utils.py:88-91) but instead of running all
    S positions and discarding masked rows, tokens are compacted kept-first
    (stable order) and the layer runs at the smallest static bucket capacity
    holding the batch's max kept-count — `lax.switch` selects among a ladder
    of pre-compiled capacities at runtime, keeping every shape static for XLA
    while the executed FLOPs track the actual mask density.

    TPU-specific design: XLA's dynamic gather/scatter ops cost ~2 ms/layer at
    these shapes, so compaction runs as ONE-HOT BATCHED MATMULS on the MXU
    (~0.25 ms): P[b, r, t] = 1 iff token t lands in compacted row r, built
    from two cumsums (kept ranks first, skipped ranks appended — stable
    order, no sort). Gather = P @ x; scatter-back = P^T @ y. The one-hot
    weights are exact in bf16, so numerics match the gather formulation.
    """
    b, s, _ = x.shape
    kept = mask.astype(jnp.int32)
    counts = kept.sum(-1)  # [B], CLS included
    maxc = counts.max()
    kept_rank = jnp.cumsum(kept, axis=-1) - 1
    skip_rank = counts[:, None] + jnp.cumsum(1 - kept, axis=-1) - 1
    dest = jnp.where(mask, kept_rank, skip_rank)  # [B, S] compacted row ids

    if cap_hint is not None and cap_hint < s and use_pallas and quant != "int8":
        # budget-bounded configs (mask_budget / topk / random): ONE fused
        # kernel does gather -> staged2 layer at the capacity -> masked
        # scatter + identity passthrough entirely in VMEM
        # (ops/pallas/layer.py::fused_vit_layer_bucketed) — the unfused
        # ladder's per-layer HBM round trips for compaction cost ~1.3
        # ms/layer at DeiT-S B=512 (r3 ablation)
        from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_bucketed

        y = fused_vit_layer_bucketed(
            x, layer_params, dest, mask, cap_hint, config.num_heads,
            eps=config.layernorm_eps,
        )
        if passthrough is None:
            return y  # identity passthrough already baked into the scatter
        return jnp.where(mask[..., None], y, passthrough)

    caps = _bucket_caps(s)
    if cap_hint is not None and cap_hint < s:
        caps = tuple(sorted(set(caps) | {cap_hint}))

    def make_branch(cap):
        if cap == s:
            # full length: no compaction needed — run the masked layer as-is
            def br(x):
                return vit_layer(x, layer_params, config, token_mask=mask,
                                 use_pallas=use_pallas, quant=quant)
            return br

        def br(x):
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)
            P = (dest[:, None, :] == rows).astype(x.dtype)  # [B, cap, S]
            xc = jnp.einsum("brt,btd->brd", P, x)
            key_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (b, cap), 1)
                < counts[:, None]
            )
            yc = vit_layer(xc, layer_params, config, token_mask=key_ok,
                           use_pallas=use_pallas, quant=quant)
            return jnp.einsum("brt,brd->btd", P, yc)
        return br

    idx = jnp.searchsorted(jnp.asarray(caps, jnp.int32), maxc)
    y = jax.lax.switch(idx, [make_branch(c) for c in caps], x)
    return jnp.where(mask[..., None], y, x if passthrough is None else passthrough)


def _sim_threshold(pcfg: PruneConfig, layer_idx: int) -> float:
    """Per-layer oracle threshold: pcfg.sim_threshold is one float (the
    reference's global st) or a per-layer tuple (see configs.py)."""
    st = pcfg.sim_threshold
    return st[layer_idx] if isinstance(st, tuple) else st


def _mlp_threshold(pcfg: PruneConfig, layer_idx: int) -> float:
    """Per-layer predictor threshold (float or per-layer tuple)."""
    mt = pcfg.mlp_threshold
    return mt[layer_idx] if isinstance(mt, tuple) else mt


def _hoistable_oracle(pcfg: PruneConfig) -> bool:
    """True when the layer's oracle/teacher signals can be computed OUTSIDE
    the layer's AD/remat scope (see _hoisted_oracle_targets): every consumer
    stop-grads them and the dense pass is not the layer's output. Excluded:
    mode='oracle' and measure_only (dense_out IS the output) and the
    key_cosine predictor (it computes the dense pass inside apply_predictor
    anyway — hoisting would pay it twice)."""
    return (pcfg.mode in ("mask", "topk", "topk_prog", "random")
            and not pcfg.measure_only
            and pcfg.predictor != "key_cosine")


def _hoisted_oracle_targets(
    layer_params: dict,
    layer_idx: int,
    x: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    teacher: Optional[tuple],
    use_pallas: bool,
    quant: str,
) -> dict:
    """Predictor-loss teacher signals, computed outside remat/AD (SURVEY §7
    hard part (d), VERDICT r4 #5).

    The oracle's dense layer pass (the reference's second full forward,
    himanshu/model_utils.py:95-101) is pure instrumentation: similarity
    labels, CLS-attention targets and confusion counts are all consumed
    under stop_gradient. Computing it inside the jax.checkpoint'd layer made
    the 'both'-loss fine-tune backward RECOMPUTE a dense forward per layer
    for zero gradient. Hoisting the [B,N]-sized targets out of the remat
    scope makes the instrumented step pay exactly one no-AD dense forward,
    and the remat residuals stay small (targets, not [B,S,D] activations).

    Returns {"similarity", "oracle_keep"} plus the loss-specific target
    ("attn_target" for mse_attention, "cos_target" for mse_cosine).
    """
    xs = jax.lax.stop_gradient(x)
    t: dict = {}
    dense_out = None
    if pcfg.loss == "mse_attention":
        # M7 target needs attention probabilities — XLA path, like the
        # in-layer branch it replaces
        dense_out, probs = vit_layer(xs, layer_params, config, return_probs=True)
        t["attn_target"] = probs[:, :, 0, 1:].mean(axis=1)
    elif teacher is None:
        dense_out = vit_layer(xs, layer_params, config, use_pallas=use_pallas,
                              quant=quant)
    if teacher is not None:
        # M19 parallel teacher stream (mukunda/deit.py:241-343)
        oracle_in = jax.lax.stop_gradient(teacher[0][:, 1:])
        dense_p = jax.lax.stop_gradient(teacher[1][:, 1:])
    else:
        oracle_in = xs[:, 1:]
        dense_p = dense_out[:, 1:]
    sim = similarity_oracle(oracle_in, dense_p, pcfg.oracle_alpha)
    t["similarity"] = sim
    t["oracle_keep"] = sim < _sim_threshold(pcfg, layer_idx)
    if pcfg.loss == "mse_cosine":
        dot = jnp.sum(dense_p * oracle_in, axis=-1)
        nrm = jnp.linalg.norm(dense_p, axis=-1) * jnp.linalg.norm(oracle_in, axis=-1)
        t["cos_target"] = (dot / jnp.maximum(nrm, 1e-12) + 1.0) / 2.0
    return jax.lax.stop_gradient(t)


def pruned_layer_forward(
    layer_params: dict,
    pred_params: Optional[dict],
    layer_idx: int,
    x: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    *,
    prev_keep: Optional[jnp.ndarray],
    nbr_idx,
    need_oracle: bool,
    rng: Optional[jax.Array],
    use_pallas: bool = False,
    quant: str = "none",
    updatenet_params: Optional[dict] = None,
    teacher: Optional[tuple] = None,
    train: bool = False,
    oracle_targets: Optional[dict] = None,
):
    """One pruned encoder layer. Returns (x_out, info dict).

    info: keep_mask [B,S] bool, scores [B,N], and when need_oracle also
    pred_loss (scalar), similarity [B,N], oracle_keep [B,N], confusion [2,2].

    train=True without need_oracle (the classification fine-tune phase,
    which never reads pred_loss — VERDICT r3 #6) runs the full-length
    masked layer / static gather-scatter paths (differentiable, one
    compiled shape) instead of the serving-only bucketed dispatch, but
    skips the oracle's dense pass entirely.

    oracle_targets: teacher signals precomputed by _hoisted_oracle_targets
    (outside this function's remat scope); when given, the layer computes
    NO dense oracle pass of its own.
    """
    b, s, d = x.shape
    n = s - 1

    # --- neighbor refresh of previously-skipped tokens (model_utils.py:47-51)
    if pcfg.avg_threshold > 0.0 and prev_keep is not None:
        patches = neighbor_average(
            x[:, 1:], nbr_idx, pcfg.avg_threshold, source_mask=~prev_keep[:, 1:]
        )
        x = jnp.concatenate([x[:, 0:1], patches], axis=1)

    # --- score and select
    extras: dict = {}
    if pcfg.predictor != "none" and pred_params is not None:
        scores, extras = apply_predictor(
            pred_params, layer_idx, x, config, pcfg, layer_params=layer_params
        )
    else:
        scores = jnp.ones((b, n), dtype=x.dtype)
    if pcfg.skip_correction == "updatenet" and updatenet_params is not None:
        # M18: learned residual update carried by skipped tokens
        extras["approx_residual"] = apply_updatenet(updatenet_params, layer_idx, x)
    elif pcfg.skip_correction == "cls_direction":
        # M15 DHSLayer: skipped tokens get x + cls/||cls||
        cls = x[:, 0:1]
        extras["approx_residual"] = jnp.broadcast_to(
            cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12),
            x[:, 1:].shape,
        )

    # key_cosine computes the dense layer pass itself — reuse it rather than
    # paying a second full pass for the oracle / M3
    dense_out = extras.get("dense_out")
    probs = None
    need_probs = (need_oracle and pcfg.loss == "mse_attention"
                  and oracle_targets is None)
    if (pcfg.mode == "oracle" or pcfg.measure_only or need_probs
            or (need_oracle and teacher is None and oracle_targets is None)):
        if need_probs:
            dense_out, probs = vit_layer(x, layer_params, config, return_probs=True)
        elif dense_out is None:
            dense_out = vit_layer(x, layer_params, config, use_pallas=use_pallas,
                                  quant=quant)

    if pcfg.mode == "mask":
        keep = threshold_keep_mask(scores, _mlp_threshold(pcfg, layer_idx))
        if pcfg.mask_budget is not None and pcfg.mask_budget < n:
            # per-image density cap: at most mask_budget highest-scoring
            # above-threshold tokens. The typical image (kept-count <=
            # budget) keeps exactly the thresholded set — reference
            # semantics (himanshu/model_utils.py:62-91); only fat-tail
            # images are truncated by score rank. This pins the bucketed
            # execution capacity at budget+1 instead of the batch max.
            capped = rank_keep_mask(
                jnp.where(keep, scores, -jnp.inf), pcfg.mask_budget
            )
            keep = keep & capped
        mask = add_cls_keep(keep)
        if pcfg.measure_only:
            # M13 (pradeep/mid2.py:64-70): stats only, dense execution
            out = dense_out
        elif pcfg.query_only:
            # M15 (recap/convprad.py:188-190): skipped tokens stay in K/V;
            # only their own (query) outputs are discarded
            y = vit_layer(x, layer_params, config, use_pallas=use_pallas, quant=quant)
            out = jnp.where(mask[..., None], y, _passthrough(x, extras, mask))
        elif not (need_oracle or train):
            # serving: bucketed compaction — same kept-key attention set,
            # but the executed shape tracks the batch's actual mask density
            # (capped configs run at exactly budget+1)
            hint = pcfg.mask_budget + 1 if pcfg.mask_budget is not None else None
            out = bucketed_masked_layer(
                x, layer_params, mask, config,
                use_pallas=use_pallas, quant=quant, cap_hint=hint,
                passthrough=(_passthrough(x, extras, mask)
                             if "approx_residual" in extras else None),
            )
        else:
            y = vit_layer(x, layer_params, config, token_mask=mask,
                          use_pallas=use_pallas, quant=quant)
            out = jnp.where(mask[..., None], y, _passthrough(x, extras, mask))
    elif pcfg.mode == "topk":
        if need_oracle or train:
            keep, kidx = topk_keep_mask(scores, pcfg.top_k)
        else:
            # serving needs only the mask: rank selection (no sort/scatter)
            keep = rank_keep_mask(scores, pcfg.top_k)
        mask = add_cls_keep(keep)
        if not (need_oracle or train):
            # serving: one-hot matmul compaction at the static k+1 bucket —
            # XLA's dynamic gather/scatter costs ~2 ms/layer at these shapes
            # (measured: gather/scatter form 12.7k img/s vs 14.2k bucketed)
            out = bucketed_masked_layer(
                x, layer_params, mask, config,
                use_pallas=use_pallas, quant=quant, cap_hint=pcfg.top_k + 1,
                passthrough=(_passthrough(x, extras, mask)
                             if "approx_residual" in extras else None),
            )
        else:
            # CLS + sorted top-k patch indices == compact_indices(mask, k+1)
            cidx = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32),
                 jnp.sort(kidx.astype(jnp.int32), axis=-1) + 1], axis=1)
            xc = gather_compact(x, cidx)
            yc = vit_layer(xc, layer_params, config, use_pallas=use_pallas,
                           quant=quant)
            out = scatter_back(_passthrough(x, extras, mask), cidx, yc)
    elif pcfg.mode == "oracle":
        sim_o = similarity_oracle(x[:, 1:], dense_out[:, 1:], pcfg.oracle_alpha)
        # token changes a lot => process
        keep = sim_o < _sim_threshold(pcfg, layer_idx)
        mask = add_cls_keep(keep)
        out = jnp.where(mask[..., None], dense_out, x)
    elif pcfg.mode == "random":
        if rng is None:
            raise ValueError("mode='random' requires an rng")
        budget = (
            pcfg.random_keep[layer_idx] if pcfg.random_keep is not None else pcfg.top_k
        )
        keep = random_keep_mask(jax.random.fold_in(rng, layer_idx), b, n, budget)
        mask = add_cls_keep(keep)
        if not (need_oracle or train):
            # fixed per-image budget => the bucket runs at exactly budget+1:
            # mask-mode execution cost at the exact skip rate
            out = bucketed_masked_layer(x, layer_params, mask, config,
                                        use_pallas=use_pallas, quant=quant,
                                        cap_hint=budget + 1)
        else:
            y = vit_layer(x, layer_params, config, token_mask=mask,
                          use_pallas=use_pallas, quant=quant)
            out = jnp.where(mask[..., None], y, x)
    else:
        raise ValueError(f"unknown prune mode {pcfg.mode!r}")

    if pcfg.layer_skip_threshold > 0.0:
        # M8 (himanshu/midlayer.py:250-330): images whose mean keep-score is
        # below the threshold bypass the whole layer
        skip_layer = jnp.mean(scores, axis=1) < pcfg.layer_skip_threshold  # [B]
        out = jnp.where(skip_layer[:, None, None], x, out)
        mask = jnp.where(skip_layer[:, None], jnp.zeros_like(mask), mask)
        mask = mask.at[:, 0].set(True)  # CLS counted as live for reporting

    info = {"keep_mask": mask, "scores": scores}

    if need_oracle:
        if oracle_targets is not None:
            # teacher signals hoisted out of this layer's AD/remat scope
            # (_hoisted_oracle_targets) — already stop-gradded there
            sim = oracle_targets["similarity"]
            oracle_keep = oracle_targets["oracle_keep"]
            cos = oracle_targets.get("cos_target")
            target = oracle_targets.get("attn_target")
        else:
            if teacher is not None:
                # M19 parallel teacher stream (mukunda/deit.py:241-343):
                # oracle from the UNPRUNED trajectory, not the pruned
                # stream's input
                t_in, t_out = teacher
                oracle_in = jax.lax.stop_gradient(t_in[:, 1:])
                dense_p = jax.lax.stop_gradient(t_out[:, 1:])
            else:
                oracle_in = jax.lax.stop_gradient(x[:, 1:])
                dense_p = jax.lax.stop_gradient(dense_out[:, 1:])
            sim = similarity_oracle(oracle_in, dense_p, pcfg.oracle_alpha)
            oracle_keep = sim < _sim_threshold(pcfg, layer_idx)
            if pcfg.loss == "mse_cosine":
                dot = jnp.sum(dense_p * oracle_in, axis=-1)
                nrm = (jnp.linalg.norm(dense_p, axis=-1)
                       * jnp.linalg.norm(oracle_in, axis=-1))
                cos = (dot / jnp.maximum(nrm, 1e-12) + 1.0) / 2.0
            elif pcfg.loss == "mse_attention":
                target = jax.lax.stop_gradient(probs[:, :, 0, 1:].mean(axis=1))
        if pcfg.loss == "bce_oracle":
            pred_loss = weighted_bce_oracle(scores, oracle_keep)
        elif pcfg.loss == "mse_cosine":
            pred_loss = mse_cosine_loss(scores, cos)
            # training signal for the detached predictor step (harness fast
            # path): the cosine target the scores regress
            info["cos_target"] = cos
        elif pcfg.loss == "mse_attention":
            pred_loss = mse_attention_loss(scores, target)
            # expose the training signal so callers can measure predictor
            # fidelity against the ranking it was actually trained on
            # (quality.py: top-k set agreement for M7-recipe predictors)
            info["attn_target"] = target
        elif pcfg.loss == "focal":
            pred_loss = focal_loss(
                scores, oracle_keep, alpha=pcfg.focal_alpha, gamma=pcfg.focal_gamma
            )
        else:
            raise ValueError(f"unknown loss {pcfg.loss!r}")
        info.update(
            pred_loss=pred_loss,
            similarity=sim,
            oracle_keep=oracle_keep,
            confusion=confusion_counts(oracle_keep, mask[:, 1:]),
        )

    return out, info


def _passthrough(x: jnp.ndarray, extras: dict, mask: jnp.ndarray) -> jnp.ndarray:
    """Value carried by skipped tokens: identity, or the bottleneck's learned
    approximation `middle + hidden` (M17, recap/prad_final_code.py:176-183)."""
    if "approx_residual" in extras:
        approx = x[:, 1:] + extras["approx_residual"]
        return jnp.concatenate([x[:, 0:1], approx], axis=1)
    return x


def pruned_vit_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    *,
    train: bool = False,
    compute_oracle: bool = False,
    oracle: Optional[bool] = None,
    return_layer_inputs: bool = False,
    rng: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    quant: Optional[str] = None,
    remat: bool = False,
):
    """Full pruned forward.

    Returns dict with:
      logits [B, num_labels], cls [B, D], last_hidden [B, S, D]
      keep_masks [L, B, S] bool, scores [L, B, N]
      aux (only when the oracle instrumentation runs): pred_loss [L],
      similarity [L, B, N], oracle_keep [L, B, N], confusion [L, 2, 2]
      (+ attn_target / cos_target for the corresponding losses)
      layer_inputs [L, B, S, D] (only when return_layer_inputs — each
      layer's input AS SEEN by its predictor, for the harness's detached
      predictor phase)

    The oracle instrumentation (the reference's `compute_cosine` flag,
    model_utils.py:95 — one dense pass per layer as teacher/label source)
    runs when `train or compute_oracle`, unless `oracle` overrides it
    explicitly: the classification fine-tune phase never reads pred_loss,
    so its train step passes oracle=False and skips the dense passes
    entirely (VERDICT r3 #6) while still training on the static-shape
    re-decide execution paths.
    """
    need_oracle = (train or compute_oracle) if oracle is None else oracle
    if train or need_oracle:
        # training/oracle paths always run unquantized: int8 matmuls have no
        # useful gradient (round/clip are zero-derivative) and the oracle
        # teacher should be the float model (set_serving_quant docstring)
        quant = "none"
    elif quant is None:
        from vit_pruning_tpu.ops.dispatch import serving_quant

        quant = serving_quant()
    if pcfg.mode == "none" and not return_layer_inputs:
        # Dense config: route through vit_forward's lax.scan encoder — ONE
        # compiled layer body instead of num_layers unrolled copies. This
        # is load-bearing for compile SIZE, not just speed: the unrolled
        # ViT-L train graph (24 remat'd layers + the KD teacher, itself a
        # second unrolled dense forward) reproducibly crashed the relay
        # compile helper after ~25 min (broken pipe, r5) — with the teacher
        # and the dense baseline scanned, the programs fit. Output fields
        # are synthesized exactly as the unrolled inactive-layer path
        # does (equivalence test: tests/test_pruning.py).
        dense = vit_forward(params["backbone"], pixel_values, config,
                            use_pallas=use_pallas, quant=quant, remat=remat)
        x = dense["last_hidden"]
        b, s = x.shape[0], x.shape[1]
        L, n = config.num_layers, s - 1
        out = {
            "logits": dense["logits"],
            "cls": dense["cls"],
            "last_hidden": x,
            "keep_masks": jnp.ones((L, b, s), bool),
            "scores": jnp.ones((L, b, n), x.dtype),
        }
        if need_oracle:
            aux = dict(
                pred_loss=jnp.zeros((L,)),
                similarity=jnp.zeros((L, b, n), x.dtype),
                oracle_keep=jnp.ones((L, b, n), bool),
                confusion=jnp.zeros((L, 2, 2), jnp.int32),
            )
            if pcfg.loss == "mse_attention":
                aux["attn_target"] = jnp.zeros((L, b, n), x.dtype)
            elif pcfg.loss == "mse_cosine":
                aux["cos_target"] = jnp.ones((L, b, n), x.dtype)
            out["aux"] = aux
        return out
    if pcfg.mode == "topk_prog" and not (train or need_oracle):
        # serving path: progressive compaction (no oracle instrumentation)
        return progressive_topk_forward(
            params, pixel_values, config, pcfg, use_pallas=use_pallas,
            quant=quant,
        )
    if pcfg.mode == "topk_prog":
        # training/oracle passes use the per-layer re-decide semantics the
        # predictor is trained with (M7); deployment then runs progressive
        pcfg = pcfg.replace(mode="topk")
    if use_pallas is None:
        from vit_pruning_tpu.ops.dispatch import use_pallas as _resolve

        use_pallas = _resolve()
    backbone = params["backbone"]
    pred = params.get("predictor")

    x = embed(pixel_values, backbone["embed"], config)
    nbr_idx = jnp.asarray(neighbor_index_table(config.grid_size))

    use_teacher = need_oracle and pcfg.oracle_stream == "parallel"
    x_teacher = x if use_teacher else None
    masks, scores_l, aux_l, layer_inputs = [], [], [], []
    prev_keep = None
    # M8 skip-next flag (himanshu/midlayer.py:471-523): [B] bool, set by the
    # previous layer's thresholded mask; flagged images bypass this layer.
    skip_vec = None
    for i in range(config.num_layers):
        if return_layer_inputs:
            layer_inputs.append(x)
        lp = _layer_slice(backbone["layers"], i)
        teacher = None
        if use_teacher:
            t_out = vit_layer(x_teacher, lp, config, use_pallas=use_pallas,
                              quant=quant)
            teacher = (x_teacher, t_out)
            x_teacher = t_out
        if not _is_active(pcfg, i):
            x_in = x
            dense_fn = lambda x_, lp_: vit_layer(  # noqa: E731
                x_, lp_, config, use_pallas=use_pallas, quant=quant)
            if remat:
                # inactive layers (and the whole mode='none' dense baseline)
                # must honor remat too: a ViT-L @224 bs128 bf16 train step
                # holds 24 x [B,197,4096] MLP activations without it —
                # 18.4G of the v5e's 15.75G HBM (measured OOM, r5)
                dense_fn = jax.checkpoint(dense_fn)
            x = dense_fn(x, lp)
            if skip_vec is not None:
                # M8: "skip the next layer" means the physically next layer,
                # whether or not it is an active pruning layer — consume the
                # flag here too (a skipped layer computes no decision)
                x = jnp.where(skip_vec[:, None, None], x_in, x)
                skip_vec = None
            mask = jnp.ones(x.shape[:2], dtype=bool)
            info = {"keep_mask": mask, "scores": jnp.ones((x.shape[0], x.shape[1] - 1), x.dtype)}
            if need_oracle:
                n = x.shape[1] - 1
                info.update(
                    pred_loss=jnp.zeros(()),
                    similarity=jnp.zeros((x.shape[0], n), x.dtype),
                    oracle_keep=jnp.ones((x.shape[0], n), bool),
                    confusion=jnp.zeros((2, 2), jnp.int32),
                )
                if pcfg.loss == "mse_attention":
                    info["attn_target"] = jnp.zeros((x.shape[0], n), x.dtype)
                elif pcfg.loss == "mse_cosine":
                    info["cos_target"] = jnp.ones((x.shape[0], n), x.dtype)
        else:
            otargets = None
            if need_oracle and _hoistable_oracle(pcfg):
                # dense-pass instrumentation stays OUTSIDE the (possibly
                # remat'd) differentiable layer: one no-AD dense forward,
                # small [B,N] residuals (SURVEY §7 hard part (d))
                otargets = _hoisted_oracle_targets(
                    lp, i, x, config, pcfg, teacher, use_pallas, quant)

            def layer_fn(lp_, pred_, x_, prev_keep_, rng_, un_, teacher_,
                         otargets_, _i=i):
                return pruned_layer_forward(
                    lp_, pred_, _i, x_, config, pcfg,
                    prev_keep=prev_keep_, nbr_idx=nbr_idx,
                    need_oracle=need_oracle, rng=rng_, use_pallas=use_pallas,
                    quant=quant, updatenet_params=un_, teacher=teacher_,
                    train=train, oracle_targets=otargets_,
                )
            if remat:
                # trade FLOPs for memory on long fine-tunes (the reference's
                # gradient_checkpointing branch, model_utils.py:154-160)
                layer_fn = jax.checkpoint(layer_fn)
            x_in = x
            x, info = layer_fn(
                lp, pred, x, prev_keep, rng, params.get("updatenet"), teacher,
                otargets
            )
            if pcfg.skip_next_threshold > 0.0:
                # M8 (midlayer.py:471-523): decide from THIS layer's raw
                # thresholded mask whether each image skips the NEXT layer;
                # images flagged by the previous layer take the identity
                # path here and report an all-ones mask (the reference's
                # `all_boolean_masks.append(torch.ones_like(prev_mask))`).
                # A skipped layer computes no decision, so skips never chain.
                raw_mask = info["keep_mask"]
                trigger = (
                    jnp.mean(raw_mask[:, 1:].astype(jnp.float32), axis=1)
                    > pcfg.skip_next_threshold
                )
                if skip_vec is not None:
                    x = jnp.where(skip_vec[:, None, None], x_in, x)
                    info = dict(info)
                    info["keep_mask"] = jnp.where(
                        skip_vec[:, None], jnp.ones_like(raw_mask), raw_mask
                    )
                    info["scores"] = jnp.where(
                        skip_vec[:, None],
                        jnp.ones_like(info["scores"]),
                        info["scores"],
                    )
                    trigger = trigger & ~skip_vec
                skip_vec = trigger
        prev_keep = info["keep_mask"]
        masks.append(info["keep_mask"])
        scores_l.append(info["scores"])
        if need_oracle:
            keys = ["pred_loss", "similarity", "oracle_keep", "confusion"]
            if pcfg.loss == "mse_attention":
                keys.append("attn_target")
            elif pcfg.loss == "mse_cosine":
                keys.append("cos_target")
            aux_l.append({k: info[k] for k in keys})

    x = layer_norm(x, backbone["ln_f"], config.layernorm_eps)
    cls = x[:, 0]
    logits = cls @ backbone["head"]["w"] + backbone["head"]["b"]

    out = {
        "logits": logits,
        "cls": cls,
        "last_hidden": x,
        "keep_masks": jnp.stack(masks),
        "scores": jnp.stack(scores_l),
    }
    if need_oracle:
        out["aux"] = jax.tree.map(lambda *a: jnp.stack(a), *aux_l)
    if return_layer_inputs:
        out["layer_inputs"] = jnp.stack(layer_inputs)
    return out


def skip_ratio(keep_masks: jnp.ndarray) -> jnp.ndarray:
    """Fraction of tokens skipped per layer: [L, B, S] -> [L]."""
    return 1.0 - keep_masks.mean(axis=(1, 2), dtype=jnp.float32)


def _keep_projection(scores: jnp.ndarray, k: int):
    """The progressive-compaction selection, in one place: CLS + top-k
    patches by score (rank_keep_mask tie-break), compacted-row assignment
    by cumsum. Returns (mask [B, S] bool, P [B, k+1, S] bool one-hot
    gather). Both progressive_drop and merge_dropped_tokens MUST derive
    their kept set from this helper — merge targets desynchronize from the
    drop decision if the two ever diverge (XLA CSE dedupes the recompute)."""
    keep = rank_keep_mask(scores, k)  # [B, S-1] patch keeps
    mask = add_cls_keep(keep)  # [B, S], CLS always kept
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # compacted row
    P = (
        rank[:, None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (1, k + 1, 1), 1)
    ) & mask[:, None, :]  # [B, k+1, S]
    return mask, P


def progressive_drop(
    x: jnp.ndarray,
    pred_params: Optional[dict],
    layer_idx: int,
    k: int,
    config: ViTConfig,
    pcfg: PruneConfig,
    layer_params: Optional[dict] = None,
):
    """One progressive-compaction drop: score the current (possibly already
    compacted) sequence and keep CLS + the top-k patches, preserving token
    order. Shared by progressive_topk_forward and the pruned pipeline
    (parallel/pipeline.py) so both execute identical selection semantics.

    Returns (x_compacted [B, k+1, D], scores [B, cur-1], cidx [B, k+1]).
    """
    b, s_cur, _ = x.shape
    scores, _ = apply_predictor(
        pred_params, layer_idx, x, config, pcfg, layer_params=layer_params
    )
    # sort/scatter-free compaction: the kept set as a rank mask (same
    # lower-index tie-break as top_k), compacted rows assigned by cumsum —
    # original token order is preserved, exactly as the sorted-top_k
    # formulation (kept as _progressive_drop_topk for the parity test).
    # top_k + sort are the expensive pieces of re-decide selection on TPU
    # (see ops/masking.py::rank_keep_mask); the comparison rank streams on
    # the VPU instead. The one-hot gather runs as a batched matmul on the
    # MXU instead of XLA's dynamic gather (the bucketed_masked_layer
    # lesson: row selection as P @ x is exact — each P row has a single 1
    # — and several times cheaper at these shapes than take_along_axis).
    _, P = _keep_projection(scores, k)
    xc = jnp.einsum("brt,btd->brd", P.astype(x.dtype), x)
    # source index of each compacted row (viz/pipeline bookkeeping; dead
    # code under the serving jit, where only logits are consumed)
    cidx = (
        P * jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_cur), 2)
    ).sum(-1).astype(jnp.int32)
    return xc, scores, cidx


def merge_dropped_tokens(
    x_full: jnp.ndarray,
    xc: jnp.ndarray,
    scores: jnp.ndarray,
    k: int,
    sizes: jnp.ndarray,
):
    """ToMe-flavored compaction (PruneConfig.merge_dropped): each DROPPED
    patch token merges into its most cosine-similar KEPT patch token as a
    size-weighted average, so its information survives the drop instead of
    vanishing. The framework extension closest to the reference's
    neighbor-averaging idea (himanshu/model_utils.py:47-51), executed as
    three batched matmuls (sim, value scatter-add, size scatter-add) — all
    MXU work, no dynamic gather.

    x_full: [B, S, D] pre-compaction sequence; xc: [B, k+1, D] compacted
    (CLS + kept patches, from progressive_drop on the same scores);
    sizes: [B, S] accumulated token sizes (ones at layer 0).
    Returns (xc_merged [B, k+1, D], sizes_compacted [B, k+1]).

    Invariant (tested): sum(merged * new_sizes) == sum(x_full * sizes) per
    feature — merging conserves the size-weighted token mass. CLS never
    merges in either direction.
    """
    dtype = x_full.dtype
    # the same decision as the drop, from the same helper (never re-derive)
    mask, P = _keep_projection(scores, k)
    sz_c = jnp.einsum("brt,bt->br", P.astype(dtype), sizes)  # [B, k+1]

    kept_p = xc[:, 1:, :]  # [B, k, D]
    xn = x_full * jax.lax.rsqrt(
        jnp.sum(jnp.square(x_full), -1, keepdims=True) + 1e-6)
    kn = kept_p * jax.lax.rsqrt(
        jnp.sum(jnp.square(kept_p), -1, keepdims=True) + 1e-6)
    sim = jnp.einsum("bsd,bkd->bsk", xn, kn)  # [B, S, k]
    dropped = (~mask).astype(dtype)  # [B, S]; CLS row is 0 by construction
    assign = (
        jax.nn.one_hot(jnp.argmax(sim, -1), k, dtype=dtype)
        * dropped[:, :, None]
    )  # [B, S, k] — one-hot target per dropped token, zero rows elsewhere
    add_num = jnp.einsum("bsk,bsd->bkd", assign, x_full * sizes[..., None])
    add_sz = jnp.einsum("bsk,bs->bk", assign, sizes)
    new_sz = sz_c[:, 1:] + add_sz
    merged = (kept_p * sz_c[:, 1:, None] + add_num) / new_sz[:, :, None]
    xc_merged = jnp.concatenate([xc[:, :1], merged], axis=1)
    return xc_merged, jnp.concatenate([sz_c[:, :1], new_sz], axis=1)


def _progressive_drop_topk(x, scores, k):
    """Reference formulation of progressive_drop's compaction (top_k →
    sorted indices → index-equality one-hot). Used only by the parity test
    and the kernel-lab ablation; progressive_drop's rank/cumsum form must
    select identically."""
    b, s_cur, _ = x.shape
    _, kidx = jax.lax.top_k(scores, k)
    cidx = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.sort(kidx.astype(jnp.int32), axis=-1) + 1], axis=1)
    P = (
        cidx[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_cur), 2)
    ).astype(x.dtype)
    xc = jnp.einsum("brt,btd->brd", P, x)
    return xc, cidx


def progressive_topk_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    config: ViTConfig,
    pcfg: PruneConfig,
    *,
    use_pallas: Optional[bool] = None,
    quant: Optional[str] = None,
    x0: Optional[jnp.ndarray] = None,
    logits_only: bool = False,
):
    """Serving-optimized progressive compaction (mode='topk_prog').

    Unlike mode='topk' (the reference M7 semantics, where every layer
    re-decides over all 197 positions and skipped tokens are scattered back,
    pradeep/using_attention.py:136-176), dropped tokens here never rejoin:
    the sequence physically shrinks following pcfg.keep_schedule, there is no
    per-layer scatter, and the classifier reads CLS from the compacted
    sequence. This removes ~40% of the pruned path's HBM traffic and is the
    deployment configuration for the >=3x throughput target.

    logits_only=True (the deployment fast path) drops 'cls'/'last_hidden'
    from the output and, on the Pallas path, fuses the LAST layer +
    final-LN + classifier into a CLS-only megakernel — the last layer's
    non-CLS Q/attention/MLP rows are dead work once only logits are
    consumed (ops/pallas/layer.py::fused_vit_layer_cls_logits; VERDICT r2
    #5 fixed-cost shave). Numerics are identical to the full path. (The
    patch embedding is NOT Pallas-fused: the measured-4x-slower fused embed
    kernel was reverted — see the NOTE at the embed call below; the shipped
    embed is XLA's strided-conv formulation.)

    Returns dict(logits, cls, keep_masks [L, B, S] bool mapped back to
    original token positions for viz parity, scores [L, B, N] in original
    positions with -inf at dropped positions).
    """
    if use_pallas is None:
        from vit_pruning_tpu.ops.dispatch import use_pallas as _resolve

        use_pallas = _resolve()
    if quant is None:
        from vit_pruning_tpu.ops.dispatch import serving_quant

        quant = serving_quant()
    backbone = params["backbone"]
    pred = params.get("predictor")
    qw = backbone["layers"]["attn"]["q"]["w"].shape[-1]
    if qw != config.attn_width:
        # same trace-time geometry check as vit_layer — the fused-encoder
        # segments bypass vit_layer, so head-pruned params under the wrong
        # config would otherwise silently run with the wrong head split
        raise ValueError(
            f"attention projection width {qw} != config.num_heads "
            f"({config.num_heads}) x config.head_dim ({config.head_dim}); "
            f"use the ViTConfig returned by prune_heads for pruned params"
        )

    # NOTE: a fused float-embed Pallas kernel was measured 4x SLOWER than
    # this XLA path (5.55 vs 1.40 ms/batch-512 DeiT-S, r3 ablation): XLA
    # fuses patch-transpose + projection + pos-add without materializing the
    # [B, N, C*P*P] patch tensor, which a pallas_call input forces. Kept as
    # ops/pallas/embed.py::embed_fused for the record; not used.
    x = x0 if x0 is not None else embed(pixel_values, backbone["embed"], config)
    b, s, d = x.shape
    L = config.num_layers
    schedule = pcfg.keep_schedule or tuple(
        [pcfg.top_k] + [0] * (L - 1)
    )  # 0 = no further drop
    schedule = tuple(min(k, s - 1) if k else 0 for k in schedule)

    # original position of each live token (CLS at 0)
    orig = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    masks, scores_l = [], []
    cur = s
    # merge_dropped: accumulated token sizes (merge weights) across drops
    sizes = jnp.ones((b, s), x.dtype) if pcfg.merge_dropped else None

    # group consecutive no-drop layers into segments so each segment runs in
    # ONE whole-encoder megakernel launch (activations VMEM-resident across
    # the segment; see ops/pallas/model.py)
    from vit_pruning_tpu.ops.dispatch import encoder_fusion_enabled
    from vit_pruning_tpu.ops.pallas.model import encoder_weights_fit

    itemsize = jax.tree.leaves(backbone["layers"])[0].dtype.itemsize
    fuse_segments = (
        use_pallas
        and encoder_fusion_enabled()
        and encoder_weights_fit(L, config.hidden_size, config.mlp_dim, itemsize)
    )

    def run_segment(x, l0, l1):
        """Layers [l0, l1) at fixed sequence length."""
        if l1 == l0:
            return x
        seg = jax.tree.map(lambda a: a[l0:l1], backbone["layers"])
        if fuse_segments:
            from vit_pruning_tpu.ops.pallas.model import differentiable_fused_encoder

            return differentiable_fused_encoder(
                config.num_heads, config.layernorm_eps
            )(x, seg, None)
        if l1 - l0 <= 8:
            # short segments unroll: measured 2-4% faster than scan on the
            # flagship DeiT-S presets (composed 8.52 vs 8.68 ms/batch) —
            # XLA overlaps the next layer's weight fetch across the
            # unrolled boundary, which a scan's dynamic-slice defeats
            for j in range(l0, l1):
                x = vit_layer(x, _layer_slice(backbone["layers"], j), config,
                              use_pallas=use_pallas, quant=quant)
            return x
        # long segments scan: ONE traced layer body (one Pallas payload)
        # per segment sequence length instead of one per layer — same
        # kernels at runtime, but the remote-compile request shrinks
        # ~seg-fold. vit_large's 24-layer composed program exceeded the
        # relay's request-size limit (HTTP 413) when fully unrolled.
        def body(carry, lp):
            return vit_layer(carry, lp, config,
                             use_pallas=use_pallas, quant=quant), None

        x, _ = jax.lax.scan(body, x, seg)
        return x

    seg_start = 0
    for i in range(L):
        lp = _layer_slice(backbone["layers"], i)
        k_i = schedule[i]
        if k_i and k_i < cur - 1 and _is_active(pcfg, i):
            x = run_segment(x, seg_start, i)
            seg_start = i
            x_full = x
            x, scores, cidx = progressive_drop(x, pred, i, k_i, config, pcfg,
                                               layer_params=lp)
            if pcfg.merge_dropped:
                x, sizes = merge_dropped_tokens(x_full, x, scores, k_i, sizes)
            # report scores at original patch positions (dropped = -inf)
            patch_orig = orig[:, 1:] - 1  # [B, cur-1] original patch indices
            full_scores = jnp.full((b, s - 1), -jnp.inf, scores.dtype)
            full_scores = jax.vmap(lambda f, idx, sc: f.at[idx].set(sc))(
                full_scores, patch_orig, scores
            )
            scores_l.append(full_scores)
            orig = jnp.take_along_axis(orig, cidx, axis=1)
            cur = k_i + 1
        else:
            scores_l.append(jnp.full((b, s - 1), -jnp.inf, x.dtype))
        live = jnp.zeros((b, s), bool)
        live = jax.vmap(lambda m, o: m.at[o].set(True))(live, orig)
        masks.append(live)
    if logits_only and use_pallas:
        # CLS-epilogue fusion: run to the LAST layer's input, then one kernel
        # computes last layer (CLS-only Q/attn/MLP, full K/V) + final-LN +
        # classifier. Under int8 serving the preceding layers stay int8 and
        # this tail runs in the weights' float dtype — quantizing a layer
        # whose Q/attention/MLP touch one row saves nothing (int8's gain is
        # 6-12% of a FULL layer), and the K/V projection difference is within
        # the int8 path's own quantization error.
        from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_cls_logits

        x = run_segment(x, seg_start, L - 1)
        logits = fused_vit_layer_cls_logits(
            x, _layer_slice(backbone["layers"], L - 1),
            backbone["ln_f"], backbone["head"],
            config.num_heads, eps=config.layernorm_eps,
        )
        return {
            "logits": logits,
            "keep_masks": jnp.stack(masks),
            "scores": jnp.stack(scores_l),
        }
    x = run_segment(x, seg_start, L)

    x = layer_norm(x, backbone["ln_f"], config.layernorm_eps)
    cls = x[:, 0]
    logits = cls @ backbone["head"]["w"] + backbone["head"]["b"]
    out = {
        "logits": logits,
        "cls": cls,
        # compacted final hidden states [B, live, D] (live tokens only; use
        # keep_masks to map rows back to original positions)
        "last_hidden": x,
        "keep_masks": jnp.stack(masks),
        "scores": jnp.stack(scores_l),
    }
    if logits_only:
        out.pop("cls")
        out.pop("last_hidden")
    return out
