"""The long-tail model variants (M8-M19) and structured pruning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig, vit_tiny
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params, pruned_vit_forward
from vit_pruning_tpu.models.vit import init_vit_params, vit_forward
from vit_pruning_tpu.ops.structured import (
    apply_channel_mask,
    head_importance,
    prune_heads,
    prune_mlp_channels,
)
from vit_pruning_tpu.train.freeze import freeze_mask, masked_adam
from vit_pruning_tpu.train.harness import make_train_step

CFG = vit_tiny()


def _x(b=2):
    return jax.random.normal(jax.random.PRNGKey(1), (b, 3, CFG.image_size, CFG.image_size))


@pytest.mark.parametrize("kw", [
    dict(mode="mask", predictor="cls_cosine"),          # M10 heuristic
    dict(mode="topk", predictor="cls_cosine", top_k=6), # M10 top-k form
    dict(mode="mask", predictor="key_mlp"),             # M8/M9 key scoring
    dict(mode="mask", predictor="cls_mlp", skip_correction="cls_direction"),  # M15 DHS
    dict(mode="mask", predictor="cls_mlp", skip_correction="updatenet"),      # M18
    dict(mode="mask", predictor="cls_mlp", query_only=True),                  # M15 attn
    dict(mode="mask", predictor="cls_mlp", measure_only=True),                # M13
    dict(mode="mask", predictor="cls_mlp", oracle_stream="parallel"),         # M19
])
def test_variant_trains_one_step(kw):
    pcfg = PruneConfig(**kw)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    out = pruned_vit_forward(params, _x(), CFG, pcfg, train=True, rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(np.asarray(out["aux"]["pred_loss"])).all()

    # one gradient step end-to-end (covers freeze-mask coverage of extras)
    optimizer = masked_adam(params, "vit_mlp_train", 1e-3)
    step = make_train_step(CFG, pcfg, "both", optimizer)
    batch = {"pixel_values": _x(), "labels": jnp.array([0, 1])}
    p2, _, metrics = step(params, optimizer.init(params), batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_measure_only_output_is_dense():
    """M13: masks are recorded but execution is dense."""
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", measure_only=True)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = _x()
    out = pruned_vit_forward(params, x, CFG, pcfg)
    ref = vit_forward(params["backbone"], x, CFG)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), atol=1e-5
    )
    assert not np.asarray(out["keep_masks"]).all()  # masks still computed


def test_query_only_differs_from_full_mask():
    """M15: keeping skipped tokens in K/V changes kept-token outputs."""
    base = dict(mode="mask", predictor="cls_mlp", mlp_threshold=0.5)
    x = _x()
    pc1 = PruneConfig(**base, query_only=False)
    pc2 = PruneConfig(**base, query_only=True)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pc1)
    o1 = pruned_vit_forward(params, x, CFG, pc1)
    o2 = pruned_vit_forward(params, x, CFG, pc2)
    np.testing.assert_array_equal(
        np.asarray(o1["keep_masks"]), np.asarray(o2["keep_masks"])
    )
    if not np.asarray(o1["keep_masks"]).all():
        assert np.abs(np.asarray(o1["logits"] - o2["logits"])).max() > 1e-6


def test_updatenet_params_created_and_used():
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", skip_correction="updatenet")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    assert "updatenet" in params
    mask = freeze_mask(params, "mlp_train")
    assert all(jax.tree.leaves(mask["updatenet"]))  # trains with predictor
    mask = freeze_mask(params, "vit_train")
    assert not any(jax.tree.leaves(mask["updatenet"]))


# --- structured pruning ------------------------------------------------------

def test_channel_mask_equivalent_to_zeroed_units():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    x = _x()
    cm = jnp.ones((CFG.num_layers, CFG.mlp_dim))
    cm = cm.at[:, ::2].set(0.0)  # drop every other hidden unit
    masked = apply_channel_mask(params, cm)
    out = vit_forward(masked, x, CFG)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # masking all channels reduces MLP to identity residual
    full_zero = apply_channel_mask(params, jnp.zeros((CFG.num_layers, CFG.mlp_dim)))
    out0 = vit_forward(full_zero, x, CFG)
    # fc2 bias still applies; just check it runs and differs from unmasked
    assert np.abs(np.asarray(out["logits"] - out0["logits"])).max() > 0


def test_prune_heads_physically():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    keep = [[0, 2]] * CFG.num_layers  # keep 2 of 4 heads
    new_params, new_cfg = prune_heads(params, CFG, keep)
    assert new_cfg.num_heads == 2
    q = new_params["layers"]["attn"]["q"]["w"]
    assert q.shape == (CFG.num_layers, CFG.hidden_size, 2 * (CFG.hidden_size // 4))
    out = vit_forward(new_params, _x(), new_cfg, use_pallas=False)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # pruning heads whose head_mask was zero matches the soft-masked model
    hm = np.zeros((CFG.num_layers, CFG.num_heads), np.float32)
    hm[:, [0, 2]] = 1.0
    ref = vit_forward(params, _x(), CFG, head_mask=jnp.asarray(hm))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), atol=1e-5
    )


def test_prune_mlp_channels_physically():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    keep = [list(range(0, CFG.mlp_dim, 2))] * CFG.num_layers
    new_params = prune_mlp_channels(params, keep)
    assert new_params["layers"]["mlp"]["fc1"]["w"].shape[-1] == CFG.mlp_dim // 2
    out = vit_forward(new_params, _x(), CFG, use_pallas=False)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # equals the channel-masked model exactly
    cm = jnp.zeros((CFG.num_layers, CFG.mlp_dim)).at[:, ::2].set(1.0)
    ref = vit_forward(apply_channel_mask(params, cm), _x(), CFG)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), atol=1e-5
    )


def test_head_importance_shape():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    imp = head_importance(params, _x(), CFG)
    assert imp.shape == (CFG.num_layers, CFG.num_heads)
    assert (imp >= 0).all() and (imp <= 1.001).all()


def test_layer_skip_threshold():
    """M8: an image whose mean keep-score is low bypasses the whole layer."""
    pcfg = PruneConfig(mode="mask", predictor="cls_cosine", layer_skip_threshold=1.1)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = _x()
    out = pruned_vit_forward(params, x, CFG, pcfg)
    # threshold 1.1 > any mean score => every layer skipped for every image
    km = np.asarray(out["keep_masks"])
    assert km[:, :, 1:].sum() == 0  # only CLS reported live
    # logits equal a no-layer model (embed -> ln -> head)
    from vit_pruning_tpu.models.vit import embed, layer_norm
    bb = params["backbone"]
    h = embed(x, bb["embed"], CFG)
    h = layer_norm(h, bb["ln_f"], CFG.layernorm_eps)
    ref = h[:, 0] @ bb["head"]["w"] + bb["head"]["b"]
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(ref), atol=1e-5)


# --- M8 skip-next mechanics (himanshu/midlayer.py:471-523) -------------------

def _skip_next_outputs(threshold, mlp_threshold=0.5):
    pcfg = PruneConfig(
        mode="mask", predictor="cls_mlp", measure_only=True,
        mlp_threshold=mlp_threshold, skip_next_threshold=threshold,
    )
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    out = pruned_vit_forward(params, _x(), CFG, pcfg)
    return params, pcfg, out


def test_skip_next_trigger_direction_and_identity():
    """When mean(thresholded mask) EXCEEDS the threshold, the NEXT layer is
    skipped (identity), and that layer reports an all-ones mask — the
    reference's skip_next flag semantics."""
    # threshold 0 disables; near-0 (but >0) triggers for any non-empty mask
    params, pcfg, out = _skip_next_outputs(threshold=1e-6, mlp_threshold=-1.0)
    # mlp_threshold=-1 => every token kept => mean(mask)=1 > 1e-6 at layer 0
    # => layer 1 must be skipped entirely
    km = np.asarray(out["keep_masks"])  # [L, B, S]
    assert km[1].all(), "skipped layer must record an all-ones mask"

    # identity check: layer 1's input equals its output. Compare against a
    # run of the dense backbone: hidden after layer 2 of the skip model must
    # equal "embed -> layer0 -> layer2" (layer 1 removed).
    from vit_pruning_tpu.models.vit import embed, vit_layer, layer_norm

    x = _x()
    bb = params["backbone"]
    h = embed(x, bb["embed"], CFG)
    h = vit_layer(h, jax.tree.map(lambda a: a[0], bb["layers"]), CFG)
    h = vit_layer(h, jax.tree.map(lambda a: a[2], bb["layers"]), CFG)  # layer 1 skipped
    h = layer_norm(h, bb["ln_f"], CFG.layernorm_eps)
    expected_logits = h[:, 0] @ bb["head"]["w"] + bb["head"]["b"]
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(expected_logits), rtol=2e-5, atol=2e-5
    )


def test_skip_next_no_chained_skips():
    """A skipped layer computes no decision, so layer 2 runs even though the
    all-ones recorded mask would re-trigger naively (vit_tiny has 3 layers:
    L0 decides skip L1; L1 skipped; L2 must NOT be skipped by L1's ones)."""
    params, pcfg, out = _skip_next_outputs(threshold=1e-6, mlp_threshold=-1.0)
    km = np.asarray(out["keep_masks"])
    # layer 2 triggers only from its own computed mask; with mlp_threshold=-1
    # every mask is ones anyway, so instead check identity is NOT applied:
    # logits must differ from the model that skips BOTH layers 1 and 2
    from vit_pruning_tpu.models.vit import embed, vit_layer, layer_norm

    x = _x()
    bb = params["backbone"]
    h = embed(x, bb["embed"], CFG)
    h = vit_layer(h, jax.tree.map(lambda a: a[0], bb["layers"]), CFG)
    h = layer_norm(h, bb["ln_f"], CFG.layernorm_eps)
    both_skipped = h[:, 0] @ bb["head"]["w"] + bb["head"]["b"]
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(both_skipped), atol=1e-4)


def test_skip_next_below_threshold_never_skips():
    """Trigger direction: mean(mask) must EXCEED the threshold to skip."""
    params, pcfg, out = _skip_next_outputs(threshold=1.5, mlp_threshold=-1.0)
    dense = vit_forward(params["backbone"], _x(), CFG)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(dense["logits"]), rtol=2e-5, atol=2e-5
    )


# --- topk_prog serving path: every per-token predictor runs ------------------

@pytest.mark.parametrize("predictor", [
    "cls_mlp", "token_mlp", "common_mlp", "bottleneck", "cls_cosine", "key_mlp",
])
def test_topk_prog_all_token_predictors(predictor):
    pcfg = PruneConfig(
        mode="topk_prog", predictor=predictor, loss="mse_cosine", top_k=6,
        keep_schedule=(6, 0, 4),
    )
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    out = pruned_vit_forward(params, _x(), CFG, pcfg)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert "last_hidden" in out  # ModifiedViTModel wrapper reads this


def test_topk_prog_rejects_fixed_grid_predictors():
    with pytest.raises(ValueError, match="full token grid"):
        PruneConfig(mode="topk_prog", predictor="compressor",
                    keep_schedule=(6, 0, 4))
    # drop only at layer 0 is allowed (full grid at decision time)
    PruneConfig(mode="topk_prog", predictor="compressor", keep_schedule=(6, 0, 0))


# --- M19 per-predictor optimizers --------------------------------------------

def test_per_predictor_adam_equals_masked_adam_at_equal_lr():
    from vit_pruning_tpu.train.freeze import per_predictor_adam

    pcfg = PruneConfig(mode="mask", predictor="cls_mlp")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    batch = {"pixel_values": _x(), "labels": jnp.array([0, 1])}

    outs = []
    for opt in (masked_adam(params, "mlp_train", 1e-3),
                per_predictor_adam(params, 1e-3)):
        step = make_train_step(CFG, pcfg, "cosine", opt)
        p_in = jax.tree.map(jnp.copy, params)  # step donates its inputs
        p2, _, _ = step(p_in, opt.init(p_in), batch, jax.random.PRNGKey(3))
        outs.append(p2)
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_per_predictor_adam_per_layer_lr_scales():
    from vit_pruning_tpu.train.freeze import per_predictor_adam

    pcfg = PruneConfig(mode="mask", predictor="cls_mlp")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    batch = {"pixel_values": _x(), "labels": jnp.array([0, 1])}

    scales = [0.0] * CFG.num_layers
    scales[1] = 1.0  # only layer 1's predictor learns
    opt = per_predictor_adam(params, 1e-3, lr_scales=scales)
    step = make_train_step(CFG, pcfg, "cosine", opt)
    w0 = np.asarray(params["predictor"]["mlp"]["l0"]["w"]).copy()
    p_in = jax.tree.map(jnp.copy, params)  # step donates its inputs
    p2, _, _ = step(p_in, opt.init(p_in), batch, jax.random.PRNGKey(3))

    w1 = np.asarray(p2["predictor"]["mlp"]["l0"]["w"])
    assert np.allclose(w0[0], w1[0])          # layer 0 frozen by scale 0
    assert not np.allclose(w0[1], w1[1])      # layer 1 updated
    assert np.allclose(w0[2], w1[2])          # layer 2 frozen


def test_skip_next_consumed_by_inactive_layer():
    """M8 regression: 'skip the next layer' means the physically next layer
    even when it is NOT an active pruning layer (active_layers gap). The
    flag must be consumed there, not leak past it to a later active layer."""
    pcfg = PruneConfig(
        mode="mask", predictor="cls_mlp", measure_only=True,
        mlp_threshold=-1.0, skip_next_threshold=1e-6,
        active_layers=(0, 2),
    )
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = _x()
    out = pruned_vit_forward(params, x, CFG, pcfg)

    from vit_pruning_tpu.models.vit import embed, layer_norm, vit_layer

    bb = params["backbone"]
    h = embed(x, bb["embed"], CFG)
    h = vit_layer(h, jax.tree.map(lambda a: a[0], bb["layers"]), CFG)
    # layer 1 (inactive) must be skipped for every image; layer 2 runs
    h = vit_layer(h, jax.tree.map(lambda a: a[2], bb["layers"]), CFG)
    h = layer_norm(h, bb["ln_f"], CFG.layernorm_eps)
    want = h[:, 0] @ bb["head"]["w"] + bb["head"]["b"]
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(want), rtol=2e-5, atol=2e-5
    )


# --- M9: next-key cosine masking (pradeep/key_considerations.py:280-346) ----

def test_key_cosine_matches_hand_built():
    """predictor='key_cosine' reproduces MaskIt(find_k_values(layer(x)),
    find_k_values(x)) > threshold on the patch tokens."""
    from vit_pruning_tpu.models.vit import embed, layer_norm, vit_layer

    pcfg0 = PruneConfig(mode="mask", predictor="key_cosine", active_layers=(0,))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg0)
    x = _x()

    lp = jax.tree.map(lambda a: a[0], params["backbone"]["layers"])
    h0 = embed(x, params["backbone"]["embed"], CFG)
    dense = vit_layer(h0, lp, CFG)

    def avg_keys(h):
        hn = layer_norm(h, lp["ln1"], CFG.layernorm_eps)
        k = hn @ lp["attn"]["k"]["w"] + lp["attn"]["k"]["b"]
        b, s, _ = k.shape
        return k.reshape(b, s, CFG.num_heads, CFG.head_dim).mean(axis=2)

    kc, kn = avg_keys(h0), avg_keys(dense)
    cos = np.sum(np.asarray(kn) * np.asarray(kc), -1) / (
        np.linalg.norm(np.asarray(kn), axis=-1)
        * np.linalg.norm(np.asarray(kc), axis=-1)
    )
    cos01 = (cos + 1.0) / 2.0
    # threshold at the patch-cosine median so the decision is non-degenerate
    # even on random weights (residual-dominated layers keep cos near 1)
    mt = float(np.median(cos01[:, 1:]))

    out = pruned_vit_forward(params, x, CFG, pcfg0.replace(mlp_threshold=mt))
    # the predictor's scores ARE the hand-built normalized key cosine
    got_scores = np.asarray(out["scores"])[0]
    np.testing.assert_allclose(got_scores, cos01[:, 1:], atol=1e-5)
    # mask = score >= threshold in the MaskIt orientation (stable keys =
    # PROCESS), checked against the forward's own scores to avoid f32/f64
    # tie-breaking at the exact cut
    got = np.asarray(out["keep_masks"])[0]
    np.testing.assert_array_equal(got[:, 1:], got_scores >= mt)
    assert 0 < got[:, 1:].sum() < got[:, 1:].size  # non-degenerate split
    assert got[:, 0].all()  # CLS always kept (framework invariant)


def test_key_cosine_trains_and_scores_in_range():
    pcfg = PruneConfig(mode="mask", predictor="key_cosine", loss="bce_oracle")
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    out = pruned_vit_forward(params, _x(), CFG, pcfg, train=True,
                             rng=jax.random.PRNGKey(2))
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1).all()
    assert np.isfinite(np.asarray(out["aux"]["pred_loss"])).all()


# --- mask-mode per-image density cap (VERDICT r2 #3) ------------------------

def test_mask_budget_caps_kept_count_to_top_scorers():
    budget = 4
    base = dict(mode="mask", predictor="cls_mlp", mlp_threshold=0.0)
    pc = PruneConfig(**base, mask_budget=budget)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pc)
    x = _x()
    out = pruned_vit_forward(params, x, CFG, pc)
    masks = np.asarray(out["keep_masks"])   # [L, B, S]
    scores = np.asarray(out["scores"])      # [L, B, N]
    kept = masks[:, :, 1:]
    assert (kept.sum(-1) <= budget).all()
    # threshold 0.0 keeps every token pre-cap, so the capped set must be
    # exactly each image's top-`budget` scores
    for l in range(masks.shape[0]):
        for b in range(masks.shape[1]):
            top = np.argsort(-scores[l, b])[:budget]
            assert set(np.nonzero(kept[l, b])[0]) == set(top)
    assert masks[:, :, 0].all()  # CLS uncounted and always kept


def test_mask_budget_noop_below_budget():
    """Images whose above-threshold count fits the budget are untouched —
    reference semantics for the typical image (himanshu/model_utils.py:62-91)."""
    base = dict(mode="mask", predictor="cls_mlp", mlp_threshold=0.7)
    x = _x()
    p1 = PruneConfig(**base)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, p1)
    out_uncapped = pruned_vit_forward(params, x, CFG, p1)
    n_kept = int(np.asarray(out_uncapped["keep_masks"])[:, :, 1:].sum(-1).max())
    p2 = PruneConfig(**base, mask_budget=max(n_kept, 1))
    out_capped = pruned_vit_forward(params, x, CFG, p2)
    np.testing.assert_array_equal(
        np.asarray(out_uncapped["keep_masks"]), np.asarray(out_capped["keep_masks"])
    )
    np.testing.assert_allclose(
        np.asarray(out_uncapped["logits"]), np.asarray(out_capped["logits"]),
        atol=1e-5,
    )


def test_pruned_config_records_head_dim_and_guards_mismatch():
    """prune_heads keeps the original per-head width: the returned config
    must say so (attn_head_dim), and forwarding pruned params under the
    ORIGINAL config must raise instead of silently splitting heads at the
    wrong width (hidden // num_heads)."""
    from vit_pruning_tpu.models.pruned_vit import progressive_topk_forward

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    keep = [[0, 2]] * CFG.num_layers
    new_params, new_cfg = prune_heads(params, CFG, keep)
    assert new_cfg.head_dim == CFG.hidden_size // CFG.num_heads
    assert new_cfg.attn_width == 2 * CFG.hidden_size // CFG.num_heads

    with pytest.raises(ValueError, match="projection width"):
        vit_forward(new_params, _x(), CFG, use_pallas=False)

    pc = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                     loss="mse_attention", top_k=8,
                     keep_schedule=(8,) + (0,) * (CFG.num_layers - 1))
    full = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pc)
    full["backbone"] = new_params
    with pytest.raises(ValueError, match="projection width"):
        progressive_topk_forward(full, _x(), CFG, pc, logits_only=True)
    out = progressive_topk_forward(full, _x(), new_cfg, pc, logits_only=True)
    assert np.isfinite(np.asarray(out["logits"])).all()


@pytest.mark.parametrize("kind", ["key_mlp", "key_cosine"])
def test_key_predictors_under_head_pruning(kind):
    """Key-based predictors reshape by config.num_heads x config.head_dim —
    with attn_head_dim recorded by prune_heads this works on a head-pruned
    backbone (it crashed before: 64 // 2 = 32 != the kept heads' 16)."""
    pcfg = PruneConfig(mode="mask", predictor=kind, mlp_threshold=0.4)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    bb, new_cfg = prune_heads(params["backbone"], CFG, [[0, 2]] * CFG.num_layers)
    pruned = dict(params, backbone=bb)
    if kind == "key_mlp":
        # re-init the key MLP at the pruned key width
        pruned = {**init_pruned_vit_params(jax.random.PRNGKey(1), new_cfg, pcfg),
                  "backbone": bb}
    out = pruned_vit_forward(pruned, _x(), new_cfg, pcfg)
    assert np.isfinite(np.asarray(out["logits"])).all()
