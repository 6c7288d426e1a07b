"""Pruning-op semantics: mask-mode and top-k compaction must match the
reference's ragged per-image gather (himanshu/model_utils.py:88-91), CLS must
never be skipped, the oracle must match the reference formula, and confusion
counts must match sklearn.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, ViTConfig, vit_tiny
from vit_pruning_tpu.models.pruned_vit import (
    init_pruned_vit_params,
    pruned_vit_forward,
    skip_ratio,
)
from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
from vit_pruning_tpu.ops.masking import (
    add_cls_keep,
    compact_indices,
    confusion_counts,
    gather_compact,
    neighbor_average,
    neighbor_index_table,
    scatter_back,
    similarity_oracle,
    topk_keep_mask,
)

CFG = vit_tiny()


def _layer0(params):
    return jax.tree.map(lambda a: a[0], params["layers"])


def ragged_reference(x, layer_params, keep_mask, config):
    """The reference semantics: per image, run the layer on ONLY the kept
    tokens, scatter outputs back, leave skipped tokens untouched."""
    out = np.array(x)
    for i in range(x.shape[0]):
        idx = np.where(np.array(keep_mask[i]))[0]
        sub = jnp.asarray(np.array(x[i])[idx])[None]
        y = vit_layer(sub, layer_params, config)
        out[i, idx] = np.asarray(y[0])
    return out


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_vit_params(key, CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, CFG.seq_len, CFG.hidden_size))
    return params, x


def test_mask_mode_matches_ragged_gather(setup):
    params, x = setup
    lp = _layer0(params)
    rng = np.random.RandomState(0)
    keep = rng.rand(3, CFG.num_patches) > 0.4
    mask = np.asarray(add_cls_keep(jnp.asarray(keep)))

    ref = ragged_reference(x, lp, mask, CFG)

    y = vit_layer(x, lp, CFG, token_mask=jnp.asarray(mask))
    got = np.where(mask[..., None], np.asarray(y), np.asarray(x))

    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_topk_compaction_matches_ragged_gather(setup):
    params, x = setup
    lp = _layer0(params)
    k = 7
    scores = jax.random.uniform(jax.random.PRNGKey(2), (3, CFG.num_patches))
    keep, _ = topk_keep_mask(scores, k)
    mask = add_cls_keep(keep)

    ref = ragged_reference(x, lp, np.asarray(mask), CFG)

    cidx = compact_indices(mask, k + 1)
    xc = gather_compact(x, cidx)
    yc = vit_layer(xc, lp, CFG)
    got = np.asarray(scatter_back(x, cidx, yc))

    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_compact_indices_cls_first(setup):
    scores = jax.random.uniform(jax.random.PRNGKey(3), (4, CFG.num_patches))
    keep, _ = topk_keep_mask(scores, 5)
    mask = add_cls_keep(keep)
    cidx = np.asarray(compact_indices(mask, 6))
    assert (cidx[:, 0] == 0).all()  # CLS first
    assert (np.diff(cidx, axis=1) > 0).all()  # ascending (stable order)


def test_similarity_oracle_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x_in = rng.randn(2, 9, 16).astype(np.float32)
    x_out = rng.randn(2, 9, 16).astype(np.float32)

    ti, to = torch.from_numpy(x_in), torch.from_numpy(x_out)
    cos = (F.cosine_similarity(to, ti, dim=-1) + 1) / 2
    eucl = torch.sum((to - ti) ** 2, dim=-1) / torch.sum(to**2, dim=-1)
    ref = 0.3 * cos + 0.7 * (1 / (1 + eucl))

    got = similarity_oracle(jnp.asarray(x_in), jnp.asarray(x_out), alpha=0.3)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)


def test_confusion_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    t = rng.rand(500) > 0.3
    p = rng.rand(500) > 0.5
    ref = sklearn_metrics.confusion_matrix(t.astype(int), p.astype(int), labels=[0, 1])
    got = np.asarray(confusion_counts(jnp.asarray(t), jnp.asarray(p)))
    np.testing.assert_array_equal(got, ref)


def test_neighbor_average_center_cell():
    g = 4
    idx = neighbor_index_table(g)
    patches = jnp.arange(g * g, dtype=jnp.float32)[None, :, None]  # value = index
    out = neighbor_average(patches, jnp.asarray(idx), weight=1.0)
    # interior cell 5 (row 1, col 1): neighbors 0,1,2,4,6,8,9,10 -> mean 5.0
    assert np.isclose(np.asarray(out)[0, 5, 0], 5.0)
    # with source_mask excluding everything, token keeps its own value
    none = jnp.zeros((1, g * g), dtype=bool)
    out2 = neighbor_average(patches, jnp.asarray(idx), weight=1.0, source_mask=none)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(patches))


@pytest.mark.parametrize("mode,predictor,loss", [
    ("mask", "cls_mlp", "bce_oracle"),
    ("mask", "token_mlp", "focal"),
    ("mask", "common_mlp", "mse_cosine"),
    ("mask", "compressor", "bce_oracle"),
    ("mask", "shared_compressor", "bce_oracle"),
    ("mask", "cnn", "bce_oracle"),
    ("mask", "bottleneck", "bce_oracle"),
    ("topk", "cls_mlp", "mse_attention"),
    ("oracle", "none", "bce_oracle"),
    ("random", "none", "bce_oracle"),
])
def test_pruned_forward_all_variants(mode, predictor, loss):
    pcfg = PruneConfig(mode=mode, predictor=predictor, loss=loss, top_k=6,
                       avg_threshold=0.1 if predictor == "cls_mlp" else 0.0)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))

    out = pruned_vit_forward(
        params, x, CFG, pcfg, train=True, rng=jax.random.PRNGKey(2)
    )
    L, B, S = CFG.num_layers, 2, CFG.seq_len
    assert out["logits"].shape == (B, CFG.num_labels)
    assert out["keep_masks"].shape == (L, B, S)
    assert out["scores"].shape == (L, B, S - 1)
    assert out["aux"]["pred_loss"].shape == (L,)
    assert out["aux"]["confusion"].shape == (L, 2, 2)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(np.asarray(out["aux"]["pred_loss"])).all()
    # CLS is never skipped
    assert np.asarray(out["keep_masks"])[:, :, 0].all()
    sr = np.asarray(skip_ratio(out["keep_masks"]))
    assert sr.shape == (L,) and (sr >= 0).all() and (sr <= 1).all()


def test_topk_budget_exact():
    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", loss="mse_attention", top_k=6)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))
    out = pruned_vit_forward(params, x, CFG, pcfg)
    kept = np.asarray(out["keep_masks"]).sum(-1)
    assert (kept == 7).all()  # top_k patches + CLS, every layer, every image


def test_attn_target_exposed_and_agreement_is_one_for_oracle_scores():
    # mse_attention training exposes its regression target in aux;
    # quality.py's attention_topk_agreement must read 1.0 when scores ARE
    # the target ranking and the keep_schedule is ignored (re-decide mode)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from quality import attention_topk_agreement
    from vit_pruning_tpu.ops.masking import rank_keep_mask

    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", loss="mse_attention",
                       top_k=6)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))
    out = pruned_vit_forward(params, x, CFG, pcfg, compute_oracle=True,
                             rng=jax.random.PRNGKey(2))
    assert "attn_target" in out["aux"]
    L = CFG.num_layers
    n = (CFG.image_size // CFG.patch_size) ** 2
    assert out["aux"]["attn_target"].shape == (L, 2, n)
    # agreement == 1 when predictor scores equal the attention target:
    # simulate by comparing the target's own top-k mask with itself
    tm = rank_keep_mask(out["aux"]["attn_target"], 6)
    assert bool((tm == rank_keep_mask(out["aux"]["attn_target"], 6)).all())
    # and the quality.py measurement runs end-to-end on a real batcher
    from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset

    images, labels = synthetic_dataset(n=8, image_size=CFG.image_size, num_labels=4)
    tb = Batches(images, labels, batch_size=8, image_size=CFG.image_size)
    cap, agree, by_layer = attention_topk_agreement(params, tb, CFG, pcfg)
    assert 0.0 <= cap <= 1.5 and 0.0 <= agree <= 1.0
    # plain top_k decides at layer 0 only; the per-layer dict must agree
    assert set(by_layer) == {0} and by_layer[0] == cap


def test_rank_keep_mask_matches_topk():
    # rank selection (serving path: no sort, no scatter) must pick EXACTLY
    # the top_k set, including top_k's lower-index-wins tie-break and -inf
    # padding as used by the mask_budget cap
    from vit_pruning_tpu.ops.masking import rank_keep_mask

    rng = np.random.RandomState(0)
    for trial in range(5):
        scores = rng.randn(4, 37).astype(np.float32)
        # force ties: quantize coarsely and duplicate a few entries
        scores = np.round(scores * 2) / 2
        scores[1, 5] = scores[1, 20] = scores[1, 31]
        if trial == 3:  # -inf padding like the capped-mask call site
            scores[2, ::3] = -np.inf
        for k in (1, 7, 36):
            ref, _ = topk_keep_mask(jnp.asarray(scores), k)
            got = rank_keep_mask(jnp.asarray(scores), k)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
            assert int(np.asarray(got).sum(-1).max()) <= k


def test_inactive_layers_stay_dense():
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", active_layers=(1,))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))
    out = pruned_vit_forward(params, x, CFG, pcfg)
    masks = np.asarray(out["keep_masks"])
    assert masks[0].all() and masks[2].all()  # inactive layers keep everything


def test_forward_is_jittable():
    pcfg = PruneConfig(mode="topk", predictor="cls_mlp", loss="mse_attention", top_k=6)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))

    fwd = jax.jit(
        lambda p, v: pruned_vit_forward(p, v, CFG, pcfg, train=True),
    )
    out = fwd(params, x)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_losses_match_torch():
    torch = pytest.importorskip("torch")
    from vit_pruning_tpu.train.losses import weighted_bce_oracle, cross_entropy

    rng = np.random.RandomState(0)
    scores = rng.rand(4, 9).astype(np.float32)
    labels = (rng.rand(4, 9) > 0.4)

    fa = labels.mean()
    ref = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([fa / (1 - fa + 1e-16)], dtype=torch.float32)
    )(torch.from_numpy(scores), torch.from_numpy(labels.astype(np.float32)))
    got = weighted_bce_oracle(jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    logits = rng.randn(8, 10).astype(np.float32)
    y = rng.randint(0, 10, 8)
    ref_ce = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(y))
    got_ce = cross_entropy(jnp.asarray(logits), jnp.asarray(y))
    np.testing.assert_allclose(float(got_ce), float(ref_ce), rtol=1e-5)


def test_bucketed_masked_layer_matches_full_length():
    """Serving mask mode (bucketed compaction) == full-length masked layer
    on kept rows, across mask densities (including all-kept)."""
    from vit_pruning_tpu.models.pruned_vit import bucketed_masked_layer
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer

    cfg = CFG
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.seq_len, cfg.hidden_size))
    for density, seed in [(0.3, 2), (0.6, 3), (1.1, 4)]:
        mask = jax.random.uniform(jax.random.PRNGKey(seed), (4, cfg.seq_len)) < density
        mask = mask.at[:, 0].set(True)
        ref = vit_layer(x, lp, cfg, token_mask=mask)
        got = bucketed_masked_layer(x, lp, mask, cfg)
        err = np.abs(np.asarray(got - ref)) * np.asarray(mask)[..., None]
        assert err.max() < 1e-4, (density, err.max())


def test_mask_mode_serving_equals_oracle_instrumented_outputs():
    """The serving (bucketed) and training (full-length) mask paths agree."""
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", mlp_threshold=0.5)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))
    serve = pruned_vit_forward(params, x, CFG, pcfg)
    instr = pruned_vit_forward(params, x, CFG, pcfg, compute_oracle=True,
                               rng=jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(serve["logits"]), np.asarray(instr["logits"]), atol=1e-4, rtol=1e-4
    )


def test_per_layer_sim_threshold_tuple():
    """pcfg.sim_threshold as a per-layer tuple drives each layer's oracle
    independently: an impossible threshold keeps nothing, an infinite one
    keeps everything (similarity is finite and nonnegative)."""
    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss="bce_oracle",
                       sim_threshold=tuple(
                           [-1.0] + [1e9] * (CFG.num_layers - 1)))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.image_size, CFG.image_size))
    out = pruned_vit_forward(params, x, CFG, pcfg, compute_oracle=True,
                             rng=jax.random.PRNGKey(2))
    keep = np.asarray(out["aux"]["oracle_keep"])  # [L, B, N]
    assert not keep[0].any()   # sim < -1 never holds
    assert keep[1:].all()      # sim < 1e9 always holds


def test_channel_importance_ranks_zeroed_channels_last():
    from vit_pruning_tpu.ops.structured import channel_importance

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    dead = 3
    fc1 = params["layers"]["mlp"]["fc1"]
    fc1["w"] = fc1["w"].at[:, :, dead].set(0.0)
    imp = channel_importance(params)  # [L, M]
    assert imp.shape == (CFG.num_layers, CFG.mlp_dim)
    assert (imp[:, dead] == 0.0).all()
    assert (imp[:, dead] <= imp.min(axis=1)).all()


def test_bucketed_cap_hint_matches_unhinted():
    """cap_hint only tightens the executed capacity — numerics unchanged."""
    from vit_pruning_tpu.models.pruned_vit import bucketed_masked_layer
    from vit_pruning_tpu.models.vit import init_vit_params

    cfg = CFG
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    s = cfg.seq_len
    x = jax.random.normal(jax.random.PRNGKey(1), (4, s, cfg.hidden_size))
    keep = jax.random.uniform(jax.random.PRNGKey(2), (4, s)) > 0.5
    keep = keep.at[:, 0].set(True)
    # bound kept counts so a tight hint is legal
    maxc = int(np.asarray(keep.sum(-1)).max())
    base = bucketed_masked_layer(x, lp, keep, cfg)
    hinted = bucketed_masked_layer(x, lp, keep, cfg, cap_hint=maxc)
    m = np.asarray(keep)[..., None]
    np.testing.assert_allclose(np.asarray(base) * m, np.asarray(hinted) * m,
                               atol=1e-5)


def test_progressive_drop_rank_form_matches_topk_form():
    # progressive_drop's sort-free rank/cumsum compaction must produce
    # byte-identical compacted sequences AND source indices to the
    # top_k -> sorted-index one-hot formulation, including score ties
    # (lower original index wins, matching jax.lax.top_k)
    from vit_pruning_tpu.models.pruned_vit import (
        _layer_slice,
        _progressive_drop_topk,
        progressive_drop,
    )

    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       loss="mse_attention", top_k=6)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    n = (CFG.image_size // CFG.patch_size) ** 2
    x = jax.random.normal(jax.random.PRNGKey(1), (3, n + 1, CFG.hidden_size))
    for k in (1, 4, n - 1):
        xc, scores, cidx = progressive_drop(
            x, params["predictor"], 0, k, CFG, pcfg,
            layer_params=_layer_slice(params["backbone"]["layers"], 0),
        )
        # tie-heavy control: quantized scores force many equal values
        for s in (scores, jnp.round(scores * 2) / 2):
            keepx, keepc = _progressive_drop_topk(x, s, k)
            xc2, _, cidx2 = progressive_drop(
                x, params["predictor"], 0, k, CFG, pcfg,
                layer_params=_layer_slice(params["backbone"]["layers"], 0),
            )
            if s is scores:
                np.testing.assert_array_equal(np.asarray(cidx), np.asarray(keepc))
                np.testing.assert_allclose(np.asarray(xc), np.asarray(keepx),
                                           rtol=0, atol=0)
    # direct tie check on hand-built scores (bypasses the predictor)
    from vit_pruning_tpu.ops.masking import add_cls_keep, rank_keep_mask

    s = jnp.array([[1.0, 2.0, 2.0, 0.5, 2.0]])
    xt = jnp.arange(6, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 6, 4))
    keep = rank_keep_mask(s, 2)
    mask = add_cls_keep(keep)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    P = ((rank[:, None, :] == jax.lax.broadcasted_iota(jnp.int32, (1, 3, 1), 1))
         & mask[:, None, :])
    xc = jnp.einsum("brt,btd->brd", P.astype(xt.dtype), xt)
    keepx, keepc = _progressive_drop_topk(xt, s, 2)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(keepx), rtol=0, atol=0)


def test_attention_agreement_skips_inactive_drop_layers():
    """quality.py's fidelity metric must grade only layers the serving
    schedule actually decides at: a keep_schedule drop that active_layers
    disables returns dummy scores/targets from the eval forward (capture 0,
    tie-broken agreement 1) and must not dilute the metric."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from quality import attention_topk_agreement
    from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset

    images, labels = synthetic_dataset(n=8, image_size=CFG.image_size, num_labels=4)
    tb = Batches(images, labels, batch_size=8, image_size=CFG.image_size)
    common = dict(mode="topk_prog", predictor="cls_mlp", loss="mse_attention",
                  top_k=6, active_layers=(2,))
    # drop scheduled at layer 0 but layer 0 is INACTIVE -> never decided
    pcfg_a = PruneConfig(keep_schedule=(6, 0, 6, 0), **common)
    # control: no entry at layer 0 at all — identical serving decisions
    pcfg_b = PruneConfig(keep_schedule=(0, 0, 6, 0), **common)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg_a)
    cap_a, agree_a, by_a = attention_topk_agreement(params, tb, CFG, pcfg_a)
    cap_b, agree_b, by_b = attention_topk_agreement(params, tb, CFG, pcfg_b)
    assert cap_a == cap_b and agree_a == agree_b
    # the inactive layer-0 drop entry must not appear as a graded layer
    assert set(by_a) == set(by_b) == {2}


# --- merge_dropped (ToMe-flavored compaction, framework extension) -----------

def _merge_reference(x_full, mask, sizes):
    """Per-image numpy reference for merge_dropped_tokens: each dropped patch
    token merges (size-weighted) into its most cosine-similar kept patch."""
    b, s, d = x_full.shape
    out_x, out_sz = [], []
    for i in range(b):
        kept_idx = np.where(mask[i])[0]          # includes CLS at 0
        kept_p_idx = kept_idx[kept_idx != 0]     # kept patches only
        drop_idx = np.where(~mask[i])[0]
        acc = {int(t): (x_full[i, t] * sizes[i, t], sizes[i, t])
               for t in kept_p_idx}
        kept_p = x_full[i, kept_p_idx]
        kn = kept_p / np.sqrt((kept_p ** 2).sum(-1, keepdims=True) + 1e-6)
        for t in drop_idx:
            v = x_full[i, t]
            vn = v / np.sqrt((v ** 2).sum() + 1e-6)
            tgt = int(kept_p_idx[np.argmax(kn @ vn)])
            num, sz = acc[tgt]
            acc[tgt] = (num + v * sizes[i, t], sz + sizes[i, t])
        rows, szs = [x_full[i, 0]], [sizes[i, 0]]  # CLS untouched
        for t in kept_p_idx:
            num, sz = acc[int(t)]
            rows.append(num / sz)
            szs.append(sz)
        out_x.append(np.stack(rows))
        out_sz.append(np.array(szs))
    return np.stack(out_x), np.stack(out_sz)


def test_merge_dropped_matches_naive_reference():
    from vit_pruning_tpu.models.pruned_vit import merge_dropped_tokens
    from vit_pruning_tpu.ops.masking import rank_keep_mask as rkm

    rng = np.random.RandomState(0)
    b, s, d, k = 3, 13, 8, 5
    x = rng.randn(b, s, d).astype(np.float32)
    scores = rng.randn(b, s - 1).astype(np.float32)
    # non-trivial accumulated sizes (as if from an earlier drop)
    sizes = rng.randint(1, 4, size=(b, s)).astype(np.float32)
    sizes[:, 0] = 1.0

    keep = np.asarray(rkm(jnp.asarray(scores), k))
    mask = np.asarray(add_cls_keep(jnp.asarray(keep)))
    # compacted kept rows (original order), as progressive_drop produces
    xc = np.stack([x[i][np.where(mask[i])[0]] for i in range(b)])

    got_x, got_sz = merge_dropped_tokens(
        jnp.asarray(x), jnp.asarray(xc), jnp.asarray(scores), k,
        jnp.asarray(sizes))
    ref_x, ref_sz = _merge_reference(x, mask, sizes)
    np.testing.assert_allclose(np.asarray(got_sz), ref_sz, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), ref_x, atol=1e-5)


def test_merge_dropped_conserves_mass_and_cls():
    """Size-weighted token mass is conserved per feature; CLS row and size
    pass through untouched."""
    from vit_pruning_tpu.models.pruned_vit import merge_dropped_tokens
    from vit_pruning_tpu.ops.masking import rank_keep_mask as rkm

    rng = np.random.RandomState(1)
    b, s, d, k = 2, 17, 16, 6
    x = rng.randn(b, s, d).astype(np.float32)
    scores = rng.randn(b, s - 1).astype(np.float32)
    sizes = np.ones((b, s), np.float32)

    keep = np.asarray(rkm(jnp.asarray(scores), k))
    mask = np.asarray(add_cls_keep(jnp.asarray(keep)))
    xc = np.stack([x[i][np.where(mask[i])[0]] for i in range(b)])

    got_x, got_sz = merge_dropped_tokens(
        jnp.asarray(x), jnp.asarray(xc), jnp.asarray(scores), k,
        jnp.asarray(sizes))
    got_x, got_sz = np.asarray(got_x), np.asarray(got_sz)
    np.testing.assert_allclose(got_x[:, 0], x[:, 0], atol=0)
    np.testing.assert_allclose(got_sz[:, 0], sizes[:, 0], atol=0)
    # patch mass: sum over compacted patches of x*size == sum over all patches
    np.testing.assert_allclose(
        (got_x[:, 1:] * got_sz[:, 1:, None]).sum(1),
        (x[:, 1:] * sizes[:, 1:, None]).sum(1), atol=1e-4)
    assert got_sz[:, 1:].sum() == pytest.approx(float(s - 1) * b)


def test_merge_dropped_end_to_end_progressive():
    """PruneConfig.merge_dropped changes the values (merged information) but
    not the selection (keep_masks identical), across two scheduled drops."""
    from vit_pruning_tpu.models.pruned_vit import progressive_topk_forward

    cfg = CFG
    common = dict(mode="topk_prog", predictor="cls_mlp", top_k=9,
                  keep_schedule=(9, 0, 5))
    pcfg_off = PruneConfig(**common)
    pcfg_on = PruneConfig(merge_dropped=True, **common)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), cfg, pcfg_off)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.image_size,
                                                  cfg.image_size))
    off = progressive_topk_forward(params, x, cfg, pcfg_off, use_pallas=False)
    on = progressive_topk_forward(params, x, cfg, pcfg_on, use_pallas=False)
    assert on["logits"].shape == off["logits"].shape
    # first drop's selection is identical (same scores feed the decision);
    # values afterwards differ because dropped tokens merged in
    np.testing.assert_array_equal(np.asarray(on["keep_masks"][0]),
                                  np.asarray(off["keep_masks"][0]))
    assert float(jnp.abs(on["logits"] - off["logits"]).max()) > 1e-6


@pytest.mark.parametrize("loss,grad_check", [
    ("bce_oracle", True),
    ("mse_attention", True),
    ("mse_cosine", False),
])
def test_hoisted_oracle_targets_match_in_layer_path(monkeypatch, loss,
                                                    grad_check):
    """The r5 hoist (teacher signals computed OUTSIDE the remat/AD scope,
    _hoisted_oracle_targets) must be semantically invisible: identical
    pred_loss / similarity labels / confusion AND identical 'both'-loss
    gradients vs the pre-r5 in-layer path."""
    from vit_pruning_tpu.models import pruned_vit as pv

    pcfg = PruneConfig(mode="mask", predictor="cls_mlp", loss=loss, top_k=6)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 3, CFG.image_size, CFG.image_size))

    def forward(p):
        return pruned_vit_forward(p, x, CFG, pcfg, train=True,
                                  rng=jax.random.PRNGKey(2))

    def both_loss(p):
        out = forward(p)
        one_hot = jnp.zeros((2, CFG.num_labels)).at[:, 0].set(1.0)
        ce = -jnp.mean(jnp.sum(
            jax.nn.log_softmax(out["logits"]) * one_hot, axis=-1))
        return ce + out["aux"]["pred_loss"].mean()

    assert pv._hoistable_oracle(pcfg)
    out_h = forward(params)
    g_h = jax.grad(both_loss)(params) if grad_check else None

    monkeypatch.setattr(pv, "_hoistable_oracle", lambda _pcfg: False)
    out_i = forward(params)
    g_i = jax.grad(both_loss)(params) if grad_check else None

    np.testing.assert_allclose(np.asarray(out_h["aux"]["pred_loss"]),
                               np.asarray(out_i["aux"]["pred_loss"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_h["keep_masks"]),
                                  np.asarray(out_i["keep_masks"]))
    np.testing.assert_array_equal(np.asarray(out_h["aux"]["confusion"]),
                                  np.asarray(out_i["aux"]["confusion"]))
    if grad_check:
        for (ph, lh), (pi, li) in zip(
                jax.tree_util.tree_flatten_with_path(g_h)[0],
                jax.tree_util.tree_flatten_with_path(g_i)[0]):
            assert ph == pi
            np.testing.assert_allclose(np.asarray(lh), np.asarray(li),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=str(ph))


def test_mode_none_scan_fast_path_matches_unrolled():
    """mode='none' routes through vit_forward's scanned encoder (r5: the
    unrolled dense train graph at ViT-L crashed the remote compiler). It
    must be output-identical — incl. synthesized masks/scores/aux — to the
    unrolled inactive-layer path (mode='mask' with active_layers=()), and
    gradient-identical under remat."""
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 3, CFG.image_size, CFG.image_size))
    dense_cfg = PruneConfig(mode="none", predictor="none")
    unrolled_cfg = PruneConfig(mode="mask", predictor="none",
                               active_layers=())
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, dense_cfg)

    fast = pruned_vit_forward(params, x, CFG, dense_cfg, compute_oracle=True)
    slow = pruned_vit_forward(params, x, CFG, unrolled_cfg,
                              compute_oracle=True)
    np.testing.assert_allclose(np.asarray(fast["logits"]),
                               np.asarray(slow["logits"]), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(fast["keep_masks"]),
                                  np.asarray(slow["keep_masks"]))
    np.testing.assert_array_equal(np.asarray(fast["scores"]),
                                  np.asarray(slow["scores"]))
    for k in ("pred_loss", "similarity", "oracle_keep", "confusion"):
        np.testing.assert_array_equal(np.asarray(fast["aux"][k]),
                                      np.asarray(slow["aux"][k]))

    def loss(p, pcfg, remat):
        out = pruned_vit_forward(p, x, CFG, pcfg, train=True, oracle=False,
                                 remat=remat)
        return jnp.mean(out["logits"] ** 2)

    g_fast = jax.grad(lambda p: loss(p, dense_cfg, True))(params)
    g_slow = jax.grad(lambda p: loss(p, unrolled_cfg, True))(params)
    for (pf, lf), (ps, ls) in zip(
            jax.tree_util.tree_flatten_with_path(g_fast)[0],
            jax.tree_util.tree_flatten_with_path(g_slow)[0]):
        assert pf == ps
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=2e-5, atol=2e-5, err_msg=str(pf))
