"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.ops.attention import attention_probs, mha
from vit_pruning_tpu.ops.pallas.attention import fused_attention
from vit_pruning_tpu.ops.pallas.mlp import fused_mlp


@pytest.mark.parametrize("masked", [False, True])
def test_fused_attention_matches_reference(masked):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    B, H, S, hd = 2, 3, 197, 64
    q = jax.random.normal(k1, (B, H, S, hd))
    k = jax.random.normal(k2, (B, H, S, hd))
    v = jax.random.normal(k3, (B, H, S, hd))
    mask = None
    if masked:
        mask = jax.random.uniform(k4, (B, S)) > 0.4
        mask = mask.at[:, 0].set(True)

    p = attention_probs(q, k, mask)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    got = fused_attention(q, k, v, mask, interpret=True)

    err = np.abs(np.asarray(got - ref))
    if masked:
        # only rows of valid tokens are meaningful (invalid rows are
        # overwritten by the residual passthrough upstream)
        err = err * np.asarray(mask)[:, None, :, None]
    assert err.max() < 1e-5


def test_fused_attention_odd_shapes():
    # 50-token sequence (compacted top-k path), head_dim 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, 2, 50, 32))
    k = jax.random.normal(k2, (1, 2, 50, 32))
    v = jax.random.normal(k3, (1, 2, 50, 32))
    p = attention_probs(q, k, None)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_mlp_matches_reference():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    T, D, M = 300, 384, 1536
    x = jax.random.normal(k1, (T, D))
    w1 = jax.random.normal(k2, (D, M)) * 0.05
    b1 = jax.random.normal(k3, (M,)) * 0.05
    w2 = jax.random.normal(k4, (M, D)) * 0.05
    b2 = jnp.ones((D,)) * 0.1

    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    got = fused_mlp(x, w1, b1, w2, b2, block_t=128, block_m=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_mha_pallas_path_matches_jnp():
    """End-to-end through ops.attention.mha with use_pallas (interpret via
    monkeypatched flag is not needed — call fused path off-TPU through
    interpret-enabled kernel)."""
    key = jax.random.PRNGKey(3)
    B, S, D, H = 2, 29, 64, 4
    x = jax.random.normal(key, (B, S, D))
    params = {
        name: {
            "w": jax.random.normal(jax.random.fold_in(key, i), (D, D)) * 0.05,
            "b": jnp.zeros((D,)),
        }
        for i, name in enumerate(["q", "k", "v", "o"])
    }
    mask = jax.random.uniform(jax.random.fold_in(key, 9), (B, S)) > 0.3
    mask = mask.at[:, 0].set(True)

    ref = mha(x, params, H, token_mask=mask, use_pallas=False)
    # fused path (interpret mode so it runs on CPU)
    import vit_pruning_tpu.ops.pallas.attention as pa

    orig = pa.fused_attention
    pa.fused_attention = lambda q, k, v, m=None: orig(q, k, v, m, interpret=True)
    try:
        got = mha(x, params, H, token_mask=mask, use_pallas=True)
    finally:
        pa.fused_attention = orig

    err = np.abs(np.asarray(got - ref)) * np.asarray(mask)[..., None]
    assert err.max() < 1e-5


def test_differentiable_fused_layer_grads_match():
    """Custom-VJP megakernel: grads equal the jnp reference's."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import differentiable_fused_layer

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=1,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))
    mask = jax.random.uniform(jax.random.PRNGKey(2), (2, 17)) > 0.3
    mask = mask.at[:, 0].set(True)

    f = differentiable_fused_layer(cfg.num_heads, cfg.layernorm_eps, interpret=True)

    def loss_fused(x, p):
        y = f(x, p, mask)
        return (jnp.where(mask[..., None], y, x) ** 2).sum()

    def loss_ref(x, p):
        y = vit_layer(x, p, cfg, token_mask=mask)
        return (jnp.where(mask[..., None], y, x) ** 2).sum()

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, lp)
    gx2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(x, lp)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("attn_impl",
                         ["unrolled", "batched", "staged", "staged2", "packed"])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_layer_attn_impls_match_reference(attn_impl, masked):
    """Both megakernel attention implementations match the jnp layer."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=1,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64))
    mask = None
    if masked:
        mask = jax.random.uniform(jax.random.PRNGKey(2), (4, 17)) > 0.3
        mask = mask.at[:, 0].set(True)

    ref = vit_layer(x, lp, cfg, token_mask=mask)
    got = fused_vit_layer(
        x, lp, cfg.num_heads, eps=cfg.layernorm_eps, token_mask=mask,
        interpret=True, attn_impl=attn_impl,
    )
    if masked:
        err = np.abs(np.asarray(got - ref)) * np.asarray(mask)[..., None]
    else:
        err = np.abs(np.asarray(got - ref))
    assert err.max() < 2e-5


@pytest.mark.parametrize("masked", [False, True])
def test_fused_encoder_matches_layer_loop(masked):
    """Whole-encoder megakernel == L sequential jnp layers."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.pallas.model import fused_vit_encoder

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=3,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64))
    mask = None
    if masked:
        mask = jax.random.uniform(jax.random.PRNGKey(2), (4, 17)) > 0.3
        mask = mask.at[:, 0].set(True)

    ref = x
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        ref = vit_layer(ref, lp, cfg, token_mask=mask)

    got = fused_vit_encoder(
        x, params["layers"], cfg.num_heads, eps=cfg.layernorm_eps,
        token_mask=mask, interpret=True,
    )
    err = np.abs(np.asarray(got - ref))
    if masked:
        err = err * np.asarray(mask)[..., None]
    assert err.max() < 1e-4


@pytest.mark.parametrize("masked", [False, True])
def test_int8_fused_layer_matches_quant_reference(masked):
    """int8 megakernel == ops/quant.py's jnp int8 serving layer."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params
    from vit_pruning_tpu.ops.pallas.layer_int8 import fused_vit_layer_int8
    from vit_pruning_tpu.ops.quant import int8_vit_layer_ref, quantize_layer_params

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=1,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    qp = quantize_layer_params(lp)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64))
    mask = None
    if masked:
        mask = jax.random.uniform(jax.random.PRNGKey(2), (4, 17)) > 0.3
        mask = mask.at[:, 0].set(True)

    ref = int8_vit_layer_ref(x, qp, cfg, token_mask=mask)
    got = fused_vit_layer_int8(
        x, qp, cfg.num_heads, eps=cfg.layernorm_eps, token_mask=mask,
        interpret=True,
    )
    if masked:
        err = np.abs(np.asarray(got - ref)) * np.asarray(mask)[..., None]
    else:
        err = np.abs(np.asarray(got - ref))
    assert err.max() < 1e-4


def test_int8_reference_close_to_float_layer():
    """Quantization error of the int8 serving layer vs the float layer is
    small on unit-scale activations (sanity bound, not a strict gate)."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.quant import int8_vit_layer_ref, quantize_layer_params

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=1,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64))
    ref = vit_layer(x, lp, cfg)
    got = int8_vit_layer_ref(x, quantize_layer_params(lp), cfg)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quant_mode_int8_forward_close_to_float():
    """quant_mode('int8') swaps every layer to the int8 serving path (XLA
    branch here); logits stay close to the float forward."""
    from vit_pruning_tpu.configs import ViTConfig
    from vit_pruning_tpu.models.vit import init_vit_params, vit_forward
    from vit_pruning_tpu.ops.dispatch import quant_mode

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=4,
                    num_heads=2, mlp_dim=128, num_labels=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    ref = vit_forward(params, x, cfg, use_pallas=False)["logits"]
    with quant_mode("int8"):
        got = vit_forward(params, x, cfg, use_pallas=False)["logits"]
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel
    assert not np.allclose(np.asarray(got), np.asarray(ref))  # actually quantized


def test_quant_mode_int8_progressive_and_head_pruned():
    """int8 serving composes with progressive compaction and with physically
    head/channel-pruned backbones (the composed bench preset)."""
    from vit_pruning_tpu.configs import PruneConfig, ViTConfig
    from vit_pruning_tpu.models.pruned_vit import (
        init_pruned_vit_params,
        progressive_topk_forward,
    )
    from vit_pruning_tpu.ops.dispatch import quant_mode
    from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=4,
                    num_heads=4, mlp_dim=128, num_labels=10)
    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       loss="bce_oracle", top_k=8, keep_schedule=(8, 0, 4, 0))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), cfg, pcfg)
    bb, pruned_cfg = prune_heads(params["backbone"], cfg,
                                 [[0, 2]] * cfg.num_layers)
    bb = prune_mlp_channels(bb, [list(range(0, cfg.mlp_dim, 2))] * cfg.num_layers)
    params = dict(params, backbone=bb)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))

    ref = progressive_topk_forward(params, x, pruned_cfg, pcfg,
                                   use_pallas=False)["logits"]
    with quant_mode("int8"):
        got = progressive_topk_forward(params, x, pruned_cfg, pcfg,
                                       use_pallas=False)["logits"]
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert 0.0 < rel < 0.05, rel  # quantization engaged AND small


# --- Serving fixed-cost fusions (VERDICT r2 #5) -----------------------------

def test_fused_cls_logits_matches_reference():
    """Last layer + final-LN + classifier in one CLS-only kernel == the full
    vit_layer -> layer_norm -> head pipeline (CLS attention sees the same
    full K/V set; non-CLS rows are dead work, not different math)."""
    from vit_pruning_tpu.configs import vit_tiny
    from vit_pruning_tpu.models.vit import init_vit_params, layer_norm, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_cls_logits

    cfg = vit_tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[-1], params["layers"])
    # odd sequence length (compacted serving shape)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 11, cfg.hidden_size))

    y = vit_layer(x, lp, cfg, use_pallas=False, quant="none")
    yn = layer_norm(y, params["ln_f"], cfg.layernorm_eps)
    ref = yn[:, 0] @ params["head"]["w"] + params["head"]["b"]

    got = fused_vit_layer_cls_logits(
        x, lp, params["ln_f"], params["head"], cfg.num_heads,
        eps=cfg.layernorm_eps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_cls_logits_wide_model_block_promotion():
    """At d>=1280 _auto_block_b drops to bt=4 (VMEM sizing for the FULL
    layer kernel), but a [4, labels] logits block violates the Pallas
    sublane rule (second-to-last block dim must be a multiple of 8 or equal
    b) — this crashed the ViT-H bench_full rows at b=512 (r5). The CLS
    kernel promotes bt back to 8; this pins the numerics at exactly the
    promotion geometry (b > 8 > auto bt, d=1280)."""
    from dataclasses import replace

    from vit_pruning_tpu.configs import vit_huge
    from vit_pruning_tpu.models.vit import init_vit_params, layer_norm, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import _auto_block_b, fused_vit_layer_cls_logits

    cfg = replace(vit_huge(num_labels=10), num_layers=1)
    assert _auto_block_b(16, cfg.hidden_size, 2) < 8  # the crash precondition
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[-1], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 9, cfg.hidden_size))

    y = vit_layer(x, lp, cfg, use_pallas=False, quant="none")
    yn = layer_norm(y, params["ln_f"], cfg.layernorm_eps)
    ref = yn[:, 0] @ params["head"]["w"] + params["head"]["b"]

    got = fused_vit_layer_cls_logits(
        x, lp, params["ln_f"], params["head"], cfg.num_heads,
        eps=cfg.layernorm_eps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)


def test_fused_embed_f_matches_reference():
    """Float fused patch embed == models.vit.embed (projection + pos + CLS)."""
    from vit_pruning_tpu.configs import vit_tiny
    from vit_pruning_tpu.models.vit import embed, init_vit_params
    from vit_pruning_tpu.ops.pallas.embed import embed_fused

    cfg = vit_tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (3, 3, cfg.image_size, cfg.image_size))
    ref = embed(x, params["embed"], cfg)
    got = embed_fused(x, params["embed"], cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_progressive_logits_only_matches_full_output():
    """logits_only=True (the deployment fast path) returns the same logits
    as the full progressive forward on the jnp path."""
    from vit_pruning_tpu.configs import PruneConfig, vit_tiny
    from vit_pruning_tpu.models.pruned_vit import (
        init_pruned_vit_params,
        progressive_topk_forward,
    )

    cfg = vit_tiny()
    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       keep_schedule=(10, 0, 6))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), cfg, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, cfg.image_size, cfg.image_size))
    full = progressive_topk_forward(params, x, cfg, pcfg, use_pallas=False)
    fast = progressive_topk_forward(params, x, cfg, pcfg, use_pallas=False,
                                    logits_only=True)
    np.testing.assert_allclose(np.asarray(fast["logits"]),
                               np.asarray(full["logits"]), atol=1e-5)
    assert "last_hidden" not in fast and "cls" not in fast
    np.testing.assert_array_equal(np.asarray(fast["keep_masks"]),
                                  np.asarray(full["keep_masks"]))


def test_fused_bucketed_layer_matches_unfused():
    """fused_vit_layer_bucketed == one-hot gather -> masked vit_layer ->
    masked scatter + identity passthrough (the bucketed_masked_layer branch),
    at kept AND skipped positions."""
    from vit_pruning_tpu.configs import vit_tiny
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_bucketed

    cfg = vit_tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    b, s = 4, cfg.seq_len  # 17
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.hidden_size))
    mask = jax.random.uniform(jax.random.PRNGKey(2), (b, s)) > 0.5
    mask = mask.at[:, 0].set(True)
    cap = int(np.asarray(mask.sum(-1)).max())

    kept = mask.astype(jnp.int32)
    counts = kept.sum(-1)
    kept_rank = jnp.cumsum(kept, axis=-1) - 1
    skip_rank = counts[:, None] + jnp.cumsum(1 - kept, axis=-1) - 1
    dest = jnp.where(mask, kept_rank, skip_rank)

    # unfused reference at the same capacity
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)
    P = (dest[:, None, :] == rows).astype(x.dtype)
    xc = jnp.einsum("brt,btd->brd", P, x)
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (b, cap), 1) < counts[:, None]
    yc = vit_layer(xc, lp, cfg, token_mask=key_ok, use_pallas=False, quant="none")
    y = jnp.einsum("brt,brd->btd", P, yc)
    ref = jnp.where(mask[..., None], y, x)

    got = fused_vit_layer_bucketed(x, lp, dest, mask, cap, cfg.num_heads,
                                   eps=cfg.layernorm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_staged2_and_cls_epilogue_at_vit_large_width():
    """The bench rows beyond the reference's largest model (bench.py --model
    vit_large) run the same kernels at hidden 1024 / 16 heads / mlp 4096 —
    parity-check that geometry once so the width generalization is covered,
    not assumed (the other kernel tests run at hidden 64 / 2 heads)."""
    from vit_pruning_tpu.configs import vit_large
    from vit_pruning_tpu.models.vit import init_vit_params, layer_norm, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import (
        fused_vit_layer,
        fused_vit_layer_cls_logits,
    )

    cfg = vit_large(num_labels=100).replace(num_layers=1)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 33, cfg.hidden_size))

    ref = vit_layer(x, lp, cfg, use_pallas=False, quant="none")
    got = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps,
                          interpret=True, attn_impl="staged2")
    assert np.abs(np.asarray(got - ref)).max() < 2e-5

    yn = layer_norm(ref, params["ln_f"], cfg.layernorm_eps)
    logits_ref = yn[:, 0] @ params["head"]["w"] + params["head"]["b"]
    logits = fused_vit_layer_cls_logits(
        x, lp, params["ln_f"], params["head"], cfg.num_heads,
        eps=cfg.layernorm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-5, rtol=1e-4)


def test_staged2_at_vit_huge_head_dim():
    """ViT-H/14 (bench.py --model vit_huge) is the only preset with a
    non-power-of-two head width (1280/16 = 80): parity-check the fused
    layer at that head geometry so the 80-lane attention reshapes are
    covered, not assumed."""
    from vit_pruning_tpu.configs import vit_huge
    from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
    from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer

    cfg = vit_huge(num_labels=100).replace(num_layers=1)
    assert cfg.head_dim == 80
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 33, cfg.hidden_size))

    ref = vit_layer(x, lp, cfg, use_pallas=False, quant="none")
    got = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps,
                          interpret=True, attn_impl="staged2")
    assert np.abs(np.asarray(got - ref)).max() < 2e-5


def test_patch_embed_conv_impl_matches_matmul():
    """The TPU strided-conv embed formulation == the matmul reference
    (scripts/embed_probe.py: conv halves the embed's batch cost)."""
    from vit_pruning_tpu.ops.patch_embed import patch_embed

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 64, 64), jnp.float32)
    params = {
        "w": jnp.asarray(rng.randn(3 * 16 * 16, 48), jnp.float32) * 0.05,
        "b": jnp.asarray(rng.randn(48), jnp.float32),
    }
    ref = patch_embed(x, params, 16, impl="matmul")
    got = patch_embed(x, params, 16, impl="conv")
    assert ref.shape == got.shape == (2, 16, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # bf16: same formulation under the benched dtype
    got16 = patch_embed(x.astype(jnp.bfloat16),
                        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params),
                        16, impl="conv").astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref),
                               atol=0.15, rtol=0.05)


def test_embed_u8_kernel_matches_xla_path():
    """The superseded Pallas u8 embed (kept as a documented negative —
    serving now uses the 5x-faster XLA embed_from_u8) still computes the
    same embeddings."""
    from vit_pruning_tpu.configs import vit_tiny
    from vit_pruning_tpu.models.vit import init_vit_params
    from vit_pruning_tpu.ops.pallas.embed import embed_u8
    from vit_pruning_tpu.serving import embed_from_u8

    cfg = vit_tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    u8 = jnp.asarray(
        np.random.RandomState(0).randint(
            0, 256, (2, 3, cfg.image_size, cfg.image_size), np.uint8
        )
    )
    ref = embed_from_u8(u8, params["embed"], cfg)
    got = embed_u8(u8, params["embed"], cfg, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_auto_block_b_calibration():
    """The default batch block shrinks exactly for f32 compute at DeiT-B
    width and up (the deit_base @224 f32 eval step overflowed the scoped
    VMEM stack at bt=8, round 3); every bf16/int8 config and f32 below
    hidden 768 keeps the measured-best bt=8 byte-unchanged."""
    from vit_pruning_tpu.ops.pallas.layer import _auto_block_b

    assert _auto_block_b(128, 384, 4) == 8   # deit_small f32 (recorded gates)
    assert _auto_block_b(128, 768, 4) == 4   # deit_base f32 (the OOM shape)
    assert _auto_block_b(128, 1024, 4) == 2  # vit_large f32
    for d in (384, 768, 1024):               # bf16 benches: unchanged
        assert _auto_block_b(512, d, 2) == 8
    assert _auto_block_b(512, 1280, 2) == 4  # vit_huge bf16 (164M>128M at 8)
    assert _auto_block_b(128, 1280, 4) == 1  # vit_huge f32
    assert _auto_block_b(6, 768, 4) == 3     # respects batch divisibility
    assert _auto_block_b(2, 384, 2) == 2     # bt <= b
