"""The reference-style class API (ModifiedViTModel wrapper)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import vit_tiny
from vit_pruning_tpu.models.api import ModifiedViTModel

CFG = vit_tiny()


def test_call_contract():
    model = ModifiedViTModel(CFG, sim_threshold=0.9, mlp_threshold=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    out = model(x)
    assert out.logits.shape == (2, CFG.num_labels)
    assert out.boolean_masks.shape == (CFG.num_layers, 2, CFG.seq_len)
    assert not hasattr(out, "layer_losses")

    out = model(x, compute_cosine=True)  # the reference's full_testing path
    assert out.layer_losses.shape == (CFG.num_layers,)
    assert out.mlp_confusion_matrix.shape == (CFG.num_layers, 2, 2)


def test_freeze_policy_methods():
    model = ModifiedViTModel(CFG)
    assert model.mlp_train().policy == "mlp_train"
    assert model.vit_train().policy == "vit_train"
    assert model.classifier_mlp_train().policy == "classifier_mlp_train"
    assert model.train()._training and not model.eval()._training


def test_load_torch_state_dict():
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig as HFCfg, ViTForImageClassification

    hf = ViTForImageClassification(HFCfg(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128, num_labels=10,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )).eval()
    model = ModifiedViTModel(vit_tiny(num_labels=10).replace(
        hidden_size=64, num_layers=3, num_heads=4, mlp_dim=128))
    before = np.asarray(model.params["backbone"]["embed"]["cls"]).copy()
    model.load_torch_state_dict(hf.state_dict())
    after = np.asarray(model.params["backbone"]["embed"]["cls"])
    assert not np.array_equal(before, after)
    ref_cls = hf.vit.embeddings.cls_token.detach().numpy()
    np.testing.assert_allclose(after, ref_cls, atol=1e-7)


def test_flax_module_wrapper():
    flax = pytest.importorskip("flax")
    from vit_pruning_tpu.configs import PruneConfig
    from vit_pruning_tpu.models.flax_module import PrunedViT
    from vit_pruning_tpu.models.pruned_vit import pruned_vit_forward

    pcfg = PruneConfig(mode="mask", predictor="cls_mlp")
    module = PrunedViT(config=CFG, prune_config=pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    variables = module.init(jax.random.PRNGKey(0), x)
    out = module.apply(variables, x)
    assert out["logits"].shape == (2, CFG.num_labels)
    # identical to the functional core on the same params
    ref = pruned_vit_forward(variables["params"]["model"], x, CFG, pcfg)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), atol=1e-6
    )


def test_topk_prog_inference_contract():
    """mode='topk_prog' inference routes to progressive_topk_forward; the
    wrapper must still expose logits/masks/last_hidden (advisor repro)."""
    from vit_pruning_tpu.configs import PruneConfig

    model = ModifiedViTModel(
        CFG, prune_config=PruneConfig(mode="topk_prog", predictor="cls_mlp",
                                      loss="mse_cosine", top_k=6),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    out = model.eval()(x)
    assert out.logits.shape == (2, CFG.num_labels)
    assert out.boolean_masks.shape == (CFG.num_layers, 2, CFG.seq_len)
    assert out.last_hidden_state.shape[0] == 2


def test_quant_mode_change_retraces_cached_jit():
    """quant is part of ModifiedViTModel's traced signature: flipping the
    dispatch global AFTER the first call must change the computation (the
    round-2 advisor's stale-cache scenario)."""
    import numpy as np

    from vit_pruning_tpu.configs import PruneConfig, vit_tiny
    from vit_pruning_tpu.models.api import ModifiedViTModel
    from vit_pruning_tpu.ops.dispatch import quant_mode

    cfg = vit_tiny()
    m = ModifiedViTModel(cfg, prune_config=PruneConfig(mode="none", predictor="none"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, cfg.image_size, cfg.image_size))
    base = np.asarray(m(x).logits)
    with quant_mode("int8"):
        quant = np.asarray(m(x).logits)  # same cached _jitted, new static arg
    after = np.asarray(m(x).logits)
    assert not np.allclose(base, quant), "int8 mode did not retrace"
    np.testing.assert_allclose(base, after, atol=0)  # mode restored exactly
