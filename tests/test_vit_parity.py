"""Bit-match the from-scratch JAX ViT against the torch/HF reference.

The reference's substrate is HF transformers ViT (himanshu/model_utils.py:2);
BASELINE.json requires bit-matching logits. We instantiate a small random HF
ViTForImageClassification on CPU, convert its weights, and compare logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import ViTConfig as HFViTConfig
from transformers import ViTForImageClassification

from vit_pruning_tpu.configs import ViTConfig
from vit_pruning_tpu.models.convert import torch_state_dict_to_params, strip_prefix
from vit_pruning_tpu.models.vit import vit_forward, init_vit_params, param_count


def make_hf_model(seed=0, **kw):
    cfg = dict(
        image_size=32,
        patch_size=8,
        num_channels=3,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        num_labels=10,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg.update(kw)
    torch.manual_seed(seed)
    # eager attention: transformers 4.49 (the reference's pin) falls back to
    # eager whenever head_mask is given; 4.57's SDPA path misapplies
    # head_mask as an additive bias, so pin the well-defined semantics.
    model = ViTForImageClassification(HFViTConfig(**cfg, attn_implementation="eager"))
    model.eval()
    return model


def our_config(hf):
    c = hf.config
    return ViTConfig(
        image_size=c.image_size,
        patch_size=c.patch_size,
        num_channels=c.num_channels,
        hidden_size=c.hidden_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        mlp_dim=c.intermediate_size,
        num_labels=c.num_labels,
        layernorm_eps=c.layer_norm_eps,
    )


@pytest.fixture(scope="module")
def hf_model():
    return make_hf_model()


def test_logits_match_hf(hf_model):
    config = our_config(hf_model)
    params = torch_state_dict_to_params(hf_model.state_dict(), config)

    rng = np.random.RandomState(0)
    x = rng.randn(4, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(pixel_values=torch.from_numpy(x)).logits.numpy()

    out = jax.jit(lambda p, v: vit_forward(p, v, config))(params, jnp.asarray(x))
    got = np.asarray(out["logits"])

    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_hidden_states_match_hf(hf_model):
    config = our_config(hf_model)
    params = torch_state_dict_to_params(hf_model.state_dict(), config)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.vit(
            pixel_values=torch.from_numpy(x), output_hidden_states=True
        ).hidden_states

    out = vit_forward(params, jnp.asarray(x), config, output_hidden_states=True)
    assert len(out["hidden_states"]) == len(ref)
    for i, (got_h, ref_h) in enumerate(zip(out["hidden_states"], ref)):
        np.testing.assert_allclose(
            np.asarray(got_h), ref_h.numpy(), atol=5e-5, rtol=1e-4,
            err_msg=f"hidden state {i} mismatch",
        )


def test_vit_prefix_surgery(hf_model):
    """hi_main.py:130-137 strips the 'vit.' prefix before loading."""
    sd = hf_model.state_dict()
    assert any(k.startswith("vit.") for k in sd)
    stripped = strip_prefix(sd)
    assert any(k.startswith("encoder.layer.0") for k in stripped)
    assert "classifier.weight" in stripped  # untouched


def test_head_mask_matches_hf(hf_model):
    """HF head_mask semantics: 1.0 = keep head (model_utils.py:216-220)."""
    config = our_config(hf_model)
    params = torch_state_dict_to_params(hf_model.state_dict(), config)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    L, H = config.num_layers, config.num_heads
    hm = (np.arange(L * H).reshape(L, H) % 2).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(
            pixel_values=torch.from_numpy(x), head_mask=torch.from_numpy(hm)
        ).logits.numpy()

    out = vit_forward(params, jnp.asarray(x), config, head_mask=jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=2e-5, rtol=1e-5)


def test_random_init_runs():
    config = ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, num_labels=10,
    )
    params = init_vit_params(jax.random.PRNGKey(0), config)
    assert param_count(params) > 0
    x = jnp.zeros((2, 3, 32, 32))
    out = vit_forward(params, x, config)
    assert out["logits"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_interpolate_pos_embed():
    """Resolution change via bicubic pos-embed interpolation
    (HF interpolate_pos_encoding equivalent, himanshu/model_utils.py:196,228)."""
    from vit_pruning_tpu.models.convert import interpolate_pos_embed

    config = ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, num_labels=10,
    )
    params = init_vit_params(jax.random.PRNGKey(0), config)
    new_params, new_cfg = interpolate_pos_embed(params, config, 64)
    assert new_cfg.image_size == 64 and new_cfg.num_patches == 64
    assert new_params["embed"]["pos"].shape == (1, 65, 64)
    # CLS position embedding unchanged
    np.testing.assert_array_equal(
        np.asarray(new_params["embed"]["pos"][:, 0]),
        np.asarray(params["embed"]["pos"][:, 0]),
    )
    out = vit_forward(new_params, jnp.zeros((1, 3, 64, 64)), new_cfg)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_params_roundtrip_to_torch(hf_model):
    """Export half of the checkpoint surgery: a JAX tree converts back to an
    HF state_dict that ViTForImageClassification loads with strict=True and
    that bit-matches the original torch model's logits — so a backbone
    fine-tuned here can flow back into the reference's serving/viz stack."""
    from vit_pruning_tpu.models.convert import params_to_torch_state_dict

    config = our_config(hf_model)
    params = torch_state_dict_to_params(hf_model.state_dict(), config)
    sd = params_to_torch_state_dict(params, config)

    fresh = make_hf_model(seed=99)  # different weights, same geometry
    missing, unexpected = fresh.load_state_dict(sd, strict=True)
    assert not missing and not unexpected

    rng = np.random.RandomState(5)
    x = torch.from_numpy(rng.randn(3, 3, 32, 32).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(
            fresh(pixel_values=x).logits.numpy(),
            hf_model(pixel_values=x).logits.numpy(),
            atol=1e-6, rtol=1e-6,
        )


def test_params_roundtrip_pruned_tree_and_bare():
    """Round-trip accepts a pruned-model tree (exports its backbone) and,
    with classifier=False, emits no classifier keys (bare-ViTModel export)."""
    from vit_pruning_tpu.models.convert import params_to_torch_state_dict

    config = ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, num_labels=10,
    )
    backbone = init_vit_params(jax.random.PRNGKey(3), config)
    sd = params_to_torch_state_dict({"backbone": backbone, "predictors": {}}, config)
    assert "vit.encoder.layer.1.intermediate.dense.weight" in sd
    np.testing.assert_allclose(
        sd["classifier.weight"].numpy(),
        np.asarray(backbone["head"]["w"]).T, atol=0, rtol=0,
    )
    bare = params_to_torch_state_dict(backbone, config, classifier=False)
    assert not any(k.startswith("classifier") for k in bare)


# --- Full-scale parity (VERDICT r2 #2): ViT-B/16 @ 224 ----------------------
# The toy tests above de-risk the math; these run the REAL reproduction
# geometry (himanshu/hi_main.py:122-137 loads ViT-B/16 @224 checkpoints) so
# the converter is proven at the shapes actual checkpoints arrive in.

def vit_b16_kw(num_labels=100):
    return dict(
        image_size=224, patch_size=16, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072, num_labels=num_labels,
    )


def test_full_scale_logits_match_hf_vit_b16():
    """ViT-B/16 @224 (the hi_main.py:122 model geometry), random HF weights,
    classifier-present path: logits bit-match."""
    hf = make_hf_model(seed=7, **vit_b16_kw())
    config = our_config(hf)
    assert config.seq_len == 197 and config.hidden_size == 768
    params = torch_state_dict_to_params(hf.state_dict(), config)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).logits.numpy()
    out = jax.jit(lambda p, v: vit_forward(p, v, config))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=2e-4, rtol=1e-4)


def test_full_scale_bare_vitmodel_surgery():
    """The strict=False path at full scale: a bare `ViTModel` state_dict (no
    'vit.' prefix, no classifier — hi_main.py:130-137's other branch) converts
    with a random head; encoder final hidden states bit-match HF."""
    from transformers import ViTModel

    torch.manual_seed(11)
    bare = ViTModel(
        HFViTConfig(
            **{k: v for k, v in vit_b16_kw().items() if k != "num_labels"},
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        ),
        add_pooling_layer=False,
    )
    bare.eval()
    sd = bare.state_dict()
    assert not any(k.startswith("vit.") for k in sd)
    assert "classifier.weight" not in sd

    config = ViTConfig(num_labels=100)  # ViT-B/16 @224 defaults
    params = torch_state_dict_to_params(sd, config)
    # classifier absent from the state_dict => random init (strict=False)
    assert params["head"]["w"].shape == (768, 100)

    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = bare(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    out = jax.jit(lambda p, v: vit_forward(p, v, config))(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden"]), ref, atol=2e-4, rtol=1e-4
    )
