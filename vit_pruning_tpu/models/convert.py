"""Torch/HF checkpoint -> JAX pytree weight conversion.

Reproduces the reference's weight surgery: strip the 'vit.' prefix from an
`AutoModelForImageClassification` state_dict and load non-strictly so the
predictor heads / classifier can start random (himanshu/hi_main.py:130-137).

Only numpy crosses the torch/JAX boundary; torch is an optional dependency
used for loading reference checkpoints and parity tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_pruning_tpu.configs import ViTConfig
from vit_pruning_tpu.models import vit as vit_mod


def strip_prefix(state_dict: Dict[str, "object"], prefix: str = "vit.") -> Dict[str, "object"]:
    """Key surgery: 'vit.encoder...' -> 'encoder...' (hi_main.py:131-134)."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in state_dict.items()}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: dict, name: str) -> dict:
    """torch Linear [out, in] -> input-major {'w' [in, out], 'b' [out]}."""
    return {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T), "b": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _ln(sd: dict, name: str) -> dict:
    return {"g": jnp.asarray(_np(sd[f"{name}.weight"])), "b": jnp.asarray(_np(sd[f"{name}.bias"]))}


def torch_state_dict_to_params(
    state_dict: Dict[str, "object"],
    config: ViTConfig,
    rng: Optional[jax.Array] = None,
) -> dict:
    """Convert an HF ViT(ForImageClassification) state_dict to our param tree.

    Missing pieces (e.g. classifier when converting a bare ViTModel) are
    randomly initialized — the `strict=False` behavior of hi_main.py:137.
    """
    sd = strip_prefix({k: v for k, v in state_dict.items()})

    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = init_random = vit_mod.init_vit_params(rng, config)

    proj_w = _np(sd["embeddings.patch_embeddings.projection.weight"])  # [D, C, P, P]
    d = config.hidden_size
    embed = {
        "patch": {
            "w": jnp.asarray(proj_w.reshape(d, -1).T),  # (c, kh, kw) flattening order
            "b": jnp.asarray(_np(sd["embeddings.patch_embeddings.projection.bias"])),
        },
        "cls": jnp.asarray(_np(sd["embeddings.cls_token"])),
        "pos": jnp.asarray(_np(sd["embeddings.position_embeddings"])),
    }

    per_layer = []
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        per_layer.append(
            {
                "ln1": _ln(sd, f"{p}.layernorm_before"),
                "attn": {
                    "q": _lin(sd, f"{p}.attention.attention.query"),
                    "k": _lin(sd, f"{p}.attention.attention.key"),
                    "v": _lin(sd, f"{p}.attention.attention.value"),
                    "o": _lin(sd, f"{p}.attention.output.dense"),
                },
                "ln2": _ln(sd, f"{p}.layernorm_after"),
                "mlp": {
                    "fc1": _lin(sd, f"{p}.intermediate.dense"),
                    "fc2": _lin(sd, f"{p}.output.dense"),
                },
            }
        )
    layers = jax.tree.map(lambda *a: jnp.stack(a), *per_layer)

    if "classifier.weight" in sd:
        head = _lin(sd, "classifier")
    else:
        head = init_random["head"]  # random classifier (strict=False load)

    return {
        "embed": embed,
        "layers": layers,
        "ln_f": _ln(sd, "layernorm"),
        "head": head,
    }


def params_to_torch_state_dict(
    params: dict,
    config: ViTConfig,
    classifier: bool = True,
) -> Dict[str, "object"]:
    """Inverse of `torch_state_dict_to_params`: JAX param tree -> HF torch
    state_dict, loadable into `ViTForImageClassification` with strict=True.

    The export half of the reference's checkpoint surgery (hi_main.py:130-137
    only imports): lets a backbone fine-tuned here flow back into the
    reference's torch/HF serving and viz stack. Accepts a pruned-model tree
    (exports its 'backbone'; predictor heads have no HF home) or a bare
    backbone tree. Returns torch tensors.
    """
    import torch

    tree = params["backbone"] if "backbone" in params else params

    def t(x, transpose=False):
        a = np.array(x, dtype=np.float32)  # copy: torch needs writable memory
        return torch.from_numpy(np.ascontiguousarray(a.T if transpose else a))

    d, c, p = config.hidden_size, config.num_channels, config.patch_size
    sd = {
        "vit.embeddings.cls_token": t(tree["embed"]["cls"]),
        "vit.embeddings.position_embeddings": t(tree["embed"]["pos"]),
        # [C*P*P, D] input-major -> conv [D, C, P, P] (inverse of the
        # reshape(d, -1).T flattening above)
        "vit.embeddings.patch_embeddings.projection.weight": t(
            np.asarray(tree["embed"]["patch"]["w"], dtype=np.float32).T.reshape(d, c, p, p)
        ),
        "vit.embeddings.patch_embeddings.projection.bias": t(tree["embed"]["patch"]["b"]),
        "vit.layernorm.weight": t(tree["ln_f"]["g"]),
        "vit.layernorm.bias": t(tree["ln_f"]["b"]),
    }

    def put_lin(hf_name, lin, i):
        sd[f"{hf_name}.weight"] = t(lin["w"][i], transpose=True)
        sd[f"{hf_name}.bias"] = t(lin["b"][i])

    for i in range(config.num_layers):
        pre = f"vit.encoder.layer.{i}"
        L = tree["layers"]
        sd[f"{pre}.layernorm_before.weight"] = t(L["ln1"]["g"][i])
        sd[f"{pre}.layernorm_before.bias"] = t(L["ln1"]["b"][i])
        put_lin(f"{pre}.attention.attention.query", L["attn"]["q"], i)
        put_lin(f"{pre}.attention.attention.key", L["attn"]["k"], i)
        put_lin(f"{pre}.attention.attention.value", L["attn"]["v"], i)
        put_lin(f"{pre}.attention.output.dense", L["attn"]["o"], i)
        sd[f"{pre}.layernorm_after.weight"] = t(L["ln2"]["g"][i])
        sd[f"{pre}.layernorm_after.bias"] = t(L["ln2"]["b"][i])
        put_lin(f"{pre}.intermediate.dense", L["mlp"]["fc1"], i)
        put_lin(f"{pre}.output.dense", L["mlp"]["fc2"], i)

    if classifier:
        sd["classifier.weight"] = t(tree["head"]["w"], transpose=True)
        sd["classifier.bias"] = t(tree["head"]["b"])
    return sd


def interpolate_pos_embed(params: dict, config: ViTConfig, new_image_size: int) -> tuple:
    """Resize position embeddings to a new input resolution.

    The HF ViT `interpolate_pos_encoding` capability the reference forwards
    (himanshu/model_utils.py:196,228): bicubic-interpolate the patch-grid
    position embeddings, keep the CLS embedding. Returns (new_params,
    new_config). Operates on either a backbone tree or a pruned-model tree.
    """
    tree = params["backbone"] if "backbone" in params else params
    pos = tree["embed"]["pos"]  # [1, S, D]
    d = pos.shape[-1]
    old_grid = config.grid_size
    new_grid = new_image_size // config.patch_size

    cls_pos = pos[:, :1]
    patch_pos = pos[:, 1:].reshape(1, old_grid, old_grid, d)
    resized = jax.image.resize(
        patch_pos, (1, new_grid, new_grid, d), method="bicubic"
    ).reshape(1, new_grid * new_grid, d)
    new_pos = jnp.concatenate([cls_pos, resized], axis=1)

    new_tree = dict(tree)
    new_tree["embed"] = dict(tree["embed"])
    new_tree["embed"]["pos"] = new_pos
    if "backbone" in params:
        out = dict(params)
        out["backbone"] = new_tree
    else:
        out = new_tree
    return out, config.replace(image_size=new_image_size)


def load_hf_vit(model_name_or_model, config: Optional[ViTConfig] = None):
    """Load an HF ViT classification model (object or hub name) -> (params, config).

    Accepts a live torch model to stay usable in zero-egress environments.
    """
    if isinstance(model_name_or_model, str):
        from transformers import AutoModelForImageClassification

        model = AutoModelForImageClassification.from_pretrained(model_name_or_model)
    else:
        model = model_name_or_model

    hf_cfg = model.config
    if config is None:
        config = ViTConfig(
            image_size=hf_cfg.image_size,
            patch_size=hf_cfg.patch_size,
            num_channels=hf_cfg.num_channels,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            mlp_dim=hf_cfg.intermediate_size,
            num_labels=getattr(hf_cfg, "num_labels", 1000),
            layernorm_eps=hf_cfg.layer_norm_eps,
        )
    params = torch_state_dict_to_params(model.state_dict(), config)
    return params, config
