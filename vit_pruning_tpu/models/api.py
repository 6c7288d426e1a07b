"""Drop-in style class API mirroring the reference's ModifiedViTModel.

The reference's inference contract (himanshu/model_utils.py:183-300):

    model = ModifiedViTModel(config, sim_threshold, mlp_threshold, avg_threshold)
    out = model(pixel_values, compute_cosine=..., output_mask=...)
    out.logits, out.boolean_masks
    model.mlp_train() / model.vit_train() / ...   # freeze policies

This wrapper keeps that surface on top of the functional core so a reference
user can switch with minimal edits. State is a plain pytree in `.params`
(jit-friendly: the wrapper's __call__ is itself jit-compiled per flag
combination). Per-layer losses are explicit outputs (`out.layer_losses`)
instead of module side-channels.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Optional

import jax

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.convert import torch_state_dict_to_params
from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params, pruned_vit_forward
from vit_pruning_tpu.train.freeze import POLICIES


class ModifiedViTModel:
    def __init__(
        self,
        config: ViTConfig,
        sim_threshold: float = 0.9,
        mlp_threshold: float = 0.5,
        avg_threshold: float = 0.0,
        prune_config: Optional[PruneConfig] = None,
        params: Optional[dict] = None,
        seed: int = 0,
    ):
        self.config = config
        self.prune_config = (prune_config or PruneConfig()).replace(
            sim_threshold=sim_threshold,
            mlp_threshold=mlp_threshold,
            avg_threshold=avg_threshold,
        )
        self.params = params or init_pruned_vit_params(
            jax.random.PRNGKey(seed), config, self.prune_config
        )
        self.policy = "vit_mlp_train"
        self._training = False

    # --- weight loading (hi_main.py:130-137) ---------------------------------

    def load_torch_state_dict(self, state_dict) -> "ModifiedViTModel":
        """strict=False load with 'vit.'-prefix surgery: backbone replaced,
        predictor heads keep their (random) init."""
        self.params["backbone"] = torch_state_dict_to_params(state_dict, self.config)
        return self

    # --- forward -------------------------------------------------------------

    @functools.cached_property
    def _jitted(self):
        cfg, pcfg = self.config, self.prune_config

        # quant is a STATIC argument re-read from the dispatch global at every
        # __call__, so quant_mode('int8') around later calls retraces instead
        # of silently reusing whichever mode was active at first trace
        @functools.partial(
            jax.jit, static_argnames=("compute_cosine", "train", "quant")
        )
        def fwd(params, pixel_values, rng, compute_cosine, train, quant):
            return pruned_vit_forward(
                params, pixel_values, cfg, pcfg,
                train=train, compute_oracle=compute_cosine, rng=rng,
                quant=quant,
            )

        return fwd

    def __call__(
        self,
        pixel_values,
        compute_cosine: bool = False,
        output_mask: Optional[bool] = None,
        rng: Optional[jax.Array] = None,
    ):
        from vit_pruning_tpu.ops.dispatch import serving_quant

        out = self._jitted(
            self.params, pixel_values,
            rng if rng is not None else jax.random.PRNGKey(0),
            compute_cosine, self._training, serving_quant(),
        )
        res = SimpleNamespace(
            logits=out["logits"],
            boolean_masks=out["keep_masks"],  # [L, B, S], True = processed
            scores=out["scores"],
            last_hidden_state=out["last_hidden"],
        )
        if "aux" in out:
            res.layer_losses = out["aux"]["pred_loss"]       # Σ = the ref's Σ layer.loss
            res.mlp_confusion_matrix = out["aux"]["confusion"]
            res.similarity = out["aux"]["similarity"]
        return res

    # --- train/eval mode + freeze policies (model_utils.py:261-300) ----------

    def train(self):
        self._training = True
        return self

    def eval(self):
        self._training = False
        return self

    def _set_policy(self, p):
        assert p in POLICIES
        self.policy = p
        return self

    def vit_mlp_train(self):
        return self._set_policy("vit_mlp_train")

    def vit_train(self):
        return self._set_policy("vit_train")

    def mlp_train(self):
        return self._set_policy("mlp_train")

    def classifier_train(self):
        return self._set_policy("classifier_train")

    def classifier_mlp_train(self):
        return self._set_policy("classifier_mlp_train")
