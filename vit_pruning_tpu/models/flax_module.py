"""Optional Flax linen adapter over the functional core.

The framework's native surface is functional (explicit params +
`pruned_vit_forward`); this module exists for users embedding the pruned ViT
inside a larger linen model (the idiomatic JAX analogue of the reference's
`ModifiedViTModel(nn.Module)` class surface, himanshu/model_utils.py:184-259).

The parameter pytree is stored 1:1 under `variables['params']['model']`, so
checkpoints, the torch converter (models/convert.py), and every functional
utility (freeze policies, structured pruning, sharding specs) apply unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax

try:
    import flax.linen as nn
except ImportError as _e:  # pragma: no cover - flax is baked into the image
    raise ImportError("flax is required for vit_pruning_tpu.models.flax_module") from _e

from vit_pruning_tpu.configs import PruneConfig, ViTConfig
from vit_pruning_tpu.models.pruned_vit import (
    init_pruned_vit_params,
    progressive_topk_forward,
    pruned_vit_forward,
)


class PrunedViT(nn.Module):
    """Linen wrapper: `init`/`apply` over the functional pruned ViT.

    apply() returns the functional core's output dict unchanged
    ('logits', 'keep_masks', 'scores', 'last_hidden', optional 'aux').
    """

    config: ViTConfig
    prune_config: PruneConfig

    @nn.compact
    def __call__(
        self,
        pixel_values,
        train: bool = False,
        compute_oracle: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        params = self.param(
            "model",
            lambda key: init_pruned_vit_params(key, self.config, self.prune_config),
        )
        if self.prune_config.mode == "topk_prog" and not (train or compute_oracle):
            return progressive_topk_forward(
                params, pixel_values, self.config, self.prune_config
            )
        return pruned_vit_forward(
            params, pixel_values, self.config, self.prune_config,
            train=train, compute_oracle=compute_oracle, rng=rng,
        )
