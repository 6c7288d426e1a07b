from vit_pruning_tpu.train.losses import (  # noqa: F401
    bce_with_logits,
    weighted_bce_oracle,
    focal_loss,
    mse_cosine_loss,
    mse_attention_loss,
    cross_entropy,
)
