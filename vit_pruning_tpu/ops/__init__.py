from vit_pruning_tpu.ops.attention import mha, attention_probs  # noqa: F401
from vit_pruning_tpu.ops.patch_embed import extract_patches, patch_embed  # noqa: F401
from vit_pruning_tpu.ops.masking import (  # noqa: F401
    similarity_oracle,
    topk_keep_mask,
    rank_keep_mask,
    threshold_keep_mask,
    add_cls_keep,
    neighbor_average,
    neighbor_index_table,
    gather_compact,
    scatter_back,
    confusion_counts,
)
