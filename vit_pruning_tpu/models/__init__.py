from vit_pruning_tpu.models.vit import (  # noqa: F401
    init_vit_params,
    vit_forward,
    vit_layer,
    embed,
    layer_norm,
    mlp_block,
)
from vit_pruning_tpu.models.convert import (  # noqa: F401
    torch_state_dict_to_params,
    load_hf_vit,
)
