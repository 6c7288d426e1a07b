from vit_pruning_tpu.utils.run_logging import RunLogger, encode_run_name, append_stats  # noqa: F401
from vit_pruning_tpu.utils.flops import vit_flops, pruned_vit_flops  # noqa: F401
