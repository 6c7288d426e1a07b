from vit_pruning_tpu.parallel.mesh import make_mesh  # noqa: F401
from vit_pruning_tpu.parallel.sharding import (  # noqa: F401
    param_pspecs,
    batch_pspecs,
    shard_params,
    shard_batch,
)
from vit_pruning_tpu.parallel.steps import (  # noqa: F401
    make_parallel_train_step,
    make_parallel_eval_step,
    make_parallel_serving_step,
    init_sharded_opt_state,
    zero1_pspecs,
)
