from vit_pruning_tpu.viz.heatmaps import (  # noqa: F401
    mask_frequency,
    save_layer_heatmaps,
    skipped_heatmaps,
    to_skip_heatmaps,
    misclassified_heatmaps,
)
from vit_pruning_tpu.viz.blackout import (  # noqa: F401
    blackout_image,
    blackout_montage,
    skips_per_layer_chart,
    layer_strips,
)
from vit_pruning_tpu.viz.report import inference_report  # noqa: F401
