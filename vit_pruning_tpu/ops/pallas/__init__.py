"""Pallas TPU kernels for the hot ops.

Each kernel has a jnp reference implementation in vit_pruning_tpu.ops that it
is tested against (tests/test_pallas.py). Kernels are used automatically on
TPU when shapes allow (see vit_pruning_tpu.ops.dispatch) and fall back to the
jnp reference elsewhere.
"""

from vit_pruning_tpu.ops.pallas.attention import fused_attention  # noqa: F401
from vit_pruning_tpu.ops.pallas.mlp import fused_mlp  # noqa: F401
