"""Profiling: XLA traces, throughput counters, complexity reports.

Replaces the reference's ptflops-based get_complexity
(himanshu/main_model_utils.py:194-231, mukunda/deit.py:650-688) and timed
eval (mukunda/deit.py:618-648) with TPU-native equivalents: jax.profiler
traces viewable in TensorBoard/Perfetto, analytic FLOPs (utils.flops), and
host-transfer-synchronized wall-clock throughput (block_until_ready does not
synchronize on relayed TPU backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np

import jax


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput(
    fn: Callable,
    args: tuple,
    batch_size: int,
    iters: int = 10,
    warmup: int = 2,
) -> dict:
    """Median images/sec of a jitted forward; forces a host transfer per
    iteration for true synchronization."""
    for _ in range(warmup):
        np.asarray(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    return {
        "sec_per_batch": t,
        "images_per_sec": batch_size / t,
        "ms_per_batch": t * 1e3,
    }


def complexity_report(
    config,
    pcfg=None,
    tokens_per_layer=None,
    images_per_sec: Optional[float] = None,
) -> str:
    """The get_complexity printout: GFLOPs/image pruned vs dense (+ optional
    measured GFLOP/s)."""
    from vit_pruning_tpu.utils.flops import pruned_vit_flops, vit_flops

    dense = vit_flops(config)
    lines = [f"Dense FLOPs/image: {dense / 1e9:.2f} GFLOPs"]
    if pcfg is not None:
        pruned = pruned_vit_flops(config, pcfg, tokens_per_layer)
        lines.append(
            f"Pruned FLOPs/image: {pruned / 1e9:.2f} GFLOPs ({pruned / dense:.1%} of dense)"
        )
        if images_per_sec:
            lines.append(
                f"Throughput: {images_per_sec:.1f} img/s = "
                f"{images_per_sec * pruned / 1e9:.1f} GFLOPS effective"
            )
    return "\n".join(lines)
