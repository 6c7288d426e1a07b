"""Device mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.4: one
commented-out nn.DataParallel, himanshu/hi_main.py:141-143). The TPU-native
equivalent is a jax.sharding.Mesh whose collectives ride ICI, compiled by
XLA — no custom wire protocol.

Axes:
  data  — batch data parallelism (gradient all-reduce via sharding
          propagation; the only parallelism the reference's workload needs)
  model — tensor parallelism over attention heads / MLP hidden (ViT-B fits
          on one chip; the axis exists so larger configs scale without a
          redesign)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh. data defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devices)}")
    arr = mesh_utils.create_device_mesh((data, model), devices=devices[:n])
    return Mesh(arr, ("data", "model"))
