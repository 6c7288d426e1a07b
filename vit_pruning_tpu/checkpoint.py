"""Checkpoint save/restore (orbax) + best-checkpoint tracking.

Reference behavior reproduced: torch.save of the best-accuracy epoch's
state_dict to models/<run-name>.pth (himanshu/main_model_utils.py:115-116,
181-185), resume by path (hi_main.py:138-139). Improvement over the
reference: optimizer state and the epoch counter are checkpointed too, so
resume is exact (the reference restarts optimization from scratch).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (params or {'params':..., 'opt_state':..., 'epoch':...})."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree with the structure/dtypes of `like`."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda a: ocp.utils.to_shape_dtype_struct(a) if hasattr(a, "dtype") else a, like
    )
    return ckptr.restore(path, target)


class BestCheckpoint:
    """Keep the best-accuracy params on disk (main_model_utils.py:181-185),
    or in memory when constructed with save_dir=None (`.best_params`) — jax
    arrays are immutable, so holding the reference is safe."""

    def __init__(self, save_dir: Optional[str] = None, run_name: str = ""):
        self.path = os.path.join(save_dir, run_name) if save_dir and run_name else None
        self.best_accuracy = 0.0
        self.best_params: Any = None

    def update(self, accuracy: float, params: Any) -> bool:
        if accuracy <= self.best_accuracy:
            return False
        self.best_accuracy = accuracy
        if self.path:
            save_checkpoint(self.path, params)
        else:
            # deep-copy: the train step donates its params buffers, so a
            # bare reference would be deleted by the next optimization step
            self.best_params = jax.tree.map(lambda a: a.copy(), params)
        return True
