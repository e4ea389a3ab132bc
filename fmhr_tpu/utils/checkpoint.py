"""Checkpoint / resume for long optimizations (orbax-backed).

The reference's failure story is "crash loses the run" mitigated only by
stage outputs on disk and ad-hoc torch.save every 5 epochs
(SURVEY.md §5, `train_mlp.py:282-283`). Here every stage can snapshot its
full (params, opt_state, step) pytree atomically and resume mid-stage.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any, step: int) -> None:
    """Atomic snapshot of a pytree (host numpy) at `path`/step_N."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    host = jax.tree.map(np.asarray, jax.device_get(tree))
    ckpt.save(os.path.join(path, f"step_{step}"), host, force=True)
    ckpt.wait_until_finished()


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1]) for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def load_checkpoint(path: str, like: Any, step: int | None = None) -> Any:
    """Restore the pytree saved by `save_checkpoint` (structure from `like`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckpt = ocp.StandardCheckpointer()
    host_like = jax.tree.map(np.asarray, jax.device_get(like))
    return ckpt.restore(os.path.join(path, f"step_{step}"), host_like)
