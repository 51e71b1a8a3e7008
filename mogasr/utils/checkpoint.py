"""Checkpoint / resume via orbax (SURVEY.md §5).

GMM pytrees, NN params, optax state and loop counters all checkpoint through
one interface; orbax gives atomic writes, so a preempted job resumes at the
last completed step.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any, step: int = 0, force: bool = True) -> None:
    """Atomically save a pytree checkpoint at path/step."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(tree), force=force)
        mgr.wait_until_finished()


def restore_checkpoint(path: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step; template supplies structure/dtypes."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(path: str) -> Optional[int]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
