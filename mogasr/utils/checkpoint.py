"""Checkpoint / resume via orbax (SURVEY.md §5).

GMM pytrees, NN params, optax state and loop counters all checkpoint through
one interface; orbax gives atomic writes, so a preempted job resumes at the
last completed step.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
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


def all_steps(path: str) -> List[int]:
    """All checkpoint steps saved under path, ascending."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        return sorted(mgr.all_steps())


def average_checkpoints(
    path: str, template: Any, last_k: Optional[int] = None
) -> Any:
    """Uniform parameter averaging over saved steps (checkpoint averaging,
    the standard late-training smoother for e2e ASR: average the float
    leaves of the last K checkpoints; integer leaves — step counters — are
    taken from the newest). last_k=None averages every step present."""
    steps = all_steps(path)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {path}")
    if last_k is not None:
        steps = steps[-last_k:]
    trees = [restore_checkpoint(path, template, step=s) for s in steps]

    def avg(*leaves):
        x = leaves[-1]
        if hasattr(x, "dtype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating
        ):
            return sum(jnp.asarray(l) for l in leaves) / len(leaves)
        return x

    return jax.tree.map(avg, *trees)
