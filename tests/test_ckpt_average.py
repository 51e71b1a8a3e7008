"""Checkpoint averaging tests: uniform float-leaf averaging, integer
leaves from the newest step, last_k windowing."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.utils.checkpoint import (
    all_steps, average_checkpoints, restore_checkpoint, save_checkpoint,
)


def _tree(v: float, step: int):
    return {
        "params": {"w": jnp.full((3, 2), v, jnp.float32),
                   "b": jnp.asarray([v, -v], jnp.float32)},
        "step": jnp.asarray(step, jnp.int32),
    }


def test_average_checkpoints(tmp_path):
    path = str(tmp_path / "ck")
    for i, v in enumerate([1.0, 2.0, 6.0]):
        save_checkpoint(path, _tree(v, i), step=i)
    assert all_steps(path) == [0, 1, 2]

    tmpl = _tree(0.0, 0)
    avg = average_checkpoints(path, tmpl)
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), 3.0)
    np.testing.assert_allclose(np.asarray(avg["params"]["b"]), [3.0, -3.0])
    assert int(avg["step"]) == 2  # integer leaf: newest, not averaged

    avg2 = average_checkpoints(path, tmpl, last_k=2)
    np.testing.assert_allclose(np.asarray(avg2["params"]["w"]), 4.0)

    # averaging a single step is a restore
    one = average_checkpoints(path, tmpl, last_k=1)
    newest = restore_checkpoint(path, tmpl, step=2)
    np.testing.assert_allclose(
        np.asarray(one["params"]["w"]), np.asarray(newest["params"]["w"])
    )


def test_train_nn_cli_save_every_and_average(tmp_path, monkeypatch):
    """CE path: --save-every periodic checkpoints + --average-last writes
    the averaged params as the NEWEST step (what decode restores)."""
    from cli import train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "16", "--layers", "1", "--steps", "12",
         "--save-every", "4", "--average-last", "3", "--bootstrap-iters", "2"],
        monkeypatch,
    )
    ck = str(tmp_path / "run" / "nn_mlp")
    assert all_steps(ck) == [4, 8, 12, 13]
    import json

    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "ckpt_average" for m in metrics)


def test_average_checkpoints_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        average_checkpoints(str(tmp_path / "none"), _tree(0.0, 0))
