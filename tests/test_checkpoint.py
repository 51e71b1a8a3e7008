"""Checkpoint/resume roundtrip via orbax (SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np

from mogasr.am.gmm import GmmSet
from mogasr.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint


def test_gmm_roundtrip(tmp_path):
    g = GmmSet(
        weights=jnp.asarray(np.random.default_rng(0).random((3, 2)).astype(np.float32)),
        means=jnp.ones((3, 2, 4)),
        vars=2.0 * jnp.ones((3, 2, 4)),
    )
    path = str(tmp_path / "gmm")
    save_checkpoint(path, g._asdict(), step=5)
    assert latest_step(path) == 5
    back = restore_checkpoint(path, g._asdict())
    np.testing.assert_allclose(np.asarray(back["weights"]), np.asarray(g.weights))
    np.testing.assert_allclose(np.asarray(back["means"]), np.asarray(g.means))


def test_multiple_steps_latest_wins(tmp_path):
    path = str(tmp_path / "ck")
    save_checkpoint(path, {"x": jnp.zeros(3)}, step=1)
    save_checkpoint(path, {"x": jnp.ones(3)}, step=2)
    assert latest_step(path) == 2
    back = restore_checkpoint(path, {"x": jnp.zeros(3)})
    np.testing.assert_allclose(np.asarray(back["x"]), 1.0)


def test_missing_checkpoint_raises(tmp_path):
    try:
        restore_checkpoint(str(tmp_path / "nope"), {"x": jnp.zeros(1)})
        assert False, "should raise"
    except FileNotFoundError:
        pass
