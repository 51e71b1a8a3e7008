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


def test_restore_without_template(tmp_path):
    """template=None restores with the saved structure (needed when GMM K
    grew via splitting and shapes aren't known up front)."""
    path = str(tmp_path / "nt")
    save_checkpoint(path, {"gmm": {"weights": jnp.ones((3, 4))}, "K": 4}, step=2)
    back = restore_checkpoint(path, None)
    assert np.asarray(back["gmm"]["weights"]).shape == (3, 4)
    assert int(back["K"]) == 4


def test_train_gmm_resume(tmp_path):
    """Kill-and-resume: training continues from the checkpointed iteration."""
    from mogasr import pipeline as pipe
    from mogasr.config import BatchConfig, FrontendConfig, GmmConfig, TrainConfig, TopologyConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(4, words_per_utt=(2, 2), seed=5)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts], fcfg,
        BatchConfig(batch_size=4, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=fcfg.feat_dim)
    ck = str(tmp_path / "em")

    # run 2 iters with checkpointing ("preempted" after 2)
    r1 = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=2), ckpt_dir=ck)
    # resume to 4 iters: must continue (not restart), ending with 4 history entries
    r2 = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=4), ckpt_dir=ck)
    assert len(r1.history) == 2
    assert len(r2.history) == 4
    np.testing.assert_allclose(r2.history[:2], r1.history, rtol=1e-6)
    assert r2.gmm.n_components == 2
