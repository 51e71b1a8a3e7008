"""Transition re-estimation: counts from known paths, integration into
train_gmm, and per-phone topology override."""

import numpy as np
import pytest

from mogasr.am.em import estimate_transitions
from mogasr.config import TopologyConfig
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology


def test_estimate_transitions_counts():
    # one phone, pdfs [0]; path stays 3 times, moves once
    paths = np.array([[0, 0, 0, 1, -1]])
    pdfs = np.array([[0, 0, 0, 0, -1]])
    pdf_to_phone = np.array([0, 0])
    self_p, counts = estimate_transitions(paths, pdfs, pdf_to_phone, 1, prior_count=0.0)
    # transitions: 0->0 (stay), 0->0 (stay), 0->1 (move) = 2 stays 1 move
    np.testing.assert_allclose(self_p[0], 2 / 3)


def test_topology_per_phone_override():
    lex = make_lexicon({"a": ["a"]})
    topo = build_topology(lex, TopologyConfig())
    t2 = topo.with_transitions(np.array([0.9, 0.5]))
    s, a = t2.phone_trans_logps(0)
    np.testing.assert_allclose(np.exp(s), 0.9, atol=1e-6)
    np.testing.assert_allclose(np.exp(a), 0.1, atol=1e-6)
    s1, a1 = t2.phone_trans_logps(1)
    np.testing.assert_allclose(np.exp(s1), 0.5, atol=1e-6)
    # original untouched
    assert not topo.per_phone_self_prob


def test_train_gmm_reestimates_transitions():
    from mogasr import pipeline as pipe
    from mogasr.config import BatchConfig, FrontendConfig, GmmConfig, TrainConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.hmm.lexicon import synthetic_lexicon

    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(6, words_per_utt=(2, 2), seed=3)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts], fcfg,
        BatchConfig(batch_size=6, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=1, feat_dim=fcfg.feat_dim)
    res = pipe.train_gmm(
        batches, lex, topo, gcfg, TrainConfig(num_em_iters=3),
        reestimate_transitions=True,
    )
    assert len(res.topo.per_phone_self_prob) == lex.n_phones
    probs = np.asarray(res.topo.per_phone_self_prob)
    assert np.all(probs > 0) and np.all(probs < 1)
    # phones average ~9 frames/state-visit over 3 states -> self prob well
    # above 0.3 for phones that occur
    gmm, history = res  # backward-compat unpacking still works
    assert history[-1] > history[0]


def test_train_gmm_transitions_across_buckets():
    """Regression: reestimate_transitions must handle batches from DIFFERENT
    T buckets (round-2 bug: np.concatenate of unequal widths)."""
    import jax.numpy as jnp

    from mogasr import pipeline as pipe
    from mogasr.config import (
        BatchConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
    )
    from mogasr.data.synthetic import make_corpus
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    # tiny bucket ceilings force at least two distinct padded widths
    bcfg = BatchConfig(batch_size=2, bucket_boundaries=(150, 300, 500))
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(6, words_per_utt=(1, 8), seed=5)
    tb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in utts], fcfg, bcfg)
    widths = {int(fb.feats.shape[1]) for fb in tb}
    assert len(widths) > 1, f"fixture must span buckets, got {widths}"
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=1, feat_dim=fcfg.feat_dim)
    res = pipe.train_gmm(
        tb, lex, topo, gcfg, TrainConfig(num_em_iters=2),
        reestimate_transitions=True,
    )
    assert len(res.history) == 2
