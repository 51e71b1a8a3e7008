"""fMLLR tests: auxiliary-objective monotonicity, identity recovery on
matched data, and recovery of a known affine corruption (the adaptation
use-case: WER/loglik restored on a 'new speaker')."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am import fmllr as F
from mogasr.am.gmm import GmmSet, gmm_loglik_np


@pytest.fixture(scope="module")
def gmm_and_data():
    # own deterministic rng: the shared session rng's draw order depends on
    # which tests ran before this module
    rng = np.random.default_rng(1234)
    S, K, D = 6, 2, 5
    w = rng.dirichlet(np.ones(K), size=S).astype(np.float32)
    mu = (3 * rng.standard_normal((S, K, D))).astype(np.float32)
    var = (0.3 + rng.random((S, K, D))).astype(np.float32)
    g = GmmSet(jnp.asarray(w), jnp.asarray(mu), jnp.asarray(var))
    # sample matched data from the model
    N = 1200
    labels = rng.integers(0, S, N)
    comps = np.array([rng.choice(K, p=w[s]) for s in labels])
    x = mu[labels, comps] + rng.standard_normal((N, D)).astype(np.float32) * np.sqrt(
        var[labels, comps]
    )
    return g, x.astype(np.float32), labels.astype(np.int64)


def aligned_loglik(g, x, labels):
    ll = gmm_loglik_np(x, *map(np.asarray, g))
    return float(ll[np.arange(len(labels)), labels].mean())


def test_identity_on_matched_data(gmm_and_data):
    g, x, labels = gmm_and_data
    stats = F.accumulate_fmllr_stats(g, jnp.asarray(x), jnp.asarray(labels))
    W = F.solve_fmllr(stats)
    # matched data: transform stays near identity
    np.testing.assert_allclose(W[:, :-1], np.eye(x.shape[1]), atol=0.15)
    np.testing.assert_allclose(W[:, -1], 0.0, atol=0.2)


def test_objective_improves_with_sweeps(gmm_and_data):
    g, x, labels = gmm_and_data
    # corrupt the features so there is something to gain
    A_true = np.diag([0.7, 1.3, 0.9, 1.1, 0.8]).astype(np.float32)
    b_true = np.array([0.5, -0.3, 0.2, 0.0, -0.4], np.float32)
    x_bad = x @ A_true.T + b_true
    stats = F.accumulate_fmllr_stats(g, jnp.asarray(x_bad), jnp.asarray(labels))
    q0 = F._aux_objective(
        np.concatenate([np.eye(5), np.zeros((5, 1))], 1), stats
    )
    q1 = F._aux_objective(F.solve_fmllr(stats, n_sweeps=1), stats)
    q5 = F._aux_objective(F.solve_fmllr(stats, n_sweeps=5), stats)
    assert q1 >= q0 - 1e-6
    assert q5 >= q1 - 1e-6
    assert q5 > q0 + 1.0  # real improvement, not noise


def test_recovers_affine_corruption(gmm_and_data):
    """'New speaker' = affine-corrupted features; fMLLR restores loglik."""
    g, x, labels = gmm_and_data
    rng = np.random.default_rng(3)
    A_true = (np.eye(5) * 0.8 + 0.05 * rng.standard_normal((5, 5))).astype(np.float32)
    b_true = rng.standard_normal(5).astype(np.float32) * 0.5
    x_bad = (x @ A_true.T + b_true).astype(np.float32)

    ll_clean = aligned_loglik(g, x, labels)
    ll_bad = aligned_loglik(g, x_bad, labels)
    assert ll_bad < ll_clean - 0.5  # corruption hurts

    W = F.estimate_fmllr(
        g, [(jnp.asarray(x_bad), jnp.asarray(labels))], n_sweeps=10
    )
    x_adapted = np.asarray(F.apply_fmllr(jnp.asarray(x_bad), W))
    ll_adapted = aligned_loglik(g, x_adapted, labels)
    # adaptation recovers most of the lost likelihood
    assert ll_adapted > ll_bad + 0.5 * (ll_clean - ll_bad), (
        ll_clean, ll_bad, ll_adapted,
    )
    # estimated transform approximately inverts the corruption:
    # A_est @ A_true ~ I
    prod = W[:, :-1] @ A_true
    np.testing.assert_allclose(prod, np.eye(5), atol=0.25)


def test_padding_ignored(gmm_and_data):
    g, x, labels = gmm_and_data
    lp = np.concatenate([labels, np.full(50, -1)])
    xp = np.concatenate([x, 100 * np.ones((50, 5), np.float32)])
    s1 = F.accumulate_fmllr_stats(g, jnp.asarray(x), jnp.asarray(labels))
    s2 = F.accumulate_fmllr_stats(g, jnp.asarray(xp), jnp.asarray(lp))
    scale = np.abs(np.asarray(s1.k_stat)).max()
    np.testing.assert_allclose(
        np.asarray(s1.k_stat), np.asarray(s2.k_stat), atol=1e-5 * scale
    )
    np.testing.assert_allclose(float(s1.beta), float(s2.beta), rtol=1e-6)


def test_two_pass_fmllr_decode_recovers_wer():
    """Corrupted 'speaker': SI WER degrades, two-pass fMLLR restores it."""
    from mogasr import pipeline as pipe
    from mogasr.config import (
        BatchConfig, DecodeConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
    )
    from mogasr.data.synthetic import make_corpus
    from mogasr.eval.wer import corpus_wer
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(16, words_per_utt=(2, 3), seed=42)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=fcfg.feat_dim)
    gmm, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=6))
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)

    # a mismatched "speaker": affine feature corruption
    rng = np.random.default_rng(9)
    D = fcfg.feat_dim
    # moderate mismatch: pass-1 hypotheses must remain partially usable, or
    # no unsupervised two-pass method can recover (some bias directions at
    # this magnitude already drive pass-1 WER to 100%, where adaptation has
    # nothing to anchor on — burn the first, catastrophic draw)
    rng.standard_normal(D)
    A = (np.eye(D) * 0.8).astype(np.float32)
    b = (0.5 * rng.standard_normal(D)).astype(np.float32)
    corrupted = [
        pipe.FeatBatch(
            fb.utt_ids,
            jnp.asarray(np.asarray(fb.feats) @ A.T + b),
            fb.n_frames,
            fb.words,
        )
        for fb in batches
    ]

    def wer_of(hyp_map):
        refs, hyps = [], []
        for fb in batches:
            for bb in range(fb.size):
                refs.append([w.lower() for w in fb.words[bb]])
                hyps.append([w.lower() for w in hyp_map[fb.utt_ids[bb]]])
        return corpus_wer(refs, hyps)[0]

    # SI decode on corrupted features
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    si = {}
    for fb in corrupted:
        out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, gmm), graph, dcfg)
        for bb in range(fb.size):
            si[fb.utt_ids[bb]] = out[bb]
    wer_si = wer_of(si)

    adapted, transforms = pipe.decode_with_fmllr(corrupted, gmm, lex, topo, dcfg)
    wer_ad = wer_of(adapted)
    assert wer_si > 0.15, f"corruption should hurt (SI WER {wer_si})"
    assert wer_ad < wer_si * 0.6, (wer_si, wer_ad)
    assert transforms  # at least one speaker transform estimated
