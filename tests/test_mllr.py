"""MLLR (model-space mean adaptation) tests: identity on matched data,
closed-form recovery of a mean corruption, padding invariance, and
unsupervised two-pass decode recovery (mirrors test_fmllr for the
feature-space transform)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am import mllr as M
from mogasr.am.gmm import GmmSet, gmm_loglik_np


@pytest.fixture(scope="module")
def gmm_and_data():
    rng = np.random.default_rng(4321)
    S, K, D = 6, 2, 5
    w = rng.dirichlet(np.ones(K), size=S).astype(np.float32)
    mu = (3 * rng.standard_normal((S, K, D))).astype(np.float32)
    var = (0.3 + rng.random((S, K, D))).astype(np.float32)
    g = GmmSet(jnp.asarray(w), jnp.asarray(mu), jnp.asarray(var))
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
    W = M.estimate_mllr(g, [(jnp.asarray(x), jnp.asarray(labels))])
    np.testing.assert_allclose(W[:, :-1], np.eye(x.shape[1]), atol=0.15)
    np.testing.assert_allclose(W[:, -1], 0.0, atol=0.25)


def test_recovers_pure_shift_exactly(gmm_and_data):
    """Speaker = constant feature offset: mean-only MLLR corrects it fully."""
    g, x, labels = gmm_and_data
    b_true = np.array([1.0, -0.8, 0.5, 0.0, -1.2], np.float32)
    x_bad = x + b_true

    ll_clean = aligned_loglik(g, x, labels)
    ll_bad = aligned_loglik(g, x_bad, labels)
    assert ll_bad < ll_clean - 0.5

    W = M.estimate_mllr(g, [(jnp.asarray(x_bad), jnp.asarray(labels))])
    g_ad = M.apply_mllr(g, W)
    ll_ad = aligned_loglik(g_ad, x_bad, labels)
    assert ll_ad > ll_bad + 0.9 * (ll_clean - ll_bad), (ll_clean, ll_bad, ll_ad)
    np.testing.assert_allclose(W[:, -1], b_true, atol=0.2)


def test_recovers_affine_corruption(gmm_and_data):
    g, x, labels = gmm_and_data
    rng = np.random.default_rng(3)
    A_true = (np.eye(5) * 0.9 + 0.05 * rng.standard_normal((5, 5))).astype(np.float32)
    b_true = rng.standard_normal(5).astype(np.float32) * 0.5
    x_bad = (x @ A_true.T + b_true).astype(np.float32)

    ll_clean = aligned_loglik(g, x, labels)
    ll_bad = aligned_loglik(g, x_bad, labels)
    W = M.estimate_mllr(g, [(jnp.asarray(x_bad), jnp.asarray(labels))])
    g_ad = M.apply_mllr(g, W)
    ll_ad = aligned_loglik(g_ad, x_bad, labels)
    # mean-only MLLR recovers most of the gap (variances stay mismatched)
    assert ll_ad > ll_bad + 0.5 * (ll_clean - ll_bad), (ll_clean, ll_bad, ll_ad)
    # the estimated mean map approximates the data corruption itself
    np.testing.assert_allclose(W[:, :-1], A_true, atol=0.25)


def test_padding_ignored(gmm_and_data):
    g, x, labels = gmm_and_data
    lp = np.concatenate([labels, np.full(50, -1)])
    xp = np.concatenate([x, 100 * np.ones((50, 5), np.float32)])
    s1 = M.accumulate_mllr_stats(g, jnp.asarray(x), jnp.asarray(labels))
    s2 = M.accumulate_mllr_stats(g, jnp.asarray(xp), jnp.asarray(lp))
    np.testing.assert_allclose(np.asarray(s1.occ), np.asarray(s2.occ), atol=1e-4)
    scale = np.abs(np.asarray(s1.xsum)).max()
    np.testing.assert_allclose(
        np.asarray(s1.xsum), np.asarray(s2.xsum), atol=1e-5 * scale
    )


def test_low_occupancy_returns_identity(gmm_and_data):
    g, x, labels = gmm_and_data
    W = M.estimate_mllr(g, [(jnp.asarray(x[:2]), jnp.asarray(labels[:2]))],
                        min_occ=100.0)
    np.testing.assert_allclose(W[:, :-1], np.eye(5), atol=1e-6)


def test_class_mllr_beats_global_on_classwise_shift(gmm_and_data):
    """Two state groups shifted by DIFFERENT offsets: a single global mean
    transform must compromise; per-class MLLR recovers both exactly."""
    g, x, labels = gmm_and_data
    classes = np.array([0, 0, 0, 1, 1, 1], np.int32)  # S=6 states
    b0 = np.array([1.5, 0.0, -1.0, 0.5, 0.0], np.float32)
    b1 = np.array([-1.0, 1.0, 0.5, -0.5, 1.0], np.float32)
    shift = np.where((classes[labels] == 0)[:, None], b0, b1)
    x_bad = (x + shift).astype(np.float32)

    ll_clean = aligned_loglik(g, x, labels)
    ll_bad = aligned_loglik(g, x_bad, labels)
    assert ll_bad < ll_clean - 0.5

    stats = M.accumulate_mllr_stats(g, jnp.asarray(x_bad), jnp.asarray(labels))
    W_g = M.solve_mllr(g, stats)
    Ws = M.solve_mllr_classes(g, stats, classes)
    ll_global = aligned_loglik(M.apply_mllr(g, W_g), x_bad, labels)
    ll_class = aligned_loglik(
        M.apply_mllr_classes(g, Ws, classes), x_bad, labels
    )
    # per-class must beat the compromised global transform AND recover nearly
    # all of the corruption-induced likelihood loss. (The raw W entries are
    # NOT checked against the true shifts: with only 6 Gaussians per class
    # the row solves are exactly determined, so they fit the sampled
    # sufficient stats — which is precisely the ML objective — rather than
    # the generating shift.)
    assert ll_class > ll_global + 0.05, (ll_clean, ll_bad, ll_global, ll_class)
    assert ll_class > ll_bad + 0.9 * (ll_clean - ll_bad)


def test_class_mllr_backs_off_to_global(gmm_and_data):
    """A class with no occupancy gets the global transform."""
    g, x, labels = gmm_and_data
    keep = labels < 3  # starve states 3..5 entirely
    stats = M.accumulate_mllr_stats(
        g, jnp.asarray(x[keep]), jnp.asarray(labels[keep])
    )
    classes = np.array([0, 0, 0, 1, 1, 1], np.int32)
    W_g = M.solve_mllr(g, stats)
    Ws = M.solve_mllr_classes(g, stats, classes)
    np.testing.assert_allclose(Ws[1], W_g, atol=1e-6)


def test_speech_sil_classes_layout(trained_system):
    from mogasr.am.mllr import speech_sil_classes

    lex, topo, _batches, _gmm = trained_system
    cls = speech_sil_classes(topo)
    assert cls.shape == (topo.n_pdfs,)
    assert (cls[: topo.sil_states] == 0).all()
    assert (cls[topo.sil_states :] == 1).all()


def test_two_pass_mllr_decode_recovers_wer(trained_system):
    """Shifted 'speaker': SI WER degrades, two-pass MLLR restores it."""
    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig
    from mogasr.eval.wer import corpus_wer

    lex, topo, batches, gmm = trained_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)

    rng = np.random.default_rng(11)
    D = np.asarray(batches[0].feats).shape[-1]
    b = (0.6 * rng.standard_normal(D)).astype(np.float32)
    corrupted = [
        pipe.FeatBatch(
            fb.utt_ids, jnp.asarray(np.asarray(fb.feats) + b), fb.n_frames, fb.words
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

    graph = pipe.word_decode_graph(lex, topo, dcfg)
    si = {}
    for fb in corrupted:
        out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, gmm), graph, dcfg)
        for bb in range(fb.size):
            si[fb.utt_ids[bb]] = out[bb]
    wer_si = wer_of(si)

    adapted, transforms = pipe.decode_with_mllr(corrupted, gmm, lex, topo, dcfg)
    wer_ad = wer_of(adapted)
    assert wer_si > 0.15, f"corruption should hurt (SI WER {wer_si})"
    assert wer_ad < wer_si * 0.6, (wer_si, wer_ad)
    assert transforms
