"""Semi-tied covariance (MLLT) tests: decorrelation recovery, objective
monotonicity, padding invariance, and likelihood gain over the diagonal
baseline on correlated data."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am import stc as S
from mogasr.am.fmllr import apply_fmllr
from mogasr.am.gmm import GmmSet, gmm_loglik_np


@pytest.fixture(scope="module")
def correlated_data():
    """Per-class diagonal Gaussians mixed by a SHARED non-orthogonal R:
    exactly the model class STC is built for."""
    rng = np.random.default_rng(77)
    Sn, K, D, N = 5, 1, 4, 4000
    R = np.eye(D) + 0.45 * rng.standard_normal((D, D))
    mu_z = 3 * rng.standard_normal((Sn, D))
    var_z = 0.2 + rng.random((Sn, D))
    labels = rng.integers(0, Sn, N)
    z = mu_z[labels] + rng.standard_normal((N, D)) * np.sqrt(var_z[labels])
    x = (z @ R.T).astype(np.float32)
    # diagonal x-space model: true x-means, marginal x-variances
    mu_x = mu_z @ R.T
    cov_x = np.stack([(R * var_z[s]) @ R.T for s in range(Sn)])
    var_x = np.stack([np.diag(c) for c in cov_x])
    g = GmmSet(
        jnp.ones((Sn, K), jnp.float32),
        jnp.asarray(mu_x[:, None, :].astype(np.float32)),
        jnp.asarray(var_x[:, None, :].astype(np.float32)),
    )
    return g, x, labels.astype(np.int64), R


def test_stc_decorrelates_and_improves_loglik(correlated_data):
    g, x, labels, R = correlated_data
    stats = S.accumulate_stc_stats(g, jnp.asarray(x), jnp.asarray(labels))
    A, vars_y = S.solve_stc(g, stats, n_iters=10)

    # transformed within-class covariances are near-diagonal
    D = x.shape[1]
    occ = np.asarray(stats.occ, np.float64).reshape(-1)
    W = np.asarray(stats.scatter, np.float64).reshape(-1, D, D)
    Wn = W / occ[:, None, None]

    def ratio(Amat):
        covs = np.einsum("id,mde,je->mij", Amat, Wn, Amat)
        off = sum(np.abs(c - np.diag(np.diag(c))).sum() for c in covs)
        dia = sum(np.abs(np.diag(c)).sum() for c in covs)
        return off / dia

    r_id = ratio(np.eye(D))
    r_stc = ratio(np.asarray(A, np.float64))
    assert r_stc < 0.35 * r_id, (r_id, r_stc)

    # aligned loglik: diagonal baseline vs STC model in y-space + log|det A|
    ll_diag = gmm_loglik_np(x, *map(np.asarray, g))[np.arange(len(labels)), labels].mean()
    g_y = S.apply_stc(g, A, vars_y)
    y = np.asarray(apply_fmllr(jnp.asarray(x), S.stc_feature_transform(A)))
    _sign, logdet = np.linalg.slogdet(np.asarray(A, np.float64))
    ll_stc = (
        gmm_loglik_np(y, *map(np.asarray, g_y))[np.arange(len(labels)), labels].mean()
        + logdet
    )
    assert ll_stc > ll_diag + 0.1, (ll_diag, ll_stc)


def test_stc_objective_monotone(correlated_data):
    g, x, labels, R = correlated_data
    stats = S.accumulate_stc_stats(g, jnp.asarray(x), jnp.asarray(labels))
    prev = -np.inf
    for n in (1, 3, 10):
        A, vars_y = S.solve_stc(g, stats, n_iters=n)
        q = S.stc_aux_loglik(A, g, stats, vars_y)
        assert q >= prev - 1e-6, (n, prev, q)
        prev = q
    # and strictly better than the identity transform (whose optimal
    # variances are the scatter diagonals)
    D = x.shape[1]
    occ = np.asarray(stats.occ, np.float64).reshape(-1)
    W = np.asarray(stats.scatter, np.float64).reshape(-1, D, D)
    vars_id = np.stack(
        [np.diag(w) / max(o, 1e-10) for w, o in zip(W, occ)]
    ).reshape(np.asarray(stats.occ).shape + (D,))
    q_id = S.stc_aux_loglik(np.eye(D), g, stats, np.maximum(vars_id, 1e-4))
    assert prev > q_id + 0.05, (q_id, prev)


def test_stc_recipe_integration(mini_system):
    """Full recipe insert: align -> estimate STC -> transformed decode must
    not degrade WER on the mini corpus (MFCC+deltas are already fairly
    decorrelated, so near-identity A and unchanged accuracy are expected —
    the unit tests above carry the decorrelation claim)."""
    from mogasr import pipeline as pipe
    from mogasr.config import BatchConfig, DecodeConfig, FrontendConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.eval.wer import corpus_wer

    mlex, topo, gmm, vocab = mini_system
    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=8, bucket_boundaries=(250, 400))
    utts = make_corpus(8, words_per_utt=(2, 3), seed=31, vocab=vocab)
    batches = pipe.featurize([(u.utt_id, u.wave, u.words) for u in utts], fcfg, bcfg)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(mlex, topo, dcfg)

    def wer_of(bs, model):
        refs, hyps = [], []
        for fb in bs:
            out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, model), graph, dcfg)
            for b in range(fb.size):
                refs.append([w.lower() for w in fb.words[b]])
                hyps.append([w.lower() for w in out[b]])
        return corpus_wer(refs, hyps)[0]

    base = wer_of(batches, gmm)
    A, vars_y, gmm_y, tf = pipe.estimate_stc_batches(batches, gmm, mlex, topo)
    assert np.isfinite(A).all() and (vars_y > 0).all()
    wer_y = wer_of(tf(batches), gmm_y)
    assert wer_y <= base + 0.05, (base, wer_y)


def test_stc_stats_padding_invariant(correlated_data):
    g, x, labels, R = correlated_data
    lp = np.concatenate([labels, np.full(37, -1)])
    xp = np.concatenate([x, 100 * np.ones((37, x.shape[1]), np.float32)])
    s1 = S.accumulate_stc_stats(g, jnp.asarray(x), jnp.asarray(labels))
    s2 = S.accumulate_stc_stats(g, jnp.asarray(xp), jnp.asarray(lp))
    np.testing.assert_allclose(np.asarray(s1.occ), np.asarray(s2.occ), atol=1e-4)
    scale = np.abs(np.asarray(s1.scatter)).max()
    np.testing.assert_allclose(
        np.asarray(s1.scatter), np.asarray(s2.scatter), atol=1e-5 * scale
    )
