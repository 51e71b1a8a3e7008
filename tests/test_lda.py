"""LDA feature transform: solver properties, splice parity/padding,
subspace recovery, affine composition, and the splice->LDA->MLLT recipe
end-to-end on the synthetic corpus."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mogasr import pipeline as pipe
from mogasr.am import lda as ld
from mogasr.config import (
    BatchConfig, DecodeConfig, FrontendConfig, GmmConfig, TopologyConfig,
    TrainConfig,
)
from mogasr.data.synthetic import make_corpus
from mogasr.eval.wer import corpus_wer
from mogasr.hmm.lexicon import synthetic_lexicon
from mogasr.hmm.topology import build_topology


def _class_data(rng, n_classes=8, dim=20, per_class=400):
    means = 3.0 * rng.standard_normal((n_classes, dim))
    feats = np.concatenate(
        [m + rng.standard_normal((per_class, dim)) for m in means]
    ).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), per_class).astype(np.int32)
    return feats, labels


def _scatters(feats, labels):
    mu_g = feats.mean(0)
    classes = np.unique(labels)
    b = np.zeros((feats.shape[1],) * 2)
    w = np.zeros_like(b)
    for c in classes:
        x = feats[labels == c]
        d = x.mean(0) - mu_g
        b += len(x) * np.outer(d, d)
        xc = x - x.mean(0)
        w += xc.T @ xc
    n = len(feats)
    return w / n, b / n


def test_solve_lda_whitens_within_and_diagonalizes_between():
    rng = np.random.default_rng(0)
    feats, labels = _class_data(rng)
    stats = ld.accumulate_lda_stats(
        jnp.asarray(feats), jnp.asarray(labels), 8
    )
    d = 5
    W = ld.solve_lda(stats, d)
    A, bias = np.asarray(W[:, :-1], np.float64), np.asarray(W[:, -1], np.float64)
    sw, sb = _scatters(feats.astype(np.float64), labels)
    awa = A @ sw @ A.T
    np.testing.assert_allclose(awa, np.eye(d), atol=1e-3)
    aba = A @ sb @ A.T
    off = aba - np.diag(np.diag(aba))
    assert np.abs(off).max() < 1e-3, off
    diag = np.diag(aba)
    assert np.all(np.diff(diag) <= 1e-6), diag  # descending separation
    # bias centers the global mean
    np.testing.assert_allclose(A @ feats.mean(0) + bias, 0.0, atol=1e-3)


def test_lda_stats_ignore_padding():
    rng = np.random.default_rng(1)
    feats, labels = _class_data(rng, per_class=50)
    stats = ld.accumulate_lda_stats(jnp.asarray(feats), jnp.asarray(labels), 8)
    pad_feats = np.concatenate([feats, 99.0 * np.ones((17, feats.shape[1]), np.float32)])
    pad_labels = np.concatenate([labels, np.full(17, -1, np.int32)])
    stats_p = ld.accumulate_lda_stats(
        jnp.asarray(pad_feats), jnp.asarray(pad_labels), 8
    )
    np.testing.assert_allclose(stats.occ, stats_p.occ, rtol=1e-6)
    np.testing.assert_allclose(stats.first, stats_p.first, rtol=1e-5)
    np.testing.assert_allclose(stats.outer, stats_p.outer, rtol=1e-5)


def test_lda_recovers_discriminative_subspace():
    """Class information lives in a rotated 3-D subspace of 24 dims; the
    LDA projection must separate classes (near-perfect nearest-class-mean
    accuracy), far better than the raw leading dims."""
    rng = np.random.default_rng(2)
    n_classes, d_sig, D = 6, 3, 24
    means_low = 6.0 * rng.standard_normal((n_classes, d_sig))
    q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    n_per = 300
    feats, labels = [], []
    for c in range(n_classes):
        low = means_low[c] + rng.standard_normal((n_per, d_sig))
        full = np.concatenate(
            [low, 4.0 * rng.standard_normal((n_per, D - d_sig))], axis=1
        )
        feats.append(full @ q.T)
        labels.append(np.full(n_per, c))
    feats = np.concatenate(feats).astype(np.float32)
    labels = np.concatenate(labels).astype(np.int32)
    stats = ld.accumulate_lda_stats(
        jnp.asarray(feats), jnp.asarray(labels), n_classes
    )
    W = ld.solve_lda(stats, d_sig)
    proj = feats @ np.asarray(W[:, :-1]).T + np.asarray(W[:, -1])

    def ncm_acc(x):
        mus = np.stack([x[labels == c].mean(0) for c in range(n_classes)])
        d2 = ((x[:, None, :] - mus[None]) ** 2).sum(-1)
        return float((d2.argmin(1) == labels).mean())

    acc_lda = ncm_acc(proj)
    acc_raw = ncm_acc(feats[:, :d_sig])
    assert acc_lda > 0.95, acc_lda
    assert acc_lda > acc_raw + 0.1, (acc_lda, acc_raw)


def test_splice_matches_oracle_and_zeroes_padding():
    rng = np.random.default_rng(3)
    t0, t1, T, D, ctx = 11, 7, 16, 4, 3
    feats = np.zeros((2, T, D), np.float32)
    feats[0, :t0] = rng.standard_normal((t0, D))
    feats[1, :t1] = rng.standard_normal((t1, D))
    out = np.asarray(
        ld.splice_frames(jnp.asarray(feats), jnp.asarray([t0, t1]), ctx)
    )
    np.testing.assert_allclose(out[0, :t0], ld.splice_np(feats[0, :t0], ctx), rtol=1e-6)
    np.testing.assert_allclose(out[1, :t1], ld.splice_np(feats[1, :t1], ctx), rtol=1e-6)
    assert np.all(out[0, t0:] == 0.0) and np.all(out[1, t1:] == 0.0)


def test_compose_affine():
    rng = np.random.default_rng(4)
    w1 = rng.standard_normal((5, 9)).astype(np.float32)   # 8 -> 5
    w2 = rng.standard_normal((3, 6)).astype(np.float32)   # 5 -> 3
    x = rng.standard_normal((10, 8)).astype(np.float32)
    y1 = x @ w1[:, :-1].T + w1[:, -1]
    y2 = y1 @ w2[:, :-1].T + w2[:, -1]
    wc = ld.compose_affine(w2, w1)
    np.testing.assert_allclose(x @ wc[:, :-1].T + wc[:, -1], y2, rtol=1e-4, atol=1e-5)


def test_train_lda_mllt_end_to_end():
    """Boot a delta GMM, train the splice->LDA->MLLT system, and decode
    held-out audio: the LDA-space system must reach comparable WER."""
    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    bcfg = BatchConfig(batch_size=8, bucket_boundaries=(250, 400))
    utts = [(u.utt_id, u.wave, u.words) for u in make_corpus(40, words_per_utt=(2, 3), seed=21)]
    test_utts = [(u.utt_id, u.wave, u.words) for u in make_corpus(24, words_per_utt=(2, 3), seed=77)]

    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=fcfg.feat_dim)
    tcfg = TrainConfig(num_em_iters=5)
    boot_batches = pipe.featurize(utts, fcfg, bcfg)
    boot_gmm, _ = pipe.train_gmm(boot_batches, lex, topo, gcfg, tcfg)

    sys = pipe.train_lda_mllt(
        utts, lex, topo, fcfg, bcfg, gcfg, tcfg, boot_gmm,
        context=2, lda_dim=30, mllt_iters=4,
    )
    assert sys.transform.shape == (30, 5 * fcfg.base_dim + 1)
    assert sys.history[-1] > sys.history[0]

    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)

    def wer_of(batches, gmm):
        refs, hyps = [], []
        for fb in batches:
            out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, gmm), graph, dcfg)
            for b in range(fb.size):
                refs.append([w.lower() for w in fb.words[b]])
                hyps.append([w.lower() for w in out[b]])
        return corpus_wer(refs, hyps)[0]

    wer_boot = wer_of(pipe.featurize(test_utts, fcfg, bcfg), boot_gmm)
    wer_lda = wer_of(sys.featurize(test_utts, bcfg), sys.gmm)
    assert wer_lda <= wer_boot + 0.02, (wer_lda, wer_boot)
    assert wer_lda < 0.10, wer_lda
