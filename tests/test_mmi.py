"""MMI discriminative training tests (dense-denominator EBW)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am import em
from mogasr.am.mmi import ebw_update, train_mmi
from mogasr.am.gmm import GmmSet


def test_ebw_identity_when_num_equals_den():
    """num stats == den stats -> the EBW update is exactly the prior model
    (mu' = D*mu/D, var' = D(var+mu^2)/D - mu^2)."""
    rng = np.random.default_rng(0)
    S, K, D = 4, 2, 3
    g = GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, D))).astype(np.float32)),
    )
    occ = jnp.asarray(1.0 + rng.random((S, K)).astype(np.float32))
    sx = jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32))
    sxx = jnp.asarray((1.0 + rng.random((S, K, D))).astype(np.float32))
    s = em.GmmStats(occ, sx, sxx, jnp.zeros(()), jnp.zeros(()))
    g2 = ebw_update(g, s, s)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.vars), np.asarray(g.vars), atol=1e-4)


def test_ebw_moves_toward_numerator():
    """With zero denominator stats, EBW shrinks means toward the numerator ML
    estimate (interpolated through D) and variances stay positive."""
    S, K, D = 2, 1, 2
    g = GmmSet(
        jnp.ones((S, K), jnp.float32),
        jnp.zeros((S, K, D), jnp.float32),
        jnp.ones((S, K, D), jnp.float32),
    )
    # numerator: 10 frames at x = 2 for every state
    occ = jnp.full((S, K), 10.0)
    sx = jnp.full((S, K, D), 20.0)
    sxx = jnp.full((S, K, D), 40.0)
    num = em.GmmStats(occ, sx, sxx, jnp.zeros(()), jnp.zeros(()))
    den = em.zero_stats(S, K, D)
    g2 = ebw_update(g, num, den)
    m = np.asarray(g2.means)
    assert (m > 0.5).all() and (m < 2.01).all(), m  # moved toward 2, smoothed
    assert (np.asarray(g2.vars) > 0).all()


def test_mmi_criterion_improves_and_decode_stays_correct(trained_system):
    """Feature noise makes the classes genuinely overlap (the clean synthetic
    phones are so separable that posteriors are one-hot and num/den stats
    coincide — EBW is correctly a no-op there); on the noisy task the MMI
    criterion must improve monotonically and decode must not degrade."""
    import jax.numpy as jnp

    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig, GmmConfig, TrainConfig
    from mogasr.eval.wer import corpus_wer

    lex, topo, batches, _ = trained_system
    rng = np.random.default_rng(5)
    noisy = [
        pipe.FeatBatch(
            fb.utt_ids,
            jnp.asarray(
                np.asarray(fb.feats)
                + 2.0 * rng.standard_normal(np.asarray(fb.feats).shape).astype(np.float32)
            ),
            fb.n_frames,
            fb.words,
        )
        for fb in batches
    ]
    D = np.asarray(batches[0].feats).shape[-1]
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=1, feat_dim=D)
    gmm, _hist = pipe.train_gmm(noisy, lex, topo, gcfg, TrainConfig(num_em_iters=2))

    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)

    def train_wer(model):
        refs, hyps = [], []
        for fb in noisy:
            out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, model), graph, dcfg)
            for b in range(fb.size):
                refs.append([w.lower() for w in fb.words[b]])
                hyps.append([w.lower() for w in out[b]])
        return corpus_wer(refs, hyps)[0]

    wer_ml = train_wer(gmm)
    mmi_gmm, history = train_mmi(noisy, lex, topo, gmm, n_iters=4, acoustic_scale=0.1)
    assert all(b >= a - 1e-6 for a, b in zip(history, history[1:])), history
    assert history[-1] > history[0] + 1e-3, history
    wer_mmi = train_wer(mmi_gmm)
    assert wer_mmi <= wer_ml + 0.02, (wer_ml, wer_mmi, history)
