"""sMBR tests: brute-force expected-accuracy/weight parity on enumerable
graphs, the single-path zero-gradient property, and training improvement
with decode non-degradation (mirrors the MMI suite)."""

import itertools
import math

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am.smbr import smbr_quantities, train_smbr
from mogasr.hmm import graph as gr

NEG = float(gr.NEG_INF)
L = math.log


def _loop_graph_1state():
    """Two 1-state chains through the loop (J=2, pdfs 0/1)."""
    h = L(0.5)
    return gr.Graph(
        emit_id=np.asarray([0, 1], np.int32),
        self_logp=np.asarray([h, h], np.float32),
        adv_logp=np.asarray([NEG, NEG], np.float32),
        enter_logp=np.asarray([h, h], np.float32),
        exit_logp=np.asarray([h, h], np.float32),
        init_logp=np.asarray([h, h], np.float32),
        final_logp=np.asarray([h, h], np.float32),
        chain_id=np.asarray([0, 1], np.int32),
        labels=["a", "b"],
    )


def _loop_graph_2state():
    """Chain0 = 2 states (pdfs 0,1), chain1 = 1 state (pdf 2): exercises the
    advance transition alongside loop re-entry."""
    h = L(0.5)
    return gr.Graph(
        emit_id=np.asarray([0, 1, 2], np.int32),
        self_logp=np.asarray([h, h, h], np.float32),
        adv_logp=np.asarray([NEG, h, NEG], np.float32),
        enter_logp=np.asarray([h, NEG, h], np.float32),
        exit_logp=np.asarray([NEG, h, h], np.float32),
        init_logp=np.asarray([h, NEG, h], np.float32),
        final_logp=np.asarray([NEG, h, h], np.float32),
        chain_id=np.asarray([0, 0, 1], np.int32),
        labels=["ab", "c"],
    )


def _lse(vals):
    vals = [v for v in vals if v > NEG / 2]
    if not vals:
        return NEG
    m = max(vals)
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _brute_force(g: gr.Graph, emit, ref_pdf):
    """Enumerate state paths; return (E[acc], W[t, pdf]) exactly."""
    J = g.n_states
    T = emit.shape[0]
    trans = np.full((J, J), NEG)
    for i in range(J):
        for j in range(J):
            opts = []
            if i == j and g.self_logp[j] > NEG / 2:
                opts.append(float(g.self_logp[j]))
            if j == i + 1 and g.adv_logp[j] > NEG / 2:
                opts.append(float(g.adv_logp[j]))
            if g.exit_logp[i] > NEG / 2 and g.enter_logp[j] > NEG / 2:
                opts.append(float(g.exit_logp[i] + g.enter_logp[j]))
            trans[i, j] = _lse(opts)
    paths, logps, accs = [], [], []
    for path in itertools.product(range(J), repeat=T):
        lp = float(g.init_logp[path[0]]) + emit[0, path[0]]
        if lp < NEG / 2:
            continue
        ok = True
        for t in range(1, T):
            tr = trans[path[t - 1], path[t]]
            if tr < NEG / 2:
                ok = False
                break
            lp += tr + emit[t, path[t]]
        lp += float(g.final_logp[path[-1]])
        if not ok or lp < NEG / 2:
            continue
        paths.append(path)
        logps.append(lp)
        accs.append(sum(int(g.emit_id[path[t]] == ref_pdf[t]) for t in range(T)))
    z = _lse(logps)
    p = np.exp(np.asarray(logps) - z)
    accs = np.asarray(accs, np.float64)
    e_acc = float(np.sum(p * accs))
    n_pdfs = int(g.emit_id.max()) + 1
    W = np.zeros((T, n_pdfs))
    for pi, path in enumerate(paths):
        for t in range(T):
            W[t, g.emit_id[path[t]]] += p[pi] * (accs[pi] - e_acc)
    return e_acc, W


@pytest.mark.parametrize("builder", [_loop_graph_1state, _loop_graph_2state])
def test_smbr_matches_brute_force(builder):
    g = builder()
    n_pdfs = int(g.emit_id.max()) + 1
    rng = np.random.default_rng(3)
    T = 4
    emit = rng.standard_normal((T, n_pdfs)).astype(np.float32)
    ref = rng.integers(0, n_pdfs, T).astype(np.int32)
    want_acc, want_w = _brute_force(g, emit, ref)

    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    q = smbr_quantities(
        jnp.asarray(emit[None]), graphs, jnp.asarray(ref[None]),
        jnp.asarray([T]), acoustic_scale=1.0, n_pdfs=n_pdfs,
    )
    np.testing.assert_allclose(float(q.expected_acc[0]), want_acc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q.weights_pdf[0]), want_w, atol=1e-5)


def test_smbr_padding_invariance():
    g = _loop_graph_2state()
    n_pdfs = 3
    rng = np.random.default_rng(4)
    T = 5
    emit = rng.standard_normal((1, T, n_pdfs)).astype(np.float32)
    ref = rng.integers(0, n_pdfs, (1, T)).astype(np.int32)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    base = smbr_quantities(
        jnp.asarray(emit), graphs, jnp.asarray(ref), jnp.asarray([T]),
        acoustic_scale=1.0, n_pdfs=n_pdfs,
    )
    # add garbage padding frames
    pad_emit = np.concatenate([emit, 50.0 * np.ones((1, 3, n_pdfs), np.float32)], 1)
    pad_ref = np.concatenate([ref, np.full((1, 3), -1, np.int32)], 1)
    padded = smbr_quantities(
        jnp.asarray(pad_emit), graphs, jnp.asarray(pad_ref), jnp.asarray([T]),
        acoustic_scale=1.0, n_pdfs=n_pdfs,
    )
    np.testing.assert_allclose(
        float(padded.expected_acc[0]), float(base.expected_acc[0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(padded.weights_pdf[0, :T]), np.asarray(base.weights_pdf[0, :T]),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(padded.weights_pdf[0, T:]), 0.0, atol=1e-6)


def test_smbr_single_path_zero_weights():
    """A graph with ONE state has one path: expected acc == raw acc and all
    sMBR weights vanish (nothing to discriminate)."""
    g = gr.Graph(
        emit_id=np.asarray([0], np.int32),
        self_logp=np.asarray([0.0], np.float32),
        adv_logp=np.asarray([NEG], np.float32),
        enter_logp=np.asarray([NEG], np.float32),
        exit_logp=np.asarray([NEG], np.float32),
        init_logp=np.asarray([0.0], np.float32),
        final_logp=np.asarray([0.0], np.float32),
        chain_id=np.asarray([0], np.int32),
        labels=["a"],
    )
    T = 6
    emit = np.zeros((1, T, 2), np.float32)
    ref = np.asarray([[0, 0, 1, 0, 1, 0]], np.int32)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    q = smbr_quantities(
        jnp.asarray(emit), graphs, jnp.asarray(ref), jnp.asarray([T]),
        acoustic_scale=1.0, n_pdfs=2,
    )
    np.testing.assert_allclose(float(q.expected_acc[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q.weights_pdf), 0.0, atol=1e-5)


def test_smbr_training_improves_and_decode_stays_correct(trained_system):
    """Same noisy-overlap task as the MMI suite: the expected frame accuracy
    must improve and decode must not degrade."""
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
    sm_gmm, history = train_smbr(noisy, lex, topo, gmm, n_iters=3, acoustic_scale=0.1)
    assert history[-1] > history[0] - 1e-6, history
    wer_smbr = train_wer(sm_gmm)
    assert wer_smbr <= wer_ml + 0.02, (wer_ml, wer_smbr, history)
