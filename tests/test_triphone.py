"""Context-dependent (triphone) modeling tests: context extraction, tying,
CD graph expansion, full CD training recipe, CD decode WER."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.config import (
    BatchConfig, DecodeConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
)
from mogasr.data.synthetic import make_corpus
from mogasr.hmm import triphone as tri
from mogasr.hmm.lexicon import synthetic_lexicon
from mogasr.hmm.topology import build_topology

FCFG = FrontendConfig()


def test_contexts_of():
    out = tri.contexts_of([0, 5, 7, 0], sil_id=0)
    assert out == [(0, 0, 5), (0, 5, 7), (5, 7, 0), (7, 0, 0)]


def test_tie_states_structure():
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    rng = np.random.default_rng(0)
    # two well-separated context groups for phone 1, position 0
    stats = {}
    for i, l in enumerate([2, 3, 4, 5]):
        mean = np.full(4, 10.0 if i % 2 == 0 else -10.0)
        stats[(l, 1, 2, 0)] = (50.0, mean + 0.01 * rng.standard_normal(4))
    n_backoff = topo.sil_states + (lex.n_phones - 1) * topo.states_per_phone
    tied = tri.tie_states(topo, stats, target_pdfs=n_backoff + 2, min_occ=5.0)
    # seen contexts got tied pdfs; the two mean groups map to different pdfs
    p_a = tied.pdf_of(2, 1, 2, 0)
    p_b = tied.pdf_of(3, 1, 2, 0)
    p_c = tied.pdf_of(4, 1, 2, 0)
    assert p_a == p_c != p_b
    # unseen context backs off to the (c, k) pdf
    assert tied.pdf_of(9, 1, 2, 0) == tied.backoff[(1, 0)]
    # silence stays context-independent in the low pdf range
    assert tied.pdf_of(3, 0, 5, 1) == 1
    assert tied.n_pdfs > topo.sil_states


def test_align_graph_cd_monophone_equivalent():
    """With an empty tying table, CD graphs reduce to backoff (monophone-like)
    emit ids and identical transition structure."""
    from mogasr.hmm import graph as gr

    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    tied = tri.tie_states(topo, {}, target_pdfs=0)
    pids = lex.words_to_phone_ids(["cat"])
    g_cd = tri.align_graph_cd(tied, pids)
    g_mono = gr.align_graph(topo, pids)
    assert g_cd.n_states == g_mono.n_states
    np.testing.assert_array_equal(g_cd.self_logp, g_mono.self_logp)
    np.testing.assert_array_equal(g_cd.chain_id, g_mono.chain_id)


@pytest.mark.parametrize("mode", ["viterbi"])
def test_cd_training_and_decode(mode):
    """Full recipe: mono train -> tie -> CD EM -> CD word decode on held-out."""
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(24, words_per_utt=(2, 3), seed=7)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        FCFG, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=FCFG.feat_dim)
    mono, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=4))

    tied, res = pipe.train_triphone(
        batches, lex, topo, gcfg, TrainConfig(num_em_iters=4), mono,
        target_pdfs=150, min_occ=5.0, mode=mode,
    )
    assert tied.n_pdfs > topo.n_pdfs  # genuinely context-dependent
    assert res.gmm.n_states == tied.n_pdfs
    assert res.history[-1] > res.history[0] - 1e-6

    # CD decode on held-out utterances
    test_utts = make_corpus(8, words_per_utt=(2, 3), seed=7007)
    eb = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in test_utts],
        FCFG, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = tri.word_loop_graph_cd(tied, insertion_penalty=dcfg.word_insertion_penalty)
    from mogasr.eval.wer import corpus_wer

    refs, hyps = [], []
    for fb in eb:
        scores = pipe.score_batch(fb.feats, res.gmm)
        out = pipe.decode_batch(fb, scores, graph, dcfg)
        for b in range(fb.size):
            refs.append([w.lower() for w in fb.words[b]])
            hyps.append([w.lower() for w in out[b]])
    wer, _ = corpus_wer(refs, hyps)
    assert wer < 0.3, wer
