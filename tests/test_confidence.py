"""Word-confidence decoding: posteriors in (0,1], high on clean trained data,
degraded on noise."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig, TopologyConfig


@pytest.fixture(scope="module")
def system(trained_system):
    return trained_system


def test_confidences_valid_and_high_on_clean_data(system):
    lex, topo, batches, gmm = system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    confs = []
    for fb in batches:
        scores = pipe.score_batch(fb.feats, gmm)
        out = pipe.decode_batch_with_confidence(fb, scores, graph, dcfg)
        plain = pipe.decode_batch(fb, scores, graph, dcfg)
        for b in range(fb.size):
            # words match the plain decoder exactly
            assert [w for w, _c in out[b]] == plain[b]
            for _w, c in out[b]:
                assert 0.0 <= c <= 1.0 + 1e-6
                confs.append(c)
    assert confs and float(np.median(confs)) > 0.8, np.median(confs)


def test_ambiguity_splits_confidence():
    """Two vocabulary words with IDENTICAL pronunciations: whichever is
    decoded must carry ~0.5 posterior confidence (mass split between the
    indistinguishable chains) — the property that makes posterior confidence
    informative where raw Viterbi scores are not."""
    from mogasr.hmm import graph as gr
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology as bt

    lex = make_lexicon({"uno": ["a"], "duo": ["a"], "tri": ["b"]})
    topo = bt(lex, TopologyConfig(states_per_phone=1, sil_states=1))
    dcfg = DecodeConfig(acoustic_scale=1.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    # emissions strongly favoring phone "a" for 6 frames
    T = 6
    scores = np.full((1, T, topo.n_pdfs), -10.0, np.float32)
    a_pdf = topo.phone_pdf_ids(lex.phone_id("a"))[0]
    scores[:, :, a_pdf] = 0.0
    # feats unused by this API beyond shape bookkeeping; pass scores directly
    out = pipe.decode_batch_with_confidence(
        pipe.FeatBatch(["u0"], jnp.zeros((1, T, 3)), jnp.asarray([T]), [[]]),
        jnp.asarray(scores), graph, dcfg,
    )
    words = out[0]
    assert words, "should decode at least one word"
    assert all(w in ("uno", "duo") for w, _c in words), words
    for _w, c in words:
        assert 0.35 < c < 0.65, words  # mass split between uno/duo


def test_nbest_alternatives_rank_ambiguous_words():
    """Homophones: both words appear among the top alternatives ~0.5/0.5;
    the clear word dominates its span."""
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology as bt

    lex = make_lexicon({"uno": ["a"], "duo": ["a"], "tri": ["b"]})
    topo = bt(lex, TopologyConfig(states_per_phone=1, sil_states=1))
    dcfg = DecodeConfig(acoustic_scale=1.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    T = 6
    scores = np.full((1, T, topo.n_pdfs), -10.0, np.float32)
    scores[:, :3, topo.phone_pdf_ids(lex.phone_id("a"))[0]] = 0.0
    scores[:, 3:, topo.phone_pdf_ids(lex.phone_id("b"))[0]] = 0.0
    out = pipe.decode_batch_nbest(
        pipe.FeatBatch(["u0"], jnp.zeros((1, T, 3)), jnp.asarray([T]), [[]]),
        jnp.asarray(scores), graph, dcfg, n_best=3,
    )
    words = out[0]
    assert len(words) >= 2
    # first span: ambiguous 'a' word -> both uno and duo as alternatives
    alts0 = dict(words[0]["alternatives"])
    assert "uno" in alts0 and "duo" in alts0, words[0]
    assert abs(alts0["uno"] - alts0["duo"]) < 0.15
    # last span: unambiguous 'b' word -> tri dominates
    altsl = words[-1]["alternatives"]
    assert altsl and altsl[0][0] == "tri" and altsl[0][1] > 0.8, words[-1]
