"""Confusion-network / MBR tests: exact arc posteriors (frame-coverage
invariant + hand-computable case), CN slot structure, consensus and
N-best-MBR decoding quality vs the Viterbi 1-best."""

import math

import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig
from mogasr.decoder.confusion import (
    confusion_network, consensus_decode, lattice_arc_posteriors,
    mbr_nbest_decode,
)
from mogasr.decoder.lattice import Arc, Lattice, rescore_lattice
from mogasr.decoder.lm_viterbi import path_to_tokens_lm
from mogasr.eval.wer import corpus_wer
from mogasr.lm.ngram import estimate_bigram, uniform_bigram


# ------------------------------------------------------------- handcrafted


def _toy_lattice():
    """Two competing first words (0.7 vs 0.3 after softmax), then one word."""
    arcs = [
        Arc(start=0, end=1, chain=0, word="a", score=math.log(0.7)),
        Arc(start=0, end=1, chain=1, word="b", score=math.log(0.3)),
        Arc(start=2, end=3, chain=2, word="c", score=0.0),
    ]
    return Lattice(n_frames=4, arcs=arcs), uniform_bigram(["a", "b", "c"])


def test_toy_arc_posteriors_exact():
    lat, lm = _toy_lattice()
    arcs, post, z = lattice_arc_posteriors(lat, lm)
    by_word = {a.word: p for a, p in zip(arcs, post)}
    np.testing.assert_allclose(by_word["a"], 0.7, atol=1e-6)
    np.testing.assert_allclose(by_word["b"], 0.3, atol=1e-6)
    np.testing.assert_allclose(by_word["c"], 1.0, atol=1e-6)


def test_toy_confusion_network_and_consensus():
    lat, lm = _toy_lattice()
    slots = confusion_network(lat, lm)
    assert len(slots) == 2
    assert set(slots[0].words) == {"a", "b"}
    np.testing.assert_allclose(sum(slots[0].words.values()), 1.0, atol=1e-6)
    assert slots[0].eps < 1e-6
    words, confs = consensus_decode(slots)
    assert words == ["a", "c"]
    np.testing.assert_allclose(confs, [0.7, 1.0], atol=1e-6)


def test_toy_mbr_picks_mass_winner():
    lat, lm = _toy_lattice()
    hyp, risk = mbr_nbest_decode(lat, lm, n=8)
    assert hyp == ["a", "c"]
    # expected errors: P(b path)=0.3 contributes one substitution
    np.testing.assert_allclose(risk, 0.3, atol=1e-6)


# ----------------------------------------------------------- real lattices


@pytest.fixture(scope="module")
def lattices(trained_system):
    lex, topo, batches, gmm = trained_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    transcripts = [list(fb.words[b]) for fb in batches for b in range(fb.size)]
    lm = estimate_bigram(transcripts, graph.labels, alpha=0.1)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    out = []
    for fb in batches:
        scores = pipe.score_batch(fb.feats, gmm)
        lats, res = pipe.decode_batch_lattices(fb, scores, graph, lm, dcfg)
        toks = path_to_tokens_lm(res, graph)
        for b, lat in enumerate(lats):
            ref = [w.lower() for w in fb.words[b]]
            one_best = [w.lower() for w in toks[b] if w not in ("<sil>", "sil")]
            out.append((lat, ref, one_best))
    return lm, out


def test_frame_coverage_invariant(lattices):
    """Every complete path covers each frame exactly once => the posteriors
    of arcs spanning any frame sum to 1."""
    lm, items = lattices
    lat, _, _ = items[0]
    arcs, post, _z = lattice_arc_posteriors(lat, lm)
    for t in range(0, lat.n_frames, max(lat.n_frames // 7, 1)):
        cover = sum(p for a, p in zip(arcs, post) if a.start <= t <= a.end)
        np.testing.assert_allclose(cover, 1.0, atol=1e-4)


def test_consensus_and_mbr_match_viterbi_quality(lattices):
    lm, items = lattices
    refs = [r for _, r, _ in items]
    vit = [h for _, _, h in items]
    cons, mbr = [], []
    for lat, _, _ in items:
        words, _ = consensus_decode(confusion_network(lat, lm))
        cons.append([w.lower() for w in words])
        hyp, _ = mbr_nbest_decode(lat, lm, n=16)
        mbr.append([w.lower() for w in hyp])
    wer_vit, _ = corpus_wer(refs, vit)
    wer_cons, _ = corpus_wer(refs, cons)
    wer_mbr, _ = corpus_wer(refs, mbr)
    # expected-word-error decoding must not lose materially to Viterbi
    assert wer_cons <= wer_vit + 0.05, (wer_cons, wer_vit)
    assert wer_mbr <= wer_vit + 0.05, (wer_mbr, wer_vit)


def test_kws_detects_spoken_words(lattices):
    """Posterior keyword search: words in the reference are detected, words
    absent from the utterance are not (high-threshold operating point)."""
    from mogasr.decoder.kws import keyword_search

    lm, items = lattices
    vocab = sorted({w for _, ref, _ in items for w in ref})
    tp = fn = fp = 0
    for lat, ref, _ in items:
        present = set(ref)
        absent = [w for w in vocab if w not in present][:3]
        hits = keyword_search(lat, lm, [[w] for w in present] + [[w] for w in absent],
                              threshold=0.5)
        hit_terms = {h.term for h in hits}
        tp += sum(1 for w in present if w in hit_terms)
        fn += sum(1 for w in present if w not in hit_terms)
        fp += sum(1 for w in absent if w in hit_terms)
    assert tp / max(tp + fn, 1) > 0.8, (tp, fn)
    assert fp <= 0.1 * len(items) + 1, fp


def test_kws_phrase_and_times(lattices):
    from mogasr.decoder.kws import keyword_search

    lm, items = lattices
    found_phrase = 0
    tried = 0
    for lat, ref, _ in items:
        if len(ref) < 2:
            continue
        tried += 1
        hits = keyword_search(lat, lm, [ref[:2]], threshold=0.25)
        for h in hits:
            assert 0 <= h.start <= h.end < lat.n_frames
            assert 0.0 < h.posterior <= 1.0 + 1e-6
        if any(h.term == " ".join(ref[:2]) for h in hits):
            found_phrase += 1
    assert tried and found_phrase / tried > 0.7, (found_phrase, tried)


def test_consensus_confidences_are_probabilities(lattices):
    lm, items = lattices
    lat, _, _ = items[0]
    _, confs = consensus_decode(confusion_network(lat, lm))
    assert all(0.0 <= c <= 1.0 + 1e-6 for c in confs)
