"""Bigram LM estimation + LM Viterbi decoding tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig
from mogasr.decoder.lm_viterbi import path_to_tokens_lm, viterbi_lm
from mogasr.lm.ngram import BigramLm, estimate_bigram, uniform_bigram


def test_bigram_estimation_counts():
    lm = estimate_bigram([["a", "b"], ["a", "b"], ["a", "c"]], ["a", "b", "c"], alpha=0.0)
    # P(b|a) = 2/3, P(c|a) = 1/3 (a never ends a sentence)
    np.testing.assert_allclose(np.exp(lm.pair_logp[0, 1]), 2 / 3, atol=1e-6)
    np.testing.assert_allclose(np.exp(lm.pair_logp[0, 2]), 1 / 3, atol=1e-6)
    # all sentences start with a
    np.testing.assert_allclose(np.exp(lm.init_logp[0]), 1.0, atol=1e-6)
    # b and c always end sentences
    np.testing.assert_allclose(np.exp(lm.final_logp[1]), 1.0, atol=1e-6)


def test_bigram_rows_normalize():
    lm = estimate_bigram([["a", "b", "a"]], ["a", "b"], alpha=0.5)
    # P(.|c) rows + P(</s>|c) must sum to 1
    total = np.exp(lm.pair_logp).sum(1) + np.exp(lm.final_logp)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def system(trained_system):
    lex, topo, batches, gmm = trained_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    return lex, topo, batches, gmm, graph


def test_uniform_lm_matches_unigram_decoder(system):
    """viterbi_lm with a uniform bigram == plain loop-graph Viterbi when the
    unigram priors match — the LM machinery itself adds nothing."""
    lex, topo, batches, gmm, graph = system
    lm = uniform_bigram(graph.labels)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    # plain graph with identical priors: loop_graph already uses -log(C)
    for fb in batches[:1]:
        scores = pipe.score_batch(fb.feats, gmm)
        base = pipe.decode_batch(fb, scores, graph, dcfg, drop_tokens=())
        res = viterbi_lm(scores, graph, lm, fb.n_frames, acoustic_scale=1.0)
        with_lm = path_to_tokens_lm(res, graph)
        # uniform final weights differ from the plain graph's exit weights by
        # a constant per hypothesis -> identical argmax token sequences
        assert [h for h in with_lm[: fb.size]] == [h for h in base[: fb.size]]


def test_forbidding_lm_removes_word(system):
    """An LM with P ~ 0 for one word must eliminate it from hypotheses."""
    lex, topo, batches, gmm, graph = system
    fb = batches[0]
    scores = pipe.score_batch(fb.feats, gmm)
    lm_u = uniform_bigram(graph.labels)
    res_u = path_to_tokens_lm(
        viterbi_lm(scores, graph, lm_u, fb.n_frames, acoustic_scale=1.0), graph
    )
    present = {w for h in res_u[: fb.size] for w in h if w != "<sil>"}
    assert present, "baseline decode should produce words"
    banned = sorted(present)[0]
    bi = graph.labels.index(banned)
    lm_ban = BigramLm(
        tokens=lm_u.tokens,
        pair_logp=lm_u.pair_logp.copy(),
        init_logp=lm_u.init_logp.copy(),
        final_logp=lm_u.final_logp.copy(),
    )
    lm_ban.pair_logp[:, bi] = -1e30
    lm_ban.init_logp[bi] = -1e30
    res_b = path_to_tokens_lm(
        viterbi_lm(scores, graph, lm_ban, fb.n_frames, acoustic_scale=1.0), graph
    )
    assert all(banned not in h for h in res_b[: fb.size])


def test_trained_lm_improves_or_matches_wer(system):
    """Bigram trained on the corpus transcripts: WER <= uniform-LM WER."""
    from mogasr.eval.wer import corpus_wer

    lex, topo, batches, gmm, graph = system
    refs = [
        [w.lower() for w in fb.words[b]] for fb in batches for b in range(fb.size)
    ]
    lm_tr = estimate_bigram(
        [[w for w in fb.words[b]] for fb in batches for b in range(fb.size)],
        graph.labels, alpha=0.1,
    )
    lm_u = uniform_bigram(graph.labels)

    def decode_all(lm):
        hyps = []
        for fb in batches:
            scores = pipe.score_batch(fb.feats, gmm)
            res = viterbi_lm(scores, graph, lm, fb.n_frames, acoustic_scale=1.0)
            toks = path_to_tokens_lm(res, graph)
            hyps.extend(
                [[w for w in h if w != "<sil>"] for h in toks[: fb.size]]
            )
        return hyps

    wer_u, _ = corpus_wer(refs, decode_all(lm_u))
    wer_t, _ = corpus_wer(refs, decode_all(lm_tr))
    assert wer_t <= wer_u + 1e-9, (wer_t, wer_u)
