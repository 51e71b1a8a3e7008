"""Word lattices, N-best, trigram LM, and lattice rescoring tests."""

import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig
from mogasr.decoder.lattice import (
    lattice_nbest, lattice_oracle_errors, rescore_lattice,
)
from mogasr.decoder.lm_viterbi import path_to_tokens_lm, viterbi_lm
from mogasr.eval.wer import edit_counts
from mogasr.lm.ngram import (
    TrigramLm, estimate_bigram, estimate_trigram, sequence_logp, uniform_bigram,
)


# ---------------------------------------------------------------- trigram LM

def test_trigram_rows_normalize():
    lm = estimate_trigram(
        [["a", "b", "c"], ["a", "b", "a"], ["b"]], ["a", "b", "c"]
    )
    p = np.exp(lm.logp)
    np.testing.assert_allclose(p.sum(axis=2), 1.0, atol=1e-5)


def test_trigram_learns_third_word_context():
    """'x a p' vs 'y a q' deterministic: P(p|x,a) >> P(q|x,a) — a bigram
    cannot represent this (both follow 'a' equally often)."""
    corpus = [["x", "a", "p"]] * 20 + [["y", "a", "q"]] * 20
    toks = ["a", "p", "q", "x", "y"]
    tri = estimate_trigram(corpus, toks, lambdas=(0.9, 0.07, 0.03))
    bi = estimate_bigram(corpus, toks, alpha=0.1)
    i = {t: k for k, t in enumerate(toks)}
    assert tri.logp[i["x"], i["a"], i["p"]] > tri.logp[i["x"], i["a"], i["q"]] + 1.0
    # the bigram sees P(p|a) == P(q|a)
    np.testing.assert_allclose(
        bi.pair_logp[i["a"], i["p"]], bi.pair_logp[i["a"], i["q"]], atol=1e-6
    )
    # sequence scoring prefers the attested trigram
    assert sequence_logp(tri, ["x", "a", "p"]) > sequence_logp(tri, ["x", "a", "q"]) + 1.0


def test_grammar_bigram_rejects_oov_words():
    """Silently dropping an OOV grammar word would splice its neighbors into
    an unlicensed adjacency — the builder must refuse instead."""
    from mogasr.lm.ngram import grammar_bigram

    with pytest.raises(ValueError, match="grammar words"):
        grammar_bigram([["turn", "off", "lights"]], tokens=["turn", "lights"])


def test_kneser_ney_continuation_property():
    """KN's signature behaviour: in an unseen context, a word attested after
    MANY distinct contexts ("house") outranks a word attested only after ONE
    ("york"), even though "york" has more raw occurrences. Add-alpha cannot
    tell them apart."""
    from mogasr.lm.ngram import estimate_bigram_kn

    corpus = [["new", "york"]] * 8 + [
        ["the", "house"], ["a", "house"], ["my", "house"], ["her", "house"],
    ]
    toks = sorted({w for s in corpus for w in s})
    i = {t: k for k, t in enumerate(toks)}
    kn = estimate_bigram_kn(corpus, toks)
    # context "york" never precedes either word -> pure continuation backoff
    assert kn.pair_logp[i["york"], i["house"]] > kn.pair_logp[i["york"], i["york"]] + 0.5
    aa = estimate_bigram(corpus, toks, alpha=0.5)
    np.testing.assert_allclose(
        aa.pair_logp[i["york"], i["house"]], aa.pair_logp[i["york"], i["york"]], atol=1e-6
    )


def test_kneser_ney_rows_normalize():
    from mogasr.lm.ngram import estimate_bigram_kn, estimate_trigram_kn

    corpus = [["a", "b", "c"], ["b", "c", "a"], ["c"], ["a", "b"]]
    toks = ["a", "b", "c"]
    kn2 = estimate_bigram_kn(corpus, toks)
    # each context row: P(words|a) + P(EOS|a) == 1
    row = np.exp(kn2.pair_logp).sum(1) + np.exp(kn2.final_logp)
    np.testing.assert_allclose(row, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.exp(kn2.init_logp).sum(), 1.0, atol=1e-5)
    kn3 = estimate_trigram_kn(corpus, toks)
    np.testing.assert_allclose(np.exp(kn3.logp).sum(2), 1.0, atol=1e-5)


def test_kneser_ney_decodes_through_lm_viterbi(trained_system):
    """KN bigram plugs into the same decode path; sanity: corpus WER stays
    in the same range as the add-alpha bigram."""
    from mogasr.lm.ngram import estimate_bigram_kn

    lex, topo, batches, gmm = trained_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    transcripts = [list(fb.words[b]) for fb in batches for b in range(fb.size)]
    lm = estimate_bigram_kn(transcripts, graph.labels)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    refs, hyps = [], []
    for fb in batches:
        scores = pipe.score_batch(fb.feats, gmm)
        res = viterbi_lm(scores, graph, lm, fb.n_frames, acoustic_scale=1.0)
        toks = path_to_tokens_lm(res, graph)
        for b in range(fb.size):
            refs.append([w.lower() for w in fb.words[b]])
            hyps.append([w.lower() for w in toks[b] if w not in ("<sil>", "sil")])
    from mogasr.eval.wer import corpus_wer

    wer, _ = corpus_wer(refs, hyps)
    assert wer < 0.2, wer


def test_grammar_bigram_constrains_decode(mini_system):
    """FSA-style command grammar through the exact LM-Viterbi kernel: every
    hypothesis is grammar-consistent, and in-grammar utterances are
    recovered. (mini_system: the fixture that generalizes to unseen audio.)"""
    from mogasr.data.synthetic import synth_utterance
    from mogasr.lm.ngram import grammar_bigram

    lex, topo, gmm, vocab = mini_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    grammar = [["cat", "fish"], ["dog", "tree"]]
    lm = grammar_bigram(grammar, tokens=sorted(set(graph.labels)))

    from mogasr.config import BatchConfig, FrontendConfig

    utts = [
        synth_utterance(f"cmd-{i}", words, seed=50 + i)
        for i, words in enumerate(grammar * 2)
    ]
    cmd_batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        FrontendConfig(), BatchConfig(batch_size=4, bucket_boundaries=(250, 400)),
    )
    starts, finals = {"cat", "dog"}, {"fish", "tree"}
    allowed = {("cat", "fish"), ("dog", "tree")}
    n_exact = n_total = 0
    for fb in cmd_batches:
        scores = pipe.score_batch(fb.feats, gmm)
        res = viterbi_lm(scores, graph, lm, fb.n_frames, acoustic_scale=1.0)
        toks = path_to_tokens_lm(res, graph)
        for b in range(fb.size):
            hyp = [w for w in toks[b] if w not in ("<sil>", "sil")]
            # grammar consistency: starts/ends + every adjacency is either an
            # allowed pair or a (final -> start) command boundary
            assert hyp and hyp[0] in starts and hyp[-1] in finals, hyp
            for a, c in zip(hyp, hyp[1:]):
                assert (a, c) in allowed or (a in finals and c in starts), hyp
            n_total += 1
            n_exact += hyp == fb.words[b]
    assert n_exact >= n_total - 1, (n_exact, n_total)

    # an out-of-grammar utterance decodes to a path of the grammar FSA
    # (documented transparent-sil semantics: a silence bridge admits any
    # enterable word after it — so check the DIRECT adjacencies only)
    oov_utt = synth_utterance("oov", ["see", "sun"], seed=77)
    fb = pipe.featurize(
        [(oov_utt.utt_id, oov_utt.wave, oov_utt.words)],
        FrontendConfig(), BatchConfig(batch_size=1, bucket_boundaries=(250, 400)),
    )[0]
    res = viterbi_lm(
        pipe.score_batch(fb.feats, gmm), graph, lm, fb.n_frames, acoustic_scale=1.0
    )
    toks = path_to_tokens_lm(res, graph)[0]
    assert toks, toks
    grammar_words = starts | finals
    for w in toks:
        assert w == "<sil>" or w in grammar_words, toks  # OOV words impossible
    for a, c in zip(toks, toks[1:]):
        if a != "<sil>" and c != "<sil>":
            assert (a, c) in allowed or (a in finals and c in starts), toks


def test_sequence_logp_bigram_matches_manual():
    lm = estimate_bigram([["a", "b"], ["a", "b"]], ["a", "b"], alpha=0.0)
    got = sequence_logp(lm, ["a", "b"])
    want = float(lm.init_logp[0] + lm.pair_logp[0, 1] + lm.final_logp[1])
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------------ lattices

@pytest.fixture(scope="module")
def lattice_setup(trained_system):
    lex, topo, batches, gmm = trained_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    transcripts = [list(fb.words[b]) for fb in batches for b in range(fb.size)]
    lm = estimate_bigram(transcripts, graph.labels, alpha=0.1)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    fb = batches[0]
    scores = pipe.score_batch(fb.feats, gmm)
    lats, res = pipe.decode_batch_lattices(fb, scores, graph, lm, dcfg)
    return graph, lm, dcfg, fb, scores, lats, res


def test_lattice_1best_matches_viterbi(lattice_setup):
    """Re-searching the lattice under the SAME LM must reproduce the
    first-pass Viterbi hypothesis and total score (the best path's arcs are
    in the lattice by construction)."""
    graph, lm, dcfg, fb, scores, lats, res = lattice_setup
    vit_toks = path_to_tokens_lm(res, graph)
    vit_score = np.asarray(res.score)
    for b, lat in enumerate(lats):
        words, sc = rescore_lattice(lat, lm)
        want = [w for w in vit_toks[b] if w not in ("<sil>", "sil")]
        assert words == want, (b, words, want)
        np.testing.assert_allclose(sc, vit_score[b], rtol=0, atol=0.05)


def test_nbest_properties(lattice_setup):
    graph, lm, dcfg, fb, scores, lats, res = lattice_setup
    for lat in lats[:2]:
        nb = lattice_nbest(lat, lm, 5)
        assert 1 <= len(nb) <= 5
        scs = [s for _, s in nb]
        assert scs == sorted(scs, reverse=True)
        seqs = [tuple(w) for w, _ in nb]
        assert len(set(seqs)) == len(seqs)  # distinct after sil-dropping
        # 1-best == rescore_lattice
        assert nb[0][0] == rescore_lattice(lat, lm)[0]


def test_trigram_rescoring_can_flip_hypothesis(lattice_setup):
    """A second-pass trigram that bans the first-pass best word must flip the
    decision to another lattice path (mechanism test for rescoring)."""
    graph, lm, dcfg, fb, scores, lats, res = lattice_setup
    lat = lats[0]
    base_words, _ = rescore_lattice(lat, lm)
    assert base_words, "need a non-empty 1-best"
    banned = base_words[0]
    C = len(lm.tokens)
    logp = np.full((C + 1, C + 1, C + 1), -np.log(C + 1), np.float32)
    bi = lm.tokens.index(banned)
    logp[:, :, bi] = -1e30  # ban as an event in every context
    tri = TrigramLm(tokens=list(lm.tokens), logp=logp)
    new_words, _ = rescore_lattice(lat, tri)
    assert banned not in new_words
    assert new_words != base_words


def test_lattice_oracle_bounds_1best(lattice_setup):
    graph, lm, dcfg, fb, scores, lats, res = lattice_setup
    vit_toks = path_to_tokens_lm(res, graph)
    for b, lat in enumerate(lats):
        ref = [w for w in fb.words[b]]
        hyp = [w for w in vit_toks[b] if w not in ("<sil>", "sil")]
        c = edit_counts(ref, hyp)
        one_best_errs = c.errors
        oracle = lattice_oracle_errors(lat, ref)
        assert oracle <= one_best_errs, (b, oracle, one_best_errs)


def test_trigram_rescoring_improves_contextual_wer(trained_system):
    """Corpus where the 3rd word is determined by the 1st ('dog _ tree' vs
    'cat _ fish' patterns): trigram rescoring must not lose to the bigram
    first pass, and must win when acoustics are ambiguous enough. We assert
    non-degradation on the trained corpus (bigram already strong there)."""
    lex, topo, batches, gmm = trained_system
    graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
    transcripts = [list(fb.words[b]) for fb in batches for b in range(fb.size)]
    bi = estimate_bigram(transcripts, graph.labels, alpha=0.1)
    tri = estimate_trigram(transcripts, graph.labels)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    errs_bi = errs_tri = total = 0
    for fb in batches:
        scores = pipe.score_batch(fb.feats, gmm)
        lats, res = pipe.decode_batch_lattices(fb, scores, graph, bi, dcfg)
        toks = path_to_tokens_lm(res, graph)
        for b, lat in enumerate(lats):
            ref = list(fb.words[b])
            hyp_bi = [w for w in toks[b] if w not in ("<sil>", "sil")]
            hyp_tri, _ = rescore_lattice(lat, tri)
            cb, ct = edit_counts(ref, hyp_bi), edit_counts(ref, hyp_tri)
            errs_bi += cb.errors
            errs_tri += ct.errors
            total += len(ref)
    assert errs_tri <= errs_bi, (errs_tri, errs_bi, total)


def test_lattice_archive_roundtrip(tmp_path):
    """write_lattices -> read_lattices is EXACT (scores via repr), and a
    rescoring pass over the read-back archive equals the original."""
    from mogasr.decoder.lattice import (
        Arc, Lattice, read_lattices, write_lattices,
    )

    rng = np.random.default_rng(0)
    lats = {}
    for u in range(3):
        arcs = []
        t = 0
        for i in range(1 + u):
            e = t + int(rng.integers(1, 5))
            arcs.append(Arc(t, e, int(rng.integers(0, 4)),
                            f"w{int(rng.integers(0, 5))}",
                            float(rng.standard_normal())))
            t = e + 1
        lats[f"utt-{u}"] = Lattice(t + 2, arcs)
    path = str(tmp_path / "lat.txt")
    write_lattices(path, lats)
    back = read_lattices(path)
    assert set(back) == set(lats)
    for uid in lats:
        assert back[uid].n_frames == lats[uid].n_frames
        assert back[uid].arcs == lats[uid].arcs  # frozen dataclass equality

    # append mode extends the archive
    write_lattices(path, {"extra": Lattice(4, [Arc(0, 1, 0, "x", -0.5)])},
                   append=True)
    assert set(read_lattices(path)) == set(lats) | {"extra"}


def test_decode_cli_lattice_out(tmp_path, monkeypatch):
    from cli import decode
    from mogasr.decoder.lattice import read_lattices
    from tests.test_cli import run_cli

    out = str(tmp_path / "hyp.jsonl")
    lat_out = str(tmp_path / "lats.txt")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--bigram-lm", "--lattice-out", lat_out, "--out", out],
        monkeypatch,
    )
    lats = read_lattices(lat_out)
    assert len(lats) == 3
    for lat in lats.values():
        assert lat.n_frames > 0 and len(lat.arcs) > 0
