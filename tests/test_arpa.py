"""ARPA LM I/O tests: exact round-trips and Katz backoff resolution."""

import numpy as np
import pytest

from mogasr.lm.arpa import read_arpa_bigram, read_arpa_trigram, write_arpa
from mogasr.lm.ngram import (
    estimate_bigram, estimate_trigram, sequence_logp,
)

CORPUS = [["a", "b", "c"], ["a", "b", "a"], ["c", "b"], ["b"]]
TOKS = ["a", "b", "c"]


def test_bigram_roundtrip(tmp_path):
    lm = estimate_bigram(CORPUS, TOKS, alpha=0.3)
    p = tmp_path / "bi.arpa"
    write_arpa(str(p), lm)
    back = read_arpa_bigram(str(p), tokens=TOKS)
    for arr in ("pair_logp", "init_logp", "final_logp"):
        np.testing.assert_allclose(
            getattr(back, arr), getattr(lm, arr), atol=1e-4
        )
    for seq in (["a", "b"], ["c"], ["b", "a", "c"]):
        np.testing.assert_allclose(
            sequence_logp(back, seq), sequence_logp(lm, seq), atol=1e-3
        )


def test_trigram_roundtrip(tmp_path):
    lm = estimate_trigram(CORPUS, TOKS)
    p = tmp_path / "tri.arpa"
    write_arpa(str(p), lm)
    back = read_arpa_trigram(str(p), tokens=TOKS)
    C = len(TOKS)
    # compare only REACHABLE contexts: (word, <s>) never occurs in decoding
    # and is deliberately not exported, and "<s> <s> </s>" is meaningless
    for a in range(C + 1):
        for b in range(C + 1):
            if a != C and b == C:
                continue
            w_hi = C if (a == C and b == C) else C + 1
            np.testing.assert_allclose(
                back.logp[a, b, :w_hi], lm.logp[a, b, :w_hi], atol=1e-4,
                err_msg=f"context ({a},{b})",
            )
    for seq in (["a", "b", "c"], ["b"], ["c", "b", "a", "a"]):
        np.testing.assert_allclose(
            sequence_logp(back, seq), sequence_logp(lm, seq), atol=1e-3
        )


def test_backoff_resolution(tmp_path):
    """External-style ARPA with MISSING bigrams: P(b|a) must resolve as
    bow(a) * P(b) per Katz."""
    p = tmp_path / "ext.arpa"
    p.write_text(
        "\\data\\\nngram 1=4\nngram 2=2\n\n"
        "\\1-grams:\n"
        "-99\t<s>\t-0.30103\n"        # bow(<s>) = 1/2
        "-0.60206\t</s>\n"            # P(</s>) = 1/4
        "-0.30103\ta\t-0.30103\n"     # P(a) = 1/2, bow(a) = 1/2
        "-0.60206\tb\t0.0\n"          # P(b) = 1/4, bow(b) = 1
        "\n\\2-grams:\n"
        "-0.1\t<s> a\n"
        "-0.2\ta b\n"
        "\n\\end\\\n"
    )
    lm = read_arpa_bigram(str(p), tokens=["a", "b"])
    i = {t: k for k, t in enumerate(lm.tokens)}
    # listed bigrams pass through
    np.testing.assert_allclose(lm.init_logp[i["a"]], -0.1 * np.log(10), atol=1e-5)
    np.testing.assert_allclose(lm.pair_logp[i["a"], i["b"]], -0.2 * np.log(10), atol=1e-5)
    # missing (a, a): bow(a) + P(a) = log10(1/2) + log10(1/2)
    np.testing.assert_allclose(
        lm.pair_logp[i["a"], i["a"]], np.log(0.25), atol=1e-4
    )
    # missing (b, </s>): bow(b) + P(</s>) = 0 + log10(1/4)
    np.testing.assert_allclose(lm.final_logp[i["b"]], np.log(0.25), atol=1e-4)


def test_exported_trigram_decodes_identically(tmp_path, trained_system):
    """Rescoring a lattice with the re-imported trigram == the original."""
    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig
    from mogasr.decoder.lattice import rescore_lattice

    lex, topo, batches, gmm = trained_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    transcripts = [list(fb.words[b]) for fb in batches for b in range(fb.size)]
    bi = estimate_bigram(transcripts, graph.labels, alpha=0.1)
    tri = estimate_trigram(transcripts, graph.labels)
    p = tmp_path / "tri.arpa"
    write_arpa(str(p), tri)
    tri2 = read_arpa_trigram(str(p), tokens=tri.tokens)

    fb = batches[0]
    scores = pipe.score_batch(fb.feats, gmm)
    lats, _ = pipe.decode_batch_lattices(fb, scores, graph, bi, dcfg)
    for lat in lats[:4]:
        w1, s1 = rescore_lattice(lat, tri)
        w2, s2 = rescore_lattice(lat, tri2)
        assert w1 == w2
        np.testing.assert_allclose(s1, s2, atol=0.05)
