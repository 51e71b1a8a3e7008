"""v3 hard-corpus generator: determinism, contract, and BPE headroom.

Round 5 (VERDICT r4 weak #4): the v3 regime exists so the quality axes
have something to push against — these tests pin the generator contract
(the accuracy numbers themselves live in
benchmarks/results_accuracy_v3.json).
"""

from __future__ import annotations

import numpy as np

from mogasr.data import synthetic as syn


def test_v3_deterministic_and_distinct_from_v2():
    a = syn.make_corpus_v3(3, seed=5)
    b = syn.make_corpus_v3(3, seed=5)
    for ua, ub in zip(a, b):
        np.testing.assert_array_equal(ua.wave, ub.wave)
        assert ua.words == ub.words
    # same seed, different regime: v2 draws unchanged (byte-compat guard)
    v2 = syn.make_corpus_v2(3, seed=5)
    assert any(len(ua.wave) != len(uv.wave) or ua.words != uv.words
               for ua, uv in zip(a, v2))


def test_v3_lexicon_size_and_phone_validity():
    lex = syn.extended_lexicon_v3(1000)
    assert len(lex) == 1000
    inv = set(syn.PHONE_FORMANTS)
    assert all(p in inv for phones in lex.values() for p in phones)
    # longer templates actually appear (6-phone words)
    assert any(len(v) == 6 for v in lex.values())


def test_v3_ground_truth_bounds_consistent():
    u = syn.make_corpus_v3(1, seed=9)[0]
    assert u.phone_bounds[-1] == len(u.wave)
    assert len(u.phone_bounds) == len(u.phones) + 1
    assert 4 <= len(u.words) <= 10
    # fast-speech regime: mean non-sil phone well under v2's 90 ms
    durs = np.diff(u.phone_bounds) / u.sample_rate
    non_sil = [d for d, p in zip(durs, u.phones) if p != syn.SIL]
    assert np.mean(non_sil) < 0.075


def test_v3_text_reaches_bpe_target():
    """The v2 saturation evidence was 99/300 learned units; v3 transcripts
    must support a >=300-unit inventory."""
    from mogasr.data.bpe import train_bpe

    utts = syn.make_corpus_v3(120, seed=3)
    bpe = train_bpe([u.words for u in utts], 300)
    assert bpe.n_units >= 300
