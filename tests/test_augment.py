"""Waveform augmentation (mogasr.data.augment): speed-factor length/pitch
oracle, exact-SNR mixing, gain law, corpus expansion determinism."""

import numpy as np
import pytest

from mogasr.data import augment as A


SR = 16000


def _tone(freq, sec=0.5, sr=SR):
    t = np.arange(int(sec * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _dominant_freq(wave, sr=SR):
    spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
    return np.fft.rfftfreq(len(wave), 1 / sr)[int(np.argmax(spec))]


def test_speed_changes_length_and_pitch():
    w = _tone(440.0)
    for f in (0.9, 1.1):
        out = A.speed_perturb(w, f)
        assert abs(len(out) - len(w) / f) <= 2, (f, len(out), len(w))
        # sox 'speed' shifts pitch with the rate
        assert abs(_dominant_freq(out) - 440.0 * f) < 5.0


def test_speed_identity():
    w = _tone(200.0)
    out = A.speed_perturb(w, 1.0)
    np.testing.assert_array_equal(out, w)


def test_add_noise_exact_snr():
    w = _tone(300.0, sec=1.0)
    rng = np.random.default_rng(0)
    for snr in (0.0, 10.0, 20.0):
        noisy = A.add_noise_snr(w, snr, rng)
        noise = noisy - w
        measured = 10 * np.log10(np.mean(w**2) / np.mean(noise**2))
        assert abs(measured - snr) < 0.3, (snr, measured)


def test_add_noise_from_recording_short_and_long():
    w = _tone(300.0, sec=1.0)
    rng = np.random.default_rng(1)
    hum = _tone(50.0, sec=0.2)  # shorter than signal: must loop
    noisy = A.add_noise_snr(w, 5.0, rng, noise=hum)
    assert len(noisy) == len(w)
    long_noise = rng.standard_normal(len(w) * 3).astype(np.float32)
    noisy2 = A.add_noise_snr(w, 5.0, rng, noise=long_noise)
    assert len(noisy2) == len(w)
    measured = 10 * np.log10(np.mean(w**2) / np.mean((noisy2 - w) ** 2))
    assert abs(measured - 5.0) < 0.3


def test_volume_gain_law():
    w = _tone(100.0)
    out = A.volume_perturb(w, 6.0)
    np.testing.assert_allclose(
        np.max(np.abs(out)) / np.max(np.abs(w)), 10 ** (6.0 / 20.0), rtol=1e-5
    )


def test_augment_corpus_expansion_and_determinism():
    corpus = [("u1", _tone(220.0), ["cat"]), ("u2", _tone(330.0), ["dog"])]
    out1 = A.augment_corpus(corpus, snr_db_range=(10, 20), gain_db_range=(-3, 3), seed=7)
    out2 = A.augment_corpus(corpus, snr_db_range=(10, 20), gain_db_range=(-3, 3), seed=7)
    assert len(out1) == 6  # 2 utts x 3 speeds
    ids = [u for u, _, _ in out1]
    assert ids == ["u1-sp0.9", "u1", "u1-sp1.1", "u2-sp0.9", "u2", "u2-sp1.1"]
    for (i1, w1, t1), (i2, w2, t2) in zip(out1, out2):
        assert i1 == i2 and t1 == t2
        np.testing.assert_array_equal(w1, w2)
    # different seed -> different noise
    out3 = A.augment_corpus(corpus, snr_db_range=(10, 20), seed=8)
    assert not np.array_equal(out1[0][1], out3[0][1])


def test_augment_corpus_transcripts_preserved():
    corpus = [("u1", _tone(220.0), ["cat", "fish"])]
    for _, _, words in A.augment_corpus(corpus):
        assert words == ["cat", "fish"]
