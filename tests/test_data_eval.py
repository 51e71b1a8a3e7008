"""Tests for audio I/O, LibriSpeech reader (fixture layout), batching, WER."""

import numpy as np
import pytest

from mogasr.config import BatchConfig, FrontendConfig
from mogasr.data import audio, batching, synthetic
from mogasr.data.librispeech import LibriSpeech, write_fixture_corpus
from mogasr.eval.wer import corpus_wer, edit_counts


def test_wav_roundtrip(tmp_path):
    u = synthetic.synth_utterance("w0", ["cat"], seed=0)
    p = str(tmp_path / "x.wav")
    audio.write_wav(p, u.wave, u.sample_rate)
    back, sr = audio.read_wav(p)
    assert sr == 16000
    assert back.shape == u.wave.shape
    np.testing.assert_allclose(back, u.wave, atol=1.0 / 32000)


def test_read_audio_dispatch(tmp_path):
    u = synthetic.synth_utterance("w1", ["dog"], seed=1)
    p = str(tmp_path / "y.wav")
    audio.write_wav(p, u.wave, u.sample_rate)
    wave, sr = audio.read_audio(p)
    assert sr == 16000 and len(wave) == len(u.wave)
    with pytest.raises(ValueError):
        audio.read_audio(str(tmp_path / "z.mp3"))


def test_resample():
    t = np.linspace(0, 1, 8000, endpoint=False)
    wave = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    out = audio.resample(wave, 8000, 16000)
    assert len(out) == 16000


def test_librispeech_fixture_layout(tmp_path):
    utts = synthetic.make_corpus(5, seed=7)
    write_fixture_corpus(str(tmp_path), "dev-clean", utts)
    corpus = LibriSpeech(str(tmp_path), "dev-clean")
    assert len(corpus) == 5
    uid = corpus.utt_ids()[0]
    wave, sr, text = corpus.load_utterance(uid)
    assert sr == 16000
    assert text == " ".join(w.upper() for w in utts[0].words)
    assert len(wave) == len(utts[0].wave)
    # iteration order is deterministic
    assert [u for u, _, _ in corpus] == corpus.utt_ids()


def test_batching_shapes():
    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=4, bucket_boundaries=(100, 200, 400))
    utts = [
        (f"u{i}", np.zeros(1600 * (i + 1), np.float32), ["cat"]) for i in range(10)
    ]
    batches = list(batching.make_batches(utts, bcfg, fcfg))
    assert all(b.waves.shape[0] == 4 for b in batches)
    # every wave fits its bucket, every bucket is a boundary ceiling
    bounds = {batching.frames_to_samples(f, fcfg) for f in bcfg.bucket_boundaries}
    for b in batches:
        assert b.waves.shape[1] in bounds
        for i in range(b.size):
            assert b.num_samples[i] <= b.waves.shape[1]
    assert sum(b.size for b in batches) == 10


def test_batching_drops_overlong():
    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=2, bucket_boundaries=(100,))
    too_long = np.zeros(batching.frames_to_samples(100, fcfg) + 1, np.float32)
    batches = list(batching.make_batches([("a", too_long, [])], bcfg, fcfg))
    assert batches == []


def test_edit_counts():
    c = edit_counts(["a", "b", "c"], ["a", "x", "c"])
    assert (c.substitutions, c.deletions, c.insertions) == (1, 0, 0)
    c = edit_counts(["a", "b", "c"], ["a", "c"])
    assert (c.substitutions, c.deletions, c.insertions) == (0, 1, 0)
    c = edit_counts(["a", "c"], ["a", "b", "c"])
    assert (c.substitutions, c.deletions, c.insertions) == (0, 0, 1)
    c = edit_counts([], ["a"])
    assert c.insertions == 1 and c.wer == 1.0


def test_corpus_wer():
    refs = [["the", "cat"], ["a", "dog", "ran"]]
    hyps = [["the", "cat"], ["a", "dog"]]
    wer, counts = corpus_wer(refs, hyps)
    assert counts.ref_words == 5
    assert counts.deletions == 1
    np.testing.assert_allclose(wer, 0.2)


def test_wer_bootstrap_ci_properties():
    import numpy as np

    from mogasr.eval.wer import corpus_wer, wer_bootstrap_ci

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(20)]
    refs, hyps = [], []
    for _ in range(60):
        r = [words[int(rng.integers(0, 20))] for _ in range(6)]
        h = list(r)
        if rng.random() < 0.5:
            h[int(rng.integers(0, 6))] = "xx"  # one substitution half the time
        refs.append(r)
        hyps.append(h)
    wer, _counts = corpus_wer(refs, hyps)
    w2, lo, hi = wer_bootstrap_ci(refs, hyps, n_boot=500, seed=1)
    assert abs(w2 - wer) < 1e-12
    assert lo <= wer <= hi
    assert 0.0 < hi - lo < 0.2  # a real, non-degenerate interval
    # deterministic given the seed
    assert wer_bootstrap_ci(refs, hyps, n_boot=500, seed=1) == (w2, lo, hi)
    # perfect hypotheses -> degenerate zero interval
    assert wer_bootstrap_ci(refs, refs, n_boot=50) == (0.0, 0.0, 0.0)


def test_align_words_and_error_report():
    from mogasr.eval.wer import align_words, edit_counts, error_report

    ref = ["the", "cat", "sat", "down"]
    hyp = ["the", "bat", "sat", "here", "down"]
    ali = align_words(ref, hyp)
    ops = [o for o, _r, _h in ali]
    c = edit_counts(ref, hyp)
    # op counts agree with the counting DP
    assert ops.count("sub") == c.substitutions
    assert ops.count("del") == c.deletions
    assert ops.count("ins") == c.insertions
    # reading the ref/hyp sides back reconstructs the originals
    assert [r for _o, r, _h in ali if r is not None] == ref
    assert [h for _o, _r, h in ali if h is not None] == hyp

    rep = error_report([ref], [hyp], ids=["u1"])
    assert "id: u1" in rep and "REF:" in rep and "HYP:" in rep
    assert "CAT -> BAT".lower() in rep.lower()
    assert "TOTAL wer" in rep


def test_error_report_cli(tmp_path, monkeypatch):
    from cli import decode
    from tests.test_cli import run_cli

    out = str(tmp_path / "errs.txt")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--errors-out", out],
        monkeypatch,
    )
    rep = open(out).read()
    assert rep.count("REF:") == 3 and "TOTAL wer" in rep
