"""JSONL manifest corpus reader (mogasr.data.manifest): wav + flac entries,
relative/absolute paths, id derivation, line-numbered errors, max_utts,
round-trip through write_manifest, and an end-to-end CLI drive."""

import json
import os

import numpy as np
import pytest

from mogasr.data.audio import write_wav
from mogasr.data.flac_write import write_flac
from mogasr.data.manifest import read_manifest, write_manifest


def _tone(f0, n=4000, sr=16000):
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


@pytest.fixture()
def corpus_dir(tmp_path):
    (tmp_path / "audio").mkdir()
    write_wav(str(tmp_path / "audio" / "a.wav"), _tone(220.0), 16000)
    write_flac(str(tmp_path / "audio" / "b.flac"), _tone(330.0), 16000)
    # an 8 kHz wav that must be resampled on read
    write_wav(str(tmp_path / "audio" / "c.wav"), _tone(110.0, n=2000, sr=8000),
              8000)
    entries = [
        {"audio": "audio/a.wav", "text": "cat dog"},
        {"audio": "audio/b.flac", "text": "Fish Bird", "id": "utt-b"},
        {"audio": str(tmp_path / "audio" / "c.wav"), "text": "cow"},
    ]
    mpath = str(tmp_path / "corpus.jsonl")
    assert write_manifest(mpath, entries) == 3
    return mpath


def test_read_manifest_full(corpus_dir):
    corpus = read_manifest(corpus_dir)
    assert [u for u, _, _ in corpus] == ["a", "utt-b", "c"]
    assert [w for _, _, w in corpus] == [["cat", "dog"], ["fish", "bird"],
                                         ["cow"]]
    # wav loads at length, flac decodes, 8 kHz entry resampled to 16 kHz
    assert len(corpus[0][1]) == 4000
    assert len(corpus[1][1]) == 4000
    assert abs(len(corpus[2][1]) - 4000) <= 4
    for _u, wave, _w in corpus:
        assert wave.dtype == np.float32 and np.abs(wave).max() <= 1.0


def test_max_utts(corpus_dir):
    assert len(read_manifest(corpus_dir, max_utts=2)) == 2


def test_errors_name_the_line(tmp_path, corpus_dir):
    bad = tmp_path / "bad.jsonl"
    bad.write_text('\n{nope\n')
    with pytest.raises(ValueError, match=r"bad\.jsonl:2: bad json"):
        read_manifest(str(bad))
    bad2 = tmp_path / "bad2.jsonl"
    bad2.write_text('{"text": "missing audio"}\n')
    with pytest.raises(ValueError, match=r"bad2\.jsonl:1: need 'audio'"):
        read_manifest(str(bad2))
    bad3 = tmp_path / "bad3.jsonl"
    bad3.write_text('{"audio": "missing.wav", "text": "a"}\n')
    with pytest.raises(ValueError, match=r"bad3\.jsonl:1: cannot read"):
        read_manifest(str(bad3))
    with pytest.raises(ValueError, match="needs audio"):
        write_manifest(str(tmp_path / "w.jsonl"), [{"text": "no audio"}])


def test_features_cli_manifest(tmp_path, corpus_dir, monkeypatch, capsys):
    # end to end: manifest -> fused front end -> npz dump
    import sys

    from cli import features

    lexicon = tmp_path / "lexicon.txt"
    lexicon.write_text(
        "cat k ae t\ndog d ao g\nfish f ih sh\nbird b er d\ncow k aw\n")
    out = str(tmp_path / "feats.npz")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--manifest", corpus_dir, "--lexicon", str(lexicon),
        "--out", out, "--run-dir", str(tmp_path / "run")])
    features.main()
    d = np.load(out)
    assert sorted(d.files) == ["a", "c", "utt-b"]
    assert d["a"].shape[1] == 39
