"""Real-corpus path end-to-end: CLIs over a LibriSpeech-layout fixture corpus
with a Kaldi-style lexicon file (the exact flags a user with real data runs)."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mogasr.data.librispeech import write_fixture_corpus
from mogasr.data.synthetic import LEXICON, make_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls_root")
    utts = make_corpus(6, words_per_utt=(2, 2), seed=21)
    write_fixture_corpus(str(root), "dev-clean", utts)
    # Kaldi-style lexicon with UPPERCASE words, like real LibriSpeech/CMUdict
    # lexicons: load_lexicon lowercases them to match the corpus loader
    lex_path = root / "lexicon.txt"
    with open(lex_path, "w") as f:
        for w, phones in sorted(LEXICON.items()):
            f.write(f"{w.upper()} {' '.join(phones)}\n")
    return str(root), str(lex_path)


def run_cli(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


def test_features_cli_librispeech(corpus_dir, tmp_path, monkeypatch):
    from cli import features

    root, lex = corpus_dir
    out = str(tmp_path / "f.npz")
    run_cli(
        features,
        ["--librispeech-root", root, "--split", "dev-clean", "--lexicon", lex,
         "--run-dir", str(tmp_path / "run"), "--check-parity", "--out", out],
        monkeypatch,
    )
    data = np.load(out)
    assert len(data.files) == 6


def test_train_and_eval_cli_librispeech(corpus_dir, tmp_path, monkeypatch):
    from cli import eval as eval_cli
    from cli import train_gmm

    root, lex = corpus_dir
    run_cli(
        train_gmm,
        ["--librispeech-root", root, "--lexicon", lex,
         "--run-dir", str(tmp_path / "run"), "--num-components", "2",
         "--num-iters", "4"],
        monkeypatch,
    )
    gmm_ckpt = str(tmp_path / "run" / "gmm")
    assert os.path.isdir(gmm_ckpt)

    run_cli(
        eval_cli,
        ["--librispeech-root", root, "--lexicon", lex,
         "--run-dir", str(tmp_path / "run2"), "--gmm-ckpt", gmm_ckpt],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run2" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 6
    # a trained model evaluating its own tiny corpus: far better than chance
    assert ev[0]["wer"] < 0.5, ev[0]


def test_missing_lexicon_is_clear_error(corpus_dir, tmp_path, monkeypatch):
    from cli import features

    root, _lex = corpus_dir
    with pytest.raises(SystemExit, match="lexicon"):
        run_cli(
            features,
            ["--librispeech-root", root, "--run-dir", str(tmp_path / "run")],
            monkeypatch,
        )


def test_lexicon_alternate_pronunciations(tmp_path):
    from mogasr.hmm.lexicon import load_lexicon

    p = tmp_path / "lex.txt"
    p.write_text("THE dh ah\nTHE(2) dh iy\nCAT k ae t\n")
    lex = load_lexicon(str(p))
    assert "the" in lex.words and "the(2)" not in lex.words
    assert lex.prons["the"] == ("dh", "ah")  # first pronunciation wins
    assert lex.prons["cat"] == ("k", "ae", "t")
