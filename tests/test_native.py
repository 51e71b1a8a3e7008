"""Native C++ WER scorer: build, exact parity with the Python DP, fallback."""

import numpy as np
import pytest

from mogasr.eval.wer import corpus_wer, edit_counts
from mogasr.native import load_wer_lib


def test_native_lib_builds():
    lib = load_wer_lib()
    if lib is None:
        pytest.skip("g++ unavailable; Python fallback covers functionality")
    assert hasattr(lib, "batch_edit_counts")


def test_native_matches_python(rng):
    vocab = [f"w{i}" for i in range(20)]
    refs, hyps = [], []
    for _ in range(100):
        r = [vocab[i] for i in rng.integers(0, 20, rng.integers(0, 15))]
        h = [vocab[i] for i in rng.integers(0, 20, rng.integers(0, 15))]
        refs.append(r)
        hyps.append(h)
    w_n, c_n = corpus_wer(refs, hyps, native=True)
    w_p, c_p = corpus_wer(refs, hyps, native=False)
    assert w_n == w_p
    assert (c_n.substitutions, c_n.deletions, c_n.insertions) == (
        c_p.substitutions, c_p.deletions, c_p.insertions,
    )


def test_empty_sequences():
    w, c = corpus_wer([[], ["a"]], [["a"], []], native=True)
    assert c.insertions == 1 and c.deletions == 1
