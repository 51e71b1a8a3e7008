"""Kaldi text-archive (ark,t) roundtrip and format tests."""

import numpy as np
import pytest

from mogasr.data.kaldi_io import read_ark_t_dict, write_ark_t


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mats = {
        "utt-a": rng.standard_normal((7, 13)).astype(np.float32),
        "utt-b": rng.standard_normal((1, 4)).astype(np.float32),
        "utt-c": (1e-8 * rng.standard_normal((3, 2))).astype(np.float32),
    }
    p = tmp_path / "feats.ark"
    write_ark_t(str(p), sorted(mats.items()))
    back = read_ark_t_dict(str(p))
    assert set(back) == set(mats)
    for k in mats:
        np.testing.assert_allclose(back[k], mats[k], rtol=2e-6, atol=1e-12)


def test_reads_kaldi_style_text(tmp_path):
    """Hand-written archive in the exact layout copy-format-dump produces."""
    p = tmp_path / "k.ark"
    p.write_text(
        "spk1-utt1  [\n  1 2 3 \n  4 5 6 ]\n"
        "spk1-utt2  [\n  0.5 -0.25 ]\n"
    )
    d = read_ark_t_dict(str(p))
    np.testing.assert_allclose(d["spk1-utt1"], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(d["spk1-utt2"], [[0.5, -0.25]])


def test_truncated_raises(tmp_path):
    p = tmp_path / "bad.ark"
    p.write_text("u1  [\n  1 2 \n")
    with pytest.raises(ValueError, match="truncated"):
        read_ark_t_dict(str(p))


def test_features_cli_write_ark(tmp_path, monkeypatch):
    import json

    from cli import features as features_cli
    from tests.test_cli import run_cli

    ark = str(tmp_path / "feats.ark")
    run_cli(
        features_cli,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "run"),
         "--write-ark", ark],
        monkeypatch,
    )
    d = read_ark_t_dict(ark)
    assert len(d) == 2
    for m in d.values():
        assert m.ndim == 2 and m.shape[1] == 39  # mfcc+deltas dim
