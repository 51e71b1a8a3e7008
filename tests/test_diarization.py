"""Diarization: DER metric properties, AHC clustering, and end-to-end
who-spoke-when on a synthetic multi-speaker session."""

from __future__ import annotations

import numpy as np

from mogasr.diarize import ahc_labels, diarize_wave, train_diarizer, DiarizeConfig
from mogasr.eval.diarization import der


def test_der_perfect_hypothesis_is_zero():
    ref = [(0.0, 2.0, "a"), (2.5, 4.0, "b"), (4.5, 6.0, "a")]
    out = der(ref, ref)
    assert out["der"] == 0.0


def test_der_invariant_to_label_permutation():
    ref = [(0.0, 2.0, "a"), (2.5, 4.0, "b")]
    hyp = [(0.0, 2.0, 1), (2.5, 4.0, 0)]  # same turns, renamed speakers
    assert der(ref, hyp)["der"] == 0.0


def test_der_components():
    ref = [(0.0, 10.0, "a")]
    # half missed, and 5 s of false alarm elsewhere
    hyp = [(0.0, 5.0, "x"), (20.0, 25.0, "x")]
    out = der(ref, hyp)
    np.testing.assert_allclose(out["miss"], 0.5, atol=0.01)
    np.testing.assert_allclose(out["false_alarm"], 0.5, atol=0.01)
    np.testing.assert_allclose(out["der"], 1.0, atol=0.02)
    assert out["confusion"] == 0.0


def test_der_confusion_with_optimal_mapping():
    ref = [(0.0, 6.0, "a"), (6.0, 8.0, "b")]
    # hyp swaps a 2 s chunk of speaker a to a second label; mapping must
    # assign hyp-0 -> a, hyp-1 -> b, leaving exactly 2 s confusion
    hyp = [(0.0, 4.0, 0), (4.0, 6.0, 1), (6.0, 8.0, 1)]
    out = der(ref, hyp)
    np.testing.assert_allclose(out["confusion"], 0.25, atol=0.01)
    np.testing.assert_allclose(out["der"], 0.25, atol=0.02)


def test_der_collar_excludes_boundaries():
    ref = [(0.0, 4.0, "a")]
    hyp = [(0.1, 4.0, "z")]  # 0.1 s boundary error
    assert der(ref, hyp)["der"] > 0.0
    assert der(ref, hyp, collar_s=0.25)["der"] == 0.0


def test_ahc_clusters_separated_points():
    rng = np.random.default_rng(0)
    centers = np.eye(3)
    X = np.concatenate([
        c + 0.05 * rng.standard_normal((10, 3)) for c in centers
    ])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    labels = ahc_labels(X, n_clusters=3)
    truth = np.repeat(np.arange(3), 10)
    # each true cluster maps to exactly one predicted label
    for t in range(3):
        assert len(set(labels[truth == t])) == 1
    assert len(set(labels)) == 3
    # threshold mode finds the same 3 clusters without being told the count
    labels_t = ahc_labels(X, threshold=0.5)
    assert len(set(labels_t)) == 3


def test_diarize_synthetic_session():
    """A 2-speaker session built from well-separated v2 speakers must
    diarize to DER well under chance (one-speaker-everywhere ~ 0.5)."""
    from cli.diarize import build_session

    wave, refs, train_utts = build_session(2, 10, seed=4)
    from mogasr.config import FrontendConfig

    fcfg = FrontendConfig(cmvn="none")
    ubm, t_mat = train_diarizer(train_utts[:24], fcfg, n_components=16, rank=8,
                                ubm_iters=6, tv_iters=6)
    turns = diarize_wave(wave, fcfg, ubm, t_mat, n_speakers=2)
    assert turns, "no speech found"
    assert len({lab for _s, _e, lab in turns}) == 2
    out = der(refs, turns, collar_s=0.25)
    assert out["der"] < 0.30, out
    # sanity: collapsing everything to one speaker must be clearly worse
    one = [(s, e, 0) for s, e, _l in turns]
    assert out["der"] < der(refs, one, collar_s=0.25)["der"] - 0.05, out
