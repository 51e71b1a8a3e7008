"""Front-end tests: per-stage golden parity vs the NumPy oracle, CMVN
properties, padding invariance (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mogasr.config import FrontendConfig
from mogasr.data.synthetic import synth_utterance
from mogasr.frontend import jax_frontend as jf
from mogasr.frontend import numpy_ref as npref

CFG = FrontendConfig()


@pytest.fixture(scope="module")
def wave():
    return synth_utterance("t0", ["cat", "see", "moon"], seed=3).wave


def test_window_matches_hann_power():
    w = npref.window_fn("povey", 400)
    hann = npref.window_fn("hann", 400)
    np.testing.assert_allclose(w, hann ** 0.85, rtol=1e-12)


def test_mel_matrix_shape_and_partition():
    m = npref.mel_filterbank_matrix(CFG)
    assert m.shape == (CFG.n_fft // 2 + 1, CFG.n_mels)
    # every filter has positive mass and triangles overlap
    assert (m.sum(axis=0) > 0).all()
    assert m.max() <= 1.0 + 1e-12


def test_dct_orthonormal():
    d = npref.dct_matrix(13, 40)
    # rows of D^T D are identity on the kept coefficients
    eye = d.T @ d * (40 / 40)
    np.testing.assert_allclose(eye, np.eye(13), atol=1e-10)


def test_frame_count_convention():
    assert CFG.num_frames(400) == 1
    assert CFG.num_frames(399) == 0
    assert CFG.num_frames(560) == 2
    assert CFG.num_frames(16000) == 1 + (16000 - 400) // 160


def test_full_parity_jax_vs_numpy(wave):
    ref = npref.extract_features_np(wave, CFG)
    got = jf.extract_features(wave, CFG)
    assert got.shape == ref.shape
    # fp32 tolerance gate (BASELINE.json north_star)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_parity_fbank(wave):
    cfg = FrontendConfig(feature_type="fbank", delta_order=0)
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_parity_no_cmvn_no_deltas(wave):
    cfg = FrontendConfig(cmvn="none", delta_order=0)
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-4)


def test_levinson_solves_normal_equations():
    """Levinson-Durbin output must solve the Toeplitz normal equations."""
    rng = np.random.default_rng(0)
    p = 12
    # build a valid autocorrelation from a random spectrum (PSD by construction)
    spec = rng.uniform(0.1, 2.0, size=(4, 64))
    full = np.concatenate([spec, spec[:, -2:0:-1]], axis=1)
    R = np.fft.ifft(full, axis=1).real[:, : p + 1]
    a, err = npref.levinson_np(R)
    for b in range(R.shape[0]):
        T = np.array([[R[b, abs(i - j)] for j in range(p)] for i in range(p)])
        np.testing.assert_allclose(T @ a[b], R[b, 1 : p + 1], rtol=1e-8, atol=1e-10)
        assert err[b] > 0


def test_plp_idft_autocorrelation_identity():
    """iDCT-I of a flat compressed spectrum gives R[0]=power, R[k>0]=0."""
    mat = npref.plp_idft_matrix(40, 12)
    flat = np.ones(42)
    R = flat @ mat
    np.testing.assert_allclose(R[0], 1.0, atol=1e-12)
    np.testing.assert_allclose(R[1:], 0.0, atol=1e-12)


def test_parity_plp(wave):
    cfg = FrontendConfig(feature_type="plp")
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=4e-4, rtol=4e-4)


def test_parity_plp_energy_no_cmvn(wave):
    cfg = FrontendConfig(feature_type="plp", use_energy=True,
                         cmvn="none", delta_order=1)
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=4e-4)


def test_plp_padding_invariance(wave):
    cfg = FrontendConfig(feature_type="plp")
    n = len(wave)
    solo = jf.extract_features(wave, cfg)
    padded_len = n + 4801
    fn = jf.make_frontend(cfg, padded_len)
    waves = np.zeros((2, padded_len), np.float32)
    waves[0, :n] = wave
    other = synth_utterance("t1", ["dog"], seed=9).wave
    waves[1, : len(other)] = other
    feats, n_frames = fn(jnp.asarray(waves), jnp.asarray([n, len(other)]))
    t = int(n_frames[0])
    assert t == solo.shape[0]
    np.testing.assert_allclose(np.asarray(feats[0, :t]), solo, atol=4e-4, rtol=4e-4)


def test_cmvn_property(wave):
    feats = jf.extract_features(wave, CFG)
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats.var(axis=0), 1.0, atol=1e-3)


def test_padding_invariance(wave):
    """Features of an utterance must not change when batch-padded (SURVEY §7 #4)."""
    n = len(wave)
    solo = jf.extract_features(wave, CFG)

    padded_len = n + 7013
    fn = jf.make_frontend(CFG, padded_len)
    waves = np.zeros((2, padded_len), np.float32)
    waves[0, :n] = wave
    other = synth_utterance("t1", ["dog"], seed=9).wave
    waves[1, : len(other)] = other
    feats, n_frames = fn(jnp.asarray(waves), jnp.asarray([n, len(other)]))
    t = int(n_frames[0])
    assert t == solo.shape[0]
    np.testing.assert_allclose(np.asarray(feats[0, :t]), solo, atol=2e-4, rtol=2e-4)
    # padded region is exactly zero
    assert np.all(np.asarray(feats[0, t:]) == 0.0)


def test_batched_matches_per_utterance_oracle():
    utts = [synth_utterance(f"u{i}", ["cat", "dog"], seed=i).wave for i in range(3)]
    max_n = max(len(w) for w in utts) + 500
    fn = jf.make_frontend(CFG, max_n)
    waves = np.zeros((3, max_n), np.float32)
    for i, w in enumerate(utts):
        waves[i, : len(w)] = w
    feats, n_frames = fn(jnp.asarray(waves), jnp.asarray([len(w) for w in utts]))
    for i, w in enumerate(utts):
        ref = npref.extract_features_np(w, CFG)
        t = int(n_frames[i])
        assert t == ref.shape[0]
        np.testing.assert_allclose(np.asarray(feats[i, :t]), ref, atol=2e-4, rtol=2e-4)


def test_use_energy(wave):
    cfg = FrontendConfig(use_energy=True)
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_snip_edges_false_parity(wave):
    """Centered frames with symmetric edge reflection (Kaldi convention)."""
    cfg = FrontendConfig(snip_edges=False)
    ref = npref.extract_features_np(wave, cfg)
    got = jf.extract_features(wave, cfg)
    assert got.shape == ref.shape
    assert ref.shape[0] == cfg.num_frames(len(wave)) > CFG.num_frames(len(wave))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_snip_edges_false_batched(wave):
    """Per-utterance reflection must use each row's true length."""
    cfg = FrontendConfig(snip_edges=False)
    from mogasr.data.synthetic import synth_utterance as _synth

    other = _synth("t2", ["go"], seed=13).wave
    n1, n2 = len(wave), len(other)
    padded = max(n1, n2) + 999
    fn = jf.make_frontend(cfg, padded)
    waves = np.zeros((2, padded), np.float32)
    waves[0, :n1] = wave
    waves[1, :n2] = other
    feats, nf = fn(jnp.asarray(waves), jnp.asarray([n1, n2]))
    for i, w in enumerate([wave, other]):
        ref = npref.extract_features_np(w, cfg)
        t = int(nf[i])
        assert t == ref.shape[0]
        np.testing.assert_allclose(np.asarray(feats[i, :t]), ref, atol=2e-4, rtol=2e-4)


def test_dither_implemented_and_parity(wave):
    # round 2: dither is a deterministic shared-stream feature now; the
    # fused path must track the oracle with it enabled (test_dither_energy
    # covers the full matrix, this guards the old raise-site)
    cfg = FrontendConfig(dither=1e-4)
    ref = npref.extract_features_np(wave, cfg)
    fe = jf.make_frontend(cfg, len(wave))
    import jax.numpy as jnp
    feats, nf = fe(jnp.asarray(wave)[None], jnp.asarray([len(wave)]))
    import numpy as np
    got = np.asarray(feats)[0, : int(nf[0])]
    np.testing.assert_allclose(got, ref, atol=2e-3)
