"""Dither + streaming use_energy: the round-2 closure of the streaming
"exact offline equivalence" carve-outs (round-1 VERDICT missing item 6).

Contract: dither is a DETERMINISTIC position-keyed noise stream shared by the
NumPy oracle, the fused batched path, and the streaming front end, so all
three remain parity-equal with dither enabled; use_energy works in all three.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mogasr.config import FrontendConfig
from mogasr.data.synthetic import synth_utterance
from mogasr.frontend import numpy_ref as npref
from mogasr.frontend.jax_frontend import _dither_noise, cached_frontend
from mogasr.frontend.streaming import StreamingFrontend


def test_dither_noise_deterministic_and_position_keyed():
    a = npref.dither_noise_np(0, 1000)
    b = npref.dither_noise_np(0, 1000)
    np.testing.assert_array_equal(a, b)
    # windowed generation must agree with one-shot (the streaming property)
    c = np.concatenate([npref.dither_noise_np(0, 300),
                        npref.dither_noise_np(300, 700)])
    np.testing.assert_array_equal(a, c)
    # roughly unit Gaussian
    big = npref.dither_noise_np(0, 200_000)
    assert abs(big.mean()) < 0.01
    assert abs(big.std() - 1.0) < 0.01
    assert np.isfinite(big).all()


def test_dither_noise_jax_matches_numpy():
    n = 50_000
    ref = npref.dither_noise_np(0, n)
    got = np.asarray(_dither_noise(n))
    # float32 Box-Muller vs float64: tiny elementwise drift only
    np.testing.assert_allclose(got, ref, atol=5e-4)
    assert np.isfinite(got).all()


def _cfgs():
    base = FrontendConfig()
    return [
        dataclasses.replace(base, dither=1e-4),
        dataclasses.replace(base, use_energy=True),
        dataclasses.replace(base, use_energy=True, dither=1e-4),
    ]


def test_oracle_vs_fused_parity_with_dither_and_energy():
    u = synth_utterance("u", ["cat", "see", "dog"], seed=11)
    for cfg in _cfgs():
        ref = npref.extract_features_np(u.wave, cfg)
        fe = cached_frontend(cfg, len(u.wave))
        feats, nf = fe(jnp.asarray(u.wave)[None], jnp.asarray([len(u.wave)]))
        got = np.asarray(feats)[0, : int(nf[0])]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_streaming_equals_offline_with_dither_and_energy():
    u = synth_utterance("u", ["moon", "walk"], seed=12)
    rng = np.random.default_rng(0)
    for cfg in _cfgs():
        if cfg.cmvn == "utterance":
            cfg = dataclasses.replace(cfg, cmvn="none")
        ref = npref.extract_features_np(u.wave, cfg)
        sf = StreamingFrontend(cfg)
        outs, pos = [], 0
        while pos < len(u.wave):
            step = int(rng.integers(900, 4200))  # ragged chunk sizes
            outs.append(sf.process(u.wave[pos : pos + step]))
            pos += step
        outs.append(sf.finalize())
        got = np.concatenate([o for o in outs if o.size])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_dither_zero_is_noop():
    u = synth_utterance("u", ["cat"], seed=13)
    cfg = FrontendConfig()
    assert cfg.dither == 0.0
    ref = npref.extract_features_np(u.wave, cfg)
    ref2 = npref.extract_features_np(
        u.wave, dataclasses.replace(cfg, dither=1e-4))
    # dither must actually change something (guards against silent no-op)
    assert np.abs(ref - ref2).max() > 0.0


def test_dither_unsticks_log_floor():
    """The purpose of dither: all-zero audio stops producing log-floor
    plateaus (constant features) once dither is on."""
    cfg = dataclasses.replace(FrontendConfig(), cmvn="none")
    wave = np.zeros(16000, np.float32)
    flat = npref.extract_features_np(wave, cfg)
    dithered = npref.extract_features_np(
        wave, dataclasses.replace(cfg, dither=1e-5))
    assert np.ptp(flat[:, 0]) == 0.0          # log-floor plateau
    assert np.ptp(dithered[:, 0]) > 0.0       # broken by dither
