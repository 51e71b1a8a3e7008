"""Streaming endpointer (mogasr.frontend.endpoint): the three rules fire on
the right inputs, never mid-speech, and decisions are chunk-size invariant."""

import numpy as np
import pytest

from mogasr.config import FrontendConfig
from mogasr.frontend.endpoint import EndpointConfig, StreamingEndpointer


FCFG = FrontendConfig()
SR = FCFG.sample_rate


def _tone(sec, freq=440.0, amp=0.3):
    t = np.arange(int(sec * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noise(sec, amp=1e-3, seed=0):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(int(sec * SR))).astype(np.float32)


def _run(wave, chunk=1600, cfg=EndpointConfig()):
    ep = StreamingEndpointer(FCFG, cfg)
    for i in range(0, len(wave), chunk):
        ep.feed(wave[i : i + chunk])
        if ep.endpointed:
            break
    return ep


def test_rule1_trailing_silence_after_speech():
    wave = np.concatenate([_noise(0.3), _tone(1.0), _noise(2.0, seed=1)])
    ep = _run(wave)
    assert ep.rule == "rule1_trailing_silence"
    # fires ~rule1_trailing_sil_s after speech ends (1.3 s in), well before
    # the audio runs out
    t_fire = ep.endpoint_frame * FCFG.frame_shift_ms / 1000.0
    assert 1.5 < t_fire < 2.5, t_fire


def test_rule2_no_speech():
    ep = _run(_noise(7.0), cfg=EndpointConfig(rule2_no_speech_s=3.0))
    assert ep.rule == "rule2_no_speech"
    t_fire = ep.endpoint_frame * FCFG.frame_shift_ms / 1000.0
    assert abs(t_fire - 3.0) < 0.1


def test_rule3_max_length_during_continuous_speech():
    # speech with tiny amplitude wobble, never silent
    wave = _tone(6.0)
    ep = _run(wave, cfg=EndpointConfig(rule3_max_utt_s=4.0,
                                       rule2_no_speech_s=100.0))
    assert ep.rule == "rule3_max_length"
    t_fire = ep.endpoint_frame * FCFG.frame_shift_ms / 1000.0
    assert abs(t_fire - 4.0) < 0.1


def test_no_endpoint_mid_speech():
    wave = np.concatenate([_noise(0.2), _tone(2.0)])
    ep = _run(wave, cfg=EndpointConfig(rule2_no_speech_s=100.0))
    assert not ep.endpointed


def test_chunk_size_invariance():
    wave = np.concatenate([_noise(0.3), _tone(0.8), _noise(1.5, seed=2)])
    frames = [
        _run(wave, chunk=c).endpoint_frame for c in (160, 1600, 4000, len(wave))
    ]
    assert frames[0] is not None
    assert all(f == frames[0] for f in frames), frames


def test_pauses_shorter_than_rule1_do_not_fire():
    cfg = EndpointConfig(rule1_trailing_sil_s=0.5, rule2_no_speech_s=100.0)
    wave = np.concatenate([
        _tone(0.5), _noise(0.3, seed=3), _tone(0.5), _noise(0.3, seed=4),
        _tone(0.5),
    ])
    assert not _run(wave, cfg=cfg).endpointed


def test_reset_keeps_floor_starts_fresh():
    cfg = EndpointConfig(rule2_no_speech_s=1.0)
    ep = StreamingEndpointer(FCFG, cfg)
    ep.feed(_noise(1.5))
    assert ep.rule == "rule2_no_speech"
    ep.reset()
    assert not ep.endpointed and ep.frames_seen == 0
    ep.feed(np.concatenate([_tone(0.5), _noise(1.0, seed=5)]))
    assert ep.rule == "rule1_trailing_silence"
