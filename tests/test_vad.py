"""VAD/segmentation tests: known synthetic silence structure is recovered."""

import numpy as np
import pytest

from mogasr.config import FrontendConfig
from mogasr.data.synthetic import synth_utterance
from mogasr.frontend import vad

FCFG = FrontendConfig()


def _long_recording():
    """3 utterances separated by 1.5 s of near-silence."""
    parts, bounds = [], []
    pos = 0
    gap = np.zeros(24000, np.float32)  # 1.5 s
    rng = np.random.default_rng(0)
    for i, words in enumerate([["cat", "dog"], ["see", "moon"], ["tree"]]):
        u = synth_utterance(f"v{i}", words, seed=50 + i)
        parts.append(gap + 0.0005 * rng.standard_normal(len(gap)).astype(np.float32))
        pos += len(gap)
        bounds.append((pos, pos + len(u.wave)))
        parts.append(u.wave)
        pos += len(u.wave)
    parts.append(gap)
    return np.concatenate(parts), bounds


def test_vad_finds_speech():
    wave, bounds = _long_recording()
    mask = vad.energy_vad(wave, FCFG)
    # speech frames mostly detected inside true spans
    H = FCFG.frame_shift
    for a, b in bounds:
        # synthetic utterances contain real internal silence (edge + inter-word
        # sil phones), so full-span coverage sits well below 1.0 by design
        inner = mask[(a + 800) // H : (b - 800) // H]
        assert inner.mean() > 0.55, inner.mean()
    # silence in the gaps
    assert mask[: (bounds[0][0] - 8000) // H].mean() < 0.1


def test_segmentation_recovers_utterances():
    wave, bounds = _long_recording()
    segs = vad.segment_utterances(wave, FCFG)
    assert len(segs) == 3, segs
    for (sa, sb), (ta, tb) in zip(segs, bounds):
        # boundaries within 0.5 s of truth (segments legitimately trim the
        # utterances' own edge-silence phones)
        assert abs(sa - ta) < 8000, (sa, ta)
        assert abs(sb - tb) < 8000, (sb, tb)


def test_max_segment_split():
    wave, _ = _long_recording()
    vcfg = vad.VadConfig(max_segment_s=0.5)
    segs = vad.segment_utterances(wave, FCFG, vcfg)
    H = FCFG.frame_shift
    max_len = 0.5 * 16000 + FCFG.frame_length + 2 * H
    assert all((b - a) <= max_len for a, b in segs), segs
    assert len(segs) >= 4  # utterances forced into sub-segments


def test_empty_and_silent_inputs():
    assert vad.segment_utterances(np.zeros(100, np.float32), FCFG) == []
    silent = 0.0001 * np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    assert vad.segment_utterances(silent, FCFG) == []
