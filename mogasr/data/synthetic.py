"""Deterministic synthetic speech corpus for tests, fixtures and benchmarks.

The environment has no LibriSpeech audio and no flac decoder (SURVEY.md §0:
offline box), so tests and the benchmark harness use a synthetic corpus with
*known ground truth*: each utterance is generated from a phone sequence where
every phone has a characteristic two-"formant" spectrum, so forced alignment,
decoding and WER all have verifiable answers. The real LibriSpeech reader
lives in mogasr.data.librispeech and activates when a corpus directory exists.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SIL = "sil"

# A compact phone set with well-separated formant pairs (Hz).
PHONE_FORMANTS: Dict[str, Tuple[float, float]] = {
    "aa": (730, 1090), "iy": (270, 2290), "uw": (300, 870), "eh": (530, 1840),
    "ae": (660, 1720), "ah": (640, 1190), "ao": (570, 840), "ih": (390, 1990),
    "s": (4500, 6200), "sh": (2500, 4000), "f": (5500, 7200), "th": (5100, 6800),
    "m": (250, 1000), "n": (250, 1600), "ng": (250, 2000),
    "k": (1800, 3500), "t": (3000, 5000), "p": (1000, 2200),
    "b": (500, 1500), "d": (2600, 3900), "g": (1500, 2800), "r": (490, 1350),
    "l": (360, 1300), "w": (300, 610), "y": (300, 2200), "z": (3800, 5600),
}

PHONES: List[str] = [SIL] + sorted(PHONE_FORMANTS)

# Small closed vocabulary: word -> phone sequence.
LEXICON: Dict[str, List[str]] = {
    "cat": ["k", "ae", "t"], "dog": ["d", "ao", "g"], "fish": ["f", "ih", "sh"],
    "bird": ["b", "r", "d"], "see": ["s", "iy"], "saw": ["s", "ao"],
    "new": ["n", "uw"], "moon": ["m", "uw", "n"], "sun": ["s", "ah", "n"],
    "rain": ["r", "eh", "n"], "snow": ["s", "n", "uw"], "tree": ["t", "r", "iy"],
    "leaf": ["l", "iy", "f"], "wind": ["w", "ih", "n", "d"],
    "yes": ["y", "eh", "s"], "no": ["n", "uw"], "go": ["g", "uw"],
    "run": ["r", "ah", "n"], "walk": ["w", "ao", "k"], "talk": ["t", "ao", "k"],
    "sing": ["s", "ih", "ng"], "ring": ["r", "ih", "ng"], "king": ["k", "ih", "ng"],
    "thin": ["th", "ih", "n"], "zoo": ["z", "uw"], "tea": ["t", "iy"],
    "day": ["d", "eh"], "may": ["m", "eh"], "way": ["w", "eh"], "bee": ["b", "iy"],
}

WORDS: List[str] = sorted(LEXICON)


@dataclasses.dataclass
class Utterance:
    utt_id: str
    wave: np.ndarray          # float32 [-1, 1]
    sample_rate: int
    words: List[str]
    phones: List[str]         # including surrounding/inter-word sil
    phone_bounds: np.ndarray  # [n_phones + 1] sample boundaries


def phone_wave(
    phone: str, n: int, sr: int, rng: np.random.Generator,
    formant_scale: float = 1.0,
) -> np.ndarray:
    """formant_scale simulates a vocal-tract-length change: every phone's
    formant pair is scaled (the VTLN adaptation target)."""
    t = np.arange(n, dtype=np.float64) / sr
    if phone == SIL:
        return (0.001 * rng.standard_normal(n)).astype(np.float64)
    f1, f2 = PHONE_FORMANTS[phone]
    f1, f2 = f1 * formant_scale, f2 * formant_scale
    jitter = 1.0 + 0.02 * rng.standard_normal()
    sig = 0.5 * np.sin(2 * np.pi * f1 * jitter * t + rng.uniform(0, 2 * np.pi))
    sig += 0.3 * np.sin(2 * np.pi * f2 * jitter * t + rng.uniform(0, 2 * np.pi))
    sig += 0.02 * rng.standard_normal(n)
    # short raised-cosine on/off ramps to avoid clicks
    ramp = min(n // 4, 80)
    if ramp > 0:
        env = np.ones(n)
        env[:ramp] = 0.5 - 0.5 * np.cos(np.pi * np.arange(ramp) / ramp)
        env[-ramp:] = env[:ramp][::-1]
        sig *= env
    return sig


def words_to_phones(
    words: Sequence[str],
    interword_sil: bool = True,
    lexicon: Optional[Dict[str, List[str]]] = None,
) -> List[str]:
    lex = LEXICON if lexicon is None else lexicon
    phones = [SIL]
    for i, w in enumerate(words):
        phones.extend(lex[w])
        if interword_sil and i < len(words) - 1:
            phones.append(SIL)
    phones.append(SIL)
    return phones


def synth_utterance(
    utt_id: str,
    words: Sequence[str],
    sr: int = 16000,
    seed: int = 0,
    mean_phone_ms: float = 90.0,
    lexicon: Optional[Dict[str, List[str]]] = None,
    formant_scale: float = 1.0,
) -> Utterance:
    """lexicon overrides the word->phones map (e.g. alternate pronunciations
    for multi-pron decoding tests); formant_scale simulates a different
    vocal tract length (VTLN tests); default is the module LEXICON."""
    rng = np.random.default_rng(seed)
    phones = words_to_phones(words, lexicon=lexicon)
    waves, bounds = [], [0]
    for p in phones:
        dur_ms = mean_phone_ms * (1.6 if p == SIL else 1.0) * rng.uniform(0.7, 1.4)
        n = max(int(sr * dur_ms / 1000.0), 160)
        waves.append(phone_wave(p, n, sr, rng, formant_scale=formant_scale))
        bounds.append(bounds[-1] + n)
    wave = np.concatenate(waves)
    wave = (0.3 * wave / max(np.abs(wave).max(), 1e-6)).astype(np.float32)
    return Utterance(utt_id, wave, sr, list(words), phones, np.array(bounds))


def make_corpus(
    n_utts: int,
    words_per_utt: Tuple[int, int] = (2, 6),
    sr: int = 16000,
    seed: int = 0,
    vocab: Optional[Sequence[str]] = None,
    formant_scale: float = 1.0,
) -> List[Utterance]:
    rng = np.random.default_rng(seed)
    vocab = list(vocab) if vocab is not None else WORDS
    utts = []
    for i in range(n_utts):
        n_words = int(rng.integers(words_per_utt[0], words_per_utt[1] + 1))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_words)]
        utts.append(
            synth_utterance(
                f"synth-{i:05d}", words, sr=sr, seed=seed * 100003 + i,
                formant_scale=formant_scale,
            )
        )
    return utts
