"""Audio I/O: wav/flac reading, resampling, int->float conversion.

SURVEY.md §2 "Audio I/O" row. This box has neither soundfile nor librosa
(verified at build time), so:

- WAV: stdlib ``wave`` + NumPy (PCM16/PCM8/PCM24/PCM32 and float32).
- FLAC: gated behind optional ``soundfile`` — raises a clear error when the
  codec is unavailable rather than failing obscurely.
- Resampling: polyphase-free rational resampler via ``scipy.signal.resample_poly``.
"""

from __future__ import annotations

import io
import wave as _wave
from math import gcd
from typing import Optional, Tuple, Union

import numpy as np

try:  # pragma: no cover - optional codec
    import soundfile as _soundfile
except ImportError:  # pragma: no cover
    _soundfile = None


def read_wav(path_or_bytes: Union[str, bytes]) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV (8/16/24/32-bit int) -> (float32 mono in [-1,1], sr).

    IEEE-float WAVs are not supported by the stdlib wave module.
    """
    if isinstance(path_or_bytes, bytes):
        f = _wave.open(io.BytesIO(path_or_bytes), "rb")
    else:
        f = _wave.open(path_or_bytes, "rb")
    with f:
        n_ch, sampwidth, sr, n_frames = (
            f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes(),
        )
        raw = f.readframes(n_frames)
    if sampwidth == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data, sr


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    if _soundfile is None:
        raise RuntimeError(
            "FLAC decoding requires the optional 'soundfile' package, which is "
            "not installed in this environment. Convert to WAV or install "
            "soundfile."
        )
    data, sr = _soundfile.read(path, dtype="float32")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return np.ascontiguousarray(data, np.float32), sr


def resample(wave: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return wave
    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(wave, sr_out // g, sr_in // g).astype(np.float32)


def read_audio(path: str, target_sr: Optional[int] = 16000) -> Tuple[np.ndarray, int]:
    """``read_audio(path) -> (float32 mono waveform, sr)`` (SURVEY.md §1 L0)."""
    lower = path.lower()
    if lower.endswith(".flac"):
        data, sr = read_flac(path)
    elif lower.endswith(".wav"):
        data, sr = read_wav(path)
    else:
        raise ValueError(f"unsupported audio format: {path}")
    if target_sr is not None and sr != target_sr:
        data, sr = resample(data, sr, target_sr), target_sr
    return data, sr


def write_wav(path: str, wave: np.ndarray, sr: int) -> None:
    """Write float32 [-1,1] mono as PCM16 WAV (fixture generation)."""
    pcm = np.clip(np.asarray(wave, np.float32), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    with _wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
