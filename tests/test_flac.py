"""FLAC codec tests: Python encoder (mogasr/data/flac_write.py) round-tripped
through the native C++ decoder (mogasr/native/flac_native.cpp).

SURVEY.md §2 "Audio I/O": LibriSpeech ships as FLAC; this closes the round-1
"partial" row (flac was previously gated on the absent soundfile package).
The encoder and decoder are independent implementations of the public FLAC
spec (encoder: NumPy bit-writer; decoder: C++ bit-reader), so exact
round-trip equality is a genuine cross-check, not self-agreement.
"""

from __future__ import annotations

import numpy as np
import pytest

from mogasr.data.audio import decode_flac_bytes, read_audio
from mogasr.data.flac_write import encode_flac, write_flac
from mogasr.native import load_flac_lib

pytestmark = pytest.mark.skipif(
    load_flac_lib() is None, reason="native FLAC decoder unavailable"
)


def _rt(samples, sr=16000, **kw):
    data = encode_flac(np.asarray(samples), sr, **kw)
    out, got_sr, got_bits = decode_flac_bytes(data)
    return out, got_sr, got_bits, data


def _tonal(n, bits=16, seed=0, ch=None):
    """Smooth tonal signal (exercises fixed/LPC predictors)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    amp = (1 << (bits - 1)) * 0.5
    x = amp * np.sin(2 * np.pi * 220 * t / 16000.0)
    x = x + amp * 0.2 * np.sin(2 * np.pi * 517 * t / 16000.0 + 1.0)
    x = x + rng.normal(0, amp * 0.01, n)
    x = np.round(x).astype(np.int64)
    if ch is not None:
        sh = np.round(0.8 * x + rng.normal(0, amp * 0.005, n)).astype(np.int64)
        x = np.stack([x, sh], axis=1)
    lim = 1 << (bits - 1)
    return np.clip(x, -lim, lim - 1)


# ---------------------------------------------------------------- roundtrips

def test_mono_16bit_roundtrip():
    x = _tonal(10000)
    out, sr, bits, _ = _rt(x)
    assert sr == 16000 and bits == 16
    np.testing.assert_array_equal(out, x)


def test_multiple_blocks_and_partial_tail():
    # 2.5 blocks of 4096 -> exercises frame numbering + tail blocksize
    x = _tonal(4096 * 2 + 1234, seed=3)
    out, _, _, _ = _rt(x)
    np.testing.assert_array_equal(out, x)


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_bit_depths(bits):
    x = _tonal(3000, bits=bits, seed=bits)
    out, _, got_bits, _ = _rt(x, bits=bits)
    assert got_bits == bits
    np.testing.assert_array_equal(out, x)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side", "auto"]
)
def test_stereo_modes(mode):
    x = _tonal(5000, seed=7, ch=2)
    out, _, _, _ = _rt(x, stereo_mode=mode)
    np.testing.assert_array_equal(out, x)


def test_constant_and_silence_subframes():
    x = np.zeros(6000, np.int64)
    x[2000:4096] = 123  # constant nonzero within one block
    out, _, _, data = _rt(x)
    np.testing.assert_array_equal(out, x)
    # compresses massively (constant / near-constant subframes, not verbatim)
    assert len(data) < 1000
    silence, _, _, silence_data = _rt(np.zeros(6000, np.int64))
    np.testing.assert_array_equal(silence, 0)
    assert len(silence_data) < 150


def test_verbatim_white_noise():
    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, 4500, dtype=np.int64)
    out, _, _, _ = _rt(x)
    np.testing.assert_array_equal(out, x)


def test_wasted_bits():
    # PCM with 4 trailing zero bits in every sample
    x = (_tonal(4000, seed=5) >> 4) << 4
    out, _, _, data_w = _rt(x)
    np.testing.assert_array_equal(out, x)


def test_no_lpc_still_roundtrips():
    x = _tonal(4000, seed=9)
    out, _, _, _ = _rt(x, try_lpc=False)
    np.testing.assert_array_equal(out, x)


def test_lpc_beats_or_matches_fixed_on_tonal():
    x = _tonal(3 * 4096, seed=13)
    with_lpc = encode_flac(x, 16000, try_lpc=True)
    without = encode_flac(x, 16000, try_lpc=False)
    assert len(with_lpc) <= len(without)
    # and a sanity compression bound on smooth audio
    assert len(with_lpc) < 0.8 * x.size * 2


def test_short_utterance_smaller_than_block():
    x = _tonal(777, seed=21)
    out, _, _, _ = _rt(x)
    np.testing.assert_array_equal(out, x)


def test_blocksize_variants():
    x = _tonal(4096, seed=2)
    for bs in (192, 576, 1152, 4096, 1000):
        out, _, _, _ = _rt(x, blocksize=bs)
        np.testing.assert_array_equal(out, x)


# ----------------------------------------------------------- error handling

def test_corrupt_frame_fails_crc():
    x = _tonal(4000, seed=1)
    data = bytearray(encode_flac(x, 16000))
    data[-20] ^= 0x40  # flip a bit in the last frame's audio payload
    with pytest.raises(ValueError):
        decode_flac_bytes(bytes(data))


def test_truncated_and_garbage_streams():
    with pytest.raises(ValueError):
        decode_flac_bytes(b"not a flac stream at all")
    x = _tonal(4000, seed=1)
    data = encode_flac(x, 16000)
    with pytest.raises(ValueError):
        decode_flac_bytes(data[:30])


def test_out_of_range_samples_rejected_by_encoder():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], np.int64), 16000, bits=16)


# ------------------------------------------------------------- integration

def test_read_audio_flac(tmp_path):
    wave = 0.4 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000.0)
    p = str(tmp_path / "utt.flac")
    write_flac(p, wave.astype(np.float32), 16000)
    out, sr = read_audio(p, target_sr=16000)
    assert sr == 16000 and out.dtype == np.float32
    assert np.max(np.abs(out - wave)) < 2.0 / 32768.0  # quantization only


def test_read_audio_flac_resamples(tmp_path):
    wave = 0.3 * np.sin(2 * np.pi * 440 * np.arange(8820) / 44100.0)
    p = str(tmp_path / "cd.flac")
    write_flac(p, wave.astype(np.float32), 44100)
    out, sr = read_audio(p, target_sr=16000)
    assert sr == 16000
    assert abs(out.size - 3200) <= 2


def test_stereo_flac_downmixes(tmp_path):
    x = _tonal(4000, seed=4, ch=2)
    p = str(tmp_path / "st.flac")
    write_flac(p, x, 16000)
    out, sr = read_audio(p, target_sr=None)
    expect = (x.astype(np.float64) / 32768.0).mean(axis=1)
    assert np.max(np.abs(out - expect)) < 1e-6


def test_streaminfo_md5_present():
    x = _tonal(2000, seed=6)
    data = encode_flac(x, 16000)
    md5 = data[8 + 18 : 8 + 34]
    assert md5 != b"\x00" * 16


def test_librispeech_flac_corpus(tmp_path):
    """LibriSpeech's real on-disk format end-to-end: flac fixture corpus ->
    walker -> waveform parity with the wav path."""
    from mogasr.data import synthetic
    from mogasr.data.librispeech import LibriSpeech, write_fixture_corpus

    utts = synthetic.make_corpus(3, seed=17)
    write_fixture_corpus(str(tmp_path / "f"), "dev-clean", utts, fmt="flac")
    write_fixture_corpus(str(tmp_path / "w"), "dev-clean", utts, fmt="wav")
    cf = LibriSpeech(str(tmp_path / "f"), "dev-clean")
    cw = LibriSpeech(str(tmp_path / "w"), "dev-clean")
    assert cf.utt_ids() == cw.utt_ids() and len(cf) == 3
    for uid in cf.utt_ids():
        wf, srf, tf = cf.load_utterance(uid)
        ww, srw, tw = cw.load_utterance(uid)
        assert srf == srw and tf == tw and len(wf) == len(ww)
        # both paths quantize to PCM16; bit-identical samples
        np.testing.assert_array_equal(wf, ww)
