"""Streaming (chunked) front end with exact chunk-boundary handling.

BASELINE.json configs[4]: "streaming chunked front end". Design (SURVEY.md §5
long-context row): sequence scaling comes from chunked processing with correct
frame/context overlap — not attention-style SP. The streamer produces features
*identical to the offline batched front end* (tested), with these rules:

- sample buffering keeps the frame_length-hop overlap across chunk boundaries,
  plus one trailing sample for pre-emphasis continuity;
- delta context induces an emission lag of ``delta_order * delta_window``
  frames; ``finalize()`` flushes the tail with offline edge replication;
- CMVN: per-utterance CMVN is acausal, so streaming supports ``global``
  (precomputed stats applied frame-wise), ``sliding`` (CAUSAL trailing-window
  stats — the true-online normalization, emitted values identical to the
  offline sliding path), ``none``, or deferred per-utterance normalization
  applied by the caller after finalize.

The per-chunk spectral pipeline (window+DFT+mel+DCT GEMMs) reuses the same
fused jitted kernel chain as the offline path, bucketed to a fixed chunk frame
count so XLA compiles once.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.config import FrontendConfig
from mogasr.frontend import numpy_ref as npref
from mogasr.frontend.jax_frontend import HIGHEST, _plp_cepstra, build_consts


@functools.lru_cache(maxsize=16)
def _chunk_kernel(cfg: FrontendConfig, max_frames: int):
    """Jitted windowed-DFT->mel->DCT over [max_frames, frame_length] frames."""
    consts = build_consts(cfg)

    @jax.jit
    def run(frames: jax.Array) -> jax.Array:
        re = jnp.dot(frames, consts.dft_cos_w, precision=HIGHEST)
        im = jnp.dot(frames, consts.dft_sin_w, precision=HIGHEST)
        pspec = re * re + im * im
        mel = jnp.dot(pspec, consts.mel, precision=HIGHEST)
        if cfg.feature_type == "plp":
            return _plp_cepstra(mel, cfg, consts)
        logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))
        if cfg.feature_type == "fbank":
            return logmel
        return jnp.dot(logmel, consts.dct_lift, precision=HIGHEST)

    return run


class StreamingFrontend:
    """Chunked feature extractor; emits [n, feat_dim] arrays incrementally."""

    def __init__(
        self,
        cfg: FrontendConfig,
        chunk_frames: int = 64,
        cmvn_mean: Optional[np.ndarray] = None,
        cmvn_istd: Optional[np.ndarray] = None,
    ):
        if not cfg.snip_edges:
            raise NotImplementedError(
                "streaming requires snip_edges=True (centered frames need "
                "right-edge reflection, which is acausal)"
            )
        if cfg.add_pitch:
            raise NotImplementedError(
                "streaming add_pitch is unsupported: the pitch stream's lag "
                "Viterbi and log-f0 centering are utterance-level (acausal)"
            )
        self.cfg = cfg
        self.chunk_frames = chunk_frames
        self.kernel = _chunk_kernel(cfg, chunk_frames)
        self._buf = np.zeros(0, np.float64)   # un-consumed samples
        self._prev_sample = 0.0               # for pre-emphasis continuity
        self._first = True
        self._n_in = 0                        # absolute samples consumed (dither key)
        # rolling buffer of base (pre-delta) frames: only the delta-context
        # tail is kept, so streaming stays O(T) (not O(T^2)) in utterance
        # length. _buf_start is the global frame index of _base_buf[0].
        self._base_buf = np.zeros((0, cfg.base_dim), np.float32)
        self._buf_start = 0
        self._t_avail = 0
        self._emitted = 0                     # final frames already emitted
        if cfg.cmvn == "global":
            assert cmvn_mean is not None and cmvn_istd is not None, (
                "global CMVN streaming needs precomputed stats"
            )
        self.cmvn_mean = cmvn_mean
        self.cmvn_istd = cmvn_istd
        # sliding CMVN state: trailing raw (pre-normalization) final frames,
        # at most window-1 of them, plus the global emitted count
        self._cmvn_hist = np.zeros((0, cfg.feat_dim), np.float64)

    @property
    def _lag(self) -> int:
        return self.cfg.delta_order * self.cfg.delta_window

    def _frame_pending(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Host half of frame extraction: framing + pre-emphasis (+ energy).

        Returns (frames [t, frame_length] float32, energy [t] float32 or
        None) and advances the sample buffer — WITHOUT running the spectral
        kernel. Used by the batched session engine
        (mogasr.serving.engine), which runs ONE kernel dispatch for many
        sessions' frames; `_consume_frames` below is the single-session
        path that applies the kernel immediately.
        """
        cfg = self.cfg
        L, H = cfg.frame_length, cfg.frame_shift
        n = len(self._buf)
        if n < L:
            return np.zeros((0, L), np.float32), None
        t = (n - L) // H + 1
        idx = np.arange(t)[:, None] * H + np.arange(L)[None, :]
        raw = self._buf[idx]
        # pre-emphasis with cross-chunk continuity
        prevs = np.empty((t, L))
        prevs[:, 1:] = raw[:, :-1]
        starts = idx[:, 0]
        prev_of_start = np.where(
            starts > 0, self._buf[np.maximum(starts - 1, 0)], self._prev_sample
        )
        if self._first:
            # Kaldi convention: very first sample emphasized against itself
            prev_of_start = np.where(starts == 0, raw[:, 0], prev_of_start)
        prevs[:, 0] = prev_of_start
        frames = raw - cfg.preemphasis * prevs
        # energy path: log raw-frame energy BEFORE pre-emphasis/window,
        # matching the offline fused path and the NumPy oracle exactly
        # (the buffer already carries dithered samples — see process())
        energy = None
        if cfg.use_energy and cfg.feature_type in ("mfcc", "plp"):
            raw32 = raw.astype(np.float32)
            energy = np.log(
                np.maximum((raw32 * raw32).sum(-1), cfg.log_floor)
            ).astype(np.float32)
        # drop consumed samples; keep from start of next frame, minus one
        # sample of pre-emphasis history
        next_start = t * H
        self._prev_sample = float(self._buf[next_start - 1])
        self._buf = self._buf[next_start:]
        self._first = False
        return frames.astype(np.float32), energy

    def _absorb_base(self, out: np.ndarray) -> None:
        """Append spectral-kernel output rows (base features) to the rolling
        buffer. `out` is the kernel applied to `_frame_pending` frames, with
        the energy column already substituted when cfg.use_energy."""
        if out.shape[0] == 0:
            return
        self._base_buf = np.concatenate([self._base_buf, out])
        self._t_avail += out.shape[0]

    def _consume_frames(self) -> None:
        """Turn buffered samples into base feature frames (single-session
        path: framing on host, spectral kernel applied per block)."""
        frames, energy = self._frame_pending()
        t = frames.shape[0]
        L = self.cfg.frame_length
        for i in range(0, t, self.chunk_frames):
            block = frames[i : i + self.chunk_frames]
            nb = block.shape[0]
            padded = np.zeros((self.chunk_frames, L), np.float32)
            padded[:nb] = block.astype(np.float32)
            out = np.asarray(self.kernel(jnp.asarray(padded)))[:nb]
            if energy is not None:
                out = out.copy()
                out[:, 0] = energy[i : i + nb]
            self._absorb_base(out)

    def _deltas_ready(self, t_ready: int, final: bool) -> np.ndarray:
        """Final features for frames [emitted, t_ready) with full context.

        Deltas are computed over the rolling buffer only; the buffer always
        keeps `lag` frames of left context before the first un-emitted frame
        (and starts at the true frame 0 until that many frames are emitted),
        so the values equal a full-utterance computation exactly: left-edge
        clamping happens only when _buf_start == 0, right-edge clamping only
        at finalize when the buffer truly ends the utterance.
        """
        cfg = self.cfg
        if t_ready <= self._emitted:
            return np.zeros((0, cfg.feat_dim), np.float32)
        feats = [self._base_buf]
        prev = self._base_buf
        for _ in range(cfg.delta_order):
            prev = npref.compute_deltas(prev, cfg.delta_window)
            feats.append(prev)
        full = np.concatenate(feats, axis=-1)
        lo = self._emitted - self._buf_start
        hi = t_ready - self._buf_start
        out = full[lo:hi].astype(np.float32)
        self._emitted = t_ready
        # trim: keep `lag` frames of context before the next un-emitted frame
        new_start = max(t_ready - self._lag, 0)
        if new_start > self._buf_start:
            self._base_buf = self._base_buf[new_start - self._buf_start :]
            self._buf_start = new_start
        if self.cfg.cmvn == "global":
            out = (out - self.cmvn_mean) * self.cmvn_istd
        elif self.cfg.cmvn == "sliding":
            out = self._sliding_normalize(out)
        return out

    def _sliding_normalize(self, out: np.ndarray) -> np.ndarray:
        """Causal trailing-window normalization of newly-final frames.

        _cmvn_hist holds exactly min(frames_emitted_so_far, window-1) raw
        frames, so each new frame's window (trailing ``window`` frames incl.
        itself) is fully contained in hist+out — values match the offline
        cmvn_sliding_np exactly."""
        W = self.cfg.cmvn_window
        h = self._cmvn_hist.shape[0]
        allf = np.concatenate([self._cmvn_hist, np.asarray(out, np.float64)])
        cs = np.cumsum(allf, axis=0)
        css = np.cumsum(allf * allf, axis=0)
        t = np.arange(h, allf.shape[0])          # rows to normalize
        lo = t - W
        s = cs[t] - np.where(lo[:, None] >= 0, cs[np.maximum(lo, 0)], 0.0)
        ss = css[t] - np.where(lo[:, None] >= 0, css[np.maximum(lo, 0)], 0.0)
        cnt = np.minimum(t + 1, W)[:, None].astype(np.float64)
        mean = s / cnt
        norm = allf[t] - mean
        if self.cfg.cmvn_norm_var:
            var = ss / cnt - mean**2
            norm = norm / np.sqrt(np.maximum(var, 1e-10))
        keep = W - 1
        self._cmvn_hist = allf[allf.shape[0] - min(keep, allf.shape[0]):] if keep > 0 \
            else allf[:0]
        return norm.astype(np.float32)

    def _buffer_samples(self, samples: np.ndarray) -> None:
        samples = np.asarray(samples, np.float64)
        if self.cfg.dither != 0.0 and len(samples):
            # same deterministic position-keyed stream as offline/oracle
            samples = samples + self.cfg.dither * npref.dither_noise_np(
                self._n_in, len(samples)
            )
        self._n_in += len(samples)
        self._buf = np.concatenate([self._buf, samples])

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Feed a chunk of audio; returns newly-final [n, feat_dim] features."""
        self._buffer_samples(samples)
        self._consume_frames()
        return self._deltas_ready(max(self._t_avail - self._lag, 0), final=False)

    # ---- batched-engine path (mogasr.serving.engine) -------------------
    # The engine runs ONE spectral-kernel dispatch for MANY sessions, so the
    # per-session object only does the host half (framing / deltas / CMVN):
    #   frames = fe.accept_samples(pcm)     # host framing; queue `frames`
    #   ...engine batches frames of all sessions through the kernel...
    #   feats = fe.absorb(base_rows)        # kernel rows back -> final feats
    # Values are identical to process()/finalize() (tested).

    def accept_samples(
        self, samples: np.ndarray
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Host framing only: returns (pre-emphasized frames [t, frame_len],
        energy [t] or None) for the shared batched spectral kernel."""
        self._buffer_samples(samples)
        return self._frame_pending()

    def absorb(self, base_rows: np.ndarray) -> np.ndarray:
        """Accept spectral-kernel output rows (energy column already
        substituted by the caller when cfg.use_energy); returns newly-final
        [n, feat_dim] features."""
        self._absorb_base(np.asarray(base_rows, np.float32))
        return self._deltas_ready(max(self._t_avail - self._lag, 0), final=False)

    def finalize_absorbed(self) -> np.ndarray:
        """Engine finalize: every accept_samples() frame must have been
        absorb()ed; flushes the delta-lag tail with edge replication."""
        return self._deltas_ready(self._t_avail, final=True)

    def finalize(self) -> np.ndarray:
        """Flush remaining frames with end-of-utterance edge replication."""
        self._consume_frames()
        return self._deltas_ready(self._t_avail, final=True)
