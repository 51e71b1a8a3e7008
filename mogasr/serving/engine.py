"""Batched streaming session engine: ONE device dispatch chain per tick for
ALL live sessions.

BASELINE.json configs[4] is the streaming/serving shape. The naive server
(cli/serve.py per-session mode) steps each session independently, so every
audio event costs its own synchronized batch-1 dispatch chain — ~27-30 ms
through the TPU tunnel (docs/TPU_NOTES.md), capping a chip at ~10 realtime
streams REGARDLESS of available compute. TPU-native serving amortizes the
dispatch: sessions live in slots of fixed ``[B, ...]`` device state and one
``tick()`` advances every live session together:

    tick:  [B,F,L] spectral GEMMs  ->  [B,F,S] acoustic scores
           ->  [B,F,J] Viterbi chunk scan
           (async dispatches, ~one host round-trip per tick)

The decode dispatch consumes features finalized by the PREVIOUS tick's
spectral dispatch, so the two device stages of a tick overlap and the host
blocks roughly once per tick instead of once per stage (the host must see
base features between the stages to run the exact delta/CMVN lag
bookkeeping of StreamingFrontend).

Exactness: a session's features, partials, and final words are identical to
a dedicated ``StreamingFrontend`` + ``OnlineDecoder`` pair (tested in
tests/test_serving_engine.py) — batching changes WHEN work is dispatched,
never what is computed. Ragged arrival is handled with per-slot valid-frame
counts (masked inside the shared Viterbi scan) and per-slot backpointer
histories: under ragged feeding a slot's frames are NOT contiguous rows of
a global history, so each slot keeps its own.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.config import DecodeConfig, FrontendConfig
from mogasr.decoder.online import NEG_INF, _chunk_step
from mogasr.frontend.streaming import StreamingFrontend, _chunk_kernel
from mogasr.hmm import graph as gr


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _reset_slots(delta: jax.Array, started: jax.Array, mask: jax.Array):
    """Clear decoder state for freed slots (applied before the next scan)."""
    delta = jnp.where(mask[:, None], NEG_INF, delta)
    started = started & ~mask
    return delta, started


class _Slot:
    """Host-side per-session state. Device state lives in the engine's
    shared [B, ...] arrays at this slot's row."""

    def __init__(self, fe: StreamingFrontend, frame_len: int, feat_dim: int):
        self.fe = fe
        self.pend_frames = np.zeros((0, frame_len), np.float32)
        self.pend_energy: Optional[np.ndarray] = None
        self.feat_q = np.zeros((0, feat_dim), np.float32)
        self.bp_hist: List[np.ndarray] = []     # each [k, J] uint8
        self.exit_hist: List[np.ndarray] = []   # each [k] int32
        self.n_frames = 0
        self.samples = 0
        self.finishing = False   # end() called: flush tail when frames drain
        self.flushed = False     # finalize_absorbed() has run


class BatchedSessionEngine:
    """Fixed-capacity slot-batched streaming recognizer (GMM/hybrid family).

    graph:    ONE shared decode loop graph (e.g. pipeline.word_decode_graph)
    score_fn: stateless scorer [B, F, D] -> [B, F, S] (e.g. a closure over
              pipeline.score_batch and a GmmSet, or a jitted MLP apply)
    fcfg:     front-end config (streaming-compatible: snip_edges, and cmvn in
              {none, global, sliding})
    """

    def __init__(
        self,
        graph,
        score_fn: Callable[[jax.Array], jax.Array],
        fcfg: FrontendConfig,
        dcfg: Optional[DecodeConfig] = None,
        capacity: int = 16,
        tick_frames: int = 24,
        beam: float = 0.0,
        cmvn_mean: Optional[np.ndarray] = None,
        cmvn_istd: Optional[np.ndarray] = None,
    ):
        dcfg = dcfg or DecodeConfig()
        self.graph = graph
        self.score_fn = score_fn
        self.fcfg = fcfg
        self.acoustic_scale = float(dcfg.acoustic_scale)
        self.beam = float(beam)
        self.capacity = int(capacity)
        self.tick_frames = int(tick_frames)
        self.cmvn_mean = cmvn_mean
        self.cmvn_istd = cmvn_istd

        B = self.capacity
        self.graphs = {
            k: jnp.asarray(v) for k, v in gr.batch_graphs([graph] * B).items()
            if k != "labels"
        }
        self.J = int(self.graphs["emit_id"].shape[1])
        self.delta = jnp.full((B, self.J), NEG_INF)
        self.started = jnp.zeros((B,), bool)
        # batched spectral kernel: [B*F, frame_len] through the same fused
        # GEMM chain as the single-session streamer (one compile)
        self._spec = _chunk_kernel(fcfg, B * self.tick_frames)

        self.slots: List[Optional[_Slot]] = [None] * B
        self._sid_to_slot: Dict[object, int] = {}
        self._reset_pending = np.zeros(B, bool)
        # decode stage inputs staged from the previous tick (see tick())
        self.ticks = 0
        self.frames_decoded = 0

    # ---- session lifecycle ---------------------------------------------

    @property
    def n_live(self) -> int:
        return len(self._sid_to_slot)

    def has(self, sid) -> bool:
        return sid in self._sid_to_slot

    def audio_seconds(self, sid) -> float:
        s = self.slots[self._sid_to_slot[sid]]
        return s.samples / self.fcfg.sample_rate

    def start(self, sid) -> bool:
        """Allocate a slot; False if sid exists or engine is full."""
        if sid in self._sid_to_slot:
            return False
        try:
            b = self.slots.index(None)
        except ValueError:
            return False
        fe = StreamingFrontend(
            self.fcfg, chunk_frames=self.tick_frames,
            cmvn_mean=self.cmvn_mean, cmvn_istd=self.cmvn_istd,
        )
        self.slots[b] = _Slot(fe, self.fcfg.frame_length, self.fcfg.feat_dim)
        self._sid_to_slot[sid] = b
        return True

    def feed(self, sid, pcm: np.ndarray) -> None:
        """Buffer audio (host framing only; device work happens in tick())."""
        s = self.slots[self._sid_to_slot[sid]]
        if s.finishing:
            raise ValueError("feed() after end()")
        s.samples += len(pcm)
        frames, energy = s.fe.accept_samples(pcm)
        if frames.shape[0]:
            s.pend_frames = np.concatenate([s.pend_frames, frames])
            if energy is not None:
                s.pend_energy = (
                    energy if s.pend_energy is None
                    else np.concatenate([s.pend_energy, energy])
                )

    def end(self, sid) -> None:
        """No more audio; tail frames flush as subsequent ticks drain."""
        s = self.slots[self._sid_to_slot[sid]]
        s.finishing = True
        if len(s.pend_frames) == 0 and not s.flushed:
            tail = s.fe.finalize_absorbed()
            if tail.shape[0]:
                s.feat_q = np.concatenate([s.feat_q, tail])
            s.flushed = True

    def drained(self, sid) -> bool:
        s = self.slots[self._sid_to_slot[sid]]
        return s.flushed and len(s.feat_q) == 0

    # ---- the batched tick ----------------------------------------------

    def tick(self) -> None:
        """Advance every live session: one spectral dispatch over all slots'
        pending frames, one score+decode dispatch over all slots' finalized
        features. Dispatches are issued before any host pull so the device
        pipelines them; the host blocks ~once."""
        B, F = self.capacity, self.tick_frames
        L, D = self.fcfg.frame_length, self.fcfg.feat_dim

        # --- dispatch decode stage first (features finalized by earlier
        # ticks), so it overlaps the spectral stage on device
        feats = np.zeros((B, F, D), np.float32)
        n_valid = np.zeros(B, np.int32)
        for b, s in enumerate(self.slots):
            if s is None or len(s.feat_q) == 0:
                continue
            n = min(len(s.feat_q), F)
            feats[b, :n] = s.feat_q[:n]
            n_valid[b] = n
        decode_live = bool(n_valid.any())
        if self._reset_pending.any():
            self.delta, self.started = _reset_slots(
                self.delta, self.started, jnp.asarray(self._reset_pending)
            )
            self._reset_pending[:] = False
        if decode_live:
            scores = self.score_fn(jnp.asarray(feats))
            self.delta, self.started, bps, exit_args = _chunk_step(
                self.delta, self.started, scores, jnp.asarray(n_valid),
                self.graphs, self.acoustic_scale, self.beam,
            )

        # --- spectral stage over pending (pre-emphasized) frames
        nfr = np.zeros(B, np.int32)
        spec_live = False
        fr = None
        for b, s in enumerate(self.slots):
            if s is None or len(s.pend_frames) == 0:
                continue
            if fr is None:
                fr = np.zeros((B, F, L), np.float32)
            n = min(len(s.pend_frames), F)
            fr[b, :n] = s.pend_frames[:n]
            nfr[b] = n
            spec_live = True
        if spec_live:
            base = np.asarray(
                self._spec(jnp.asarray(fr.reshape(B * F, L)))
            ).reshape(B, F, -1)

        # --- host pulls + bookkeeping (device now runs both stages)
        if decode_live:
            bps_np = np.asarray(bps)          # [F, B, J] — the tick's sync
            exits_np = np.asarray(exit_args)  # [F, B]
            for b, s in enumerate(self.slots):
                n = int(n_valid[b])
                if n == 0:
                    continue
                s.bp_hist.append(bps_np[:n, b].copy())
                s.exit_hist.append(exits_np[:n, b].copy())
                s.n_frames += n
                s.feat_q = s.feat_q[n:]
                self.frames_decoded += n
        if spec_live:
            for b, s in enumerate(self.slots):
                n = int(nfr[b])
                if n == 0:
                    continue
                rows = base[b, :n]
                if s.pend_energy is not None:
                    rows = rows.copy()
                    rows[:, 0] = s.pend_energy[:n]
                    s.pend_energy = s.pend_energy[n:]
                s.pend_frames = s.pend_frames[n:]
                out = s.fe.absorb(rows)
                if out.shape[0]:
                    s.feat_q = np.concatenate([s.feat_q, out])
                if s.finishing and len(s.pend_frames) == 0 and not s.flushed:
                    tail = s.fe.finalize_absorbed()
                    if tail.shape[0]:
                        s.feat_q = np.concatenate([s.feat_q, tail])
                    s.flushed = True
        self.ticks += 1

    # ---- results ----------------------------------------------------------

    def _slot_backtrace(self, s: _Slot, j_last: int):
        n = s.n_frames
        path = np.full(n, -1, np.int64)
        entered = np.zeros(n, bool)
        if n == 0:
            return path, entered
        bps = np.concatenate(s.bp_hist) if s.bp_hist else np.zeros(
            (0, self.J), np.uint8
        )
        exits = np.concatenate(s.exit_hist) if s.exit_hist else np.zeros(
            0, np.int32
        )
        j = int(j_last)
        for t in range(n - 1, 0, -1):
            path[t] = j
            bcode = bps[t, j]
            entered[t] = bcode == 2
            if bcode == 0:
                pass
            elif bcode == 1:
                j = j - 1
            elif bcode == 3:
                j = j - 2
            else:
                j = int(exits[t])
        path[0] = j
        entered[0] = True
        return path, entered

    def _words_of(self, path: np.ndarray, entered: np.ndarray) -> List[str]:
        toks = []
        for t in range(path.shape[0]):
            j = path[t]
            if j < 0:
                break
            if entered[t]:
                w = self.graph.labels[self.graph.chain_id[j]]
                if w not in ("<sil>", "sil"):
                    toks.append(w)
        return toks

    def partial(self, sid, delta_np: Optional[np.ndarray] = None) -> List[str]:
        """Best-so-far hypothesis. Pass ``delta_np = np.asarray(engine.delta)``
        when emitting partials for many sessions to pay one device pull."""
        b = self._sid_to_slot[sid]
        s = self.slots[b]
        if s.n_frames == 0:
            return []
        row = (delta_np[b] if delta_np is not None
               else np.asarray(self.delta[b]))
        path, entered = self._slot_backtrace(s, int(row.argmax()))
        return self._words_of(path, entered)

    def finalize(self, sid) -> Tuple[List[str], float]:
        """Exact final result (applies final_logp); frees the slot.
        All frames must have drained: drive tick() until drained(sid)."""
        b = self._sid_to_slot[sid]
        s = self.slots[b]
        assert s.flushed and len(s.feat_q) == 0, "finalize before drained()"
        audio_s = s.samples / self.fcfg.sample_rate
        if s.n_frames == 0:
            words: List[str] = []
        else:
            final = (np.asarray(self.delta[b])
                     + np.asarray(self.graphs["final_logp"][b]))
            path, entered = self._slot_backtrace(s, int(final.argmax()))
            words = self._words_of(path, entered)
        self.slots[b] = None
        del self._sid_to_slot[sid]
        self._reset_pending[b] = True
        return words, audio_s

    def run_to_drain(self, sid) -> Tuple[List[str], float]:
        """Convenience: tick until sid's frames drain, then finalize."""
        while not self.drained(sid):
            self.tick()
        return self.finalize(sid)
