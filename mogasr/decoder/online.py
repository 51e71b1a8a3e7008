"""Online (streaming) Viterbi decoding: chunked, exact, with partial results.

The offline decoder (mogasr.decoder.viterbi) scans all T frames in one jit.
This module runs the SAME max-plus recursion chunk-by-chunk so hypotheses
are available while audio is still arriving — pairing with the streaming
front end (mogasr.frontend.streaming) for end-to-end online transcription:

- device: one jitted chunk step (fixed chunk length -> one compile), carrying
  the [B, J] Viterbi state between chunks;
- host: backpointers accumulate per chunk (uint8 [Tc, B, J] — small);
- ``partial()`` backtraces from the current best state at any time — the
  hypothesis PREFIX that all surviving paths share is stable and will appear
  unchanged in the final result;
- ``finalize()`` is bit-exact with the offline decoder on the same frames
  (tested), because the recursion is identical — chunking only changes where
  the scan is cut.

Exactness over latency: no pruning beyond the offline decoder's optional
beam, no path merging approximations.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("acoustic_scale", "beam"))
def _chunk_step(
    delta: jax.Array,        # [B, J] carry (NEG_INF rows before first frame)
    started: jax.Array,      # [B] bool: utterance has consumed >= 1 frame
    emit_ll: jax.Array,      # [B, Tc, P] this chunk's scores
    n_valid: jax.Array,      # [B] valid frames in this chunk
    graphs: Dict[str, jax.Array],
    acoustic_scale: float,
    beam: float,
):
    B, Tc, P = emit_ll.shape
    emit_id = graphs["emit_id"]
    self_logp = graphs["self_logp"]
    adv_logp = graphs["adv_logp"]
    enter_logp = graphs["enter_logp"]
    exit_logp = graphs["exit_logp"]
    # optional (j-2 -> j) skips (CTC optional-blank topology), as in viterbi.py
    skip_logp = graphs.get("skip_logp")

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )  # [B, Tc, J]
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [Tc, B, J]

    def step(carry, inputs):
        delta, started = carry
        emit_t, t = inputs
        # first valid frame of an utterance initializes from init_logp
        init_delta = graphs["init_logp"] + emit_t

        exit_scores = delta + exit_logp
        exit_best = jnp.max(exit_scores, axis=1)
        exit_arg = jnp.argmax(exit_scores, axis=1).astype(jnp.int32)
        stay = delta + self_logp
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), delta[:, :-1] + adv_logp[:, 1:]], axis=1
        )
        ent = exit_best[:, None] + enter_logp
        best = jnp.maximum(jnp.maximum(stay, adv), ent)
        bp = jnp.where(
            best == ent, jnp.uint8(2), jnp.where(best == adv, jnp.uint8(1), jnp.uint8(0))
        )
        if skip_logp is not None:
            skip = jnp.concatenate(
                [jnp.full((B, 2), NEG_INF), delta[:, :-2] + skip_logp[:, 2:]],
                axis=1,
            )
            bp = jnp.where(skip > best, jnp.uint8(3), bp)
            best = jnp.maximum(best, skip)
        bp = jnp.where(best == stay, jnp.uint8(0), bp)
        new_delta = best + emit_t
        if beam > 0:
            thresh = jnp.max(new_delta, axis=1, keepdims=True) - beam
            new_delta = jnp.where(new_delta >= thresh, new_delta, NEG_INF)

        new_delta = jnp.where(started[:, None], new_delta, init_delta)
        bp = jnp.where(started[:, None], bp, jnp.uint8(0))

        active = (t < n_valid)[:, None]
        delta_out = jnp.where(active, new_delta, delta)
        started_out = started | (t < n_valid)
        bp = jnp.where(active, bp, jnp.uint8(0))
        return (delta_out, started_out), (bp, exit_arg)

    (delta_f, started_f), (bps, exit_args) = jax.lax.scan(
        step, (delta, started), (emit_tm, jnp.arange(Tc)), unroll=4
    )
    return delta_f, started_f, bps, exit_args


class OnlineDecoder:
    """Incremental Viterbi over a shared loop graph for a batch of streams.

    graphs: batch_graphs() output (device arrays, [B, J]).
    Feed chunks with process(); read partial() any time; finalize() returns
    the exact full-utterance result.
    """

    def __init__(
        self,
        graphs: Dict[str, jax.Array],
        acoustic_scale: float = 1.0,
        beam: float = 0.0,
    ):
        self.graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
        self.acoustic_scale = acoustic_scale
        self.beam = beam
        B, J = self.graphs["emit_id"].shape
        self.B, self.J = B, J
        self.delta = jnp.full((B, J), NEG_INF)
        self.started = jnp.zeros((B,), bool)
        self._bps: List[np.ndarray] = []        # per chunk [Tc, B, J] uint8
        self._exit_args: List[np.ndarray] = []  # per chunk [Tc, B]
        self.n_frames = np.zeros(B, np.int64)

    def process(self, emit_ll: jax.Array, n_valid) -> None:
        """Consume a scored chunk [B, Tc, P]; n_valid: [B] frames valid."""
        n_valid = np.asarray(n_valid)
        self.delta, self.started, bps, exit_args = _chunk_step(
            self.delta, self.started, emit_ll, jnp.asarray(n_valid),
            self.graphs, self.acoustic_scale, self.beam,
        )
        self._bps.append(np.asarray(bps))
        self._exit_args.append(np.asarray(exit_args))
        self.n_frames += n_valid

    def _backtrace(self, j_last: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host backtrace from state j_last at each stream's last frame."""
        bps = np.concatenate(self._bps, axis=0) if self._bps else np.zeros(
            (0, self.B, self.J), np.uint8
        )
        exits = np.concatenate(self._exit_args, axis=0) if self._exit_args else (
            np.zeros((0, self.B), np.int32)
        )
        T = int(self.n_frames.max()) if self.B else 0
        path = np.full((self.B, bps.shape[0] if bps.size else 0), -1, np.int64)
        entered = np.zeros_like(path, bool)
        for b in range(self.B):
            n = int(self.n_frames[b])
            if n == 0:
                continue
            j = int(j_last[b])
            for t in range(n - 1, 0, -1):
                path[b, t] = j
                bcode = bps[t, b, j]
                entered[b, t] = bcode == 2
                if bcode == 0:
                    pass
                elif bcode == 1:
                    j = j - 1
                elif bcode == 3:
                    j = j - 2
                else:
                    j = int(exits[t, b])
            path[b, 0] = j
            entered[b, 0] = True
        return path, entered

    def partial(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Best-so-far (path, entered, score) using the running best state.

        The tail may still change as more audio arrives; prefixes shared by
        all surviving paths are stable.
        """
        delta = np.asarray(self.delta)
        j_last = delta.argmax(axis=1)
        score = delta.max(axis=1)
        path, entered = self._backtrace(j_last)
        return path, entered, score

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact end-of-stream result: applies final_logp like the offline
        decoder, then backtraces. Returns (path [B, T], entered, score [B])."""
        final = np.asarray(self.delta) + np.asarray(self.graphs["final_logp"])
        j_last = final.argmax(axis=1)
        score = final.max(axis=1)
        path, entered = self._backtrace(j_last)
        return path, entered, score
