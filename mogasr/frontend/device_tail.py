"""Batched DEVICE-resident streaming delta tail — round-5 groundwork.

Why: the serving engines' measured ceiling is the host-mediated feature
path — every tick pulls the batched spectral output to host so each slot's
`StreamingFrontend.absorb` (deltas + CMVN, numpy) can run, paying a ~30 ms
tunnel sync plus 1-core host loops per tick (docs/TPU_NOTES.md, round-4
AED-engine and capacity-ladder sections). Keeping the tail on device would
let a tick run sync-free end-to-end.

This module is the DELTA half of that plan, as a standalone batched jitted
step with per-slot carries, EXACT against the per-slot host tail
(tests/test_device_tail.py):

- state: a [B, C, D_base] rolling window holding, per slot, the frames
  from ``emitted - lag`` onward (identical trim policy to the host
  StreamingFrontend's ``_base_buf``), with a valid-count vector — the
  array edges therefore coincide with the host rolling buffer's edges, so
  regression-delta edge clamping lands on exactly the same frames
  (utterance start until ``lag`` frames are emitted, utterance end only at
  finalize).
- step: append up to F new base rows per slot (ragged, masked), compute
  order-``delta_order`` regression deltas over the valid region via the
  SAME batched helper the offline frontend jit uses
  (jax_frontend._deltas_batched), and emit every frame whose full
  ``lag``-frame lookahead is present.

Sliding CMVN stays host-side for now: the host path accumulates its
trailing-window statistics in float64, which the TPU only emulates —
matching it bit-for-bit on device needs compensated f32 arithmetic and is
the remaining piece before the engines can switch over. NOT yet wired into
mogasr.serving.engine.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.config import FrontendConfig
from mogasr.frontend.jax_frontend import _deltas_batched


class TailState(NamedTuple):
    buf: jax.Array    # [B, C, D_base] rolling window (emitted - lag ...)
    valid: jax.Array  # [B] rows of buf that are real
    off: jax.Array    # [B] relative index of the first un-emitted frame
                      # (= min(frames_emitted, lag) — matches the host
                      # buffer's emitted - buf_start)


def tail_init(cfg: FrontendConfig, batch: int, chunk: int) -> TailState:
    """Carries for ``batch`` slots absorbing up to ``chunk`` rows per step."""
    lag = cfg.delta_order * cfg.delta_window
    C = 2 * lag + chunk
    return TailState(
        jnp.zeros((batch, C, cfg.base_dim), jnp.float32),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("delta_order", "delta_window"))
def _tail_step(
    state: TailState,
    new_rows: jax.Array,   # [B, F, D_base]
    n_new: jax.Array,      # [B]
    final: jax.Array,      # [B] bool — flush the lookahead tail (end)
    delta_order: int,
    delta_window: int,
) -> Tuple[TailState, jax.Array, jax.Array]:
    """-> (state', out [B, F + lag, feat_dim], n_out [B]).

    out[b, :n_out[b]] are the newly-final full-context feature rows for
    slot b — identical to what the host tail would emit for the same
    absorb() call (tested).
    """
    B, C, D = state.buf.shape
    F = new_rows.shape[1]
    lag = delta_order * delta_window

    # ragged append: buf'[b, i] = buf[b, i] if i < valid else new[b, i-valid]
    idx = jnp.arange(C)[None, :]                     # [1, C]
    take_new = idx - state.valid[:, None]            # [B, C]
    appended = jnp.where(
        (idx < state.valid[:, None])[..., None],
        state.buf,
        jnp.take_along_axis(
            new_rows, jnp.clip(take_new, 0, F - 1)[..., None], axis=1),
    )
    appended = jnp.where(
        (idx < (state.valid + n_new)[:, None])[..., None], appended, 0.0)
    v = state.valid + n_new                          # [B]

    # full-order deltas over the valid region; _deltas_batched clamps at
    # [0, v) — the same edges as the host rolling buffer
    feats = [appended]
    prev = appended
    for _ in range(delta_order):
        prev = _deltas_batched(prev, v, delta_window)
        feats.append(prev)
    full = jnp.concatenate(feats, axis=-1)           # [B, C, feat_dim]

    # emit every frame with a complete lookahead; un-emitted frames start
    # at state.off relative to the buffer (0 at utterance start, `lag`
    # once warmed — exactly the host buffer's emitted - buf_start)
    lo = state.off                                   # [B]
    t_ready = jnp.where(final, v, v - lag)
    n_out = jnp.clip(t_ready - lo, 0, F + lag)
    out_idx = lo[:, None] + jnp.arange(F + lag)[None, :]
    out = jnp.take_along_axis(
        full, jnp.clip(out_idx, 0, C - 1)[..., None], axis=1)
    out = jnp.where(
        (jnp.arange(F + lag)[None, :] < n_out[:, None])[..., None], out, 0.0)

    # trim: keep `lag` rows of context before the next un-emitted frame
    emitted_rel = lo + n_out                         # rows now emitted (rel)
    drop = jnp.maximum(emitted_rel - lag, 0)
    keep_idx = drop[:, None] + jnp.arange(C)[None, :]
    buf2 = jnp.take_along_axis(
        appended, jnp.clip(keep_idx, 0, C - 1)[..., None], axis=1)
    v2 = v - drop
    buf2 = jnp.where((idx < v2[:, None])[..., None], buf2, 0.0)
    off2 = emitted_rel - drop
    # a finalized slot resets for reuse
    buf2 = jnp.where(final[:, None, None], 0.0, buf2)
    v2 = jnp.where(final, 0, v2)
    off2 = jnp.where(final, 0, off2)
    return TailState(buf2, v2, off2), out, n_out


def tail_step(cfg: FrontendConfig, state: TailState, new_rows, n_new,
              final=None):
    """Batched tail absorb: (state, base rows [B, F, D_base], counts [B])
    -> (state', full-context feature rows [B, F + lag, feat_dim], counts).
    ``final[b]`` flushes slot b's lookahead tail with end-of-utterance edge
    replication and resets its carry."""
    B = new_rows.shape[0]
    lag = cfg.delta_order * cfg.delta_window
    chunk = state.buf.shape[1] - 2 * lag   # tail_init: C = 2*lag + chunk
    if new_rows.shape[1] > chunk:
        # the rolling buffer sizes emission for at most `chunk` rows per
        # step; more would silently drop frames (ADVICE r4)
        raise ValueError(
            f"tail_step got {new_rows.shape[1]} rows but the state was "
            f"initialized for chunks of {chunk}")
    if final is None:
        final = jnp.zeros((B,), bool)
    return _tail_step(
        state, jnp.asarray(new_rows, jnp.float32), jnp.asarray(n_new),
        jnp.asarray(final), cfg.delta_order, cfg.delta_window,
    )
