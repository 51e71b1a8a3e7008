"""Pallas Viterbi forward: the decode scan as ONE kernel, graph VMEM-resident.

decoder/viterbi.py runs the max-plus recursion as a ``lax.scan`` whose per-
step kernel re-reads the loop-invariant graph arrays (self/adv/enter/exit
log-probs, [B, J] each) from HBM every frame.  This module runs the WHOLE
forward pass as one ``pallas_call`` with a sequential grid over frames
(TPU grids execute in order), the same shape as the Pallas LSTM
(am/lstm_pallas.py):

  - the four graph arrays + init have constant index maps, so Mosaic keeps
    them resident in VMEM for all T steps — one HBM read per decode
    instead of one per frame (~4·B·J·4 bytes/frame saved);
  - the delta row [B, J] lives in VMEM scratch and never touches HBM;
  - the per-frame emission row streams through the double-buffered block
    pipeline; the backpointer row [B, J] uint8 and exit-argmax [B] stream
    out the same way.

Per step: lane-shift + adds + three maxima + one lane max-reduce (VPU).
EXACT equality with decoder/viterbi.py is the contract — same tie-breaking
(stay beats advance beats enter on ties, replicated operation-for-
operation), same frozen rows past n_frames — and is tested bitwise on
align and loop graphs with ragged batches.  The backtrace reverse scan
stays on XLA (it is [T, B]-sized, trivially cheap).

Production switch policy (CLAUDE.md): opt-in until the on-chip A/B row
(bench_families ``gmm_vit_pallas``) shows a real win; beam pruning and CTC
skip transitions stay on the XLA path for now (viterbi.py).

No reference implementation exists for this capability (the
/root/reference mount is empty — SURVEY.md §0).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mogasr.decoder.viterbi import NEG_INF, ViterbiResult


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _vit_kernel(
    nf_ref,        # [B, 1] int32
    emit_ref,      # [1, B, J] this frame's graph-gathered emissions
    selfp_ref,     # [B, J] resident
    advp_ref,      # [B, J] resident
    enterp_ref,    # [B, J] resident
    exitp_ref,     # [B, J] resident
    initp_ref,     # [B, J] resident
    bp_ref,        # [1, B, J] uint8 out
    exitarg_ref,   # [1, 8, B] int32 out (8 sublanes: Mosaic needs the
                   # second-to-last block dim 8-divisible; row 0 is the data)
    delta_ref,     # [B, J] f32 out (final row, constant map)
    delta_scr,     # [B, J] f32 scratch
    *,
    J: int,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        delta_scr[:] = initp_ref[:] + emit_ref[0]
        bp_ref[0] = jnp.zeros_like(bp_ref[0])
        exitarg_ref[0] = jnp.zeros_like(exitarg_ref[0])

    @pl.when(t > 0)
    def _():
        delta = delta_scr[:]
        B = delta.shape[0]
        exit_scores = delta + exitp_ref[:]
        exit_best = jnp.max(exit_scores, axis=1, keepdims=True)   # [B, 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, J), 1)
        # first-match argmax (XLA argmax semantics) via min-index over ties
        exit_arg = jnp.min(
            jnp.where(exit_scores == exit_best, lane, J), axis=1
        ).astype(jnp.int32)                                       # [B]

        stay = delta + selfp_ref[:]
        delta_shift = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, delta.dtype), delta[:, : J - 1]],
            axis=1,
        )
        adv = delta_shift + advp_ref[:]
        ent = exit_best + enterp_ref[:]
        best = jnp.maximum(jnp.maximum(stay, adv), ent)
        # int32 selects: Mosaic cannot relayout the (8,128)-tiled f32
        # comparison masks onto the (32,128) int8 tiling a uint8 select
        # would need ("Invalid relayout ... vector<...xi1>"); compute in
        # i32 and pack to u8 only at the store.
        bp = jnp.where(
            best == ent, jnp.int32(2),
            jnp.where(best == adv, jnp.int32(1), jnp.int32(0)),
        )
        bp = jnp.where(best == stay, jnp.int32(0), bp)
        new_delta = best + emit_ref[0]

        active = nf_ref[:] > t                                    # [B, 1]
        delta_scr[:] = jnp.where(active, new_delta, delta)
        bp_ref[0] = jnp.where(active, bp, 0).astype(jnp.uint8)
        exitarg_ref[0] = jnp.broadcast_to(
            jnp.where(active[:, 0], exit_arg, 0)[None, :], exitarg_ref[0].shape
        )

    delta_ref[:] = delta_scr[:]


@functools.partial(
    jax.jit, static_argnames=("acoustic_scale", "with_backtrace", "interpret")
)
def viterbi_pallas(
    emit_ll: jax.Array,            # [B, T, P] pdf log-likelihoods
    graphs: Dict[str, jax.Array],  # batch_graphs() output
    n_frames: jax.Array,           # [B]
    acoustic_scale: float = 1.0,
    with_backtrace: bool = True,
    interpret: bool | None = None,
) -> ViterbiResult:
    """Drop-in for decoder.viterbi(beam=0) on plain chain+loop graphs
    (no skip transitions) — exact same result, one fused device kernel."""
    if interpret is None:
        interpret = not _on_tpu()
    if graphs.get("skip_logp") is not None:
        raise NotImplementedError(
            "viterbi_pallas covers plain chain+loop graphs; CTC skip "
            "topologies decode via decoder.viterbi"
        )
    B, T, _P = emit_ll.shape
    emit_id = graphs["emit_id"]
    J = emit_id.shape[1]
    Bp = _round_up(max(B, 8), 8)
    Jp = _round_up(max(J, 128), 128)

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )                                                             # [B, T, J]
    emit_tm = jnp.zeros((T, Bp, Jp), jnp.float32)
    emit_tm = emit_tm.at[:, :B, :J].set(
        jnp.transpose(emit_graph, (1, 0, 2)).astype(jnp.float32))

    def padg(name):
        g = jnp.full((Bp, Jp), NEG_INF, jnp.float32)
        return g.at[:B, :J].set(graphs[name].astype(jnp.float32))

    selfp, advp = padg("self_logp"), padg("adv_logp")
    enterp, exitp = padg("enter_logp"), padg("exit_logp")
    initp = padg("init_logp")
    nf = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        n_frames.astype(jnp.int32))

    const = lambda t: (0, 0)  # noqa: E731
    bps, exit_args, delta_final = pl.pallas_call(
        functools.partial(_vit_kernel, J=Jp),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Bp, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Jp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, Jp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Bp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, Jp), jnp.uint8),
            jax.ShapeDtypeStruct((T, 8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, Jp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, Jp), jnp.float32)],
        interpret=interpret,
    )(nf, emit_tm, selfp, advp, enterp, exitp, initp)

    delta_final = delta_final[:B, :J]
    bps = bps[1:, :B, :J]           # step t row (t >= 1), matching viterbi.py
    exit_args = exit_args[1:, 0, :B]

    final_scores = delta_final + graphs["final_logp"]
    score = jnp.max(final_scores, axis=1)
    j_final = jnp.argmax(final_scores, axis=1).astype(jnp.int32)

    if not with_backtrace:
        empty = jnp.zeros((B, T), jnp.int32)
        return ViterbiResult(empty, empty.astype(bool), score)

    # identical reverse scan to decoder/viterbi.py
    def back_step(j, inputs):
        bp_t, exit_t = inputs
        b = jnp.take_along_axis(bp_t, j[:, None], axis=1)[:, 0]
        j_prev = jnp.where(b == 0, j, jnp.where(b == 1, j - 1, exit_t))
        return j_prev, (j, b == 2)

    j0, (path_rev, entered_rev) = jax.lax.scan(
        back_step, j_final, (bps[::-1], exit_args[::-1])
    )
    path = jnp.concatenate([j0[None], path_rev[::-1]], axis=0).T
    entered = jnp.concatenate(
        [jnp.ones((1, B), bool), entered_rev[::-1]], axis=0
    ).T
    mask = jnp.arange(T)[None, :] < n_frames[:, None]
    path = jnp.where(mask, path, -1)
    entered = entered & mask
    return ViterbiResult(path, entered, score)
