"""On-device frame-synchronous Viterbi over chain+loop graphs.

The decode hot loop (SURVEY.md §3.3): a ``lax.scan`` over frames; each step is
a handful of batched [B, J] vector ops plus one max-reduce for the loop state
— max-plus recursion on the MXU/VPU, no data-dependent shapes (SURVEY.md §7
hard-part #2). Used for both forced alignment (align graphs) and free decode
(loop graphs); beam pruning is an optional mask, identical results at beam=inf
(tested per SURVEY.md §4).

Backtrace also runs on device as a reverse scan over stored backpointers
(uint8 per (frame, state): stay/advance/enter + an int32 per-frame exit
argmax), so the only host transfer is the final [B, T] path.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


class ViterbiResult(NamedTuple):
    path: jax.Array     # [B, T] graph-state index per frame (-1 on padding)
    entered: jax.Array  # [B, T] bool: frame t entered its chain via the loop
    score: jax.Array    # [B] total best log-prob (acoustic*scale + transition)


@functools.partial(
    jax.jit, static_argnames=("acoustic_scale", "beam", "with_backtrace")
)
def viterbi(
    emit_ll: jax.Array,        # [B, T, P] pdf log-likelihoods
    graphs: Dict[str, jax.Array],  # batch_graphs() output, on device
    n_frames: jax.Array,       # [B]
    acoustic_scale: float = 1.0,
    beam: float = 0.0,         # 0 = exact (no pruning)
    with_backtrace: bool = True,
) -> ViterbiResult:
    B, T, P = emit_ll.shape
    emit_id = graphs["emit_id"]          # [B, J]
    self_logp = graphs["self_logp"]
    adv_logp = graphs["adv_logp"]
    enter_logp = graphs["enter_logp"]
    exit_logp = graphs["exit_logp"]
    # optional (j-2 -> j) skip transitions (CTC optional-blank topology)
    skip_logp = graphs.get("skip_logp")
    J = emit_id.shape[1]

    # Pre-gather emissions for every (frame, graph-state) in ONE gather —
    # [B, T, J] — instead of a per-step gather inside the scan (measured ~2x
    # on the scan-bound decode).
    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )  # [B, T, J]
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [T, B, J]

    delta0 = graphs["init_logp"] + emit_tm[0]

    def step(delta, inputs):
        emit_t, t = inputs  # emit_t: [B, J] already graph-indexed
        exit_scores = delta + exit_logp
        exit_best = jnp.max(exit_scores, axis=1)              # [B]
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
        # prefer stay on ties (bp computed above prefers enter then adv; make
        # stay win exact ties for deterministic alignments)
        bp = jnp.where(best == stay, jnp.uint8(0), bp)

        new_delta = best + emit_t
        if beam > 0:
            thresh = jnp.max(new_delta, axis=1, keepdims=True) - beam
            new_delta = jnp.where(new_delta >= thresh, new_delta, NEG_INF)

        active = (t < n_frames)[:, None]
        delta_out = jnp.where(active, new_delta, delta)
        bp = jnp.where(active, bp, jnp.uint8(0))
        return delta_out, (bp, exit_arg)

    ts = jnp.arange(1, T)
    delta_final, (bps, exit_args) = jax.lax.scan(
        step, delta0, (emit_tm[1:], ts), unroll=4
    )
    # bps: [T-1, B, J]; exit_args: [T-1, B]

    final_scores = delta_final + graphs["final_logp"]
    score = jnp.max(final_scores, axis=1)
    j_final = jnp.argmax(final_scores, axis=1).astype(jnp.int32)

    if not with_backtrace:
        empty = jnp.zeros((B, T), jnp.int32)
        return ViterbiResult(empty, empty.astype(bool), score)

    def back_step(j, inputs):
        bp_t, exit_t = inputs
        b = jnp.take_along_axis(bp_t, j[:, None], axis=1)[:, 0]  # [B]
        j_prev = jnp.where(
            b == 0, j, jnp.where(b == 1, j - 1, jnp.where(b == 3, j - 2, exit_t))
        )
        return j_prev, (j, b == 2)

    j0, (path_rev, entered_rev) = jax.lax.scan(
        back_step, j_final, (bps[::-1], exit_args[::-1])
    )
    path = jnp.concatenate([j0[None], path_rev[::-1]], axis=0).T   # [B, T]
    entered = jnp.concatenate(
        [jnp.ones((1, B), bool), entered_rev[::-1]], axis=0
    ).T
    mask = jnp.arange(T)[None, :] < n_frames[:, None]
    path = jnp.where(mask, path, -1)
    entered = entered & mask
    return ViterbiResult(path, entered, score)


def path_to_pdfs(result: ViterbiResult, graphs: Dict[str, jax.Array]) -> jax.Array:
    """[B, T] pdf id per frame (-1 on padding) — the EM/NN training labels."""
    emit_id = graphs["emit_id"]
    safe = jnp.maximum(result.path, 0)
    pdfs = jnp.take_along_axis(emit_id, safe, axis=1)
    return jnp.where(result.path >= 0, pdfs, -1)


def path_to_tokens(result: ViterbiResult, graph_labels, chain_id: np.ndarray):
    """Host-side: collapse a decoded path into token label sequences per utt.

    chain_id: [B, J]; graph_labels: per-utterance list of chain labels.
    """
    path = np.asarray(result.path)
    entered = np.asarray(result.entered)
    B, T = path.shape
    out = []
    for b in range(B):
        labels = graph_labels[b] if isinstance(graph_labels[0], (list, tuple)) else graph_labels
        toks = []
        for t in range(T):
            if path[b, t] < 0:
                break
            if entered[b, t]:
                toks.append(labels[chain_id[b, path[b, t]]])
        out.append(toks)
    return out
