"""Frame-synchronous Viterbi with an exact bigram word LM.

Extends the token-passing decoder (mogasr.decoder.viterbi) by factoring the
single non-emitting loop state into *per-chain* LM context: at each frame the
best exit of every chain c is combined with the [C, C] bigram matrix in one
max-plus contraction, so cross-word transitions carry exact P(w'|w) — no
context loss through a shared loop state, still O(J + C^2) per frame and
fully batched under ``lax.scan``.

The graph is a SINGLE shared loop graph (all utterances decode against the
same vocabulary), passed as flat [J] arrays from mogasr.hmm.graph.Graph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.hmm.graph import Graph
from mogasr.lm.ngram import BigramLm

NEG_INF = -1e30


class LmViterbiResult(NamedTuple):
    path: jax.Array     # [B, T] graph-state index per frame (-1 on padding)
    entered: jax.Array  # [B, T] bool: frame t entered its chain via the LM
    score: jax.Array    # [B]


@functools.partial(jax.jit, static_argnames=("acoustic_scale", "insertion_penalty"))
def _viterbi_lm_impl(
    emit_ll, n_frames,
    emit_id, self_logp, adv_logp, is_start, is_end, end_adv_logp, chain_id,
    pair_logp, lm_init, lm_final,
    acoustic_scale, insertion_penalty,
):
    B, T, P = emit_ll.shape
    J = emit_id.shape[0]
    C = pair_logp.shape[0]

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale,
        jnp.broadcast_to(emit_id[None, None, :], (B, T, J)),
        axis=2,
    )
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [T, B, J]

    enter_local = jnp.where(is_start, -insertion_penalty, NEG_INF)  # [J]
    exit_w = jnp.where(is_end, end_adv_logp, NEG_INF)               # [J]

    def chain_reduce(scores):  # [B, J] -> max/argmax per chain [B, C]
        def one(row):
            m = jax.ops.segment_max(row, chain_id, num_segments=C)
            # argmax within chain: smallest j achieving the max
            hit = row >= m[chain_id] - 1e-6
            js = jnp.where(hit, jnp.arange(J), J)
            a = jax.ops.segment_min(js, chain_id, num_segments=C)
            return m, a.astype(jnp.int32)

        return jax.vmap(one)(scores)

    delta0 = (
        enter_local
        + lm_init[chain_id]
        + emit_tm[0]
    )
    delta0 = jnp.where(is_start, delta0, NEG_INF)

    def step(delta, inputs):
        emit_t, t = inputs
        exit_scores = delta + exit_w                       # [B, J]
        chain_exit, exit_arg = chain_reduce(exit_scores)   # [B, C]
        # max-plus contraction with the bigram matrix
        combo = chain_exit[:, :, None] + pair_logp[None]   # [B, C, C']
        ent_chain = jnp.max(combo, axis=1)                 # [B, C']
        prev_chain = jnp.argmax(combo, axis=1).astype(jnp.int32)

        stay = delta + self_logp
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), delta[:, :-1] + adv_logp[1:][None, :]], axis=1
        )
        ent = ent_chain[:, chain_id] + enter_local[None, :]

        best = jnp.maximum(jnp.maximum(stay, adv), ent)
        bp = jnp.where(
            best == ent, jnp.uint8(2), jnp.where(best == adv, jnp.uint8(1), jnp.uint8(0))
        )
        bp = jnp.where(best == stay, jnp.uint8(0), bp)
        new_delta = best + emit_t

        active = (t < n_frames)[:, None]
        delta_out = jnp.where(active, new_delta, delta)
        bp = jnp.where(active, bp, jnp.uint8(0))
        return delta_out, (bp, exit_arg, prev_chain)

    ts = jnp.arange(1, T)
    delta_final, (bps, exit_args, prev_chains) = jax.lax.scan(
        step, delta0, (emit_tm[1:], ts), unroll=4
    )

    final_scores = delta_final + exit_w + lm_final[chain_id][None, :]
    score = jnp.max(final_scores, axis=1)
    j_final = jnp.argmax(final_scores, axis=1).astype(jnp.int32)

    def back_step(j, inputs):
        bp_t, exit_t, prev_t = inputs  # [B,J], [B,C], [B,C]
        b = jnp.take_along_axis(bp_t, j[:, None], axis=1)[:, 0]
        cur_chain = chain_id[j]                          # [B]
        c_prev = jnp.take_along_axis(prev_t, cur_chain[:, None], axis=1)[:, 0]
        j_ent = jnp.take_along_axis(exit_t, c_prev[:, None], axis=1)[:, 0]
        j_prev = jnp.where(b == 0, j, jnp.where(b == 1, j - 1, j_ent))
        return j_prev, (j, b == 2)

    j0, (path_rev, entered_rev) = jax.lax.scan(
        back_step, j_final, (bps[::-1], exit_args[::-1], prev_chains[::-1])
    )
    path = jnp.concatenate([j0[None], path_rev[::-1]], axis=0).T
    entered = jnp.concatenate([jnp.ones((1, B), bool), entered_rev[::-1]], axis=0).T
    mask = jnp.arange(T)[None, :] < n_frames[:, None]
    path = jnp.where(mask, path, -1)
    entered = entered & mask
    return LmViterbiResult(path, entered, score)


def viterbi_lm(
    emit_ll: jax.Array,   # [B, T, P]
    graph: Graph,         # shared loop graph (host object)
    lm: BigramLm,         # chains of `graph` must be lm.tokens, same order
    n_frames: jax.Array,
    acoustic_scale: float = 1.0,
    insertion_penalty: float = 0.0,
) -> LmViterbiResult:
    assert graph.labels == lm.tokens, "graph chains and LM tokens must align"
    is_start = graph.enter_logp > NEG_INF / 2
    is_end = graph.exit_logp > NEG_INF / 2
    return _viterbi_lm_impl(
        emit_ll,
        n_frames,
        jnp.asarray(graph.emit_id),
        jnp.asarray(graph.self_logp),
        jnp.asarray(graph.adv_logp),
        jnp.asarray(is_start),
        jnp.asarray(is_end),
        jnp.asarray(graph.exit_logp),
        jnp.asarray(graph.chain_id),
        jnp.asarray(lm.pair_logp),
        jnp.asarray(lm.init_logp),
        jnp.asarray(lm.final_logp),
        acoustic_scale,
        insertion_penalty,
    )


def path_to_tokens_lm(result: LmViterbiResult, graph: Graph):
    """Host-side token readout, mirroring viterbi.path_to_tokens."""
    path = np.asarray(result.path)
    entered = np.asarray(result.entered)
    B, T = path.shape
    out = []
    for b in range(B):
        toks = []
        for t in range(T):
            if path[b, t] < 0:
                break
            if entered[b, t]:
                toks.append(graph.labels[graph.chain_id[path[b, t]]])
        out.append(toks)
    return out
