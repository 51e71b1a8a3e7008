"""Frame-synchronous Viterbi with an exact bigram word LM.

Extends the token-passing decoder (mogasr.decoder.viterbi) by factoring the
single non-emitting loop state into *per-word* LM context: at each frame the
best exit of every word w is combined with the [W, W] bigram matrix in one
max-plus contraction, so cross-word transitions carry exact P(w'|w) — no
context loss through a shared loop state, still O(J + W^2) per frame and
fully batched under ``lax.scan``.

Multiple chains may map to the same LM word (multi-pronunciation lexicons):
``token_of_chain`` reduces chain exits to word exits with a second segment
max, and ``chain_entry_logp`` carries per-variant pronunciation log-priors on
word entry. With one chain per word this degenerates to the original
per-chain contraction (tested equivalent).

The graph is a SINGLE shared loop graph (all utterances decode against the
same vocabulary), passed as flat [J] arrays from mogasr.hmm.graph.Graph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

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


def _segmax(scores, seg_id, num_segments):
    """Per-segment (max, argmax-index) over the last axis of [B, N] scores."""
    n = scores.shape[-1]

    def one(row):
        m = jax.ops.segment_max(row, seg_id, num_segments=num_segments)
        hit = row >= m[seg_id] - 1e-6
        js = jnp.where(hit, jnp.arange(n), n)
        a = jax.ops.segment_min(js, seg_id, num_segments=num_segments)
        return m, a.astype(jnp.int32)

    return jax.vmap(one)(scores)


@functools.partial(
    jax.jit,
    static_argnames=("acoustic_scale", "insertion_penalty", "with_lattice"),
)
def _viterbi_lm_impl(
    emit_ll, n_frames,
    emit_id, self_logp, adv_logp, is_start, is_end, end_adv_logp, chain_id,
    token_of_chain, chain_entry_logp,
    pair_logp, lm_init, lm_final,
    acoustic_scale, insertion_penalty,
    with_lattice: bool = False,
    skip_logp=None,  # optional [J]: (j-2 -> j) skips (CTC topology)
):
    B, T, P = emit_ll.shape
    J = emit_id.shape[0]
    C = token_of_chain.shape[0]
    W = pair_logp.shape[0]
    word_of_state = token_of_chain[chain_id]  # [J]

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale,
        jnp.broadcast_to(emit_id[None, None, :], (B, T, J)),
        axis=2,
    )
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [T, B, J]

    enter_local = jnp.where(
        is_start, chain_entry_logp[chain_id] - insertion_penalty, NEG_INF
    )  # [J]
    exit_w = jnp.where(is_end, end_adv_logp, NEG_INF)  # [J]

    delta0 = enter_local + lm_init[word_of_state] + emit_tm[0]
    delta0 = jnp.where(is_start, delta0, NEG_INF)
    # Lattice entry-tracking carries: for the token currently at state j,
    # the frame it entered its chain and the cumulative score at entry
    # (predecessor path INCLUDING its LM transition into this word) — so
    # arc score = exit score - ent_base is LM-free (emissions + intra-chain
    # transitions + pron prior/penalty + exit weight).
    ent_t0 = jnp.zeros((B, J), jnp.int32)
    ent_base0 = jnp.broadcast_to(lm_init[word_of_state][None, :], (B, J))

    def lat_slice(delta_now, ent_t_now, ent_base_now):
        lat_sc, lat_arg = _segmax(delta_now + exit_w, chain_id, C)  # [B, C]
        s = jnp.take_along_axis(ent_t_now, lat_arg, axis=1)
        base = jnp.take_along_axis(ent_base_now, lat_arg, axis=1)
        return lat_sc, s, base

    def shift1(x, fill):
        return jnp.concatenate(
            [jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1
        )

    def shift2(x, fill):
        return jnp.concatenate(
            [jnp.full((B, 2), fill, x.dtype), x[:, :-2]], axis=1
        )

    def step(carry, inputs):
        delta, ent_t, ent_base = carry
        emit_t, t = inputs
        exit_scores = delta + exit_w                          # [B, J]
        chain_exit, exit_arg = _segmax(exit_scores, chain_id, C)   # [B, C]
        word_exit, word_arg = _segmax(chain_exit, token_of_chain, W)  # [B, W]
        # max-plus contraction with the bigram matrix
        combo = word_exit[:, :, None] + pair_logp[None]       # [B, W, W']
        ent_word = jnp.max(combo, axis=1)                     # [B, W']
        prev_word = jnp.argmax(combo, axis=1).astype(jnp.int32)

        stay = delta + self_logp
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), delta[:, :-1] + adv_logp[1:][None, :]], axis=1
        )
        ent = ent_word[:, word_of_state] + enter_local[None, :]

        best = jnp.maximum(jnp.maximum(stay, adv), ent)
        bp = jnp.where(
            best == ent, jnp.uint8(2), jnp.where(best == adv, jnp.uint8(1), jnp.uint8(0))
        )
        if skip_logp is not None:
            skp = jnp.concatenate(
                [jnp.full((B, 2), NEG_INF), delta[:, :-2] + skip_logp[2:][None, :]],
                axis=1,
            )
            bp = jnp.where(skp > best, jnp.uint8(3), bp)
            best = jnp.maximum(best, skp)
        bp = jnp.where(best == stay, jnp.uint8(0), bp)
        new_delta = best + emit_t

        active = (t < n_frames)[:, None]
        delta_out = jnp.where(active, new_delta, delta)
        bp = jnp.where(active, bp, jnp.uint8(0))

        if not with_lattice:
            return (delta_out, ent_t, ent_base), (bp, exit_arg, word_arg, prev_word)

        ent_t_new = jnp.where(
            bp == 2, t.astype(jnp.int32),
            jnp.where(bp == 1, shift1(ent_t, 0),
                      jnp.where(bp == 3, shift2(ent_t, 0), ent_t)),
        )
        ent_base_new = jnp.where(
            bp == 2, ent_word[:, word_of_state],
            jnp.where(bp == 1, shift1(ent_base, NEG_INF),
                      jnp.where(bp == 3, shift2(ent_base, NEG_INF), ent_base)),
        )
        ent_t_new = jnp.where(active, ent_t_new, ent_t)
        ent_base_new = jnp.where(active, ent_base_new, ent_base)
        lat = lat_slice(delta_out, ent_t_new, ent_base_new)
        return (delta_out, ent_t_new, ent_base_new), (
            bp, exit_arg, word_arg, prev_word, lat
        )

    ts = jnp.arange(1, T)
    (delta_final, _, _), scanned = jax.lax.scan(
        step, (delta0, ent_t0, ent_base0), (emit_tm[1:], ts), unroll=4
    )
    if with_lattice:
        bps, exit_args, word_args, prev_words, lats = scanned
        lat0 = lat_slice(delta0, ent_t0, ent_base0)
        lat_score = jnp.concatenate([lat0[0][None], lats[0]], axis=0)  # [T, B, C]
        lat_start = jnp.concatenate([lat0[1][None], lats[1]], axis=0)
        lat_base = jnp.concatenate([lat0[2][None], lats[2]], axis=0)
        lattice = (
            jnp.transpose(lat_score, (1, 0, 2)),  # [B, T, C]
            jnp.transpose(lat_start, (1, 0, 2)),
            jnp.transpose(lat_base, (1, 0, 2)),
        )
    else:
        bps, exit_args, word_args, prev_words = scanned

    final_scores = delta_final + exit_w + lm_final[word_of_state][None, :]
    score = jnp.max(final_scores, axis=1)
    j_final = jnp.argmax(final_scores, axis=1).astype(jnp.int32)

    def back_step(j, inputs):
        bp_t, exit_t, warg_t, prevw_t = inputs  # [B,J], [B,C], [B,W], [B,W]
        b = jnp.take_along_axis(bp_t, j[:, None], axis=1)[:, 0]
        cur_word = word_of_state[j]                              # [B]
        w_prev = jnp.take_along_axis(prevw_t, cur_word[:, None], axis=1)[:, 0]
        c_prev = jnp.take_along_axis(warg_t, w_prev[:, None], axis=1)[:, 0]
        j_ent = jnp.take_along_axis(exit_t, c_prev[:, None], axis=1)[:, 0]
        j_prev = jnp.where(
            b == 0, j,
            jnp.where(b == 1, j - 1, jnp.where(b == 3, j - 2, j_ent)),
        )
        return j_prev, (j, b == 2)

    j0, (path_rev, entered_rev) = jax.lax.scan(
        back_step, j_final, (bps[::-1], exit_args[::-1], word_args[::-1], prev_words[::-1])
    )
    path = jnp.concatenate([j0[None], path_rev[::-1]], axis=0).T
    entered = jnp.concatenate([jnp.ones((1, B), bool), entered_rev[::-1]], axis=0).T
    mask = jnp.arange(T)[None, :] < n_frames[:, None]
    path = jnp.where(mask, path, -1)
    entered = entered & mask
    result = LmViterbiResult(path, entered, score)
    if with_lattice:
        return result, lattice
    return result


def chain_token_map(graph: Graph, lm: BigramLm) -> np.ndarray:
    """[n_chains] LM-token index per graph chain (labels may repeat under
    multi-pronunciation graphs — every label must be an LM token)."""
    tok_idx = {t: i for i, t in enumerate(lm.tokens)}
    missing = [l for l in graph.labels if l not in tok_idx]
    assert not missing, f"graph chains not in LM vocabulary: {missing[:5]}"
    return np.asarray([tok_idx[l] for l in graph.labels], np.int32)


def viterbi_lm(
    emit_ll: jax.Array,   # [B, T, P]
    graph: Graph,         # shared loop graph (host object)
    lm: BigramLm,         # every graph chain label must be an lm token
    n_frames: jax.Array,
    acoustic_scale: float = 1.0,
    insertion_penalty: float = 0.0,
    chain_entry_logp: Optional[np.ndarray] = None,  # [n_chains] pron log-priors
    with_lattice: bool = False,
) -> LmViterbiResult:
    """with_lattice=True additionally returns (lat_score, lat_start, lat_base)
    [B, T, C] device arrays: for every (frame t, chain c), the best score of a
    path ending chain c at t, that token's chain-entry frame, and its
    cumulative score at entry (incl. the LM transition) — the inputs to
    mogasr.decoder.lattice.lattices_from_pass."""
    token_of_chain = chain_token_map(graph, lm)
    n_chains = len(graph.labels)
    if chain_entry_logp is None:
        chain_entry_logp = np.zeros(n_chains, np.float32)
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
        jnp.asarray(token_of_chain),
        jnp.asarray(chain_entry_logp, dtype=jnp.float32),
        jnp.asarray(lm.pair_logp),
        jnp.asarray(lm.init_logp),
        jnp.asarray(lm.final_logp),
        acoustic_scale,
        insertion_penalty,
        with_lattice=with_lattice,
        skip_logp=None if graph.skip_logp is None else jnp.asarray(graph.skip_logp),
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
