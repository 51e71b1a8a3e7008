"""Connectionist Temporal Classification: alignment-free training + decoding.

Capability beyond the attested inventory (SURVEY.md §0: reference unreadable;
BASELINE.json attests a hybrid NN-HMM frame classifier, configs[3]): CTC
removes the GMM forced-alignment bootstrap entirely — the network trains
directly on (features, phone sequence) pairs.

TPU-native shape of the implementation:

- The CTC forward recursion is a ``lax.scan`` over frames on the
  blank-interleaved label sequence z (S = 2L+1 states), exactly the same
  batched [B, S] log-semiring vector-op structure as
  :mod:`mogasr.decoder.forward_backward` — no data-dependent shapes, padding
  frozen out the same way (padded frames carry alpha forward unchanged).
- Written from first principles; ``tests/test_ctc.py`` cross-checks values
  AND gradients against ``optax.ctc_loss`` as an independent oracle.
- Lexicon/LM-constrained CTC decoding reuses the existing chain+loop decode
  graphs (:mod:`mogasr.hmm.graph`) with the CTC topology expressed as
  optional-blank states and ``skip_logp`` (j-2 -> j) transitions, so the
  same jitted Viterbi kernel serves GMM-HMM, hybrid NN-HMM and CTC decoding.

Blank convention: blank is the LAST vocabulary index (V-1), so CTC unit ids
0..n_phones-1 coincide with lexicon phone ids.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mogasr.config import DecodeConfig, TrainConfig
from mogasr.hmm import graph as gr
from mogasr.hmm.lexicon import Lexicon

NEG_INF = -1e30


# --------------------------------------------------------------------------
# Loss
# --------------------------------------------------------------------------


def ctc_expand(
    labels: jax.Array,    # [B, L] unit ids, -1 padding
    n_labels: jax.Array,  # [B]
    blank_id: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Blank-interleave labels: z = (b, y1, b, y2, ..., yL, b), S = 2L+1.

    Returns (z [B, S], skip_ok [B, S] bool, valid_s [B, S] bool) where
    skip_ok[s] marks states reachable by the s-2 -> s CTC skip (label states
    whose previous label differs) and valid_s masks states beyond each
    utterance's own 2*n_labels+1.
    """
    B, L = labels.shape
    S = 2 * L + 1
    safe = jnp.maximum(labels, 0)
    z = jnp.full((B, S), blank_id, jnp.int32)
    z = z.at[:, 1::2].set(safe.astype(jnp.int32))
    s_idx = jnp.arange(S, dtype=jnp.int32)
    valid_s = s_idx[None, :] < (2 * n_labels[:, None] + 1)
    zm2 = jnp.concatenate([jnp.full((B, 2), -1, jnp.int32), z[:, :-2]], axis=1)
    is_label = (s_idx % 2 == 1)[None, :]
    skip_ok = is_label & (s_idx[None, :] >= 2) & (z != zm2) & valid_s
    return z, skip_ok, valid_s


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(
    logits: jax.Array,    # [B, T, V] raw scores (softmax applied here)
    n_frames: jax.Array,  # [B]
    labels: jax.Array,    # [B, L] unit ids, -1 padding
    n_labels: jax.Array,  # [B]
    blank_id: Optional[int] = None,
) -> jax.Array:
    """Per-utterance CTC negative log-likelihood -log p(y|x), shape [B].

    Standard alpha recursion over the blank-interleaved sequence
    (Graves et al. 2006) in the log semiring; frames beyond n_frames are
    frozen (carry alpha unchanged) so padding never contributes.
    """
    B, T, V = logits.shape
    bid = V - 1 if blank_id is None else blank_id
    logp = jax.nn.log_softmax(logits, axis=-1)
    z, skip_ok, valid_s = ctc_expand(labels, n_labels, bid)
    S = z.shape[1]

    # one up-front gather of per-frame label scores (viterbi.py pattern)
    lp_z = jnp.take_along_axis(logp, z[:, None, :], axis=2)  # [B, T, S]
    lp_tm = jnp.transpose(lp_z, (1, 0, 2))                   # [T, B, S]

    s_idx = jnp.arange(S, dtype=jnp.int32)
    init_ok = (s_idx[None, :] == 0) | (
        (s_idx[None, :] == 1) & (n_labels[:, None] >= 1)
    )
    alpha0 = jnp.where(init_ok, lp_tm[0], NEG_INF)

    def step(alpha, inputs):
        lp_t, t = inputs
        a1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a2 = jnp.where(skip_ok, a2, NEG_INF)
        new = jnp.logaddexp(jnp.logaddexp(alpha, a1), a2) + lp_t
        new = jnp.where(valid_s, new, NEG_INF)
        active = (t < n_frames)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    alpha_T, _ = jax.lax.scan(step, alpha0, (lp_tm[1:], ts), unroll=4)

    last = 2 * n_labels  # final blank state index
    a_blank = jnp.take_along_axis(alpha_T, last[:, None], axis=1)[:, 0]
    a_label = jnp.take_along_axis(
        alpha_T, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_label = jnp.where(n_labels > 0, a_label, NEG_INF)
    return -jnp.logaddexp(a_blank, a_label)


def ctc_loss_optax_oracle(logits, n_frames, labels, n_labels, blank_id):
    """Independent oracle via optax.ctc_loss (test use only).

    optax expresses padding as 1.0-masks instead of lengths and takes the
    same blank_id; this adapter converts our (lengths, -1-padded) convention.
    """
    B, T, V = logits.shape
    logit_pad = (jnp.arange(T)[None, :] >= n_frames[:, None]).astype(jnp.float32)
    label_pad = (
        jnp.arange(labels.shape[1])[None, :] >= n_labels[:, None]
    ).astype(jnp.float32)
    return optax.ctc_loss(
        logits, logit_pad, jnp.maximum(labels, 0), label_pad, blank_id=blank_id
    )


# --------------------------------------------------------------------------
# Training
# --------------------------------------------------------------------------


class CtcTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def masked_mean_objective(nll, n_frames, n_labels):
    """(mean per-label-normalized loss, mean raw NLL) over VALID batch rows.

    Padded rows (no frames / no labels) must not contribute — the single
    source of truth for the CTC/RNN-T loss normalization, shared by the
    local AND the data-parallel (mogasr.dist.sharded) train steps.
    """
    valid = (n_frames > 0) & (n_labels > 0)
    nv = jnp.maximum(jnp.sum(valid), 1)
    per_label = jnp.where(valid, nll / jnp.maximum(n_labels, 1), 0.0)
    mean_nll = jnp.sum(jnp.where(valid, nll, 0.0)) / nv
    return jnp.sum(per_label) / nv, mean_nll


def ctc_objective(model, params, feats, n_frames, labels, n_labels, blank_id=None):
    """Forward + CTC loss + masked normalization (local & sharded steps)."""
    logits = model.apply(params, feats, n_frames)
    nll = ctc_loss(logits, n_frames, labels, n_labels, blank_id)
    return masked_mean_objective(nll, n_frames, n_labels)


def make_ctc_train_step(
    model,
    cfg: TrainConfig,
    blank_id: Optional[int] = None,
    spec_augment: bool = False,
):
    """Jitted (state, feats, n_frames, labels, n_labels) -> (state, metrics).

    Same optimizer recipe as the CE loop (mogasr.am.train_nn.make_optimizer);
    loss is mean per-utterance CTC NLL normalized by label count (stable
    across utterance-length mixes).
    """
    from mogasr.am.train_nn import make_optimizer

    opt = make_optimizer(cfg)
    if spec_augment:
        from mogasr.am.neural import spec_augment as _sa

    @jax.jit
    def train_step(state, feats, n_frames, labels, n_labels):
        if spec_augment:
            key = jax.random.fold_in(jax.random.key(cfg.seed), state.step)
            feats_in = _sa(feats, n_frames, key)
        else:
            feats_in = feats

        def loss_fn(params):
            return ctc_objective(
                model, params, feats_in, n_frames, labels, n_labels, blank_id
            )

        (loss, mean_nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return CtcTrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "utt_nll": mean_nll,
        }

    return train_step


def init_ctc_train_state(model, cfg: TrainConfig, feat_dim: int, key) -> CtcTrainState:
    from mogasr.am.train_nn import make_optimizer

    dummy = jnp.zeros((2, 8, feat_dim), jnp.float32)
    params = model.init(key, dummy, jnp.asarray([8, 8]))
    opt = make_optimizer(cfg)
    return CtcTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def ctc_labels_from_words(
    lexicon: Lexicon, words: Sequence[str], include_sil: bool = False
) -> List[int]:
    """Phone-id target sequence for CTC training (no alignment needed).

    include_sil=False (default): blank absorbs silence; the target is the
    bare phone sequence of the words.
    """
    return lexicon.words_to_phone_ids(
        words, interword_sil=include_sil, edge_sil=include_sil
    )


def pack_label_batch(
    seqs: Sequence[Sequence[int]], pad_to: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """List of id sequences -> (labels [B, L] padded with -1, n_labels [B])."""
    n = np.asarray([len(s) for s in seqs], np.int32)
    L = int(pad_to) if pad_to is not None else max(int(n.max()), 1)
    out = np.full((len(seqs), L), -1, np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, n


# --------------------------------------------------------------------------
# Decoding
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("blank_id",))
def _greedy_frames(logits, blank_id):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def collapse_ctc(frames: Sequence[int], blank_id: int) -> List[int]:
    """Collapse repeats then drop blanks (host-side, tiny)."""
    out: List[int] = []
    prev = -1
    for f in frames:
        if f != prev and f != blank_id:
            out.append(int(f))
        prev = f
    return out


def _collapse_keep_mask(
    frames: np.ndarray, nf: np.ndarray, bid: int
) -> np.ndarray:
    """[B, T] bool: frames surviving collapse-repeats + drop-blank within
    each row's valid prefix. Vectorized twin of ``collapse_ctc`` (the
    Python loop cost ~150k interpreter iterations per bench rep and
    dominated the jitted CTC rows' host side — round 3)."""
    B = frames.shape[0]
    prev = np.concatenate(
        [np.full((B, 1), -1, frames.dtype), frames[:, :-1]], axis=1)
    valid = np.arange(frames.shape[1])[None, :] < nf[:, None]
    return valid & (frames != prev) & (frames != bid)


def ctc_greedy_decode(
    logits: jax.Array,    # [B, T, V]
    n_frames: jax.Array,  # [B]
    blank_id: Optional[int] = None,
) -> List[List[int]]:
    """Best-path decode: per-frame argmax -> collapse repeats -> drop blank.

    Equals ``[collapse_ctc(argmax[b, :nf[b]], blank) for b]`` exactly
    (tested); the collapse runs as one vectorized NumPy pass instead of a
    per-frame Python loop."""
    V = logits.shape[-1]
    bid = V - 1 if blank_id is None else blank_id
    frames = np.asarray(_greedy_frames(logits, bid))
    return ctc_collapse_frames(frames, n_frames, bid)


def ctc_greedy_decode_with_frames(
    logits: jax.Array,    # [B, T, V]
    n_frames: jax.Array,  # [B]
    blank_id: Optional[int] = None,
) -> List[List[Tuple[int, int]]]:
    """Best-path decode keeping emission times: per utterance a list of
    (unit_id, frame) where frame is the FIRST frame of the collapsed run —
    the standard CTC timing heuristic (units cluster at their run onsets).
    The unit sequence equals ctc_greedy_decode exactly."""
    V = logits.shape[-1]
    bid = V - 1 if blank_id is None else blank_id
    frames = np.asarray(_greedy_frames(logits, bid))
    nf = np.asarray(n_frames)
    keep = _collapse_keep_mask(frames, nf, bid)
    _rows, ts = np.nonzero(keep)             # row-major: (row, time) order
    vals = frames[keep]
    splits = np.cumsum(keep.sum(axis=1))[:-1]
    return [
        list(zip(vseg.tolist(), tseg.tolist()))
        for vseg, tseg in zip(np.split(vals, splits), np.split(ts, splits))
    ]


def _lse2(a: float, b: float) -> float:
    return float(np.logaddexp(a, b))


def ctc_beam_start() -> Dict[Tuple[int, ...], Tuple[float, float]]:
    """Initial prefix-beam state: the empty prefix, ending 'in blank'."""
    return {(): (0.0, NEG_INF)}


def ctc_beam_step(
    beams: Dict[Tuple[int, ...], Tuple[float, float]],
    frame: np.ndarray,  # [V] log posteriors of one frame
    beam_size: int,
    blank_id: int,
    ext_score: Optional[Callable[[Tuple[int, ...], int], float]] = None,
    ext_weight: float = 1.0,
    prune_logp: float = -12.0,
) -> Dict[Tuple[int, ...], Tuple[float, float]]:
    """One frame of prefix beam search; pure state -> state (streamable)."""
    units = np.nonzero(frame > frame.max() + prune_logp)[0]
    new: Dict[Tuple[int, ...], Tuple[float, float]] = {}

    def add(prefix, pb, pnb):
        opb, opnb = new.get(prefix, (NEG_INF, NEG_INF))
        new[prefix] = (_lse2(opb, pb), _lse2(opnb, pnb))

    for prefix, (pb, pnb) in beams.items():
        ptot = _lse2(pb, pnb)
        for u in units:
            lp = float(frame[u])
            if u == blank_id:
                add(prefix, ptot + lp, NEG_INF)
                continue
            last = prefix[-1] if prefix else -1
            if u == last:
                # same unit: staying in the label extends p_nb of the SAME
                # prefix; a new occurrence needs a blank in between (p_b)
                add(prefix, NEG_INF, pnb + lp)
                ext = prefix + (int(u),)
                s = pb + lp
                if ext_score is not None:
                    s += ext_weight * ext_score(prefix, int(u))
                add(ext, NEG_INF, s)
            else:
                ext = prefix + (int(u),)
                s = ptot + lp
                if ext_score is not None:
                    s += ext_weight * ext_score(prefix, int(u))
                add(ext, NEG_INF, s)
    return dict(sorted(new.items(), key=lambda kv: -_lse2(*kv[1]))[:beam_size])


def ctc_beam_ranked(
    beams: Dict[Tuple[int, ...], Tuple[float, float]]
) -> List[Tuple[float, List[int]]]:
    return sorted(
        ((_lse2(pb, pnb), list(prefix)) for prefix, (pb, pnb) in beams.items()),
        key=lambda x: -x[0],
    )


def ctc_prefix_beam_decode(
    logp: np.ndarray,  # [T, V] log posteriors of ONE utterance (valid frames)
    beam_size: int = 8,
    blank_id: Optional[int] = None,
    ext_score: Optional[Callable[[Tuple[int, ...], int], float]] = None,
    ext_weight: float = 1.0,
    prune_logp: float = -12.0,
) -> List[Tuple[float, List[int]]]:
    """Prefix beam search (Hannun et al. 2014) over CTC posteriors.

    Host-side by design: the beam's hypothesis set is a data-dependent dict —
    exactly what XLA is bad at — while all the FLOPs (the network forward)
    stay on device. ext_score(prefix, unit) adds shallow-fusion LM scores.

    Returns the beam as [(total_logp, unit_seq)] best-first. Frame-sequential
    by construction: the same ctc_beam_step drives streaming decoding
    (CtcStreamDecoder) with EXACT offline equivalence.
    """
    T, V = logp.shape
    bid = V - 1 if blank_id is None else blank_id
    beams = ctc_beam_start()
    for t in range(T):
        beams = ctc_beam_step(
            beams, logp[t], beam_size, bid,
            ext_score=ext_score, ext_weight=ext_weight, prune_logp=prune_logp,
        )
    return ctc_beam_ranked(beams)


def ctc_prefix_beam_decode_native(
    logp: np.ndarray,  # [T, V] log posteriors of ONE utterance
    beam_size: int = 8,
    blank_id: Optional[int] = None,
    prune_logp: float = -12.0,
) -> Optional[List[Tuple[float, List[int]]]]:
    """C++ prefix beam search (mogasr/native/ctc_beam_native.cpp).

    Exact-parity with ctc_prefix_beam_decode (same algorithm, iteration
    order, and double-precision logaddexp — tested); the host-side
    production path for wide beams / long utterances. Returns None when the
    native library is unavailable (caller falls back to Python); LM
    shallow fusion (ext_score) is Python-only.
    """
    import ctypes

    from mogasr.native import load_ctc_beam_lib

    lib = load_ctc_beam_lib()
    if lib is None:
        return None
    logp = np.ascontiguousarray(logp, np.float32)
    T, V = logp.shape
    bid = V - 1 if blank_id is None else blank_id
    max_len = max(T, 1)
    out_seqs = np.empty((beam_size, max_len), np.int32)
    out_lens = np.empty(beam_size, np.int32)
    out_scores = np.empty(beam_size, np.float64)
    as_ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    n = lib.ctc_prefix_beam(
        as_ptr(logp, ctypes.c_float), T, V, beam_size, bid, prune_logp,
        as_ptr(out_seqs, ctypes.c_int32), as_ptr(out_lens, ctypes.c_int32),
        as_ptr(out_scores, ctypes.c_double), max_len,
    )
    return [
        (float(out_scores[i]), out_seqs[i, : out_lens[i]].tolist())
        for i in range(n)
    ]


def ctc_fusion_matrix(n_units: int, unit_lm, weight: float):
    """[n_units + 1, n_units] shallow-fusion table for the DEVICE prefix
    beam: row u = weighted bigram log-probs after unit u, row n_units =
    the sentence-initial distribution (empty prefix) — the CTC twin of
    am.rnnt.rnnt_fusion_matrix, matching lm.unit_ngram.fusion_score."""
    assert unit_lm.n_units == n_units, (unit_lm.n_units, n_units)
    m = np.zeros((n_units + 1, n_units), np.float32)
    m[:n_units, :] = weight * unit_lm.pair_logp
    m[n_units, :] = weight * unit_lm.init_logp
    return m


@functools.lru_cache(maxsize=16)
def _prefix_beam_device_fn(
    beam_size: int,
    blank_id: int,
    u_cap: int,
    prune_logp: float,
    has_fusion: bool,
    has_bias: bool,
):
    """Cached jitted (logp [B,T,V], n_frames, fusion, bias_next,
    bias_delta) -> (hists [B,K,u_cap], lens, p_b, p_nb) — the WHOLE CTC
    prefix beam search (Hannun 2014) as one lax.scan over frames.

    Why (round 5): the quality-path CTC decode (fusion/biasing ride it)
    was host-bound — the native C++ beam needs the full [B,T,V] logp
    pulled to host and walks dicts frame-by-frame (the `ctc_beam` family
    row). On device, a frame step is dense algebra over fixed [B, K, ...]
    buffers:

    - SELF candidates: (p_b' = lse(p_b,p_nb) + lp[blank],
      p_nb' = p_nb + lp[last]) — the same-prefix blank/repeat paths;
    - CHILD candidates [B, K, V]: extend with u != blank at
      (u==last ? p_b : lse(p_b,p_nb)) + lp[u] (+ fusion/bias table
      gathers) — children of DISTINCT beam prefixes are themselves
      distinct (equal child length forces equal parent length, and
      same-length beam prefixes are distinct), so the ONLY merges are
      child-into-self where beam prefix p_j == p_i + c: a per-frame
      [K, K] prefix-relation matrix routes those children into p_j's
      p_nb via logaddexp and masks them out of the standalone pool —
      exactly the reference dict's add();
    - the reference's per-frame unit prune (lp <= max + prune_logp)
      masks contributions to -inf; top-K over the K + K*V merged totals
      selects the next beam (gather parents, append units).

    Scores accumulate in device f32 (the host dict promotes to f64):
    ranked lists are exact-tested on short utterances and
    tolerance-contracted on long ones (tests/test_ctc_device_beam.py).
    The reference prefix length is unbounded; here children are masked
    once a row hits ``u_cap`` (choose u_cap >= the longest plausible
    transcript).
    """
    K = int(beam_size)
    NEG_HALF = NEG_INF / 2
    cols = jnp.arange(u_cap)

    @jax.jit
    def decode(logp, n_frames, fusion_arr, bn_arr, bd_arr):
        B, T, V = logp.shape

        hist0 = jnp.full((B, K, u_cap), -1, jnp.int32)
        lens0 = jnp.zeros((B, K), jnp.int32)
        pb0 = jnp.full((B, K), NEG_INF).at[:, 0].set(0.0)
        pnb0 = jnp.full((B, K), NEG_INF)
        bn0 = jnp.zeros((B, K), jnp.int32)

        unit_ids = jnp.arange(V)

        def frame_step(st, inputs):
            hist, lens, pb, pnb, bnode = st
            lp, t = inputs                      # [B, V]
            active = t < n_frames

            keep = lp > (jnp.max(lp, axis=1, keepdims=True) + prune_logp)
            lp_m = jnp.where(keep, lp, NEG_INF)  # pruned units contribute -inf
            ptot = jnp.logaddexp(pb, pnb)        # [B, K]
            alive = ptot > NEG_HALF
            last = jnp.where(
                lens > 0,
                jnp.take_along_axis(
                    hist, jnp.maximum(lens - 1, 0)[..., None], 2)[..., 0],
                -1)                              # [B, K]

            # --- SELF candidates (same prefix) ---
            self_pb = ptot + lp_m[:, None, blank_id]
            lp_last = jnp.take_along_axis(
                lp_m, jnp.maximum(last, 0).reshape(B, K), axis=1
            ).reshape(B, K)
            self_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)
            self_pb = jnp.where(alive, self_pb, NEG_INF)
            self_pnb = jnp.where(alive, self_pnb, NEG_INF)

            # --- CHILD candidates [B, K, V] (pnb only) ---
            base = jnp.where(
                unit_ids[None, None, :] == last[..., None],
                pb[..., None], ptot[..., None])
            child = base + lp_m[:, None, :]
            def _pad_blank(tab):
                # fusion/bias tables carry n_units columns; the child grid
                # spans V incl. blank (blank children are masked anyway)
                return jnp.concatenate(
                    [tab[..., :blank_id],
                     jnp.zeros(tab.shape[:-1] + (1,), tab.dtype),
                     tab[..., blank_id:]], axis=-1)

            if has_fusion:
                # empty-prefix row is the table's LAST row (ctc_fusion_matrix)
                frow = jnp.where(last >= 0, last, fusion_arr.shape[0] - 1)
                child = child + _pad_blank(fusion_arr[frow])
            if has_bias:
                child = child + _pad_blank(bd_arr[bnode])
            child = jnp.where(unit_ids[None, None, :] == blank_id,
                              NEG_INF, child)
            child = jnp.where(alive[..., None], child, NEG_INF)
            child = jnp.where(lens[..., None] >= u_cap, NEG_INF, child)

            # --- merge child(i, c) into self(j) where p_j == p_i + c ---
            # rel[b, i, j]: len_j == len_i + 1 and hist_j[:len_i] == hist_i
            pre_eq = (hist[:, :, None, :] == hist[:, None, :, :]) | (
                cols[None, None, None, :] >= lens[:, :, None, None])
            rel = (lens[:, None, :] == lens[:, :, None] + 1) & \
                pre_eq.all(-1) & alive[:, :, None] & alive[:, None, :]
            c_ij = jnp.take_along_axis(
                jnp.broadcast_to(hist[:, None, :, :], (B, K, K, u_cap)),
                jnp.broadcast_to(
                    jnp.clip(lens, 0, u_cap - 1)[:, :, None, None],
                    (B, K, K, 1)), axis=3
            )[..., 0]                            # [B, i, j] unit p_j[len_i]
            # contribution of child(i, c_ij) to self(j)
            contrib = jnp.take_along_axis(
                child, jnp.maximum(c_ij, 0), axis=2)     # [B, i, j]
            contrib = jnp.where(rel, contrib, NEG_INF)
            merged_in = jax.nn.logsumexp(contrib, axis=1)  # [B, j]
            self_pnb = jnp.logaddexp(self_pnb, merged_in)
            # remove merged children from the standalone pool
            child_used = jnp.any(
                rel[..., None] & (unit_ids[None, None, None, :] ==
                                  jnp.maximum(c_ij, 0)[..., None]),
                axis=2)                           # [B, i, V]
            child = jnp.where(child_used, NEG_INF, child)

            # --- top-K over K selfs + K*V children ---
            self_tot = jnp.logaddexp(self_pb, self_pnb)
            child_flat = child.reshape(B, K * V)
            tot = jnp.concatenate([self_tot, child_flat], axis=1)
            top_val, top_idx = jax.lax.top_k(tot, K)
            is_self = top_idx < K
            sidx = jnp.where(is_self, top_idx, 0)
            cidx = jnp.maximum(top_idx - K, 0)
            ci, cu = cidx // V, (cidx % V).astype(jnp.int32)
            parent = jnp.where(is_self, sidx, ci)
            nhist = jnp.take_along_axis(hist, parent[..., None], 1)
            plen = jnp.take_along_axis(lens, parent, 1)
            grow = (~is_self) & (top_val > NEG_HALF)
            at = jnp.clip(plen, 0, u_cap - 1)
            nhist = jnp.where(
                (cols[None, None, :] == at[..., None]) & grow[..., None],
                cu[..., None], nhist)
            nlen = plen + grow.astype(jnp.int32)
            npb = jnp.where(
                is_self, jnp.take_along_axis(self_pb, sidx, 1), NEG_INF)
            npnb = jnp.where(
                is_self, jnp.take_along_axis(self_pnb, sidx, 1),
                jnp.take_along_axis(child_flat, cidx, 1))
            npb = jnp.where(top_val > NEG_HALF, npb, NEG_INF)
            npnb = jnp.where(top_val > NEG_HALF, npnb, NEG_INF)
            nbn = bnode
            if has_bias:
                pnode = jnp.take_along_axis(bnode, parent, 1)
                nbn = jnp.where(grow, bn_arr[pnode, cu], pnode)

            def mix(new, old):
                return jnp.where(
                    active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)

            return (mix(nhist, hist), mix(nlen, lens), mix(npb, pb),
                    mix(npnb, pnb), mix(nbn, bnode)), None

        st0 = (hist0, lens0, pb0, pnb0, bn0)
        (hist, lens, pb, pnb, _bn), _ = jax.lax.scan(
            frame_step, st0,
            (jnp.transpose(logp, (1, 0, 2)), jnp.arange(T)))
        return hist, lens, pb, pnb

    return decode


def ctc_prefix_beam_decode_device(
    logp,                 # [B, T, V] log posteriors (device or host)
    n_frames,             # [B]
    beam_size: int = 8,
    blank_id: Optional[int] = None,
    u_cap: int = 200,
    prune_logp: float = -12.0,
    fusion: Optional[np.ndarray] = None,      # ctc_fusion_matrix
    bias_next: Optional[np.ndarray] = None,   # CompiledBiaser tables
    bias_delta: Optional[np.ndarray] = None,
) -> List[List[Tuple[float, List[int]]]]:
    """Batched ONE-dispatch prefix beam over a whole [B, T, V] posterior
    block; same return shape as per-row ctc_prefix_beam_decode (ranked
    [(total_logp, units)]). See _prefix_beam_device_fn for the design and
    the f32/u_cap contracts."""
    logp = jnp.asarray(logp)
    V = logp.shape[-1]
    bid = V - 1 if blank_id is None else blank_id
    fn = _prefix_beam_device_fn(
        int(beam_size), int(bid), int(u_cap), float(prune_logp),
        fusion is not None, bias_next is not None)
    f_arr = (jnp.asarray(fusion, jnp.float32) if fusion is not None
             else jnp.zeros((1, 1), jnp.float32))
    bn_arr = (jnp.asarray(bias_next, jnp.int32) if bias_next is not None
              else jnp.zeros((1, 1), jnp.int32))
    bd_arr = (jnp.asarray(bias_delta, jnp.float32)
              if bias_delta is not None else jnp.zeros((1, 1), jnp.float32))
    hist, lens, pb, pnb = fn(logp, jnp.asarray(n_frames), f_arr, bn_arr,
                             bd_arr)
    hist, lens = np.asarray(hist), np.asarray(lens)
    tot = np.logaddexp(np.asarray(pb), np.asarray(pnb))
    out: List[List[Tuple[float, List[int]]]] = []
    for b in range(hist.shape[0]):
        row = [(float(tot[b, k]), hist[b, k, : lens[b, k]].tolist())
               for k in range(hist.shape[1]) if tot[b, k] > NEG_INF / 2]
        row.sort(key=lambda x: -x[0])
        out.append(row)
    return out


def ctc_beam_decode_batch(
    logp: np.ndarray,     # [B, T, V]
    n_frames: np.ndarray,  # [B]
    beam_size: int = 8,
    blank_id: Optional[int] = None,
    prune_logp: float = -12.0,
    native: bool = True,
) -> List[List[int]]:
    """Top-1 prefix-beam hypotheses for a batch (native when available)."""
    logp = np.asarray(logp)
    n_frames = np.asarray(n_frames)
    out = []
    for b in range(logp.shape[0]):
        lp = logp[b, : int(n_frames[b])]
        ranked = ctc_prefix_beam_decode_native(
            lp, beam_size, blank_id, prune_logp
        ) if native else None
        if ranked is None:
            ranked = ctc_prefix_beam_decode(
                lp, beam_size, blank_id, prune_logp=prune_logp
            )
        out.append(ranked[0][1] if ranked else [])
    return out


class CtcStreamDecoder:
    """Online CTC decoding over chunked log-posteriors.

    mode="greedy": best-path collapse carrying the previous frame's argmax
    across chunk boundaries. mode="beam": streaming prefix beam search
    (ctc_beam_step per frame). Both are EXACTLY equal to their offline
    counterparts for any chunking (frame-sequential algorithms; tested).

    Pairs with neural.LstmAmStream for the full online neural CTC pipeline:
    streaming frontend -> stateful LSTM chunks -> this decoder's partial().
    """

    def __init__(
        self,
        blank_id: int,
        mode: str = "greedy",
        beam_size: int = 8,
        ext_score: Optional[Callable[[Tuple[int, ...], int], float]] = None,
        ext_weight: float = 1.0,
    ):
        assert mode in ("greedy", "beam")
        self.blank_id = int(blank_id)
        self.mode = mode
        self.beam_size = beam_size
        self.ext_score = ext_score
        self.ext_weight = ext_weight
        self._prev = -1
        self._tokens: List[int] = []
        self._beams = ctc_beam_start()

    def step(self, logp_chunk: np.ndarray) -> List[int]:
        """Consume [Tc, V] log posteriors; returns the current partial hyp."""
        logp_chunk = np.asarray(logp_chunk)
        if self.mode == "greedy":
            for f in np.argmax(logp_chunk, axis=-1):
                f = int(f)
                if f != self._prev and f != self.blank_id:
                    self._tokens.append(f)
                self._prev = f
        else:
            for t in range(logp_chunk.shape[0]):
                self._beams = ctc_beam_step(
                    self._beams, logp_chunk[t], self.beam_size, self.blank_id,
                    ext_score=self.ext_score, ext_weight=self.ext_weight,
                )
        return self.partial()

    def partial(self) -> List[int]:
        if self.mode == "greedy":
            return list(self._tokens)
        return ctc_beam_ranked(self._beams)[0][1]

    def finalize(self) -> List[int]:
        return self.partial()


# --------------------------------------------------------------------------
# Lexicon/LM-constrained graph decoding (reuses the chain+loop Viterbi)
# --------------------------------------------------------------------------


def ctc_token_chain(
    phone_ids: Sequence[int], blank_id: int
) -> Tuple[List[int], List[float], List[bool], List[bool]]:
    """CTC topology for one token: states (b0, y1, b1, ..., yn, bn).

    Returns (emit_ids, skip_logp, is_entry, is_exit) per state. All CTC
    transitions are unweighted (mass lives in the emission posteriors);
    skip j-2 -> j is open where consecutive labels differ (blank optional).
    Entry at b0 or y1; exit from yn or bn.
    """
    emit: List[int] = []
    skip: List[float] = []
    entry: List[bool] = []
    exits: List[bool] = []
    n = len(phone_ids)
    for k, p in enumerate(phone_ids):
        # leading blank before label k
        emit.append(blank_id)
        skip.append(float(NEG_INF))
        entry.append(k == 0)
        exits.append(False)
        # label state
        emit.append(int(p))
        skip.append(
            0.0 if (k > 0 and phone_ids[k] != phone_ids[k - 1]) else float(NEG_INF)
        )
        entry.append(k == 0)
        exits.append(k == n - 1)
    # trailing blank
    emit.append(blank_id)
    skip.append(float(NEG_INF))
    entry.append(False)
    exits.append(True)
    return emit, skip, entry, exits


def ctc_decode_graph(
    lexicon: Lexicon,
    dcfg: DecodeConfig,
    word_logp: Optional[np.ndarray] = None,
    blank_id: Optional[int] = None,
) -> gr.Graph:
    """Word-loop decode graph over CTC units (phones + blank).

    Same Graph struct the GMM/hybrid decoders consume, plus ``skip_logp``
    for the optional-blank skips; chain labels are words, emissions index
    the CTC softmax (blank = n_phones by convention).

    Approximation shared with compact CTC decoders (EESEN-style): a word
    boundary may omit the blank, so two adjacent identical phones across a
    boundary are not forced to merge — standard and tested to be benign.
    """
    bid = lexicon.n_phones if blank_id is None else blank_id
    words = list(lexicon.words)
    if word_logp is None:
        word_logp = np.full(len(words), -np.log(max(len(words), 1)), np.float32)
    emit, selfp, advp, enterp, exitp, skipp, chain = [], [], [], [], [], [], []
    labels: List[str] = []
    for ci, w in enumerate(words):
        labels.append(w)
        e, sk, en, ex = ctc_token_chain(lexicon.word_phone_ids(w), bid)
        base = float(word_logp[ci]) - dcfg.word_insertion_penalty
        for k in range(len(e)):
            emit.append(e[k])
            selfp.append(0.0)
            advp.append(float(NEG_INF) if k == 0 else 0.0)
            enterp.append(base if en[k] else float(NEG_INF))
            exitp.append(0.0 if ex[k] else float(NEG_INF))
            skipp.append(sk[k])
            chain.append(ci)
    j = len(emit)
    enter = np.asarray(enterp, np.float32)
    exit_ = np.asarray(exitp, np.float32)
    return gr.Graph(
        emit_id=np.asarray(emit, np.int32),
        self_logp=np.asarray(selfp, np.float32),
        adv_logp=np.asarray(advp, np.float32),
        enter_logp=enter,
        exit_logp=exit_,
        init_logp=enter.copy(),
        final_logp=exit_.copy(),
        chain_id=np.asarray(chain, np.int32),
        labels=labels,
        skip_logp=np.asarray(skipp, np.float32),
    )


def make_ctc_logits_fn(model, params):
    """One jitted ``(feats, n_frames) -> (logits, n_dec)`` closure carrying
    every production routing decision for greedy/prefix CTC decoding:

    - ``ConformerAm`` emits at its native subsampled 25 Hz rate
      (``method="subsampled"``) — greedy collapse is frame-rate invariant,
      so hypotheses are identical to the full-rate contract while the
      decode stream shrinks 4x (round-2 VERDICT item 5);
    - ``LstmAm`` follows the ``use_pallas_lstm`` gate (DEMOTED round 3:
      the stock jitted XLA scan won the fair A/B — see that docstring);
    - everything else takes the stock forward at the input frame rate.

    ``n_dec`` is the per-utterance valid length IN DECODE FRAMES — greedy
    consumers must use it instead of the raw n_frames.  Graph decoding
    (``make_ctc_scorer``) keeps the full-rate [B, T, V] contract: the CTC
    skip topology's transition weights are per-frame, so its rate is part
    of the decoder definition, not an implementation detail.
    """
    from mogasr.am.lstm_pallas import lstm_am_apply_pallas, use_pallas_lstm
    from mogasr.am.neural import ConformerAm

    if type(model) is ConformerAm:
        @jax.jit
        def logits_fn(feats, n_frames):
            return model.apply(params, feats, n_frames, method="subsampled")
    elif use_pallas_lstm(model):
        @jax.jit
        def logits_fn(feats, n_frames):
            return lstm_am_apply_pallas(params, feats, n_frames), n_frames
    else:
        @jax.jit
        def logits_fn(feats, n_frames):
            return model.apply(params, feats, n_frames), n_frames

    return logits_fn


def make_ctc_frames_fn(model, params):
    """One jitted ``(feats, n_frames) -> (argmax frames [B, T'], n_dec)``
    closure: `make_ctc_logits_fn` routing with the greedy argmax FUSED into
    the same dispatch.

    Why (round 5, VERDICT r4 item 4): calling ``ctc_greedy_decode(logits,
    ...)`` after the forward pass issues the argmax as a SEPARATE
    synchronized dispatch and then pulls it — two serialized ~30 ms tunnel
    round-trips per batch AFTER the compute has finished. That host-side
    serialization (not the encoder) was the measured mechanism of the
    bench ``ctc`` row sitting ~4x below the same-size ``lstm`` hybrid row
    (whose Viterbi rides the same async stream as the forward). Fusing the
    argmax makes greedy CTC one dispatch + one tiny [B, T] int pull;
    hypotheses are identical (argmax of logits == argmax of log-softmax).
    """
    logits_fn = make_ctc_logits_fn(model, params)

    @jax.jit
    def frames_fn(feats, n_frames):
        logits, n_dec = logits_fn(feats, n_frames)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), n_dec

    return frames_fn


def ctc_collapse_frames(
    frames: np.ndarray,   # [B, T] argmax unit ids (host or device)
    n_frames: np.ndarray,
    blank_id: int,
) -> List[List[int]]:
    """Host half of greedy decode: collapse repeats + drop blanks over
    pre-argmaxed frames (the device half lives in make_ctc_frames_fn)."""
    frames = np.asarray(frames)
    nf = np.asarray(n_frames)
    keep = _collapse_keep_mask(frames, nf, blank_id)
    vals = frames[keep]                      # row-major: (row, time) order
    splits = np.cumsum(keep.sum(axis=1))[:-1]
    return [seg.tolist() for seg in np.split(vals, splits)]


def make_ctc_scorer(model, params):
    """``fb -> [B, T, V]`` log-posterior scorer for graph decoding.

    CTC emissions are already normalized posteriors — decode with
    acoustic_scale=1.0 (the hybrid prior division does not apply).
    """

    from mogasr.am.lstm_pallas import lstm_am_apply_pallas, use_pallas_lstm

    pallas = use_pallas_lstm(model)  # routing gate (demoted round 3)

    @jax.jit
    def score(feats, n_frames):
        logits = (lstm_am_apply_pallas(params, feats, n_frames) if pallas
                  else model.apply(params, feats, n_frames))
        return jax.nn.log_softmax(logits, axis=-1)

    return lambda fb: score(fb.feats, fb.n_frames)
