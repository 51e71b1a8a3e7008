"""State-level Minimum Bayes Risk (sMBR) discriminative training.

Complements MMI (mogasr.am.mmi): instead of maximizing the posterior of the
reference PATH, sMBR maximizes the posterior-expected FRAME ACCURACY

    F = sum_u E_{paths ~ p_kappa(path | X_u, G_den)} [ #frames on ref state ]

over the dense word-loop denominator graph (lattice-free, same design point
as the MMI module — no lattices on the training path). Frame accuracy
a(t, j) = 1[emit_id(j) == ref_pdf(t)] against the forced alignment, the
standard LF-sMBR surrogate.

The gradient needs, per (frame, state), the expected accuracy of paths
PASSING THROUGH that state. Both quantities come from one forward and one
backward ``lax.scan`` that carry an accuracy accumulator alongside the
log-domain Baum-Welch recursion of decoder/forward_backward.py:

    ahat(t, j) = E[acc up to t | path(t)=j]   (forward, includes a(t, j))
    bhat(t, j) = E[acc after t | path(t)=j]   (backward)
    w(t, j)    = gamma(t, j) * (ahat + bhat - E[acc])

Positive parts of w feed "numerator" stats, negative parts "denominator"
stats, and the extended Baum-Welch update is shared with MMI (mmi.ebw_update).
All per-step work is batched [B, J] vector ops; the accumulator updates are
softmax-weighted averages of predecessor accumulators computed from the SAME
log-alpha/beta values (no extra emissions gathers).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.am import em
from mogasr.am.gmm import GmmSet
from mogasr.am.mmi import ebw_update

NEG_INF = -1e30


class SmbrQuantities(NamedTuple):
    weights_pdf: jax.Array  # [B, T, P] signed sMBR weights per pdf
    expected_acc: jax.Array  # [B] posterior-expected #correct frames
    loglik: jax.Array        # [B] denominator log-likelihood


def _safe_exp(x):
    return jnp.exp(jnp.maximum(x, -80.0))


@functools.partial(jax.jit, static_argnames=("acoustic_scale", "n_pdfs"))
def smbr_quantities(
    emit_ll: jax.Array,            # [B, T, P]
    graphs: Dict[str, jax.Array],  # batched denominator graphs (word loop)
    ref_pdf: jax.Array,            # [B, T] reference pdf ids (-1 padding)
    n_frames: jax.Array,           # [B]
    acoustic_scale: float,
    n_pdfs: int,
) -> SmbrQuantities:
    B, T, P = emit_ll.shape
    emit_id = graphs["emit_id"]
    self_logp = graphs["self_logp"]
    adv_logp = graphs["adv_logp"]
    enter_logp = graphs["enter_logp"]
    exit_logp = graphs["exit_logp"]
    J = emit_id.shape[1]

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )  # [B, T, J]
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [T, B, J]
    # frame-state accuracy vs the reference alignment
    acc_bt = (emit_id[:, None, :] == ref_pdf[:, :, None]).astype(jnp.float32)
    acc_tm = jnp.transpose(acc_bt, (1, 0, 2))       # [T, B, J]

    def shift_prev(x, fill):
        return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

    # ---------------- forward: (alpha, ahat) ----------------
    alpha0 = graphs["init_logp"] + emit_tm[0]
    ahat0 = acc_tm[0]

    def fwd_step(carry, inputs):
        alpha, ahat = carry
        emit_t, acc_t, t = inputs
        exit_sc = alpha + exit_logp
        exit_lse = jax.nn.logsumexp(exit_sc, axis=1)                 # [B]
        u = _safe_exp(exit_sc - exit_lse[:, None])                   # [B, J]
        acc_via_loop = jnp.sum(u * ahat, axis=1)                     # [B]

        stay = alpha + self_logp
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1] + adv_logp[:, 1:]], axis=1
        )
        ent = exit_lse[:, None] + enter_logp
        new_alpha = jnp.logaddexp(jnp.logaddexp(stay, adv), ent) + emit_t

        # predecessor responsibilities (emission cancels in all three)
        base = new_alpha - emit_t
        w_stay = _safe_exp(stay - base)
        w_adv = _safe_exp(adv - base)
        w_ent = _safe_exp(ent - base)
        new_ahat = (
            w_stay * ahat
            + w_adv * shift_prev(ahat, 0.0)
            + w_ent * acc_via_loop[:, None]
            + acc_t
        )

        active = (t < n_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        ahat_out = jnp.where(active, new_ahat, ahat)
        return (alpha_out, ahat_out), (
            jnp.where(active, new_alpha, NEG_INF),
            jnp.where(active, new_ahat, 0.0),
        )

    ts = jnp.arange(1, T)
    (alpha_T, ahat_T), (alphas_rest, ahats_rest) = jax.lax.scan(
        fwd_step, (alpha0, ahat0), (emit_tm[1:], acc_tm[1:], ts), unroll=2
    )
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, J]
    ahats = jnp.concatenate([ahat0[None], ahats_rest], axis=0)

    final_sc = alpha_T + graphs["final_logp"]
    loglik = jax.nn.logsumexp(final_sc, axis=1)  # [B]
    p_final = _safe_exp(final_sc - loglik[:, None])
    expected_acc = jnp.sum(p_final * ahat_T, axis=1)  # [B]

    # ---------------- backward: (beta, bhat) ----------------
    beta_T = graphs["final_logp"]
    bhat_T = jnp.zeros((B, J))

    def shift_next(x, fill):
        return jnp.concatenate([x[:, 1:], jnp.full((B, 1), fill, x.dtype)], axis=1)

    def bwd_step(carry, inputs):
        beta, bhat = carry
        emit_t1, acc_t1, t = inputs  # frame t+1 quantities; produces (t)
        eb = emit_t1 + beta                                  # [B, J]
        g = bhat + acc_t1                                    # acc from t+1 on
        enter_sc = enter_logp + eb
        enter_lse = jax.nn.logsumexp(enter_sc, axis=1)       # [B]
        q = _safe_exp(enter_sc - enter_lse[:, None])
        acc_via_loop = jnp.sum(q * g, axis=1)                # [B]

        stay = self_logp + eb
        adv = jnp.concatenate(
            [adv_logp[:, 1:] + eb[:, 1:], jnp.full((B, 1), NEG_INF)], axis=1
        )
        ext = exit_logp + enter_lse[:, None]
        new_beta = jnp.logaddexp(jnp.logaddexp(stay, adv), ext)
        v_stay = _safe_exp(stay - new_beta)
        v_adv = _safe_exp(adv - new_beta)
        v_ext = _safe_exp(ext - new_beta)
        new_bhat = (
            v_stay * g + v_adv * shift_next(g, 0.0) + v_ext * acc_via_loop[:, None]
        )

        active = (t + 1 < n_frames)[:, None]
        beta_out = jnp.where(active, new_beta, beta)
        bhat_out = jnp.where(active, new_bhat, bhat)
        return (beta_out, bhat_out), (beta_out, bhat_out)

    ts_b = jnp.arange(T - 2, -1, -1)
    _, (betas_rest, bhats_rest) = jax.lax.scan(
        bwd_step, (beta_T, bhat_T), (emit_tm[1:][::-1], acc_tm[1:][::-1], ts_b),
        unroll=2,
    )
    betas = jnp.concatenate([betas_rest[::-1], beta_T[None]], axis=0)
    bhats = jnp.concatenate([bhats_rest[::-1], bhat_T[None]], axis=0)

    log_gamma = alphas + betas - loglik[None, :, None]      # [T, B, J]
    mask = (jnp.arange(T)[:, None] < n_frames[None, :])[:, :, None]
    gamma = jnp.where(mask, _safe_exp(log_gamma), 0.0)
    w_state = gamma * (ahats + bhats - expected_acc[None, :, None])  # [T, B, J]

    # collapse graph states -> pdf ids
    def per_utt(w_tj, ids):
        return jax.vmap(
            lambda row: jax.ops.segment_sum(row, ids, num_segments=n_pdfs)
        )(w_tj)

    w_pdf = jax.vmap(per_utt)(jnp.transpose(w_state, (1, 0, 2)), emit_id)
    return SmbrQuantities(w_pdf, expected_acc, loglik)


@dataclasses.dataclass
class SmbrResult:
    gmm: GmmSet
    history: List[float]  # expected frame accuracy per iteration

    def __iter__(self):
        return iter((self.gmm, self.history))


def train_smbr(
    batches,                 # Sequence[pipeline.FeatBatch]
    lexicon,
    topo,
    gmm: GmmSet,
    n_iters: int = 4,
    acoustic_scale: float = 0.1,
    e_const: float = 2.0,
    i_smooth_tau: float = 20.0,
    den_graph=None,
    realign: bool = False,   # re-derive reference alignments each iteration
    logger=None,
) -> SmbrResult:
    """sMBR training loop on top of an ML-trained GMM (mirrors train_mmi).

    Reference state sequences come from forced alignment with the INITIAL
    model (or each iteration's model when realign=True). Positive sMBR
    weights accumulate as numerator stats, negative as denominator stats,
    update via shared extended Baum-Welch.

    i_smooth_tau: I-smoothing (Povey) — each Gaussian's numerator stats are
    blended with tau frames' worth of its ML statistics, the standard
    stabilizer for MBR-family objectives (without it the tiny effective
    denominator occupancy lets EBW overshoot after the first iteration —
    observed on the test task as an accuracy collapse at iteration 2).
    """
    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig
    from mogasr.hmm import graph as gr

    if den_graph is None:
        den_graph = pipe.word_decode_graph(
            lexicon, topo, DecodeConfig(acoustic_scale=acoustic_scale)
        )
    S, K, D = gmm.means.shape
    history: List[float] = []

    def align_all(model):
        out = []
        for fb in batches:
            _res, labels, _ = pipe.align_batch(fb, model, lexicon, topo)
            out.append(jnp.asarray(labels))
        return out

    ref_labels = align_all(gmm)
    for it in range(n_iters):
        if realign and it > 0:
            ref_labels = align_all(gmm)
        num_stats = em.zero_stats(S, K, D)
        den_stats = em.zero_stats(S, K, D)
        ml_stats = em.zero_stats(S, K, D)
        acc_total = 0.0
        n_frames_total = 0.0
        for fb, ref in zip(batches, ref_labels):
            scores = pipe.score_batch(fb.feats, gmm)
            Bp = scores.shape[0]
            den_graphs_np = gr.batch_graphs([den_graph] * Bp)
            den_graphs = {k: jnp.asarray(v) for k, v in den_graphs_np.items()}
            q = smbr_quantities(
                scores, den_graphs, ref, fb.n_frames,
                acoustic_scale=acoustic_scale, n_pdfs=S,
            )
            w = q.weights_pdf.reshape(-1, S)
            feats_flat = fb.feats.reshape(-1, D)
            num_stats = em.add_stats(
                num_stats,
                em.accumulate_stats_soft(gmm, feats_flat, jnp.maximum(w, 0.0)),
            )
            den_stats = em.add_stats(
                den_stats,
                em.accumulate_stats_soft(gmm, feats_flat, jnp.maximum(-w, 0.0)),
            )
            if i_smooth_tau > 0:
                ml_stats = em.add_stats(
                    ml_stats,
                    em.accumulate_stats(gmm, feats_flat, ref.reshape(-1)),
                )
            valid = jnp.asarray(np.arange(Bp) < fb.size)
            acc_total += float(jnp.sum(jnp.where(valid, q.expected_acc, 0.0)))
            n_frames_total += float(jnp.sum(fb.n_frames[: fb.size]))

        history.append(acc_total / max(n_frames_total, 1.0))
        if logger is not None:
            logger.log({
                "stage": "train_smbr", "iter": it,
                "expected_frame_acc": history[-1],
            })
        if i_smooth_tau > 0:
            # I-smoothing: num <- num + (tau / occ_ml) * ml per Gaussian
            occ_ml = np.asarray(ml_stats.occ, np.float64)
            scale = np.where(occ_ml > 1e-6, i_smooth_tau / np.maximum(occ_ml, 1e-6), 0.0)
            num_stats = em.GmmStats(
                occ=num_stats.occ + jnp.asarray(scale * occ_ml, jnp.float32),
                sx=num_stats.sx
                + jnp.asarray(scale[:, :, None] * np.asarray(ml_stats.sx), jnp.float32),
                sxx=num_stats.sxx
                + jnp.asarray(scale[:, :, None] * np.asarray(ml_stats.sxx), jnp.float32),
                loglik=num_stats.loglik,
                n_frames=num_stats.n_frames,
            )
        gmm = ebw_update(gmm, num_stats, den_stats, e_const=e_const)
    return SmbrResult(gmm, history)
