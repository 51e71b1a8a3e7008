"""On-device forward-backward (Baum-Welch) over chain+loop graphs.

Log-semiring counterpart of mogasr.decoder.viterbi: same unified graph
format, same ``lax.scan`` structure, but sum-product instead of max-product.
Yields exact state posteriors gamma[t, j] and the total data log-likelihood —
the E-step of *soft* EM (hard/Viterbi EM lives in mogasr.am.em; this module
upgrades it to full Baum-Welch, with the soft stat accumulation in
mogasr.am.em.accumulate_stats_soft).

All recursions are batched [B, J] vector ops; the loop-state epsilon path is
one logsumexp-reduce per frame, mirroring the max-reduce in Viterbi.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _lse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.logaddexp(a, b)


class FBResult(NamedTuple):
    log_gamma: jax.Array  # [B, T, J] state log-posteriors (NEG_INF on padding)
    loglik: jax.Array     # [B] total data log-likelihood


@functools.partial(jax.jit, static_argnames=("acoustic_scale",))
def forward_backward(
    emit_ll: jax.Array,            # [B, T, P]
    graphs: Dict[str, jax.Array],  # batch_graphs() output on device
    n_frames: jax.Array,           # [B]
    acoustic_scale: float = 1.0,
) -> FBResult:
    B, T, P = emit_ll.shape
    emit_id = graphs["emit_id"]
    self_logp = graphs["self_logp"]
    adv_logp = graphs["adv_logp"]
    enter_logp = graphs["enter_logp"]
    exit_logp = graphs["exit_logp"]
    # optional (j-2 -> j) skip transitions (CTC optional-blank topology)
    skip_logp = graphs.get("skip_logp")
    J = emit_id.shape[1]

    # One up-front gather to graph-state emissions (see viterbi.py).
    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )  # [B, T, J]
    emit_tm = jnp.transpose(emit_graph, (1, 0, 2))  # [T, B, J]

    # ---------- forward ----------
    alpha0 = graphs["init_logp"] + emit_tm[0]

    def fwd_step(alpha, inputs):
        emit_t, t = inputs
        exit_lse = jax.nn.logsumexp(alpha + exit_logp, axis=1)  # [B]
        stay = alpha + self_logp
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1] + adv_logp[:, 1:]], axis=1
        )
        ent = exit_lse[:, None] + enter_logp
        new_alpha = _lse(_lse(stay, adv), ent)
        if skip_logp is not None:
            skp = jnp.concatenate(
                [jnp.full((B, 2), NEG_INF), alpha[:, :-2] + skip_logp[:, 2:]],
                axis=1,
            )
            new_alpha = _lse(new_alpha, skp)
        new_alpha = new_alpha + emit_t
        active = (t < n_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        return alpha_out, jnp.where(active, new_alpha, NEG_INF)

    ts = jnp.arange(1, T)
    alpha_T, alphas_rest = jax.lax.scan(fwd_step, alpha0, (emit_tm[1:], ts), unroll=4)
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, J]

    loglik = jax.nn.logsumexp(alpha_T + graphs["final_logp"], axis=1)  # [B]

    # ---------- backward ----------
    # beta_t[j] defined so that gamma ∝ alpha_t + beta_t. At the utterance's
    # last frame, beta = final_logp; padded frames take beta = final (frozen)
    # so that the last *valid* frame picks it up.
    beta_T = graphs["final_logp"]

    def bwd_step(beta, inputs):
        emit_t1, t = inputs  # emissions at frame t+1; this step produces beta_t
        eb = emit_t1 + beta  # [B, J]: emit(t+1, j) + beta_{t+1}[j]
        enter_lse = jax.nn.logsumexp(enter_logp + eb, axis=1)  # [B]
        stay = self_logp + eb
        adv = jnp.concatenate(
            [adv_logp[:, 1:] + eb[:, 1:], jnp.full((B, 1), NEG_INF)], axis=1
        )
        ext = exit_logp + enter_lse[:, None]
        new_beta = _lse(_lse(stay, adv), ext)
        if skip_logp is not None:
            skb = jnp.concatenate(
                [skip_logp[:, 2:] + eb[:, 2:], jnp.full((B, 2), NEG_INF)], axis=1
            )
            new_beta = _lse(new_beta, skb)
        # frame t+1 is beyond this utterance -> keep beta frozen at final_logp
        active = (t + 1 < n_frames)[:, None]
        beta_out = jnp.where(active, new_beta, beta)
        return beta_out, beta_out

    ts_b = jnp.arange(T - 2, -1, -1)
    _, betas_rest = jax.lax.scan(bwd_step, beta_T, (emit_tm[1:][::-1], ts_b), unroll=4)
    betas = jnp.concatenate([betas_rest[::-1], beta_T[None]], axis=0)  # [T, B, J]

    log_gamma = alphas + betas - loglik[None, :, None]  # [T, B, J]
    mask = (jnp.arange(T)[:, None] < n_frames[None, :])[:, :, None]
    log_gamma = jnp.where(mask, log_gamma, NEG_INF)
    return FBResult(jnp.transpose(log_gamma, (1, 0, 2)), loglik)


def state_posteriors_to_pdf(
    log_gamma: jax.Array,  # [B, T, J]
    emit_id: jax.Array,    # [B, J]
    n_pdfs: int,
) -> jax.Array:
    """Collapse graph-state posteriors to pdf posteriors: [B, T, n_pdfs]."""
    gamma = jnp.exp(jnp.maximum(log_gamma, -80.0))
    gamma = jnp.where(log_gamma <= NEG_INF / 2, 0.0, gamma)

    def per_utt(g_bt, ids):
        # g_bt: [T, J]; ids: [J]
        return jax.vmap(
            lambda row: jax.ops.segment_sum(row, ids, num_segments=n_pdfs)
        )(g_bt)

    return jax.vmap(per_utt)(gamma, emit_id)
