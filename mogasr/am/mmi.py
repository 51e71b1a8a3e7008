"""MMI discriminative training for the GMM AM (extended Baum-Welch).

Maximum Mutual Information objective per utterance u with acoustic scale k:

    F = sum_u  log p_k(X_u | G_num(u)) - log p_k(X_u | G_den)

where G_num(u) is the utterance's forced-alignment graph (transcript) and
G_den is the shared word-loop decode graph — a DENSE denominator evaluated
exactly by forward-backward on device, the same design point as lattice-free
MMI (Povey et al., Interspeech 2016): no denominator lattices to manage, one
sum-product scan over the loop graph per batch. Both passes reuse the
existing machinery (decoder.forward_backward + em.accumulate_stats_soft), so
MMI costs ~2x an ML Baum-Welch iteration and shards over a data mesh the
same way (all stats are psum-able pytrees).

Parameter update: extended Baum-Welch with per-Gaussian smoothing constants
D_mk = max(E * occ_den, D_min-for-positive-variance * 2):

    mu'  = (sx_num - sx_den + D mu) / (occ_num - occ_den + D)
    var' = (sxx_num - sxx_den + D (var + mu^2)) / (occ_num - occ_den + D) - mu'^2

Mixture weights stay fixed (the common simplification; weight EBW updates
buy little at these mixture sizes). The smoothing search is host-side numpy
on [S, K]-sized arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List


import jax.numpy as jnp
import numpy as np

from mogasr.am import em
from mogasr.am.gmm import GmmSet


def ebw_update(
    gmm: GmmSet,
    num: em.GmmStats,
    den: em.GmmStats,
    e_const: float = 2.0,
    var_floor: float = 1e-3,
    min_occ: float = 1e-2,
) -> GmmSet:
    """Extended Baum-Welch M-step (means + variances, weights fixed).

    Per-Gaussian D starts at E * occ_den and doubles until the implied
    variance is positive everywhere (the standard safety loop; converges in
    a handful of doublings).
    """
    occ_n = np.asarray(num.occ, np.float64)
    occ_d = np.asarray(den.occ, np.float64)
    sx_n = np.asarray(num.sx, np.float64)
    sx_d = np.asarray(den.sx, np.float64)
    sxx_n = np.asarray(num.sxx, np.float64)
    sxx_d = np.asarray(den.sxx, np.float64)
    mu0 = np.asarray(gmm.means, np.float64)
    var0 = np.asarray(gmm.vars, np.float64)

    D = np.maximum(e_const * occ_d, 1.0)  # [S, K]
    for _ in range(32):
        denom = (occ_n - occ_d)[:, :, None] + D[:, :, None]
        mu = (sx_n - sx_d + D[:, :, None] * mu0) / denom
        var = (sxx_n - sxx_d + D[:, :, None] * (var0 + mu0**2)) / denom - mu**2
        bad = (denom.min(-1) <= 0) | (var.min(-1) <= var_floor * 0.5)
        if not bad.any():
            break
        D = np.where(bad, D * 2.0, D)
    var = np.maximum(var, var_floor)

    # Gaussians that saw (almost) no numerator data keep their parameters —
    # nothing discriminative to learn from.
    keep = (occ_n < min_occ)[:, :, None]
    mu = np.where(keep, mu0, mu)
    var = np.where(keep, var0, var)
    return GmmSet(
        gmm.weights,
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(var, jnp.float32),
    )


@dataclasses.dataclass
class MmiResult:
    gmm: GmmSet
    history: List[float]  # MMI criterion (mean per frame) per iteration

    def __iter__(self):
        return iter((self.gmm, self.history))


def train_mmi(
    batches,                 # Sequence[pipeline.FeatBatch]
    lexicon,
    topo,
    gmm: GmmSet,
    n_iters: int = 4,
    acoustic_scale: float = 0.1,
    e_const: float = 2.0,
    den_graph=None,          # override the denominator graph (default: word loop)
    logger=None,
) -> MmiResult:
    """MMI training loop on top of an ML-trained GMM.

    acoustic_scale: the usual MMI kappa (~0.1) flattening the acoustic model
    against the (implicit unigram) LM of the denominator loop graph.
    """
    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig
    from mogasr.decoder import forward_backward as fbd
    from mogasr.hmm import graph as gr

    if den_graph is None:
        den_graph = pipe.word_decode_graph(
            lexicon, topo, DecodeConfig(acoustic_scale=acoustic_scale)
        )
    S, K, D = gmm.means.shape
    history: List[float] = []
    for it in range(n_iters):
        num_stats = em.zero_stats(S, K, D)
        den_stats = em.zero_stats(S, K, D)
        crit = 0.0
        n_frames_total = 0.0
        for fb in batches:
            scores = pipe.score_batch(fb.feats, gmm)
            Bp = scores.shape[0]

            # ---- numerator: FB over per-utterance alignment graphs ----
            num_graphs_np = pipe.build_align_graphs(fb.words, lexicon, topo)
            num_graphs = {k: jnp.asarray(v) for k, v in num_graphs_np.items()}
            fb_num = fbd.forward_backward(
                scores, num_graphs, fb.n_frames, acoustic_scale=acoustic_scale
            )
            post_num = fbd.state_posteriors_to_pdf(
                fb_num.log_gamma, num_graphs["emit_id"], S
            )

            # ---- denominator: FB over the shared word-loop graph ----
            den_graphs_np = gr.batch_graphs([den_graph] * Bp)
            den_graphs = {k: jnp.asarray(v) for k, v in den_graphs_np.items()}
            fb_den = fbd.forward_backward(
                scores, den_graphs, fb.n_frames, acoustic_scale=acoustic_scale
            )
            post_den = fbd.state_posteriors_to_pdf(
                fb_den.log_gamma, den_graphs["emit_id"], S
            )

            feats_flat = fb.feats.reshape(-1, D)
            num_stats = em.add_stats(
                num_stats,
                em.accumulate_stats_soft(gmm, feats_flat, post_num.reshape(-1, S)),
            )
            den_stats = em.add_stats(
                den_stats,
                em.accumulate_stats_soft(gmm, feats_flat, post_den.reshape(-1, S)),
            )
            valid = np.arange(Bp) < fb.size
            crit += float(
                jnp.sum(jnp.where(jnp.asarray(valid), fb_num.loglik - fb_den.loglik, 0.0))
            )
            n_frames_total += float(jnp.sum(fb.n_frames[: fb.size]))

        history.append(crit / max(n_frames_total, 1.0))
        if logger is not None:
            logger.log({"stage": "train_mmi", "iter": it, "mmi_per_frame": history[-1]})
        gmm = ebw_update(gmm, num_stats, den_stats, e_const=e_const)
    return MmiResult(gmm, history)
