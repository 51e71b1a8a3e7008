"""MLLR speaker adaptation (model-space maximum-likelihood linear regression).

Adapts the GMM MEANS with an affine transform mu' = A mu + b (mean-only MLLR,
Leggetter & Woodland) — the model-space complement to feature-space fMLLR
(mogasr.am.fmllr). Unlike fMLLR there is no Jacobian term, so each transform
row has a CLOSED-FORM solution:

    w_i = G_i^{-1} k_i,
    k_i[e]    = sum_m  sigma_{m,i}^{-2} (sum_t gamma_m x_{t,i}) xi_{m,e}
    G_i[e,f]  = sum_m  occ_m sigma_{m,i}^{-2} xi_{m,e} xi_{m,f}

with xi_m = [mu_m; 1] the extended mean. Statistics accumulate on device
(per-(state,comp) occupancies and first moments — the same reductions as the
EM E-step, psum-able across a data-parallel mesh); the tiny [D, D+1] solve
runs on host.

A single global transform is estimated (the standard baseline); per-class
MLLR would partition components into regression classes and estimate one W
per class through the same code path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.am.gmm import GmmSet


class MllrStats(NamedTuple):
    """Per-(state, component) sufficient statistics (psum-able pytree)."""

    occ: jax.Array    # [S, K]    sum_t gamma
    xsum: jax.Array   # [S, K, D] sum_t gamma * x_t


@jax.jit
def accumulate_mllr_stats(
    gmm: GmmSet,
    feats: jax.Array,   # [N, D]
    labels: jax.Array,  # [N] aligned pdf ids, -1 = padding
) -> MllrStats:
    from mogasr.am.gmm import LOG_2PI

    S, K, D = gmm.means.shape
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    mu = gmm.means[safe]                        # [N, K, D]
    var = jnp.maximum(gmm.vars[safe], 1e-8)
    w = jnp.maximum(gmm.weights[safe], 1e-30)
    x = feats[:, None, :]
    ll_k = (
        jnp.log(w)
        - 0.5 * (D * LOG_2PI + jnp.sum(jnp.log(var), -1))
        - 0.5 * jnp.sum((x - mu) ** 2 / var, -1)
    )
    gamma = jax.nn.softmax(ll_k, axis=-1)       # [N, K] within-state comp post
    gamma = jnp.where(valid[:, None], gamma, 0.0)

    one_hot = jax.nn.one_hot(safe, S, dtype=feats.dtype)     # [N, S]
    one_hot = jnp.where(valid[:, None], one_hot, 0.0)
    occ = jnp.einsum("ns,nk->sk", one_hot, gamma)            # [S, K]
    xsum = jnp.einsum("ns,nk,nd->skd", one_hot, gamma, feats)  # [S, K, D]
    return MllrStats(occ, xsum)


def solve_mllr(gmm: GmmSet, stats: MllrStats, min_occ: float = 1.0) -> np.ndarray:
    """Closed-form global mean-MLLR solve -> W = [A | b], shape [D, D+1].

    Components with negligible occupancy contribute nothing; if the total
    occupancy is too small to estimate D*(D+1) parameters, returns identity.
    """
    occ = np.asarray(stats.occ, np.float64).reshape(-1)            # [M]
    xsum = np.asarray(stats.xsum, np.float64).reshape(occ.shape[0], -1)  # [M, D]
    means = np.asarray(gmm.means, np.float64).reshape(occ.shape[0], -1)
    var = np.maximum(np.asarray(gmm.vars, np.float64).reshape(occ.shape[0], -1), 1e-8)
    D = means.shape[1]
    W_id = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1).astype(np.float32)
    if occ.sum() < max(min_occ, D + 1):
        return W_id

    keep = occ > 1e-8
    occ, xsum, means, var = occ[keep], xsum[keep], means[keep], var[keep]
    xi = np.concatenate([means, np.ones((means.shape[0], 1))], axis=1)  # [M, D+1]
    inv_var = 1.0 / var                                                  # [M, D]
    # k[d] = sum_m inv_var[m,d] * xsum[m,d] * xi[m]   -> [D, D+1]
    k = np.einsum("md,me->de", inv_var * xsum, xi)
    # G[d] = sum_m occ[m] inv_var[m,d] xi[m] xi[m]^T  -> [D, D+1, D+1]
    G = np.einsum("md,me,mf->def", occ[:, None] * inv_var, xi, xi)
    W = np.empty((D, D + 1))
    for i in range(D):
        W[i] = np.linalg.solve(G[i] + 1e-6 * np.eye(D + 1), k[i])
    return W.astype(np.float32)


def apply_mllr(gmm: GmmSet, W: np.ndarray) -> GmmSet:
    """Return a GmmSet with adapted means mu' = A mu + b (vars untouched)."""
    Wj = jnp.asarray(W, dtype=gmm.means.dtype)
    new_means = jnp.einsum("skd,ed->ske", gmm.means, Wj[:, :-1]) + Wj[:, -1]
    return gmm._replace(means=new_means)


def estimate_mllr(
    gmm: GmmSet,
    feats_list,   # iterable of ([N_i, D] feats, [N_i] labels) per batch
    min_occ: float = 1.0,
) -> np.ndarray:
    """Accumulate stats over batches (one speaker/session) and solve."""
    stats = None
    for feats, labels in feats_list:
        s = accumulate_mllr_stats(gmm, feats, labels)
        stats = s if stats is None else MllrStats(
            stats.occ + s.occ, stats.xsum + s.xsum
        )
    return solve_mllr(gmm, stats, min_occ=min_occ)
