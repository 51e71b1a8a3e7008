"""fMLLR / CMLLR speaker adaptation (feature-space maximum-likelihood
linear regression).

Estimates an affine feature transform x' = A x + b per speaker/session that
maximizes the GMM likelihood (with the log|A| Jacobian term) — the standard
GMM-HMM adaptation layer. Statistics accumulate on device (same gathered
quadratic-form math as the EM E-step); the [D, (D+1)^2]-sized solve runs on
host with the classic row-wise cofactor iteration:

    w_i = G_i^{-1} (k_i + alpha * p_i),
    alpha from the quadratic  alpha^2 (p G^-1 p) + alpha (p G^-1 k) - beta = 0,

where p_i is the extended cofactor row of A. Each row update has a closed
form given the other rows; a few sweeps converge (auxiliary objective is
monotone, tested).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.am.gmm import GmmSet


class FmllrStats(NamedTuple):
    """Sufficient statistics (a pytree — psum-able across chips).

    k_stat: [D, D+1]        sum_t sum_k gamma (mu/var) xi^T
    g_stat: [D, D+1, D+1]   per-row sum_t (sum_k gamma/var_i) xi xi^T
    beta:   []              total posterior mass (frame count)
    """

    k_stat: jax.Array
    g_stat: jax.Array
    beta: jax.Array


@jax.jit
def accumulate_fmllr_stats(
    gmm: GmmSet,
    feats: jax.Array,   # [N, D]
    labels: jax.Array,  # [N] aligned pdf ids, -1 = padding
) -> FmllrStats:
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
    gamma = jax.nn.softmax(ll_k, axis=-1)       # [N, K]
    gamma = jnp.where(valid[:, None], gamma, 0.0)

    xi = jnp.concatenate([feats, jnp.ones((feats.shape[0], 1))], axis=1)  # [N, D+1]
    # k_stat[d, e] = sum_n sum_k gamma * mu/var [n,k,d] * xi[n,e]
    gmv = jnp.einsum("nk,nkd->nd", gamma, mu / var)         # [N, D]
    k_stat = jnp.einsum("nd,ne->de", gmv, xi)               # [D, D+1]
    # g_stat[d] = sum_n (sum_k gamma/var_d) xi xi^T
    gv = jnp.einsum("nk,nkd->nd", gamma, 1.0 / var)         # [N, D]
    g_stat = jnp.einsum("nd,ne,nf->def", gv, xi, xi)        # [D, D+1, D+1]
    return FmllrStats(k_stat, g_stat, jnp.sum(gamma))


def _aux_objective(W: np.ndarray, stats) -> float:
    A = W[:, :-1]
    beta = float(stats.beta)
    q = beta * np.log(abs(np.linalg.det(A)) + 1e-300)
    for i in range(W.shape[0]):
        q += float(W[i] @ np.asarray(stats.k_stat)[i])
        q -= 0.5 * float(W[i] @ np.asarray(stats.g_stat)[i] @ W[i])
    return q


def solve_fmllr(stats: FmllrStats, n_sweeps: int = 10) -> np.ndarray:
    """Row-iterative fMLLR solve -> W = [A | b], shape [D, D+1]."""
    k_stat = np.asarray(stats.k_stat, np.float64)
    g_stat = np.asarray(stats.g_stat, np.float64)
    beta = float(stats.beta)
    D = k_stat.shape[0]
    W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)  # init: identity

    g_inv = [np.linalg.inv(g_stat[i] + 1e-6 * np.eye(D + 1)) for i in range(D)]
    for _ in range(n_sweeps):
        for i in range(D):
            A = W[:, :-1]
            # extended cofactor row: det(A) * row i of inv(A)^T, bias coord 0
            cof = np.linalg.det(A) * np.linalg.inv(A).T[i]
            p = np.concatenate([cof, [0.0]])
            gp = g_inv[i] @ p
            gk = g_inv[i] @ k_stat[i]
            a_quad = float(p @ gp)
            b_quad = float(p @ gk)
            # alpha^2 a + alpha b - beta = 0, take the root maximizing Q
            disc = b_quad * b_quad + 4 * a_quad * beta
            if a_quad <= 0 or disc < 0:
                continue
            r = np.sqrt(disc)
            cands = [(-b_quad + r) / (2 * a_quad), (-b_quad - r) / (2 * a_quad)]
            best_w, best_q = None, -np.inf
            for alpha in cands:
                w_i = g_inv[i] @ (k_stat[i] + alpha * p)
                W_try = W.copy()
                W_try[i] = w_i
                q = _aux_objective(W_try, stats)
                if q > best_q and np.isfinite(q):
                    best_q, best_w = q, w_i
            if best_w is not None:
                W[i] = best_w
    return W.astype(np.float32)


def apply_fmllr(feats: jax.Array, W: np.ndarray) -> jax.Array:
    """x' = A x + b over [..., D] features."""
    Wj = jnp.asarray(W)
    return feats @ Wj[:, :-1].T + Wj[:, -1]


def estimate_fmllr(
    gmm: GmmSet,
    feats_list,   # iterable of ([N_i, D] feats, [N_i] labels) per batch
    n_sweeps: int = 10,
) -> np.ndarray:
    """Accumulate stats over batches (one speaker/session) and solve."""
    stats = None
    for feats, labels in feats_list:
        s = accumulate_fmllr_stats(gmm, feats, labels)
        stats = s if stats is None else FmllrStats(
            stats.k_stat + s.k_stat, stats.g_stat + s.g_stat, stats.beta + s.beta
        )
    return solve_fmllr(stats, n_sweeps=n_sweeps)
