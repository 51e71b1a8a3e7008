"""Semi-tied covariance / MLLT (Gales 1999): a global linear transform that
lets diagonal-covariance GMMs model correlated features.

Model: Sigma_m = A^{-1} diag(sigma_m^2) A^{-T}, i.e. score in the
transformed space y = A x against means A mu_m and per-component diagonal
variances, plus a per-frame log|det A| constant. Estimation alternates:

  1. variances:  sigma_m,i^2 = (A W_m A^T)_{ii}
  2. rows of A:  a_i = c_i G_i^{-1} * sqrt(beta / (c_i G_i^{-1} c_i^T)),
                 G_i = sum_m (occ_m / sigma_m,i^2) W_m

with W_m the within-component scatter, c_i the cofactor row of A, beta the
total occupancy — each row update is the exact maximizer given the others
(the same cofactor machinery as fMLLR, without a bias column).

Statistics accumulate on device ([S, K, D, D] scatters — einsum reductions,
psum-able across a data mesh); the [D, D] solve runs on host. The scatter
memory is (S*K*D^2) floats: fine for training-scale models; at the 256k-
component benchmark scale you would accumulate scatters per regression
class instead (same code path, classes collapsing m).

Decode integration: features get y = A x (reuse fmllr.apply_fmllr with a
zero bias), the GmmSet gets means A mu and the re-estimated diagonal
variances (apply_stc). log|det A| shifts every frame's loglik equally, so
decode decisions need no extra term; reported logliks include it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.am.gmm import GmmSet


class StcStats(NamedTuple):
    """Per-(state, component) occupancy and within scatter (pytree)."""

    occ: jax.Array      # [S, K]
    scatter: jax.Array  # [S, K, D, D]  sum_t gamma (x - mu)(x - mu)^T


@jax.jit
def accumulate_stc_stats(
    gmm: GmmSet,
    feats: jax.Array,   # [N, D]
    labels: jax.Array,  # [N] aligned pdf ids, -1 = padding
) -> StcStats:
    from mogasr.am.gmm import LOG_2PI

    S, K, D = gmm.means.shape
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    mu = gmm.means[safe]
    var = jnp.maximum(gmm.vars[safe], 1e-8)
    w = jnp.maximum(gmm.weights[safe], 1e-30)
    x = feats[:, None, :]
    ll_k = (
        jnp.log(w)
        - 0.5 * (D * LOG_2PI + jnp.sum(jnp.log(var), -1))
        - 0.5 * jnp.sum((x - mu) ** 2 / var, -1)
    )
    gamma = jax.nn.softmax(ll_k, axis=-1)
    gamma = jnp.where(valid[:, None], gamma, 0.0)       # [N, K]
    one_hot = jax.nn.one_hot(safe, S, dtype=feats.dtype)
    one_hot = jnp.where(valid[:, None], one_hot, 0.0)   # [N, S]
    d = x - mu                                           # [N, K, D]
    occ = jnp.einsum("ns,nk->sk", one_hot, gamma)
    scatter = jnp.einsum("ns,nk,nkd,nke->skde", one_hot, gamma, d, d)
    return StcStats(occ, scatter)


def solve_stc(
    gmm: GmmSet,
    stats: StcStats,
    n_iters: int = 10,
    var_floor: float = 1e-4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Alternating MLLT solve -> (A [D, D], vars [S, K, D] in y-space)."""
    S, K, D = gmm.means.shape
    occ = np.asarray(stats.occ, np.float64).reshape(-1)              # [M]
    W = np.asarray(stats.scatter, np.float64).reshape(-1, D, D)
    keep = occ > 1e-6
    occ_k, W_k = occ[keep], W[keep]
    # normalize scatters to per-frame covariances
    Wn = W_k / np.maximum(occ_k, 1e-10)[:, None, None]
    beta = occ_k.sum()
    A = np.eye(D)
    for _ in range(n_iters):
        # 1. diagonal variances in the transformed space
        var = np.maximum(np.einsum("id,mde,ie->mi", A, Wn, A), var_floor)  # [M, D]
        # 2. exact per-row updates given the others
        for i in range(D):
            G = np.einsum("m,mde->de", occ_k / var[:, i], Wn)
            Gi = np.linalg.inv(G + 1e-8 * np.eye(D))
            cof = np.linalg.det(A) * np.linalg.inv(A).T[i]
            denom = float(cof @ Gi @ cof)
            if denom <= 0:
                continue
            A[i] = cof @ Gi * np.sqrt(beta / denom)
    var = np.maximum(np.einsum("id,mde,ie->mi", A, Wn, A), var_floor)
    vars_full = np.tile(np.mean(var, axis=0), (occ.shape[0], 1))
    vars_full[keep] = var
    return A.astype(np.float32), vars_full.reshape(S, K, D).astype(np.float32)


def stc_aux_loglik(A: np.ndarray, gmm: GmmSet, stats: StcStats, vars_y: np.ndarray) -> float:
    """Mean per-frame auxiliary log-likelihood (incl. log|det A|) — the
    monotonicity check for the alternating solve."""
    S, K, D = gmm.means.shape
    occ = np.asarray(stats.occ, np.float64).reshape(-1)
    W = np.asarray(stats.scatter, np.float64).reshape(-1, D, D)
    keep = occ > 1e-6
    occ_k = occ[keep]
    Wn = W[keep] / np.maximum(occ_k, 1e-10)[:, None, None]
    var = np.maximum(np.asarray(vars_y, np.float64).reshape(-1, D)[keep], 1e-10)
    beta = occ_k.sum()
    _sign, logdet = np.linalg.slogdet(np.asarray(A, np.float64))
    diag = np.einsum("id,mde,ie->mi", np.asarray(A, np.float64), Wn, np.asarray(A, np.float64))
    q = beta * logdet - 0.5 * float(
        np.sum(occ_k[:, None] * (np.log(2 * np.pi * var) + diag / var))
    )
    return q / max(beta, 1e-10)


def apply_stc(gmm: GmmSet, A: np.ndarray, vars_y: np.ndarray) -> GmmSet:
    """GmmSet scoring in the transformed space: means A mu, variances vars_y.
    Pair with features y = A x (fmllr.apply_fmllr with zero bias)."""
    Aj = jnp.asarray(A, dtype=gmm.means.dtype)
    new_means = jnp.einsum("skd,ed->ske", gmm.means, Aj)
    return GmmSet(gmm.weights, new_means, jnp.asarray(vars_y, gmm.vars.dtype))


def stc_feature_transform(A: np.ndarray) -> np.ndarray:
    """[D, D+1] transform for fmllr.apply_fmllr (zero bias)."""
    D = A.shape[0]
    return np.concatenate([A, np.zeros((D, 1), A.dtype)], axis=1).astype(np.float32)


def estimate_stc(
    gmm: GmmSet,
    feats_list,   # iterable of ([N_i, D] feats, [N_i] labels)
    n_iters: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate scatter stats over batches and run the alternating solve."""
    stats = None
    for feats, labels in feats_list:
        s = accumulate_stc_stats(gmm, feats, labels)
        stats = s if stats is None else StcStats(
            stats.occ + s.occ, stats.scatter + s.scatter
        )
    return solve_stc(gmm, stats, n_iters=n_iters)
