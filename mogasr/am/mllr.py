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

from typing import NamedTuple, Optional

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


def _solve_rows(
    occ: np.ndarray, xsum: np.ndarray, means: np.ndarray, var: np.ndarray,
    min_occ: float,
) -> Optional[np.ndarray]:
    """Row-wise closed-form solve over flat [M]-indexed Gaussian stats.
    Returns W [D, D+1], or None when occupancy is too small to estimate."""
    D = means.shape[1]
    if occ.sum() < max(min_occ, D + 1):
        return None
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


def _flat_stats(gmm: GmmSet, stats: MllrStats):
    occ = np.asarray(stats.occ, np.float64).reshape(-1)                  # [M]
    xsum = np.asarray(stats.xsum, np.float64).reshape(occ.shape[0], -1)  # [M, D]
    means = np.asarray(gmm.means, np.float64).reshape(occ.shape[0], -1)
    var = np.maximum(np.asarray(gmm.vars, np.float64).reshape(occ.shape[0], -1), 1e-8)
    return occ, xsum, means, var


def solve_mllr(gmm: GmmSet, stats: MllrStats, min_occ: float = 1.0) -> np.ndarray:
    """Closed-form GLOBAL mean-MLLR solve -> W = [A | b], shape [D, D+1].

    Components with negligible occupancy contribute nothing; if the total
    occupancy is too small to estimate D*(D+1) parameters, returns identity.
    """
    occ, xsum, means, var = _flat_stats(gmm, stats)
    D = means.shape[1]
    W = _solve_rows(occ, xsum, means, var, min_occ)
    if W is None:
        return np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1).astype(np.float32)
    return W


def speech_sil_classes(topo) -> np.ndarray:
    """[n_pdfs] regression classes: 0 = silence pdfs, 1 = speech pdfs — the
    classic 2-class regression partition (silence behaves like a different
    'speaker' than speech under channel/noise mismatch)."""
    classes = np.ones(topo.n_pdfs, np.int32)
    classes[: topo.sil_states] = 0
    return classes


def solve_mllr_classes(
    gmm: GmmSet,
    stats: MllrStats,
    classes: np.ndarray,     # [S] regression class per pdf state
    min_occ: float = 1.0,
) -> np.ndarray:
    """Per-regression-class mean-MLLR -> W [n_classes, D, D+1].

    Each class solves over its member Gaussians only; classes with too
    little occupancy back off to the GLOBAL transform (or identity when even
    the global one is unestimable) — the standard regression-tree backoff,
    flattened to one level.
    """
    occ, xsum, means, var = _flat_stats(gmm, stats)
    S, K = np.asarray(stats.occ).shape
    D = means.shape[1]
    member = np.repeat(np.asarray(classes, np.int32), K)  # [S*K]
    n_classes = int(classes.max()) + 1
    W_global = solve_mllr(gmm, stats, min_occ=min_occ)
    out = np.empty((n_classes, D, D + 1), np.float32)
    for c in range(n_classes):
        m = member == c
        W = _solve_rows(occ[m], xsum[m], means[m], var[m], min_occ)
        out[c] = W_global if W is None else W
    return out


def apply_mllr_classes(
    gmm: GmmSet, Ws: np.ndarray, classes: np.ndarray
) -> GmmSet:
    """Adapted means with one transform per regression class."""
    Wj = jnp.asarray(Ws, dtype=gmm.means.dtype)         # [C, D, D+1]
    cls = jnp.asarray(classes, jnp.int32)               # [S]
    A = Wj[cls, :, :-1]                                 # [S, D, D]
    b = Wj[cls, :, -1]                                  # [S, D]
    new_means = jnp.einsum("skd,sed->ske", gmm.means, A) + b[:, None, :]
    return gmm._replace(means=new_means)


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
