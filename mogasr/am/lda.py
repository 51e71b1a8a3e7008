"""LDA feature-space transform over spliced frames (Kaldi tri2b shape).

The classic CD-GMM front end replaces deltas with a learned projection:
splice +-C frames of the static features, estimate a linear discriminant
transform from forced-alignment class labels (pdf ids), and train the GMM
in the projected space.  Estimation (Haeb-Umbach & Ney 1992 formulation):

  - within-class scatter  W = T - B   (T total covariance, B between-class)
  - whiten W:  W^{-1/2} via its eigendecomposition (floored)
  - diagonalize the whitened between-class scatter  M = W^{-1/2} B W^{-1/2}
  - keep the top-d eigenvectors:  A = V_d^T W^{-1/2}   (rows ordered by
    decreasing class separation)

so the transformed within-class covariance is exactly I_d and the
between-class covariance is diagonal and descending — both properties are
unit-tested.  The returned transform is affine ([d, D+1], bias centering
the global mean) and feeds the same ``fmllr.apply_fmllr`` hook every other
feature-space transform uses; ``compose_affine`` stacks it with MLLT
(``am/stc.py``) into a single matrix, the standard splice->LDA->MLLT chain.

Statistics are one jitted pass per batch (two GEMMs + a [D, D] outer
product); only the [D, D] eigensolves run on host.  The stats pytree is
psum-able across a data mesh like every other accumulator in this repo.

No reference file can be cited (SURVEY.md §0: the /root/reference mount is
empty); the capability corresponds to the BASELINE.json GMM training
pipeline's feature-transform stage, built from the published algorithm.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LdaStats(NamedTuple):
    """Sufficient statistics for LDA: per-class occupancy and first
    moments, plus the global second moment (pytree, additive, psum-able)."""

    occ: jax.Array    # [S] class occupancies
    first: jax.Array  # [S, D] per-class feature sums
    outer: jax.Array  # [D, D] global sum of x x^T over valid frames


@functools.partial(jax.jit, static_argnums=(2,))
def accumulate_lda_stats(
    feats: jax.Array,   # [N, D] (spliced) features
    labels: jax.Array,  # [N] aligned class (pdf) ids, -1 = padding
    n_classes: int,
) -> LdaStats:
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    one_hot = jax.nn.one_hot(safe, n_classes, dtype=feats.dtype)
    one_hot = jnp.where(valid[:, None], one_hot, 0.0)  # [N, S]
    xm = jnp.where(valid[:, None], feats, 0.0)
    occ = jnp.sum(one_hot, axis=0)
    first = jnp.einsum("ns,nd->sd", one_hot, xm)
    outer = jnp.dot(xm.T, xm, precision=jax.lax.Precision.HIGHEST)
    return LdaStats(occ, first, outer)


def add_lda_stats(a: LdaStats, b: LdaStats) -> LdaStats:
    return LdaStats(a.occ + b.occ, a.first + b.first, a.outer + b.outer)


def solve_lda(
    stats: LdaStats,
    out_dim: int,
    within_floor: float = 1e-6,
) -> np.ndarray:
    """Stats -> affine LDA transform [out_dim, D + 1] (bias last column).

    Properties (tested): A Sigma_W A^T = I, A Sigma_B A^T diagonal with
    descending entries, and the bias centers the global mean (transformed
    corpus mean is 0). Eigenvalues of the within scatter are floored at
    within_floor * max(eig) so degenerate spliced dimensions (e.g.
    duplicated edge frames) cannot blow up the whitening.
    """
    occ = np.asarray(stats.occ, np.float64)
    first = np.asarray(stats.first, np.float64)
    outer = np.asarray(stats.outer, np.float64)
    D = first.shape[1]
    if not 0 < out_dim <= D:
        raise ValueError(f"out_dim={out_dim} must be in (0, {D}]")
    n = occ.sum()
    if n <= 0:
        raise ValueError("no occupancy in LDA stats")
    mu_g = first.sum(axis=0) / n
    total = outer / n - np.outer(mu_g, mu_g)
    keep = occ > 0
    mu_c = first[keep] / occ[keep, None]
    d = mu_c - mu_g[None, :]
    between = np.einsum("s,sd,se->de", occ[keep] / n, d, d)
    within = total - between
    within = 0.5 * (within + within.T)
    ew, Uw = np.linalg.eigh(within)
    ew = np.maximum(ew, within_floor * max(ew.max(), within_floor))
    w_m12 = (Uw / np.sqrt(ew)[None, :]) @ Uw.T
    m = w_m12 @ (0.5 * (between + between.T)) @ w_m12
    eb, V = np.linalg.eigh(0.5 * (m + m.T))
    order = np.argsort(eb)[::-1]
    A = (V[:, order[:out_dim]]).T @ w_m12   # [out_dim, D]
    bias = -A @ mu_g
    return np.concatenate([A, bias[:, None]], axis=1).astype(np.float32)


def compose_affine(w2: np.ndarray, w1: np.ndarray) -> np.ndarray:
    """y = A2 (A1 x + b1) + b2 as one [d2, D + 1] affine transform."""
    a2, b2 = np.asarray(w2, np.float64)[:, :-1], np.asarray(w2, np.float64)[:, -1]
    a1, b1 = np.asarray(w1, np.float64)[:, :-1], np.asarray(w1, np.float64)[:, -1]
    return np.concatenate(
        [a2 @ a1, (a2 @ b1 + b2)[:, None]], axis=1
    ).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def splice_frames(
    feats: jax.Array,     # [B, T, D]
    n_frames: jax.Array,  # [B]
    context: int,
) -> jax.Array:
    """[B, T, (2*context+1)*D] frame splicing with per-utterance clamped
    edges (offset order -C..+C), padding rows zeroed — the same edge and
    masking conventions as the delta path (jax_frontend._deltas_batched)."""
    B, T, _D = feats.shape
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    last = jnp.maximum(n_frames - 1, 0)[:, None]
    cols = []
    for off in range(-context, context + 1):
        idx = jnp.minimum(jnp.clip(t + off, 0, None), last)
        cols.append(jnp.take_along_axis(feats, idx[:, :, None], axis=1))
    out = jnp.concatenate(cols, axis=-1)
    mask = (t < n_frames[:, None]).astype(out.dtype)
    return out * mask[:, :, None]


def splice_np(feats: np.ndarray, context: int) -> np.ndarray:
    """NumPy oracle for a single unpadded [T, D] utterance."""
    T = feats.shape[0]
    idx = np.arange(T)
    cols = [
        feats[np.clip(idx + off, 0, max(T - 1, 0))]
        for off in range(-context, context + 1)
    ]
    return np.concatenate(cols, axis=-1)
