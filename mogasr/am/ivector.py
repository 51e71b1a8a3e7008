"""i-vectors: UBM + total-variability subspace speaker characterization.

The GMM-era speaker/channel front end (Dehak et al. 2011): a diagonal UBM
(one unlabeled GmmSet state, trained by the same EM machinery as the
acoustic models) summarizes each utterance into zeroth/first-order
Baum-Welch statistics; a low-rank "total variability" matrix T models the
per-utterance supervector offset  M(u) = m + T w(u),  w ~ N(0, I); the MAP
point estimate of w(u) is the i-vector.

All the FLOPs-dense pieces run jitted on device:
  - UBM responsibilities + per-utterance stats: one GEMM-shaped pass per
    batch (`accumulate_bw_stats`, masked for padding, vmapped over utts)
  - the E-step posterior  L_u = I + T' Sigma^{-1} N_u T,
    E[w] = L_u^{-1} T' Sigma^{-1} F_u  — batched [R, R] solves via vmap
  - the M-step accumulators — einsums over (utt, comp, dim, rank)
Only the final per-component [R, R] linear solves run on host (K solves of
rank R ~ tens; negligible).

Uses: cosine-scored speaker ID / verification (tested on the v2 synthetic
corpus, which has genuine per-speaker formant/tilt variation), and
i-vector-augmented neural AM inputs.

No reference file can be cited (SURVEY.md §0: /root/reference is empty);
built from the published algorithm to cover the speaker-characterization
capability of the BASELINE.json spec's model family.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mogasr.am.gmm import GmmSet, LOG_2PI


class BwStats(NamedTuple):
    """Per-utterance Baum-Welch stats against the UBM (pytree)."""

    n: jax.Array  # [..., K] zeroth order (occupancies)
    f: jax.Array  # [..., K, D] first order, CENTERED on the UBM means


def _ubm_log_resp(feats: jax.Array, ubm: GmmSet) -> jax.Array:
    """[N, D] -> [N, K] per-component log responsibilities (normalized)."""
    w = jnp.maximum(ubm.weights[0], 1e-30)
    mu = ubm.means[0]
    var = jnp.maximum(ubm.vars[0], 1e-8)
    x = feats[:, None, :]
    ll = (
        jnp.log(w)
        - 0.5 * (feats.shape[-1] * LOG_2PI + jnp.sum(jnp.log(var), -1))
        - 0.5 * jnp.sum((x - mu) ** 2 / var, -1)
    )
    return ll - jax.scipy.special.logsumexp(ll, axis=-1, keepdims=True)


@jax.jit
def accumulate_bw_stats(
    feats: jax.Array,     # [B, T, D]
    n_frames: jax.Array,  # [B]
    ubm: GmmSet,          # S == 1
) -> BwStats:
    """Batched per-utterance zeroth/first-order UBM stats (padding masked)."""
    B, T, D = feats.shape
    mask = (jnp.arange(T)[None, :] < n_frames[:, None]).astype(feats.dtype)

    def one(x, m):
        gamma = jnp.exp(_ubm_log_resp(x, ubm)) * m[:, None]      # [T, K]
        n = jnp.sum(gamma, axis=0)                                # [K]
        f = jnp.einsum("tk,td->kd", gamma, x) - n[:, None] * ubm.means[0]
        return n, f

    n, f = jax.vmap(one)(feats, mask)
    return BwStats(n, f)


@functools.partial(jax.jit, static_argnums=())
def _estep(
    t_mat: jax.Array,   # [K, D, R]
    inv_var: jax.Array, # [K, D]
    stats: BwStats,     # n [U, K], f [U, K, D]
) -> Tuple[jax.Array, jax.Array]:
    """Posterior moments of w per utterance: E[w] [U, R], E[ww'] [U, R, R]."""
    R = t_mat.shape[-1]
    tsig = t_mat * inv_var[:, :, None]                 # [K, D, R] = Sigma^-1 T
    gram = jnp.einsum("kdr,kds->krs", tsig, t_mat)     # [K, R, R]

    def one(n_u, f_u):
        prec = jnp.eye(R) + jnp.einsum("k,krs->rs", n_u, gram)
        rhs = jnp.einsum("kdr,kd->r", tsig, f_u)
        chol = jax.scipy.linalg.cho_factor(prec)
        mean = jax.scipy.linalg.cho_solve(chol, rhs)
        cov = jax.scipy.linalg.cho_solve(chol, jnp.eye(R))
        return mean, cov + jnp.outer(mean, mean)

    return jax.vmap(one)(stats.n, stats.f)


@jax.jit
def _mstep_accumulators(
    stats: BwStats,   # n [U, K], f [U, K, D]
    w_mean: jax.Array,   # [U, R]
    w_sq: jax.Array,     # [U, R, R]
) -> Tuple[jax.Array, jax.Array]:
    """A_k = sum_u n_uk E[ww'] [K, R, R];  C = sum_u f_u E[w]' [K, D, R]."""
    a = jnp.einsum("uk,urs->krs", stats.n, w_sq)
    c = jnp.einsum("ukd,ur->kdr", stats.f, w_mean)
    return a, c


def train_total_variability(
    stats_list: Sequence[BwStats],   # batched stats (any leading shape)
    ubm: GmmSet,
    rank: int,
    n_iters: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """EM for the total-variability matrix T [K, D, rank]."""
    K, D = ubm.means.shape[1], ubm.means.shape[2]
    rng = np.random.default_rng(seed)
    t_mat = jnp.asarray(
        (0.1 * rng.standard_normal((K, D, rank))).astype(np.float32)
    )
    inv_var = 1.0 / jnp.maximum(ubm.vars[0], 1e-8)
    flat = _flatten_stats(stats_list)
    for _ in range(n_iters):
        w_mean, w_sq = _estep(t_mat, inv_var, flat)
        a, c = _mstep_accumulators(flat, w_mean, w_sq)
        a_np = np.asarray(a, np.float64)
        c_np = np.asarray(c, np.float64)
        t_new = np.empty((K, D, rank))
        eye = 1e-6 * np.eye(rank)
        for k in range(K):
            t_new[k] = np.linalg.solve(a_np[k] + eye, c_np[k].T).T
        t_mat = jnp.asarray(t_new.astype(np.float32))
    return np.asarray(t_mat)


def _flatten_stats(stats_list: Sequence[BwStats]) -> BwStats:
    n = jnp.concatenate([s.n.reshape(-1, s.n.shape[-1]) for s in stats_list])
    f = jnp.concatenate(
        [s.f.reshape(-1, *s.f.shape[-2:]) for s in stats_list]
    )
    return BwStats(n, f)


def extract_ivectors(
    stats: BwStats,       # n [U, K], f [U, K, D]
    ubm: GmmSet,
    t_mat: np.ndarray,    # [K, D, R]
) -> np.ndarray:
    """MAP point estimates E[w | utt] -> [U, R] i-vectors."""
    inv_var = 1.0 / jnp.maximum(ubm.vars[0], 1e-8)
    w_mean, _ = _estep(jnp.asarray(t_mat), inv_var, stats)
    return np.asarray(w_mean)


def extract_ivectors_batches(
    batches,              # Sequence[FeatBatch-like]
    ubm: GmmSet,
    t_mat: np.ndarray,
    stats_list: Optional[Sequence[BwStats]] = None,
) -> dict:
    """{utt_id: ivector} over featurized batches.

    Slices each batch's stats to its REAL utterance count before pairing
    with ids — batch rows beyond fb.size are padding (zero stats produce a
    zero i-vector, which would silently misalign a flat concatenation)."""
    out = {}
    for i, fb in enumerate(batches):
        s = (
            stats_list[i]
            if stats_list is not None
            else accumulate_bw_stats(fb.feats, fb.n_frames, ubm)
        )
        vecs = extract_ivectors(s, ubm, t_mat)
        for b, uid in enumerate(fb.utt_ids):
            out[uid] = vecs[b]
    return out


def tv_aux_loglik(
    stats: BwStats, ubm: GmmSet, t_mat: np.ndarray
) -> float:
    """Mean per-utterance EM auxiliary objective (up to stats-only consts):
    E_q[log p(F | w)] - KL(q(w) || N(0, I)) — monotone non-decreasing over
    training iterations (tested)."""
    t_j = jnp.asarray(t_mat)
    inv_var = 1.0 / jnp.maximum(ubm.vars[0], 1e-8)
    w_mean, w_sq = _estep(t_j, inv_var, stats)
    R = t_mat.shape[-1]
    tsig = t_j * inv_var[:, :, None]
    gram = jnp.einsum("kdr,kds->krs", tsig, t_j)

    def one(n_u, f_u, m_u, s_u):
        # E[ -0.5 (Tw)' Sig^-1 N (Tw) + F' Sig^-1 T w ] and the KL term
        quad = -0.5 * jnp.sum(jnp.einsum("k,krs->rs", n_u, gram) * s_u)
        lin = jnp.einsum("kdr,kd,r->", tsig, f_u, m_u)
        cov = s_u - jnp.outer(m_u, m_u)
        sign, logdet = jnp.linalg.slogdet(cov)
        kl = 0.5 * (jnp.trace(s_u) - R - sign * logdet)
        return quad + lin - kl

    vals = jax.vmap(one)(stats.n, stats.f, w_mean, w_sq)
    return float(jnp.mean(vals))


def train_ubm(
    batches,              # Sequence[FeatBatch-like] with .feats [B,T,D], .n_frames
    n_components: int,
    n_iters: int = 8,
    seed: int = 0,
    var_floor: float = 1e-3,
) -> GmmSet:
    """Diagonal UBM as a single-state GmmSet via the repo's EM machinery:
    all valid frames labeled 0, standard split-and-refit schedule."""
    from mogasr.am import em

    feats_flat, labels_flat = [], []
    for fb in batches:
        B, T, D = fb.feats.shape
        mask = np.arange(T)[None, :] < np.asarray(fb.n_frames)[:, None]
        feats_flat.append(np.asarray(fb.feats)[mask])
    x = np.concatenate(feats_flat).astype(np.float32)
    y = np.zeros(len(x), np.int32)
    gmm = em.init_from_labels(x, y, 1)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    it = 0
    while True:
        stats = em.accumulate_stats(gmm, xj, yj)
        gmm = em.m_step(gmm, stats, var_floor=var_floor)
        it += 1
        if it >= n_iters and gmm.n_components >= n_components:
            break
        if it % 2 == 0 and gmm.n_components < n_components:
            gmm = em.split_components(gmm, seed=seed + it)
            if gmm.n_components > n_components:
                gmm = GmmSet(
                    gmm.weights[:, :n_components],
                    gmm.means[:, :n_components],
                    gmm.vars[:, :n_components],
                )
    return gmm


def length_normalize(ivecs: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Project i-vectors to the unit sphere (standard before cosine/PLDA)."""
    return ivecs / np.maximum(np.linalg.norm(ivecs, axis=-1, keepdims=True), eps)


def cosine_score(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[M, R] x [N, R] -> [M, N] cosine similarity matrix."""
    an = length_normalize(np.atleast_2d(a))
    bn = length_normalize(np.atleast_2d(b))
    return an @ bn.T


class IvectorExtractor(NamedTuple):
    """Trained i-vector front end: diagonal UBM + total-variability matrix.
    The pytree shape makes it orbax-checkpointable alongside AM params."""

    ubm: GmmSet
    t_mat: np.ndarray   # [K, D, R]

    @property
    def rank(self) -> int:
        return int(self.t_mat.shape[-1])


def train_ivector_extractor(
    batches,
    n_components: int = 64,
    rank: int = 16,
    ubm_iters: int = 8,
    tv_iters: int = 8,
    seed: int = 0,
) -> IvectorExtractor:
    """UBM + total-variability training on featurized batches — the one-call
    constructor shared by diarization and i-vector-augmented AM training."""
    ubm = train_ubm(batches, n_components, n_iters=ubm_iters, seed=seed)
    stats = [
        accumulate_bw_stats(fb.feats, fb.n_frames, ubm) for fb in batches
    ]
    t_mat = train_total_variability(stats, ubm, rank, n_iters=tv_iters,
                                    seed=seed)
    return IvectorExtractor(ubm, t_mat)


def utterance_ivectors(
    extractor: IvectorExtractor, feats, n_frames, length_norm: bool = True
) -> np.ndarray:
    """[B, R] per-utterance i-vectors (rows past the real count give zero
    stats -> zero vectors; callers mask by batch.size)."""
    stats = accumulate_bw_stats(feats, n_frames, extractor.ubm)
    vecs = extract_ivectors(stats, extractor.ubm, extractor.t_mat)
    return length_normalize(vecs) if length_norm else vecs
