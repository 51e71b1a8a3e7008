"""Pruned RNN-T loss: evaluate the joint network only on a (t, u) band.

The transducer training bottleneck is the joint network's [B, T, U+1, H]
tanh + output GEMMs — every frame against every label position, though the
posterior mass of the alignment lattice lives in a narrow monotone band
around the "diagonal".  The pruned recipe (Kuang et al., Interspeech 2022 —
the k2 `rnnt_loss_pruned`; re-derived here, no reference implementation
exists for this capability, the /root/reference mount is empty, SURVEY §0):

1. **Simple pass** — a factored trivial joint `am[t, v] + lm[u, v]` (two
   Dense heads, RnntModel.simple_heads) scores the FULL lattice at
   O(B·T·U·V) adds with O(B·U·V) live memory (a `lax.scan` over frames —
   never materializing [B, T, U, V]), and the shared lattice DP
   (rnnt.rnnt_dp_nll) turns the grids into a proper transducer NLL.
2. **Bounds** — `jax.grad` of that DP w.r.t. the emit/blank grids IS the
   arc-occupancy table; the occupancy-weighted mean label position per
   frame, clamped to a monotone band with per-step advance < band width
   (so adjacent bands overlap and blank edges survive) that starts at
   u=0 and ends covering u=U, gives `u_start[b, t]`.
3. **Pruned pass** — the REAL joint runs only on the band
   (RnntJoint.banded: [B, T, S, V], S = band), and a banded version of the
   same DP yields the pruned NLL.  Training loss = pruned NLL + a scaled
   simple NLL (the simple heads must keep learning or the bounds go stale).

With U+1 = 33 and S = 4 the joint GEMMs shrink 8×; the banded DP carries
an alpha row of width S instead of U+1.  Exactness: with S >= U+1 the band
covers everything and `rnnt_loss_banded` equals `rnnt_loss` to machine
precision (tested, values and gradients); for S < U+1 it is a provable
upper bound on the true NLL (a sub-lattice can only lose probability mass).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mogasr.am.rnnt import NEG_INF, RnntModel, RnntTrainState, rnnt_dp_nll
from mogasr.config import TrainConfig


# --------------------------------------------------------------------------
# Simple (factored) lattice grids
# --------------------------------------------------------------------------


@jax.jit
def rnnt_grids_simple(
    am: jax.Array,      # [B, T, V] encoder head (blank = V-1)
    lm: jax.Array,      # [B, U+1, V] prediction head
    labels: jax.Array,  # [B, U] (-1 padding), blank-free
) -> Tuple[jax.Array, jax.Array]:
    """(blank [B,T,U+1], emit [B,T,U]) log-prob grids of the factored joint
    logit(t,u,v) = am[t,v] + lm[u,v], normalized over v per (t, u).

    The normalizer couples t and u, so this is computed one frame at a time
    (scan over T): peak memory O(B·(U+1)·V), never O(B·T·(U+1)·V).
    """
    safe = jnp.maximum(labels, 0).astype(jnp.int32)           # [B, U]

    def row(_, am_t):                                         # am_t [B, V]
        s = am_t[:, None, :] + lm                             # [B, U+1, V]
        z = jax.scipy.special.logsumexp(s, axis=-1)           # [B, U+1]
        blank_t = s[..., -1] - z
        emit_t = (
            jnp.take_along_axis(s[:, :-1, :], safe[:, :, None], axis=2)[..., 0]
            - z[:, :-1]
        )
        return None, (blank_t, emit_t)

    _, (blank, emit) = jax.lax.scan(row, None, jnp.swapaxes(am, 0, 1))
    return jnp.swapaxes(blank, 0, 1), jnp.swapaxes(emit, 0, 1)


# --------------------------------------------------------------------------
# Pruning bounds from simple-lattice occupancies
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("band",))
def rnnt_prune_bounds(
    blank: jax.Array,     # [B, T, U+1] simple blank grid
    emit: jax.Array,      # [B, T, U] simple emit grid
    n_frames: jax.Array,  # [B]
    n_labels: jax.Array,  # [B]
    band: int,
) -> jax.Array:
    """u_start [B, T] int32: first label position of each frame's band.

    Guarantees (per valid row b, for t < n_frames):
      * u_start[b, 0] == 0                        (lattice start in band)
      * 0 <= u_start[t+1] - u_start[t] <= band-1  (adjacent bands overlap,
                                                   so blank edges survive)
      * u_start[b, n_frames-1] == max(n_labels+1-band, 0)
                                                  (final node in band)
    Caller should wrap in stop_gradient — bounds are a discrete choice.
    """
    B, T, U1 = blank.shape
    S = band

    def nll_sum(grids):
        b, e = grids
        return jnp.sum(rnnt_dp_nll(b, e, n_frames, n_labels))

    g_blank, g_emit = jax.grad(nll_sum)((blank, emit))
    # d(nll)/d(grid) = -(arc posterior); node occupancy = sum of out-arcs
    w = -g_blank + jnp.pad(-g_emit, ((0, 0), (0, 0), (0, 1)))  # [B, T, U+1]
    w = jnp.maximum(w, 0.0)
    u_idx = jnp.arange(U1, dtype=jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=-1), 1e-6)             # [B, T]
    u_hat = jnp.sum(w * u_idx, axis=-1) / denom
    raw = jnp.round(u_hat - (S - 1) / 2.0).astype(jnp.int32)   # [B, T]

    fin = jnp.maximum(n_labels.astype(jnp.int32) + 1 - S, 0)   # [B]
    last = jnp.maximum(n_frames.astype(jnp.int32) - 1, 0)      # [B]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    # Minimum start at t so that advancing <= S-1 per frame still reaches
    # fin by the last frame (closed form, no scan needed).
    lower = jnp.maximum(
        0, fin[:, None] - (last[:, None] - t_idx[None, :]) * max(S - 1, 1)
    )
    lower = jnp.minimum(lower, fin[:, None])                   # [B, T]

    def fwd(u_prev, x):
        raw_t, lo_t, active = x                                # [B] each
        lo = jnp.maximum(u_prev, lo_t)
        hi = jnp.maximum(jnp.minimum(u_prev + (S - 1), fin), lo)
        u_t = jnp.clip(raw_t, lo, hi)
        u_t = jnp.where(active, u_t, u_prev)
        return u_t, u_t

    u0 = jnp.zeros((B,), jnp.int32)                            # t=0: start
    if T == 1:
        return u0[:, None]
    xs = (
        jnp.swapaxes(raw[:, 1:], 0, 1),
        jnp.swapaxes(lower[:, 1:], 0, 1),
        jnp.swapaxes(
            t_idx[None, 1:] < n_frames[:, None].astype(jnp.int32), 0, 1
        ),
    )
    _, rest = jax.lax.scan(fwd, u0, xs)
    return jnp.concatenate([u0[:, None], jnp.swapaxes(rest, 0, 1)], axis=1)


# --------------------------------------------------------------------------
# Banded lattice DP
# --------------------------------------------------------------------------


@jax.jit
def rnnt_loss_banded(
    logits_band: jax.Array,  # [B, T, S, V] joint logits on the band
    u_start: jax.Array,      # [B, T] band starts (rnnt_prune_bounds)
    n_frames: jax.Array,     # [B]
    labels: jax.Array,       # [B, U] (-1 padding)
    n_labels: jax.Array,     # [B]
) -> jax.Array:
    """Per-utterance NLL of the banded lattice, shape [B]. Blank = V-1.

    Same recurrence as rnnt.rnnt_dp_nll in band coordinates s = u -
    u_start[t]: the emit edge stays within a frame row (s-1 -> s); the
    blank edge t-1 -> t keeps u, so the band coordinate shifts by
    delta_t = u_start[t] - u_start[t-1] (edges leaving the band are lost —
    that is the pruning). With S >= U+1 and u_start == 0 this IS the exact
    loss (tested against rnnt_loss, values and gradients).
    """
    B, T, S, V = logits_band.shape
    U = labels.shape[1]
    logp = jax.nn.log_softmax(logits_band, axis=-1)
    u_of = u_start[:, :, None] + jnp.arange(S, dtype=jnp.int32)  # [B, T, S]
    safe = jnp.maximum(labels, 0).astype(jnp.int32)
    lab = jnp.take_along_axis(
        safe[:, None, :], jnp.clip(u_of, 0, U - 1), axis=2
    )                                                            # [B, T, S]
    blank_b = logp[..., V - 1]
    emit_b = jnp.take_along_axis(logp, lab[..., None], axis=3)[..., 0]
    nl = n_labels.astype(jnp.int32)[:, None, None]
    emit_b = jnp.where(u_of < nl, emit_b, NEG_INF)   # no emit at/past u=U_b
    blank_b = jnp.where(u_of <= nl, blank_b, NEG_INF)  # states past final

    s_idx = jnp.arange(S, dtype=jnp.int32)

    def emit_row(base, emit_t):
        """alpha row from its blank-edge bases via the in-row emit scan."""

        def inner(carry, x):
            base_s, e = x
            a = jnp.logaddexp(base_s, carry + e)
            return a, a

        a0 = base[:, 0]
        _, rest = jax.lax.scan(
            inner, a0,
            (base[:, 1:].swapaxes(0, 1), emit_t[:, :-1].swapaxes(0, 1)),
        )
        return jnp.concatenate([a0[:, None], rest.swapaxes(0, 1)], axis=1)

    base0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)  # u_start[:,0] == 0
    alpha = emit_row(base0, emit_b[:, 0])

    def step(alpha, x):
        blank_tm1, emit_t, delta, active = x
        src = s_idx[None, :] + delta[:, None]                  # [B, S]
        shifted = jnp.take_along_axis(alpha, jnp.clip(src, 0, S - 1), axis=1)
        shifted_bl = jnp.take_along_axis(
            blank_tm1, jnp.clip(src, 0, S - 1), axis=1
        )
        base = jnp.where(src < S, shifted + shifted_bl, NEG_INF)
        new = emit_row(base, emit_t)
        return jnp.where(active[:, None], new, alpha), None

    if T > 1:
        deltas = u_start[:, 1:] - u_start[:, :-1]              # [B, T-1]
        ts = jnp.arange(1, T, dtype=jnp.int32)
        xs = (
            jnp.swapaxes(blank_b[:, :-1], 0, 1),
            jnp.swapaxes(emit_b[:, 1:], 0, 1),
            jnp.swapaxes(deltas, 0, 1),
            jnp.swapaxes(
                ts[None, :] < n_frames[:, None].astype(jnp.int32), 0, 1
            ),
        )
        alpha, _ = jax.lax.scan(step, alpha, xs)

    last = jnp.maximum(n_frames.astype(jnp.int32) - 1, 0)
    u_start_last = jnp.take_along_axis(u_start, last[:, None], axis=1)[:, 0]
    s_fin = jnp.clip(nl[:, 0, 0] - u_start_last, 0, S - 1)
    a_fin = jnp.take_along_axis(alpha, s_fin[:, None], axis=1)[:, 0]
    blank_last_row = jnp.take_along_axis(
        blank_b, last[:, None, None], axis=1
    )[:, 0, :]
    blank_fin = jnp.take_along_axis(blank_last_row, s_fin[:, None], axis=1)[
        :, 0
    ]
    return -(a_fin + blank_fin)


# --------------------------------------------------------------------------
# Objective + train step
# --------------------------------------------------------------------------


def rnnt_pruned_objective(
    model: RnntModel,
    params,
    feats,
    n_frames,
    labels,
    n_labels,
    band: int,
    simple_scale: float = 0.5,
    ctc_weight: float = 1.0,
):
    """Pruned training loss: banded NLL + simple_scale * factored NLL
    (+ auxiliary CTC when model.aux_ctc), masked-mean normalized like
    rnnt.rnnt_objective. Returns (loss, mean banded NLL)."""
    from mogasr.am.ctc import ctc_loss, masked_mean_objective

    am, lm, enc, pred, ctc_logits = model.apply(
        params, feats, n_frames, labels, method=RnntModel.forward_simple
    )
    blank_g, emit_g = rnnt_grids_simple(am, lm, labels)
    simple_nll = rnnt_dp_nll(blank_g, emit_g, n_frames, n_labels)
    u_start = jax.lax.stop_gradient(
        rnnt_prune_bounds(
            jax.lax.stop_gradient(blank_g),
            jax.lax.stop_gradient(emit_g),
            n_frames, n_labels, band,
        )
    )
    logits_band = model.apply(
        params, enc, pred, u_start, band, method=RnntModel.joint_banded
    )
    pruned_nll = rnnt_loss_banded(logits_band, u_start, n_frames, labels,
                                  n_labels)
    # Band feasibility: covering both the lattice start (u=0) and the final
    # node needs at most band-1 label advances per frame, i.e.
    # n_labels+1-band <= (n_frames-1)*(band-1). An infeasible utterance
    # (more labels than the band can traverse in its frames) would get a
    # ~1e30 banded NLL that poisons the batch mean — exclude it from the
    # pruned term (it still trains through the simple term below).
    feasible = (
        jnp.maximum(n_labels + 1 - band, 0)
        <= jnp.maximum(n_frames - 1, 0) * max(band - 1, 1)
    )
    loss_p, mean_nll = masked_mean_objective(
        pruned_nll, n_frames, jnp.where(feasible, n_labels, 0)
    )
    loss_s, _ = masked_mean_objective(simple_nll, n_frames, n_labels)
    loss = loss_p + simple_scale * loss_s
    if model.aux_ctc:
        ctc_nll = ctc_loss(ctc_logits, n_frames, labels, n_labels)
        ctc_mean, _ = masked_mean_objective(ctc_nll, n_frames, n_labels)
        loss = loss + ctc_weight * ctc_mean
    return loss, mean_nll


def make_rnnt_pruned_train_step(
    model: RnntModel,
    cfg: TrainConfig,
    band: int,
    simple_scale: float = 0.5,
    ctc_weight: float = 1.0,
):
    """Jitted pruned-transducer train step (drop-in for
    rnnt.make_rnnt_train_step; model must be built with simple_heads)."""
    from mogasr.am.train_nn import make_optimizer

    if not model.simple_heads:
        raise ValueError("pruned training needs build_rnnt_model("
                         "simple_heads=True)")
    if band < 2:
        raise ValueError("pruned band must be >= 2 (band=1 cannot advance "
                         "through the lattice)")
    opt = make_optimizer(cfg)

    @jax.jit
    def train_step(state, feats, n_frames, labels, n_labels):
        def loss_fn(params):
            return rnnt_pruned_objective(
                model, params, feats, n_frames, labels, n_labels,
                band, simple_scale, ctc_weight,
            )

        (loss, mean_nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return RnntTrainState(params, opt_state, state.step + 1), {
            "loss": loss, "utt_nll": mean_nll,
        }

    return train_step
