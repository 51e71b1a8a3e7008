"""Sequence-discriminative training of the hybrid NN (MMI + sMBR via autodiff).

The GMM systems get MMI/sMBR through explicit extended-Baum-Welch updates
(am/mmi.py, am/smbr.py); the neural hybrid gets the same criteria through
plain reverse-mode autodiff: the forward-backward log-likelihood and the
posterior-expected frame accuracy (decoder/forward_backward.py — a
log-semiring ``lax.scan``) are differentiable w.r.t. the emission scores.
d(num − den)/d(logits) IS the classical numerator-minus-denominator
occupancy difference, and d E[acc]/d(logits) IS the classical signed sMBR
weight — both produced by XLA's backward pass instead of hand-derived
statistics (identities tested against am/smbr.py's accumulator scans).
One jitted step runs the NN forward, the FB pass(es) (per-utterance
alignment chains as the MMI numerator, the shared word-loop graph as the
implicit-unigram denominator, exactly as am/mmi.py), the backward pass,
and the optimizer update.

CE-trained priors stay FROZEN during sequence training (the standard
hybrid recipe); acoustic_scale is the usual MMI kappa (~0.1).

No reference implementation exists for this capability (the /root/reference
mount is empty — SURVEY.md §0).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mogasr.config import TrainConfig


def nn_mmi_objective(
    model,
    params,
    log_priors: jax.Array,
    feats: jax.Array,      # [B, T, D]
    n_frames: jax.Array,   # [B]
    num_graphs: Dict[str, jax.Array],
    den_graphs: Dict[str, jax.Array],
    acoustic_scale: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """(loss, mmi_per_frame): loss = −mean over valid rows of the
    per-frame MMI criterion (num − den)/frames."""
    from mogasr.am.neural import posteriors_to_loglik
    from mogasr.decoder import forward_backward as fbd

    logits = model.apply(params, feats, n_frames)
    ll = posteriors_to_loglik(logits, log_priors)
    num = fbd.forward_backward(
        ll, num_graphs, n_frames, acoustic_scale=acoustic_scale
    ).loglik
    den = fbd.forward_backward(
        ll, den_graphs, n_frames, acoustic_scale=acoustic_scale
    ).loglik
    valid = n_frames > 0
    per_frame = jnp.where(
        valid, (num - den) / jnp.maximum(n_frames, 1), 0.0
    )
    mmi = jnp.sum(per_frame) / jnp.maximum(jnp.sum(valid), 1)
    return -mmi, mmi


def nn_smbr_objective(
    model,
    params,
    log_priors: jax.Array,
    feats: jax.Array,      # [B, T, D]
    n_frames: jax.Array,   # [B]
    den_graphs: Dict[str, jax.Array],
    ref_pdf: jax.Array,    # [B, T] reference pdf ids (-1 on padding)
    acoustic_scale: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """(loss, acc_per_frame): sMBR for the hybrid NN by autodiff.

    The criterion is the posterior-expected frame accuracy over the dense
    word-loop denominator,  E[acc] = sum_{t,j} gamma(t,j) * a(t,j)  with
    a(t,j) = 1[emit_id(j) == ref_pdf(t)].  gamma comes from the
    differentiable forward-backward scan, so d E[acc]/d emit_ll equals the
    classical signed sMBR weights (am/smbr.py smbr_quantities) — produced
    here by XLA's backward pass instead of the hand-derived ahat/bhat
    accumulator scans (identity tested in tests/test_nn_seq.py)."""
    from mogasr.am.neural import posteriors_to_loglik
    from mogasr.decoder import forward_backward as fbd

    logits = model.apply(params, feats, n_frames)
    ll = posteriors_to_loglik(logits, log_priors)
    res = fbd.forward_backward(
        ll, den_graphs, n_frames, acoustic_scale=acoustic_scale
    )
    B, T, _ = ll.shape
    acc = (den_graphs["emit_id"][:, None, :] == ref_pdf[:, :, None])
    mask = (jnp.arange(T)[None, :] < n_frames[:, None])[..., None]
    gamma = jnp.where(mask, jnp.exp(jnp.maximum(res.log_gamma, -80.0)), 0.0)
    e_acc = jnp.sum(gamma * acc.astype(gamma.dtype), axis=(1, 2))  # [B]
    valid = n_frames > 0
    per_frame = jnp.where(valid, e_acc / jnp.maximum(n_frames, 1), 0.0)
    acc_pf = jnp.sum(per_frame) / jnp.maximum(jnp.sum(valid), 1)
    return -acc_pf, acc_pf


def make_nn_mmi_step(
    model,
    cfg: TrainConfig,
    log_priors: jax.Array,
    acoustic_scale: float = 0.1,
):
    """Jitted (state, feats, n_frames, num_graphs, den_graphs) ->
    (state, metrics). Shares TrainState/optimizer with the CE loop so a
    CE checkpoint continues seamlessly."""
    from mogasr.am.train_nn import TrainState, make_optimizer

    opt = make_optimizer(cfg)
    priors = jnp.asarray(log_priors)

    @jax.jit
    def train_step(state, feats, n_frames, num_graphs, den_graphs):
        def loss_fn(params):
            return nn_mmi_objective(
                model, params, priors, feats, n_frames,
                num_graphs, den_graphs, acoustic_scale,
            )

        (loss, mmi), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "mmi_per_frame": mmi,
        }

    return train_step


def make_nn_smbr_step(
    model,
    cfg: TrainConfig,
    log_priors: jax.Array,
    acoustic_scale: float = 0.1,
):
    """Jitted (state, feats, n_frames, den_graphs, ref_pdf) ->
    (state, metrics); maximizes expected frame accuracy."""
    from mogasr.am.train_nn import TrainState, make_optimizer

    opt = make_optimizer(cfg)
    priors = jnp.asarray(log_priors)

    @jax.jit
    def train_step(state, feats, n_frames, den_graphs, ref_pdf):
        def loss_fn(params):
            return nn_smbr_objective(
                model, params, priors, feats, n_frames,
                den_graphs, ref_pdf, acoustic_scale,
            )

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "acc_per_frame": acc,
        }

    return train_step


def finetune_nn_smbr(
    labeled,               # Sequence[(FeatBatch, labels [B, T])]
    lexicon,
    topo,
    model,
    params,
    log_priors: jax.Array,
    tcfg: TrainConfig,
    steps: int,
    acoustic_scale: float = 0.1,
    logger=None,
) -> Tuple[Any, List[float]]:
    """sMBR fine-tuning of a CE-trained hybrid NN against its alignment
    labels (the CE targets double as the sMBR reference, the standard
    recipe). Returns (params, history of per-frame expected accuracy)."""
    from mogasr import pipeline as pipe
    from mogasr.am.train_nn import TrainState, make_optimizer
    from mogasr.config import DecodeConfig
    from mogasr.hmm import graph as gr

    den_graph = pipe.word_decode_graph(
        lexicon, topo, DecodeConfig(acoustic_scale=acoustic_scale)
    )
    prepared = []
    for fb, labels in labeled:
        rows = int(fb.feats.shape[0])
        den_np = gr.batch_graphs([den_graph] * rows)
        prepared.append((
            fb,
            {k: jnp.asarray(v) for k, v in den_np.items()},
            jnp.asarray(labels),
        ))

    if not prepared:
        raise ValueError("finetune_nn_smbr: no batches to train on "
                         "(an empty list would loop forever)")
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_nn_smbr_step(model, tcfg, log_priors, acoustic_scale)
    history: List[float] = []
    i = 0
    while i < steps:
        for fb, den_g, ref_pdf in prepared:
            state, m = step_fn(state, fb.feats, fb.n_frames, den_g, ref_pdf)
            history.append(float(m["acc_per_frame"]))
            i += 1
            if logger is not None and (i % 10 == 0 or i == steps):
                logger.log({"stage": "nn_smbr", "step": i,
                            "acc_per_frame": history[-1]})
            if i >= steps:
                break
    return state.params, history


def finetune_nn_mmi(
    batches,
    lexicon,
    topo,
    model,
    params,
    log_priors: jax.Array,
    tcfg: TrainConfig,
    steps: int,
    acoustic_scale: float = 0.1,
    logger=None,
) -> Tuple[Any, List[float]]:
    """MMI fine-tuning of a CE-trained hybrid NN. Returns (params, history)
    where history is the per-frame MMI criterion at each step (ascending =
    learning). Numerator/denominator graphs are built once per batch on the
    host; the step compiles once per batch shape bucket (same as EM)."""
    from mogasr import pipeline as pipe
    from mogasr.am.train_nn import make_optimizer
    from mogasr.config import DecodeConfig
    from mogasr.hmm import graph as gr

    den_graph = pipe.word_decode_graph(
        lexicon, topo, DecodeConfig(acoustic_scale=acoustic_scale)
    )
    prepared = []
    for fb in batches:
        rows = int(fb.feats.shape[0])
        num_np = pipe.build_align_graphs(fb.words, lexicon, topo)
        den_np = gr.batch_graphs([den_graph] * rows)
        prepared.append((
            fb,
            {k: jnp.asarray(v) for k, v in num_np.items()},
            {k: jnp.asarray(v) for k, v in den_np.items()},
        ))

    if not prepared:
        raise ValueError("finetune_nn_mmi: no batches to train on "
                         "(an empty list would loop forever)")
    opt = make_optimizer(tcfg)
    from mogasr.am.train_nn import TrainState

    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_nn_mmi_step(model, tcfg, log_priors, acoustic_scale)
    history: List[float] = []
    i = 0
    while i < steps:
        for fb, num_g, den_g in prepared:
            state, m = step_fn(state, fb.feats, fb.n_frames, num_g, den_g)
            history.append(float(m["mmi_per_frame"]))
            i += 1
            if logger is not None and (i % 10 == 0 or i == steps):
                logger.log({"stage": "nn_mmi", "step": i,
                            "mmi_per_frame": history[-1]})
            if i >= steps:
                break
    return state.params, history
