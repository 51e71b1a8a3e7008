"""Pallas forward-backward: both lattice passes as single kernels.

Log-semiring twin of decoder/viterbi_pallas.py for the Baum-Welch E-step
(decoder/forward_backward.py): the forward scan and the backward scan each
run as ONE ``pallas_call`` with a sequential frame grid — the backward one
simply reverses its block index maps, so the "reverse scan" is the same
forward-executing grid reading blocks back-to-front.  Graph arrays are
VMEM-resident via constant index maps (one HBM read per pass instead of
one per frame), the alpha/beta row lives in scratch, and the per-frame
emission row streams through the block pipeline.

Per step: lane shift + adds + two logaddexps + one lane logsumexp-reduce
(VPU, exp/log heavy — the sum-product version of the Viterbi step).
Equality with forward_backward() is tested to float tolerance (the
logsumexp reduction order differs inside Mosaic, so bitwise equality is
not the contract here, unlike the max-plus kernel) on align and loop
graphs with ragged batches; same frozen-row semantics past n_frames.

Scope: plain chain+loop graphs; CTC skip topologies stay on the XLA path.
Opt-in pending an on-chip A/B (same policy as viterbi_pallas).

No reference implementation exists for this capability (the
/root/reference mount is empty — SURVEY.md §0).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mogasr.decoder.forward_backward import FBResult, NEG_INF
from mogasr.decoder.viterbi_pallas import _on_tpu, _round_up


def _lse_lanes(x):
    """logsumexp over lanes (axis 1) with the usual max-shift."""
    m = jnp.max(x, axis=1, keepdims=True)
    return (m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True)))[:, 0]


def _fwd_kernel(nf_ref, emit_ref, selfp_ref, advp_ref, enterp_ref,
                exitp_ref, initp_ref, alphas_ref, alpha_fin_ref, alpha_scr,
                *, J: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a0 = initp_ref[:] + emit_ref[0]
        alpha_scr[:] = a0
        alphas_ref[0] = a0

    @pl.when(t > 0)
    def _():
        alpha = alpha_scr[:]
        B = alpha.shape[0]
        exit_lse = _lse_lanes(alpha + exitp_ref[:])               # [B]
        stay = alpha + selfp_ref[:]
        shift = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, alpha.dtype), alpha[:, : J - 1]],
            axis=1,
        )
        adv = shift + advp_ref[:]
        ent = exit_lse[:, None] + enterp_ref[:]
        new_alpha = jnp.logaddexp(jnp.logaddexp(stay, adv), ent) + emit_ref[0]
        active = nf_ref[:] > t
        alpha_scr[:] = jnp.where(active, new_alpha, alpha)
        alphas_ref[0] = jnp.where(active, new_alpha, NEG_INF)

    alpha_fin_ref[:] = alpha_scr[:]


def _bwd_kernel(nf_ref, emit_ref, selfp_ref, advp_ref, enterp_ref,
                exitp_ref, finalp_ref, betas_ref, beta_scr, *, J: int, T: int):
    i = pl.program_id(0)           # i = 0 .. T-2; this step emits beta_t
    t = T - 2 - i                  # consuming emissions at frame t+1

    @pl.when(i == 0)
    def _():
        beta_scr[:] = finalp_ref[:]

    beta = beta_scr[:]
    B = beta.shape[0]
    eb = emit_ref[0] + beta        # emit(t+1) + beta_{t+1}
    enter_lse = _lse_lanes(enterp_ref[:] + eb)                    # [B]
    stay = selfp_ref[:] + eb
    adv = jnp.concatenate(
        [advp_ref[:, 1:] + eb[:, 1:], jnp.full((B, 1), NEG_INF, beta.dtype)],
        axis=1,
    )
    ext = exitp_ref[:] + enter_lse[:, None]
    new_beta = jnp.logaddexp(jnp.logaddexp(stay, adv), ext)
    active = nf_ref[:] > (t + 1)
    out = jnp.where(active, new_beta, beta)
    beta_scr[:] = out
    betas_ref[0] = out


@functools.partial(jax.jit, static_argnames=("acoustic_scale", "interpret"))
def forward_backward_pallas(
    emit_ll: jax.Array,            # [B, T, P]
    graphs: Dict[str, jax.Array],  # batch_graphs() output
    n_frames: jax.Array,           # [B]
    acoustic_scale: float = 1.0,
    interpret: bool | None = None,
) -> FBResult:
    """Drop-in for decoder.forward_backward on plain chain+loop graphs."""
    if interpret is None:
        interpret = not _on_tpu()
    if graphs.get("skip_logp") is not None:
        raise NotImplementedError(
            "fb_pallas covers plain chain+loop graphs; CTC skip topologies "
            "use decoder.forward_backward"
        )
    B, T, _P = emit_ll.shape
    emit_id = graphs["emit_id"]
    J = emit_id.shape[1]
    Bp = _round_up(max(B, 8), 8)
    Jp = _round_up(max(J, 128), 128)

    emit_graph = jnp.take_along_axis(
        emit_ll * acoustic_scale, emit_id[:, None, :], axis=2
    )
    emit_tm = jnp.zeros((T, Bp, Jp), jnp.float32)
    emit_tm = emit_tm.at[:, :B, :J].set(
        jnp.transpose(emit_graph, (1, 0, 2)).astype(jnp.float32))

    def padg(name):
        g = jnp.full((Bp, Jp), NEG_INF, jnp.float32)
        return g.at[:B, :J].set(graphs[name].astype(jnp.float32))

    selfp, advp = padg("self_logp"), padg("adv_logp")
    enterp, exitp = padg("enter_logp"), padg("exit_logp")
    initp, finalp = padg("init_logp"), padg("final_logp")
    nf = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        n_frames.astype(jnp.int32))

    const = lambda t: (0, 0)  # noqa: E731
    alphas, alpha_fin = pl.pallas_call(
        functools.partial(_fwd_kernel, J=Jp),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Bp, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Jp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM)] * 5,
        out_specs=[
            pl.BlockSpec((1, Bp, Jp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Jp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, Jp), jnp.float32)],
        interpret=interpret,
    )(nf, emit_tm, selfp, advp, enterp, exitp, initp)

    loglik_p = jax.nn.logsumexp(alpha_fin + finalp, axis=1)       # [Bp]
    loglik = loglik_p[:B]

    if T > 1:
        betas_rev = pl.pallas_call(
            functools.partial(_bwd_kernel, J=Jp, T=T),
            grid=(T - 1,),
            in_specs=[
                pl.BlockSpec((Bp, 1), const, memory_space=pltpu.VMEM),
                # step i consumes emissions at frame t+1 = T-1-i
                pl.BlockSpec((1, Bp, Jp), lambda i: (T - 1 - i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((Bp, Jp), const, memory_space=pltpu.VMEM)] * 5,
            # step i writes beta_t at row t = T-2-i
            out_specs=pl.BlockSpec((1, Bp, Jp), lambda i: (T - 2 - i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T - 1, Bp, Jp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Bp, Jp), jnp.float32)],
            interpret=interpret,
        )(nf, emit_tm, selfp, advp, enterp, exitp, finalp)
        betas = jnp.concatenate([betas_rev, finalp[None]], axis=0)
    else:
        betas = finalp[None]

    log_gamma = alphas + betas - loglik_p[None, :, None]          # [T, Bp, Jp]
    mask = (jnp.arange(T)[:, None] < nf[None, :, 0])[:, :, None]
    log_gamma = jnp.where(mask, log_gamma, NEG_INF)
    return FBResult(
        jnp.transpose(log_gamma, (1, 0, 2))[:B, :, :J], loglik
    )
