"""Pallas TPU kernel for batched diagonal-GMM log-likelihood scoring.

The production scorer (BASELINE.json north_star: "a batched Pallas
matmul-style kernel"). Grid = (frame tiles, state tiles, component chunks);
each step computes

    scores = X2[TM, R] @ AB_k[R, TS] + c_k     (one MXU dot per component)

and folds it into an *online logsumexp* accumulator held in VMEM scratch
(running max m and running sum s, flash-attention style), so the [N, S*K]
score tensor never exists — not in HBM, not even as a single VMEM tile. Only
the [N, S] loglik is written out. This resolves SURVEY.md §7 hard-part #3
(S*K columns, tiny reduction dim) with strictly 2-D tiles: Mosaic rejects the
obvious [TM, TS*K] -> [TM, TS, K] reshape epilogue ("unsupported shape cast"),
and the online form needs no reshape at all.

Layout: natural params are pre-transposed to AB[K, R, S_pad] (component-major)
so each grid step DMAs a contiguous [R, TS] panel; the TPU grid iterates the
last grid dimension fastest, so the accumulator scratch carries (i, j) state
across the K steps between output writes.

Compute dtype is configurable: float32 (parity) or bfloat16 inputs with fp32
MXU accumulation (throughput; the logsumexp epilogue always runs fp32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mogasr.am.gmm import GmmSet, natural_params, quadratic_features


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _gmm_kernel_int8(
    x_ref, ab_ref, c_ref, sx_ref, sab_ref, out_ref, m_scr, s_scr, *, kc: int, n_kc: int
):
    """int8 variant: int8 x int8 -> int32 MXU dot, dequantized in the epilogue
    with per-frame-row and per-(component, state-column) scales."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    x = x_ref[:]
    sx = sx_ref[:].astype(jnp.float32)          # [TM, 1]
    scores_list = []
    for kk in range(kc):
        acc = jnp.dot(x, ab_ref[kk], preferred_element_type=jnp.int32)
        deq = acc.astype(jnp.float32) * sx * sab_ref[kk].astype(jnp.float32)
        scores_list.append(deq + c_ref[kk].astype(jnp.float32))
    cmax = scores_list[0]
    for kk in range(1, kc):
        cmax = jnp.maximum(cmax, scores_list[kk])
    csum = jnp.exp(scores_list[0] - cmax)
    for kk in range(1, kc):
        csum = csum + jnp.exp(scores_list[kk] - cmax)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, cmax)
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + csum * jnp.exp(cmax - m_new)
    m_scr[:] = m_new

    @pl.when(k == n_kc - 1)
    def _():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


def _chunk_expsum(scores, cmax, exp_dtype):
    """sum_kk exp(scores[kk] - cmax), elementwise over the [TM, TS] tile.

    exp_dtype=bfloat16 runs the transcendental passes (the dominant VPU cost
    of sum mode: ~0.8 pass-units vs ~0.2 for max/add, TPU_NOTES round 4) in
    bf16 with an f32 accumulator. Safe by construction: inputs are <= 0, so
    exp outputs lie in [0, 1] where bf16's 8-bit mantissa gives ~2^-8
    relative error per term — two orders below the bf16 GEMM's own error on
    the scores themselves (~0.4 absolute at |score|~100), so the bf16
    compute path's decode decisions are unchanged (tested)."""
    if exp_dtype == jnp.bfloat16:
        csum = jnp.exp((scores[0] - cmax).astype(jnp.bfloat16)).astype(
            jnp.float32)
        for kk in range(1, len(scores)):
            csum = csum + jnp.exp(
                (scores[kk] - cmax).astype(jnp.bfloat16)).astype(jnp.float32)
        return csum
    csum = jnp.exp(scores[0] - cmax)
    for kk in range(1, len(scores)):
        csum = csum + jnp.exp(scores[kk] - cmax)
    return csum


def _gmm_kernel_wide(
    x_ref, ab_ref, out_ref, m_scr, s_scr, *, kc: int, n_kc: int, ts: int, precision, mode: str = "sum", exp_dtype=jnp.float32
):
    """Wide-dot variant: ONE [TM, r] x [r, kc*TS] MXU dot per grid step
    (components of the state tile laid out as contiguous column groups),
    then kc static column slices feed the same online-logsumexp epilogue.
    Mosaic accepts contiguous 2-D slices where it rejects the
    [TM, TS, K] reshape; numerically identical to the chunked kernel when
    kc matches (bitwise: the MXU reduction is over r either way).

    The Gaussian constant c rides in the GEMM itself (a ones-lane in x against
    a c-row in ab — see _gmm_loglik_pallas_impl), so there is no bias add."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        if mode == "sum":
            s_scr[:] = jnp.zeros_like(s_scr)

    x = x_ref[:]
    wide = jnp.dot(x, ab_ref[0], preferred_element_type=jnp.float32, precision=precision)
    scores = [wide[:, kk * ts : (kk + 1) * ts] for kk in range(kc)]
    cmax = scores[0]
    for kk in range(1, kc):
        cmax = jnp.maximum(cmax, scores[kk])

    if mode == "max":
        m_scr[:] = jnp.maximum(m_scr[:], cmax)

        @pl.when(k == n_kc - 1)
        def _():
            out_ref[:] = m_scr[:]

        return

    csum = _chunk_expsum(scores, cmax, exp_dtype)
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, cmax)
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + csum * jnp.exp(cmax - m_new)
    m_scr[:] = m_new

    @pl.when(k == n_kc - 1)
    def _():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


def _gmm_kernel(x_ref, ab_ref, out_ref, m_scr, s_scr, *, kc: int, n_kc: int, precision, mode: str = "sum", exp_dtype=jnp.float32):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        if mode == "sum":
            s_scr[:] = jnp.zeros_like(s_scr)

    x = x_ref[:]
    # Static unroll: KC dots first, then one chunk-local logsumexp and a single
    # accumulator merge. This cuts the VPU epilogue from ~9 passes per dot
    # (naive online update) to ~3 (max, exp, add), which matters because
    # the kernel is VPU-bound, not MXU-bound (measured: naive online update
    # plateaus at ~17 TFLOP/s bf16 across all tile shapes).
    # The Gaussian constant c rides in the GEMM itself (a ones-lane in x
    # against a c-row in ab — the 78->128 lane padding is already paid, so
    # the bias add is free MXU work instead of a VPU pass per dot).
    # mode="max" (Viterbi approximation, best component only) drops the
    # exp/log entirely: ~1 VPU pass per dot (running max) — the round-2
    # epilogue throughput option.
    scores = [
        jnp.dot(x, ab_ref[kk], preferred_element_type=jnp.float32, precision=precision)
        for kk in range(kc)
    ]
    cmax = scores[0]
    for kk in range(1, kc):
        cmax = jnp.maximum(cmax, scores[kk])

    if mode == "max":
        m_scr[:] = jnp.maximum(m_scr[:], cmax)

        @pl.when(k == n_kc - 1)
        def _():
            out_ref[:] = m_scr[:]

        return

    csum = _chunk_expsum(scores, cmax, exp_dtype)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, cmax)
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + csum * jnp.exp(cmax - m_new)
    m_scr[:] = m_new

    @pl.when(k == n_kc - 1)
    def _():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_states", "n_comp", "tile_m", "tile_s", "kc", "compute_dtype",
        "interpret", "layout", "mode", "exp_dtype",
    ),
)
def _gmm_loglik_pallas_impl(
    x2: jax.Array,      # [N, 2D]
    ab_t: jax.Array,    # [K, 2D, S] component-major natural params
    c_t: jax.Array,     # [K, S]
    n_states: int,
    n_comp: int,
    tile_m: int,
    tile_s: int,
    kc: int,
    compute_dtype: str,
    interpret: bool,
    layout: str = "chunked",   # chunked (kc small dots) | wide (one wide dot)
    mode: str = "sum",         # sum (exact logsumexp) | max (Viterbi approx)
    exp_dtype: str = "float32",  # sum-mode epilogue transcendental dtype
) -> jax.Array:
    n, two_d = x2.shape
    r = _round_up(two_d + 2, 128)  # +2: ones-lanes that carry c (float paths)
    n_pad = _round_up(max(n, tile_m), tile_m)
    s_pad = _round_up(n_states, tile_s)
    k_pad = _round_up(n_comp, kc)
    n_kc = k_pad // kc
    dt = jnp.dtype(compute_dtype)

    if dt == jnp.int8:
        # symmetric per-frame-row / per-(comp, state-col) quantization; c
        # stays a separate f32 bias (folding it into the int8 dot would
        # destroy its precision)
        x2f = jnp.zeros((n_pad, r), jnp.float32).at[:n, :two_d].set(x2)
        sx = jnp.maximum(jnp.max(jnp.abs(x2f), axis=1, keepdims=True), 1e-10) / 127.0
        x2p = jnp.clip(jnp.round(x2f / sx), -127, 127).astype(jnp.int8)
        abf = jnp.zeros((k_pad, r, s_pad), jnp.float32)
        abf = abf.at[:n_comp, :two_d, :n_states].set(ab_t)
        sab = jnp.maximum(jnp.max(jnp.abs(abf), axis=1, keepdims=True), 1e-10) / 127.0
        abp = jnp.clip(jnp.round(abf / sab), -127, 127).astype(jnp.int8)
    else:
        # Bias-in-GEMM layout: x gets ones-lanes at columns 2D and 2D+1, ab
        # gets matching c-rows, so the constant term is folded into the
        # (already lane-padded) MXU contraction instead of costing a VPU pass
        # per dot. c is split hi/lo across the two rows (c = dt(c) + dt(c -
        # dt(c))) so the f32 accumulator recovers ~16 mantissa bits of c even
        # when dt is bfloat16 — both lanes are otherwise padding, so this is
        # free.
        c_hi = c_t.astype(dt)
        c_lo = (c_t - c_hi.astype(jnp.float32)).astype(dt)
        x2p = jnp.zeros((n_pad, r), dt).at[:n, :two_d].set(x2.astype(dt))
        x2p = x2p.at[:n, two_d : two_d + 2].set(jnp.asarray(1, dt))
        abp = jnp.zeros((k_pad, r, s_pad), dt)
        abp = abp.at[:n_comp, :two_d, :n_states].set(ab_t.astype(dt))
        abp = abp.at[:n_comp, two_d, :n_states].set(c_hi)
        abp = abp.at[:n_comp, two_d + 1, :n_states].set(c_lo)
        # Padded components: large-negative finite c (-inf would make the MXU
        # produce 0 * -inf = NaN on padded frame rows) -> exp underflows to
        # exactly 0 under logsumexp, and max-mode never selects them.
        # Padded state columns stay all-zero (score 0, sliced away).
        abp = abp.at[n_comp:, two_d, :n_states].set(jnp.asarray(-1e30, dt))
    # c as a separate bias: only the int8 kernel still consumes this.
    cp = jnp.full((k_pad, 1, s_pad), -jnp.inf, jnp.float32)
    cp = cp.at[:n_comp, 0, :n_states].set(c_t)
    # Padded states all -inf would yield nan (log 0 ... -inf max): give them c=0.
    cp = cp.at[:, :, n_states:].set(0.0)

    # f32 inputs get a true-fp32 MXU pass (parity gate, SURVEY.md §7 #1);
    # bf16 inputs use the fast default.
    precision = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    grid = (n_pad // tile_m, s_pad // tile_s, n_kc)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((tile_m, tile_s), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, s_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_m, tile_s), jnp.float32),
            pltpu.VMEM((tile_m, tile_s), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * r * s_pad * k_pad,
            bytes_accessed=(n_pad * r + k_pad * r * s_pad + n_pad * s_pad) * dt.itemsize,
            transcendentals=2 * n_pad * s_pad * k_pad,
        ),
        interpret=interpret,
    )
    x_spec = pl.BlockSpec((tile_m, r), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM)
    ab_spec = pl.BlockSpec((kc, r, tile_s), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((kc, 1, tile_s), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM)
    if layout == "wide" and dt != jnp.int8:
        n_st = s_pad // tile_s
        # state-tile-major column groups: tile j's kc component panels are
        # contiguous and kk-major -> one wide dot + static slices in-kernel
        ab_wide = (
            abp.reshape(n_kc, kc, r, n_st, tile_s)
            .transpose(0, 2, 3, 1, 4)
            .reshape(n_kc, r, n_st * kc * tile_s)
        )
        out = pl.pallas_call(
            functools.partial(
                _gmm_kernel_wide, kc=kc, n_kc=n_kc, ts=tile_s,
                precision=precision, mode=mode,
                exp_dtype=jnp.dtype(exp_dtype).type,
            ),
            in_specs=[
                x_spec,
                pl.BlockSpec((1, r, kc * tile_s), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            ],
            **common,
        )(x2p, ab_wide)
        return out[:n, :n_states]
    if dt == jnp.int8:
        sx_spec = pl.BlockSpec((tile_m, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_gmm_kernel_int8, kc=kc, n_kc=n_kc),
            in_specs=[x_spec, ab_spec, c_spec, sx_spec, c_spec],
            **common,
        )(x2p, abp, cp, sx, sab)
    else:
        out = pl.pallas_call(
            functools.partial(_gmm_kernel, kc=kc, n_kc=n_kc,
                              precision=precision, mode=mode,
                              exp_dtype=jnp.dtype(exp_dtype).type),
            in_specs=[x_spec, ab_spec],
            **common,
        )(x2p, abp)
    return out[:n, :n_states]


def transposed_natural_params(gmm: GmmSet, var_floor: float = 1e-3):
    """Component-major GEMM layout: ab_t[K, 2D, S], c_t[K, S]."""
    nat = natural_params(gmm, var_floor)
    S, K, D = gmm.means.shape
    ab = nat.ab.reshape(2 * D, S, K)
    return ab.transpose(2, 0, 1), nat.c.reshape(S, K).T


def gmm_loglik_pallas(
    x: jax.Array,
    gmm: GmmSet,
    tile_m: Optional[int] = None,
    tile_s: Optional[int] = None,
    kc: Optional[int] = None,
    compute_dtype: str = "float32",
    interpret: Optional[bool] = None,
    layout: str = "chunked",
    mode: str = "sum",
    exp_dtype: str = "float32",
) -> jax.Array:
    """score(features) -> loglik: [N, D] x GmmSet -> [N, S].

    Drop-in replacement for mogasr.am.gmm.gmm_loglik; runs the fused Pallas
    kernel on TPU, interpreter mode elsewhere (tests). layout="wide" issues
    one [TM, r] x [r, kc*TS] dot per grid step instead of kc small dots
    (bitwise-identical results at equal kc; A/B-able through bench.py).
    exp_dtype="bfloat16" runs sum-mode's transcendental epilogue passes in
    bf16 (f32 accumulation) — measured SLOWER on v5e (casts cost more than
    bf16 saves; TPU_NOTES round 4), kept as the recorded A/B arm.

    Default tiles are mode-dependent (round-4 sweeps, TPU_NOTES): the bf16
    sum path (VPU-epilogue-bound, 3-4 passes/dot) wants narrow [*, 128]
    output tiles, small component chunks, and the TALLEST frame tile the
    call's N affords — (2048, 128, 8) measured 89.0 TF/s (45.2% MFU) vs
    71.7 for the old (512, 256, 16); tile_m adapts down to N so small
    serving-tick calls don't pay round-up-to-tile padding. Max-mode
    (1 pass/dot) and the unswept f32/int8 paths keep (512, 256, 16).
    """
    S, K, D = gmm.means.shape
    n_rows = x.shape[0]
    fast_sum = mode == "sum" and compute_dtype == "bfloat16"
    if tile_m is None:
        if fast_sum and n_rows >= 2048:
            tile_m = 2048
        elif fast_sum and n_rows >= 1024:
            tile_m = 1024
        else:
            tile_m = 512
    if tile_s is None:
        tile_s = 128 if fast_sum else 256
    if kc is None:
        kc = 8 if fast_sum else 16
    kc = min(kc, K)
    if interpret is None:
        interpret = not _on_tpu()
    if mode == "max" and compute_dtype == "int8":
        raise NotImplementedError("mode='max' supports float32/bfloat16 only")
    if exp_dtype != "float32" and compute_dtype == "int8":
        raise NotImplementedError("exp_dtype applies to float32/bfloat16 only")
    ab_t, c_t = transposed_natural_params(gmm)
    x2 = quadratic_features(x)
    return _gmm_loglik_pallas_impl(
        x2, ab_t, c_t, S, K, tile_m, tile_s, kc, compute_dtype, interpret,
        layout=layout, mode=mode, exp_dtype=exp_dtype,
    )


def gmm_loglik_batched(
    feats: jax.Array,   # [B, T, D]
    gmm: GmmSet,
    **kwargs,
) -> jax.Array:
    """Batched scorer over padded utterance batches: [B, T, D] -> [B, T, S]."""
    B, T, D = feats.shape
    out = gmm_loglik_pallas(feats.reshape(B * T, D), gmm, **kwargs)
    return out.reshape(B, T, -1)
