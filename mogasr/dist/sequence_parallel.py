"""Sequence (context) parallelism over a ``('seq',)`` mesh.

Long-audio mapping: shard the TIME axis. One 3-hour recording is ~1M
frames — too long for one chip's activation memory at production feature
dims, and embarrassingly parallel except for two couplings the offline
front-end tail has (mogasr/frontend/jax_frontend.py):

- **deltas** gather +-window frames with per-utterance edge replication
  (clamped to [0, n_frames-1]) — resolved with a halo exchange: each delta
  pass ``ppermute``s ``window`` boundary frames to both neighbors, and the
  clamped global gather indices for every VALID output frame land inside
  the haloed block by construction (|idx - t| <= window, and invalid
  frames are masked downstream, so their clamped garbage never propagates
  — the same argument that makes the offline op padding-invariant).
- **utterance CMVN** is a global mean/var over valid frames — two
  ``psum``s over 'seq' (count, sum, sum-of-squares).

``make_sp_feature_tail`` reproduces the offline deltas+CMVN tail — the
halo-exchange deltas gather-for-gather, the psum CMVN up to reduction
order (measured max diff 2.4e-7; tests/test_sequence_parallel.py) — on
[B, T/P, D]-sharded blocks, and ``make_sp_score_step`` chains a
replicated MLP scorer so logits stay time-sharded end to end — frames
never materialize on one device. Exercised by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_mesh(n: int, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("seq",))


def _halo_exchange(x, window: int):
    """[B, Tl, D] -> [B, Tl + 2*window, D] with neighbours' edge frames.

    Ring ppermutes; the first/last shard receive wrapped garbage in their
    outer halo, which no VALID frame's clamped gather can address (global
    indices are clamped to [0, n_frames-1], inside the real data)."""
    n = jax.lax.axis_size("seq")
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = jax.lax.ppermute(x[:, -window:], "seq", fwd)
    right = jax.lax.ppermute(x[:, :window], "seq", bwd)
    return jnp.concatenate([left, x, right], axis=1)


def _sp_delta_pass(x, n_frames, window: int):
    """One regression-delta pass on a time-shard, matching
    jax_frontend._deltas_batched frame for frame."""
    B, Tl, _ = x.shape
    idx = jax.lax.axis_index("seq")
    off = idx * Tl
    ext = _halo_exchange(x, window)
    t = off + jnp.arange(Tl, dtype=jnp.int32)[None, :]          # global [1,Tl]
    last = jnp.maximum(n_frames - 1, 0)[:, None]                # [B, 1]
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    out = jnp.zeros_like(x)
    for i in range(1, window + 1):
        fwd_g = jnp.minimum(t + i, last)
        bwd_g = jnp.minimum(jnp.clip(t - i, 0, None), last)
        # to haloed-local coordinates; clamp only protects MASKED frames
        fwd_l = jnp.clip(fwd_g - off + window, 0, Tl + 2 * window - 1)
        bwd_l = jnp.clip(bwd_g - off + window, 0, Tl + 2 * window - 1)
        fwd = jnp.take_along_axis(ext, fwd_l[:, :, None], axis=1)
        bwd = jnp.take_along_axis(ext, bwd_l[:, :, None], axis=1)
        out = out + i * (fwd - bwd)
    return out / denom


def make_sp_feature_tail(mesh: Mesh, delta_order: int = 2, window: int = 2,
                         norm_var: bool = True):
    """(base [B, T, D] time-sharded, n_frames [B]) -> feats
    [B, T, D*(1+order)] time-sharded: deltas (halo) + masked utterance
    CMVN (psum), equal to the offline tail. T must divide the mesh."""

    def body(base, n_frames):
        B, Tl, D = base.shape
        if Tl < window:
            # A shard shorter than the halo window would ship a truncated
            # halo and the clipped gathers below would silently clamp VALID
            # frames' indices (wrong deltas, no error). Fail at trace time.
            raise ValueError(
                f"sequence-parallel shard length {Tl} < delta window "
                f"{window}: use fewer 'seq' shards or longer T")
        idx = jax.lax.axis_index("seq")
        off = idx * Tl
        feats = [base]
        prev = base
        for _ in range(delta_order):
            prev = _sp_delta_pass(prev, n_frames, window)
            feats.append(prev)
        out = jnp.concatenate(feats, axis=-1)
        t = off + jnp.arange(Tl, dtype=jnp.int32)[None, :]
        mask = (t < n_frames[:, None]).astype(jnp.float32)[:, :, None]
        cnt = jax.lax.psum(jnp.sum(mask, axis=1, keepdims=True), "seq")
        cnt = jnp.maximum(cnt, 1.0)
        mean = jax.lax.psum(jnp.sum(out * mask, axis=1, keepdims=True),
                            "seq") / cnt
        res = out - mean
        if norm_var:
            var = jax.lax.psum(
                jnp.sum((out - mean) ** 2 * mask, axis=1, keepdims=True),
                "seq") / cnt
            res = res / jnp.sqrt(jnp.maximum(var, 1e-10))
        return res * mask

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "seq", None), P()),
        out_specs=P(None, "seq", None),
    )

    @jax.jit
    def tail(base, n_frames):
        return mapped(base, n_frames)

    return tail


def make_sp_score_step(mesh: Mesh, apply_fn, delta_order: int = 2,
                       window: int = 2, norm_var: bool = True):
    """Chain the sharded tail into a replicated frame scorer: logits stay
    [B, T, V] time-sharded (apply_fn(params, feats [N, Din]) -> [N, V] must
    be per-frame, e.g. an MLP AM's features->logits map)."""
    tail = make_sp_feature_tail(mesh, delta_order, window, norm_var)
    logit_sh = NamedSharding(mesh, P(None, "seq", None))

    @jax.jit
    def step(params, base, n_frames):
        feats = tail(base, n_frames)
        B, T, D = feats.shape
        logits = apply_fn(params, feats.reshape(B * T, D)).reshape(B, T, -1)
        return jax.lax.with_sharding_constraint(logits, logit_sh)

    return step
