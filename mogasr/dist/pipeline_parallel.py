"""Pipeline parallelism (GPipe microbatches) over a ``('pipe',)`` mesh.

Layer-stage parallelism for acoustic models deeper than one chip's HBM or
step budget: stage s holds layer s's parameters (the stacked [P, ...]
parameter pytree is sharded on its leading axis), microbatches flow through
the stages via ``jax.lax.ppermute`` ring shifts, and the classic GPipe
schedule emerges from a ``lax.scan`` over M + P - 1 ticks: at tick t,
stage s computes microbatch t - s (bubble ticks compute zeros that are
masked off — the XLA-friendly alternative to ragged control flow, same
convention as the serving engine's idle slots).

All communication is ``ppermute`` over the 'pipe' axis inside one
``shard_map``; autodiff differentiates straight through it (the transpose
of a ring shift is the reverse ring shift), so ``pp_train_step`` is just
``jax.grad`` of the pipelined forward — activations are rematerialized by
XLA where needed, no hand-written backward schedule.

Equality vs the serial single-device stack is tested on the faked
8-device CPU mesh (tests/test_pipeline_parallel.py) and exercised by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_pp_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_stages]), ("pipe",))


def init_pp_params(key, n_stages: int, hidden: int, n_out: int):
    """Stacked stage parameters: W [P, H, H], b [P, H] (tanh stages) plus a
    replicated classifier head (Wo [H, V], bo [V]) applied after the last
    stage. All stages are H->H so the stack shards cleanly on axis 0."""
    ks = jax.random.split(key, n_stages + 1)
    scale = 1.0 / np.sqrt(hidden)
    W = jnp.stack([
        jax.random.normal(ks[i], (hidden, hidden), jnp.float32) * scale
        for i in range(n_stages)
    ])
    b = jnp.zeros((n_stages, hidden), jnp.float32)
    Wo = jax.random.normal(ks[-1], (hidden, n_out), jnp.float32) * scale
    bo = jnp.zeros((n_out,), jnp.float32)
    return {"W": W, "b": b, "Wo": Wo, "bo": bo}


def shard_pp_params(params, mesh: Mesh):
    st = NamedSharding(mesh, P("pipe"))
    rep = NamedSharding(mesh, P())
    return {
        "W": jax.device_put(params["W"], st),
        "b": jax.device_put(params["b"], st),
        "Wo": jax.device_put(params["Wo"], rep),
        "bo": jax.device_put(params["bo"], rep),
    }


def serial_forward(params, x):
    """Single-device reference: x [N, H] -> hidden [N, H] -> logits [N, V]."""
    h = x
    for s in range(params["W"].shape[0]):
        h = jnp.tanh(h @ params["W"][s] + params["b"][s])
    return h @ params["Wo"] + params["bo"]


def make_pp_forward(mesh: Mesh, n_micro: int):
    """Pipelined forward: (params sharded, x [M, mb, H]) -> logits [M, mb, V]
    replicated. M = n_micro microbatches; the scan runs M + P - 1 ticks."""
    n_stages = mesh.shape["pipe"]

    def pipe_body(W, b, Wo, bo, x):
        # W [1, H, H], b [1, H] (this stage); x [M, mb, H] replicated
        idx = jax.lax.axis_index("pipe")
        M = x.shape[0]
        # zeros start unvarying over 'pipe'; the scan body makes them
        # device-varying (ppermute / per-stage writes), so mark the carry
        # varying up front (JAX >= 0.8 vma typing)
        outs0 = jax.lax.pcast(jnp.zeros_like(x), ("pipe",), to="varying")
        act0 = jax.lax.pcast(
            jnp.zeros(x.shape[1:], x.dtype), ("pipe",), to="varying")
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            act_in, outs = carry
            inp = jnp.where(idx == 0, x[jnp.clip(t, 0, M - 1)], act_in)
            act = jnp.tanh(inp @ W[0] + b[0])
            live = (t - idx >= 0) & (t - idx < M)
            act = jnp.where(live, act, 0.0)
            m = t - (n_stages - 1)
            write = (idx == n_stages - 1) & (m >= 0) & (m < M)
            upd = jax.lax.dynamic_update_slice(
                outs, act[None], (jnp.clip(m, 0, M - 1), 0, 0))
            outs = jnp.where(write, upd, outs)
            act_next = jax.lax.ppermute(act, "pipe", fwd_perm)
            return (act_next, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (act0, outs0), jnp.arange(M + n_stages - 1))
        # finished microbatches live on the last stage only -> replicate
        h = jax.lax.psum(
            jnp.where(idx == n_stages - 1, outs, 0.0), "pipe")
        return h @ Wo + bo

    mapped = shard_map(
        pipe_body, mesh=mesh,
        in_specs=(P("pipe"), P("pipe"), P(), P(), P()),
        out_specs=P(),
    )

    @jax.jit
    def forward(params, x):
        assert x.shape[0] == n_micro
        return mapped(params["W"], params["b"], params["Wo"], params["bo"], x)

    return forward


def make_pp_train_step(mesh: Mesh, n_micro: int, lr: float = 1e-2):
    """One pipelined CE training step: (params, x [M, mb, H], y [M, mb])
    -> (params', loss). Grads flow through the ppermute ring; the stacked
    stage grads land sharded exactly like the parameters."""
    forward = make_pp_forward(mesh, n_micro)

    def loss_fn(params, x, y):
        logits = forward(params, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    @jax.jit
    def step(params, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        new = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    return step
