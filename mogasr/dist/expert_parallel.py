"""Expert parallelism (MoE FFN) over an ``('expert',)`` mesh.

Mixture-of-experts frame classifier layer with one expert per device:
tokens (frames) are data-sharded over the same axis, a replicated router
picks each token's expert (top-1, softmax gate), and two
``jax.lax.all_to_all`` shuffles move tokens to their expert's device and
back. The dispatch uses fixed-capacity slot buffers ([E, C, H] per
device) so every shape is static — tokens past an expert's capacity are
dropped (their combine weight is exactly 0), the standard Switch-style
overflow rule, tested explicitly.

This is the TPU-native MoE recipe: the all_to_all rides ICI, buffers are
lane-aligned, and autodiff differentiates through both shuffles (the
transpose of all_to_all is all_to_all), so ``make_ep_train_step`` is
plain ``jax.grad`` with a load-balance auxiliary loss (Shazeer et al.'s
importance/load proxy: mean gate fraction x mean route fraction per
expert, scaled by E).

Equality vs the dense per-token reference is tested on the faked
8-device CPU mesh (tests/test_expert_parallel.py) and exercised by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ep_mesh(n_experts: int, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_experts:
        raise ValueError(f"need {n_experts} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_experts]), ("expert",))


def init_moe_params(key, n_experts: int, hidden: int, ffn: int, n_out: int):
    """Router (replicated), per-expert FFN stacks (sharded on axis 0), and a
    replicated classifier head."""
    kr, k1, k2, ko = jax.random.split(key, 4)
    s_h, s_f = 1.0 / np.sqrt(hidden), 1.0 / np.sqrt(ffn)
    return {
        "Wr": jax.random.normal(kr, (hidden, n_experts), jnp.float32) * s_h,
        "W1": jax.random.normal(k1, (n_experts, hidden, ffn), jnp.float32) * s_h,
        "b1": jnp.zeros((n_experts, ffn), jnp.float32),
        "W2": jax.random.normal(k2, (n_experts, ffn, hidden), jnp.float32) * s_f,
        "b2": jnp.zeros((n_experts, hidden), jnp.float32),
        "Wo": jax.random.normal(ko, (hidden, n_out), jnp.float32) * s_h,
        "bo": jnp.zeros((n_out,), jnp.float32),
    }


def shard_moe_params(params, mesh: Mesh):
    ex = NamedSharding(mesh, P("expert"))
    rep = NamedSharding(mesh, P())
    spec = {"Wr": rep, "W1": ex, "b1": ex, "W2": ex, "b2": ex,
            "Wo": rep, "bo": rep}
    return {k: jax.device_put(v, spec[k]) for k, v in params.items()}


def _expert_ffn(W1, b1, W2, b2, h):
    return jax.nn.relu(h @ W1 + b1) @ W2 + b2


def moe_dense_reference(params, x):
    """Per-token dense reference (no dropping): each token through its
    routed expert, gated; then the classifier head. [N, H] -> [N, V]."""
    scores = x @ params["Wr"]
    e = jnp.argmax(scores, axis=-1)
    gate = jnp.take_along_axis(
        jax.nn.softmax(scores, axis=-1), e[:, None], axis=-1)[:, 0]
    ys = jnp.einsum("nh,ehf->nef", x, params["W1"]) + params["b1"][None]
    ys = jnp.einsum("nef,efh->neh", jax.nn.relu(ys), params["W2"])
    ys = ys + params["b2"][None]
    h = gate[:, None] * ys[jnp.arange(x.shape[0]), e]
    return h @ params["Wo"] + params["bo"]


def make_moe_forward(mesh: Mesh, capacity: int):
    """(params sharded, x [N, H] sharded over 'expert') -> (logits [N, V]
    sharded, aux) with fixed per-(device, expert) capacity C = ``capacity``.

    aux = (load_balance_loss, dropped_fraction) — both replicated scalars.
    """
    n_exp = mesh.shape["expert"]

    def body(Wr, W1, b1, W2, b2, Wo, bo, x):
        # x [n, H] local tokens; W1 [1, H, F] local expert
        n, H = x.shape
        scores = x @ Wr                                    # [n, E]
        probs = jax.nn.softmax(scores, axis=-1)
        e = jnp.argmax(scores, axis=-1)                    # [n]
        gate = jnp.take_along_axis(probs, e[:, None], axis=-1)[:, 0]
        onehot = jax.nn.one_hot(e, n_exp, dtype=jnp.int32)  # [n, E]
        rank = jnp.cumsum(onehot, axis=0) - onehot          # slots before me
        r = jnp.take_along_axis(rank, e[:, None], axis=-1)[:, 0]
        keep = r < capacity
        # dispatch buffer [E, C, H]: token i -> (e_i, r_i)
        buf = jnp.zeros((n_exp, capacity, H), x.dtype)
        buf = buf.at[e, jnp.minimum(r, capacity - 1)].add(
            jnp.where(keep[:, None], x, 0.0))
        recv = jax.lax.all_to_all(
            buf, "expert", split_axis=0, concat_axis=0, tiled=True)
        y = _expert_ffn(W1[0], b1[0], W2[0], b2[0],
                        recv.reshape(n_exp * capacity, H))
        back = jax.lax.all_to_all(
            y.reshape(n_exp, capacity, H), "expert",
            split_axis=0, concat_axis=0, tiled=True)
        out = back[e, jnp.minimum(r, capacity - 1)]         # [n, H]
        out = jnp.where(keep[:, None], gate[:, None] * out, 0.0)
        logits = out @ Wo + bo
        # Switch-style load balance: E * sum_e mean(prob_e) * mean(route_e)
        me = jax.lax.pmean(jnp.mean(probs, axis=0), "expert")
        ce = jax.lax.pmean(
            jnp.mean(onehot.astype(jnp.float32), axis=0), "expert")
        lb = n_exp * jnp.sum(me * ce)
        dropped = 1.0 - jax.lax.pmean(
            jnp.mean(keep.astype(jnp.float32)), "expert")
        return logits, lb, dropped

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("expert"), P("expert"), P("expert"), P("expert"),
                  P(), P(), P("expert")),
        out_specs=(P("expert"), P(), P()),
    )

    @jax.jit
    def forward(params, x):
        return mapped(params["Wr"], params["W1"], params["b1"],
                      params["W2"], params["b2"], params["Wo"],
                      params["bo"], x)

    return forward


def make_ep_train_step(mesh: Mesh, capacity: int, lr: float = 1e-2,
                       lb_weight: float = 0.01):
    """One EP-MoE CE training step on expert-sharded tokens: grads flow
    through both all_to_all shuffles; expert grads land expert-sharded."""
    forward = make_moe_forward(mesh, capacity)

    def loss_fn(params, x, y):
        logits, lb, _ = forward(params, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        return -jnp.mean(ll) + lb_weight * lb

    @jax.jit
    def step(params, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        new = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    return step
