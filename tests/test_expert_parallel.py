"""Expert-parallel (MoE all_to_all) equality tests.

Runs on the hermetic faked-8-device CPU mesh (tests/conftest.py). With
capacity high enough that nothing drops, the two-shuffle EP forward must
equal the dense per-token reference; with capacity 0 every token drops and
the MoE contribution is exactly zero (Switch overflow rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.dist.expert_parallel import (
    init_moe_params,
    make_ep_mesh,
    make_ep_train_step,
    make_moe_forward,
    moe_dense_reference,
    shard_moe_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the faked 8-device mesh"
)

H, F, V, E = 10, 16, 6, 8
N = 64  # tokens, divisible by E


@pytest.fixture(scope="module")
def mesh():
    return make_ep_mesh(E)


def _setup(seed=0):
    params = init_moe_params(jax.random.key(seed), E, H, F, V)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((N, H)).astype(np.float32)
    y = rng.integers(0, V, size=(N,))
    return params, jnp.asarray(x), jnp.asarray(y)


def test_moe_forward_equals_dense_reference(mesh):
    params, x, _ = _setup()
    want = moe_dense_reference(params, x)
    # capacity = all local tokens could pick one expert -> nothing drops
    fwd = make_moe_forward(mesh, capacity=N // E)
    got, lb, dropped = fwd(shard_moe_params(params, mesh), x)
    assert float(dropped) == 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert float(lb) > 0.0


def test_moe_capacity_drop_is_exact_zero(mesh):
    """capacity 1: per source device only ONE token per expert survives;
    dropped tokens contribute exactly gate*0 (head bias only)."""
    params, x, _ = _setup(seed=1)
    fwd = make_moe_forward(mesh, capacity=1)
    got, _lb, dropped = fwd(shard_moe_params(params, mesh), x)
    assert 0.0 < float(dropped) < 1.0
    # recompute keep mask on host, per source shard of N//E tokens
    xs = np.asarray(x)
    e = np.argmax(xs @ np.asarray(params["Wr"]), axis=-1)
    got = np.asarray(got)
    bias_row = np.asarray(params["bo"])
    n_loc = N // E
    for s in range(E):
        seen = set()
        for i in range(s * n_loc, (s + 1) * n_loc):
            if e[i] in seen:  # dropped: logits == head bias exactly
                np.testing.assert_allclose(got[i], bias_row, rtol=0, atol=0)
            seen.add(e[i])


def test_ep_train_step_improves_and_shards_grads(mesh):
    params, x, y = _setup(seed=2)
    sharded = shard_moe_params(params, mesh)
    step = make_ep_train_step(mesh, capacity=N // E, lr=5e-2)
    losses = []
    for _ in range(10):
        sharded, loss = step(sharded, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # expert weights stayed expert-sharded through the update
    spec = sharded["W1"].sharding.spec
    assert spec[0] == "expert"


def test_ep_grads_match_dense_reference(mesh):
    """With no drops, EP grads == dense-reference grads (the all_to_all
    transpose is correct for every parameter, router included)."""
    params, x, y = _setup(seed=3)

    def dense_loss(p, x, y):
        logits = moe_dense_reference(p, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    want = jax.grad(dense_loss)(params, x, y)

    fwd = make_moe_forward(mesh, capacity=N // E)

    def ep_loss(p, x, y):
        logits, _lb, _d = fwd(p, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    got = jax.grad(ep_loss)(shard_moe_params(params, mesh), x, y)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)
