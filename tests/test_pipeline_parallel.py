"""Pipeline-parallel (GPipe microbatch) equality tests.

Runs on the hermetic faked-8-device CPU mesh (tests/conftest.py). The
pipelined forward/step must be numerically equivalent to the serial
single-device layer stack — the ppermute schedule changes WHERE each layer
runs, not the math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.dist.pipeline_parallel import (
    init_pp_params,
    make_pp_forward,
    make_pp_mesh,
    make_pp_train_step,
    serial_forward,
    shard_pp_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the faked 8-device mesh"
)

H, V, MB = 12, 7, 5


@pytest.fixture(scope="module", params=[4, 8])
def mesh(request):
    return make_pp_mesh(request.param)


def _data(n_micro, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_micro, MB, H)).astype(np.float32)
    y = rng.integers(0, V, size=(n_micro, MB))
    return jnp.asarray(x), jnp.asarray(y)


def test_pp_forward_equals_serial(mesh):
    n_stages = mesh.shape["pipe"]
    params = init_pp_params(jax.random.key(0), n_stages, H, V)
    x, _ = _data(n_micro=6)
    want = serial_forward(params, x.reshape(-1, H)).reshape(6, MB, V)
    got = make_pp_forward(mesh, 6)(shard_pp_params(params, mesh), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pp_forward_single_microbatch(mesh):
    """M=1 (pure bubble pipeline) still matches."""
    n_stages = mesh.shape["pipe"]
    params = init_pp_params(jax.random.key(3), n_stages, H, V)
    x, _ = _data(n_micro=1, seed=4)
    want = serial_forward(params, x.reshape(-1, H)).reshape(1, MB, V)
    got = make_pp_forward(mesh, 1)(shard_pp_params(params, mesh), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pp_train_step_matches_serial_grads(mesh):
    """Loss and one SGD step equal the serial reference: grads flow through
    the ppermute ring correctly for EVERY stage's parameters."""
    n_stages = mesh.shape["pipe"]
    params = init_pp_params(jax.random.key(1), n_stages, H, V)
    x, y = _data(n_micro=4, seed=2)

    def serial_loss(p, x, y):
        logits = serial_forward(p, x.reshape(-1, H))
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, y.reshape(-1)[:, None], axis=-1)
        return -jnp.mean(ll)

    want_loss, want_grads = jax.value_and_grad(serial_loss)(params, x, y)
    want_new = jax.tree.map(lambda p, g: p - 1e-2 * g, params, want_grads)

    step = make_pp_train_step(mesh, 4, lr=1e-2)
    got_new, got_loss = step(shard_pp_params(params, mesh), x, y)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-6)
    for k in ("W", "b", "Wo", "bo"):
        np.testing.assert_allclose(
            np.asarray(got_new[k]), np.asarray(want_new[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_pp_loss_decreases(mesh):
    n_stages = mesh.shape["pipe"]
    params = shard_pp_params(
        init_pp_params(jax.random.key(5), n_stages, H, V), mesh)
    x, y = _data(n_micro=4, seed=6)
    step = make_pp_train_step(mesh, 4, lr=5e-2)
    losses = []
    for _ in range(8):
        params, loss = step(params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
