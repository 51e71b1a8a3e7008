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


# ---------------------------------------------------------------------------
# Production MoeAm graduation (round 4): --arch moe through build_model /
# train_nn, EP twin executes the SAME flax param tree over the mesh.
# ---------------------------------------------------------------------------


def _moe_am_setup(seed=0, B=8, T=12, D=13, P_=7):
    from mogasr.am.neural import build_model
    from mogasr.am.train_nn import init_train_state
    from mogasr.config import TrainConfig

    cfg = TrainConfig(nn_arch="moe", nn_hidden=16, nn_layers=2,
                      nn_context=1, nn_experts=E, num_nn_steps=10)
    model = build_model("moe", P_, cfg)
    state = init_train_state(model, cfg, D, jax.random.key(seed))
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    n_frames = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)))
    labels = rng.integers(0, P_, size=(B, T))
    labels[np.arange(T)[None, :] >= np.asarray(n_frames)[:, None]] = -1
    return model, cfg, state, feats, n_frames, jnp.asarray(labels)


def test_moe_am_dense_trains_and_scores():
    """build_model('moe') trains under the standard make_train_step (aux
    load-balance loss collected via the sown 'losses' collection) and plain
    apply yields decode-ready [B, T, P] logits."""
    from mogasr.am.train_nn import make_train_step

    model, cfg, state, feats, n_frames, labels = _moe_am_setup()
    logits = model.apply(state.params, feats, n_frames)
    assert logits.shape == (8, 12, 7)
    step = make_train_step(model, cfg)
    first = None
    for _ in range(30):
        state, metrics = step(state, feats, n_frames, labels)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_moe_am_ep_forward_equals_dense_apply(mesh):
    """Valid positions equal the dense apply exactly; padding positions are
    UNSPECIFIED by contract (EP never dispatches padding tokens so they
    cannot consume expert capacity — see test below; every consumer masks
    by n_frames / label mask)."""
    from mogasr.dist.expert_parallel import (
        make_moe_am_ep_forward, shard_moe_am_params,
    )

    model, _cfg, state, feats, n_frames, _labels = _moe_am_setup(seed=4)
    want = np.asarray(model.apply(state.params, feats, n_frames))
    sharded = shard_moe_am_params(state.params, mesh)
    # valid tokens per device <= (B/E)*T; capacity that big never drops
    fwd = make_moe_am_ep_forward(model, mesh, capacity=12)
    got = np.asarray(fwd(sharded, feats, n_frames))
    vmask = (np.arange(feats.shape[1])[None, :]
             < np.asarray(n_frames)[:, None])
    np.testing.assert_allclose(got[vmask], want[vmask],
                               rtol=2e-5, atol=2e-5)


def test_moe_am_ep_padding_never_consumes_capacity(mesh):
    """Valid-token outputs are INVARIANT to the amount of batch padding,
    even at a capacity tight enough that unmasked padding tokens would
    evict valid ones (splice-clamped padding duplicates the last valid
    frame and routes identically — the review-found failure mode)."""
    from mogasr.dist.expert_parallel import (
        make_moe_am_ep_forward, shard_moe_am_params,
    )

    model, _cfg, state, feats, n_frames, _labels = _moe_am_setup(
        seed=6, B=8, T=24)
    # every row half-valid: 12 valid + 12 padding tokens per device row
    n_frames = jnp.full((8,), 12, jnp.int32)
    sharded = shard_moe_am_params(state.params, mesh)
    fwd = make_moe_am_ep_forward(model, mesh, capacity=12)
    got_padded = np.asarray(fwd(sharded, feats, n_frames))[:, :12]
    # same audio, no padding at all
    fwd12 = make_moe_am_ep_forward(model, mesh, capacity=12)
    got_tight = np.asarray(
        fwd12(sharded, feats[:, :12], jnp.full((8,), 12, jnp.int32)))
    np.testing.assert_allclose(got_padded, got_tight, rtol=2e-5, atol=2e-5)


def test_moe_am_ep_train_step_matches_dense_step(mesh):
    """One full production AdamW step: the EP path (CE + lb aux, grads
    through both all_to_all shuffles, sharded moments) produces the SAME
    updated parameters as the dense single-device make_train_step."""
    from mogasr.am.train_nn import make_train_step
    from mogasr.dist.expert_parallel import (
        ep_opt_init, make_moe_am_ep_train_step, shard_moe_am_params,
    )

    model, cfg, state, feats, n_frames, labels = _moe_am_setup(seed=5)
    step_d = make_train_step(model, cfg)
    state_d, metrics_d = step_d(state, feats, n_frames, labels)

    sharded = shard_moe_am_params(state.params, mesh)
    opt_state = ep_opt_init(model, cfg, sharded)
    step_ep = make_moe_am_ep_train_step(model, cfg, mesh, capacity=12)
    new_params, _opt2, metrics_ep = step_ep(
        sharded, opt_state, feats, n_frames, labels)

    np.testing.assert_allclose(float(metrics_ep["loss"]),
                               float(metrics_d["loss"]), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves_with_path(state_d.params)
    flat_e = dict(jax.tree_util.tree_leaves_with_path(new_params))
    for path, leaf in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_e[path]), np.asarray(leaf),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path))
    # expert tensors and their AdamW moments stayed expert-sharded
    assert new_params["params"]["W1_0"].sharding.spec[0] == "expert"


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
