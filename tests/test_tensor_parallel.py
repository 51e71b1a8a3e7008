"""Tensor-parallel (2-D data x model mesh) equality tests.

Runs on the hermetic faked-8-device CPU mesh (tests/conftest.py). Each TP
path must be numerically equivalent to its single-device counterpart — the
sharding annotations change layout and collectives, not math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mogasr.am.gmm import GmmSet, gmm_loglik, init_gmm
from mogasr.am.neural import build_model
from mogasr.am.train_nn import init_train_state, make_train_step
from mogasr.config import GmmConfig, TrainConfig
from mogasr.dist.tensor_parallel import (
    make_tp_forward,
    make_tp_mesh,
    make_tp_score_step,
    make_tp_train_step,
    mlp_shardings,
    shard_gmm_states,
    shard_mlp_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the faked 8-device mesh"
)

S, K, D = 24, 4, 13  # S divisible by the model axis (4)


@pytest.fixture(scope="module")
def mesh():
    return make_tp_mesh(2, 4)


@pytest.fixture(scope="module")
def gmm():
    cfg = GmmConfig(n_states=S, n_components=K, feat_dim=D)
    return init_gmm(cfg, jax.random.key(0))


def test_mesh_axes(mesh):
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)


def test_gmm_actually_sharded(mesh, gmm):
    g = shard_gmm_states(gmm, mesh)
    assert g.means.sharding.spec == P("model")
    # per-device shard holds S/4 states
    shard = g.means.addressable_shards[0]
    assert shard.data.shape[0] == S // 4


@pytest.mark.parametrize("mode", ["sum", "max"])
def test_tp_score_matches_single_device(mesh, gmm, mode):
    B, T = 4, 6
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    g = shard_gmm_states(gmm, mesh)
    score = make_tp_score_step(mesh, mode=mode)
    out = score(g, feats)
    assert out.shape == (B, T, S)
    ref = gmm_loglik(feats.reshape(-1, D), gmm, mode=mode).reshape(B, T, S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_mlp_kernels_alternate_col_row(mesh):
    cfg = TrainConfig(nn_hidden=16, nn_layers=2, lr=1e-3)
    model = build_model("mlp", 10, cfg)
    state = init_train_state(model, cfg, D, jax.random.key(0))
    ssh = mlp_shardings(state, mesh)
    kernels = {
        "/".join(str(getattr(p, "key", "")) for p in path): sh.spec
        for path, sh in jax.tree_util.tree_flatten_with_path(ssh)[0]
        if str(getattr(path[-1], "key", "")) == "kernel"
    }
    col = [s for k, s in kernels.items() if "Dense_0" in k]
    row = [s for k, s in kernels.items() if "Dense_1" in k]
    assert all(s == P(None, "model") for s in col) and col
    assert all(s == P("model", None) for s in row) and row


def test_tp_forward_matches_single_device(mesh):
    cfg = TrainConfig(nn_hidden=16, nn_layers=3, lr=1e-3)
    model = build_model("mlp", 10, cfg)
    state = init_train_state(model, cfg, D, jax.random.key(2))
    B, T = 4, 8
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    nf = jnp.asarray([T] * B)
    ref = model.apply(state.params, feats, nf)
    st = shard_mlp_state(state, mesh)
    fwd = make_tp_forward(model, mesh)
    out = fwd(st.params, feats, nf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_train_step_matches_single_device(mesh):
    cfg = TrainConfig(nn_hidden=16, nn_layers=2, lr=1e-3)
    n_pdfs = 10
    model = build_model("mlp", n_pdfs, cfg)
    B, T = 4, 8
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    nf = jnp.asarray([T] * B)
    labels = jnp.asarray(rng.integers(0, n_pdfs, (B, T)).astype(np.int32))

    ref_state = init_train_state(model, cfg, D, jax.random.key(5))
    ref_step = make_train_step(model, cfg)
    tp_state = shard_mlp_state(
        init_train_state(model, cfg, D, jax.random.key(5)), mesh)
    tp_step = make_tp_train_step(model, cfg, mesh)

    for _ in range(3):
        ref_state, ref_m = ref_step(ref_state, feats, nf, labels)
        tp_state, tp_m = tp_step(tp_state, feats, nf, labels)

    np.testing.assert_allclose(float(tp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5, atol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(tp_state.params)[0],
        jax.tree_util.tree_flatten_with_path(ref_state.params)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))
    # step counter advanced and params stayed sharded
    assert int(tp_state.step) == 3
    ksh = [
        a.sharding.spec
        for path, a in jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
        if "Dense_0" in "/".join(str(getattr(p, "key", "")) for p in path)
        and str(getattr(path[-1], "key", "")) == "kernel"
    ]
    assert ksh == [P(None, "model")]
