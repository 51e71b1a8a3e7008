"""Sequence-parallel (time-sharded) equality tests.

Runs on the hermetic faked-8-device CPU mesh (tests/conftest.py). The
halo-exchange deltas reproduce the offline gather exactly; the psum CMVN
sums per-shard partials in a different order than the offline single-axis
sum, so the tail is compared at tight float tolerance (measured max diff
2.4e-7 on this data). Ragged n_frames cases include valid regions ending
mid-shard and before a shard starts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.frontend.jax_frontend import _deltas_batched, _masked_cmvn
from mogasr.dist.sequence_parallel import (
    make_sp_feature_tail,
    make_sp_mesh,
    make_sp_score_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the faked 8-device mesh"
)

B, T, D = 3, 64, 5  # T divisible by 8


@pytest.fixture(scope="module")
def mesh():
    return make_sp_mesh(8)


def _offline_tail(base, n_frames, order=2, window=2, norm_var=True):
    feats = [base]
    prev = base
    for _ in range(order):
        prev = _deltas_batched(prev, n_frames, window)
        feats.append(prev)
    out = jnp.concatenate(feats, axis=-1)
    mask = (jnp.arange(base.shape[1])[None, :] < n_frames[:, None])
    return _masked_cmvn(out, mask.astype(jnp.float32), norm_var)


@pytest.mark.parametrize("n_frames", [
    [64, 64, 64],    # full
    [64, 37, 5],     # ends mid-shard / first shard only
    [1, 64, 23],     # single frame / ragged
])
def test_sp_tail_equals_offline(mesh, n_frames):
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    nf = jnp.asarray(n_frames, jnp.int32)
    want = _offline_tail(base, nf)
    got = make_sp_feature_tail(mesh)(base, nf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_sp_tail_no_var_norm(mesh):
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    nf = jnp.asarray([40, 64, 9], jnp.int32)
    want = _offline_tail(base, nf, norm_var=False)
    got = make_sp_feature_tail(mesh, norm_var=False)(base, nf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_sp_score_step_sharded_logits(mesh):
    """Tail + replicated per-frame MLP: logits equal the offline chain and
    stay time-sharded (no single-device [B, T, V] materialization)."""
    rng = np.random.default_rng(2)
    base = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    nf = jnp.asarray([64, 50, 17], jnp.int32)
    Din, V = D * 3, 7
    W = jnp.asarray(rng.standard_normal((Din, V)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.standard_normal((V,)).astype(np.float32))

    def apply_fn(params, feats):
        return feats @ params["W"] + params["b"]

    params = {"W": W, "b": bias}
    step = make_sp_score_step(mesh, apply_fn)
    got = step(params, base, nf)
    feats = _offline_tail(base, nf)
    want = apply_fn(params, feats.reshape(-1, Din)).reshape(B, T, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert "seq" in str(got.sharding.spec)


def test_sp_shard_shorter_than_window_fails_loudly(mesh):
    """A time shard shorter than the delta window cannot ship a full halo;
    the clipped gathers would silently clamp VALID frames (round-3 ADVICE).
    Must raise at trace time, not produce wrong deltas."""
    tail = make_sp_feature_tail(mesh, window=2)
    base = jnp.zeros((1, 8, 4), jnp.float32)   # Tl = 8/8 = 1 < window
    with pytest.raises(ValueError, match="delta window"):
        tail(base, jnp.asarray([8], jnp.int32))
