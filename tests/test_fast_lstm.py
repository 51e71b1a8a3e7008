"""Prefused LSTM forward (mogasr.am.fast_lstm): exact equality with the
stock LstmAm on the same parameter tree, ragged batches, and padding
invariance of the hoisted-GEMM evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.am import fast_lstm as FL
from mogasr.am.neural import LstmAm


def _init(B=3, T=17, D=7, H=11, layers=2, seed=0):
    model = LstmAm(n_pdfs=5, hidden=H, layers=layers)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    n_frames = jnp.asarray([T, T - 5, 4])
    params = model.init(jax.random.key(1), feats, n_frames)
    return model, params, feats, n_frames


@pytest.mark.parametrize("layers", [1, 2])
def test_prefused_matches_stock_on_valid_frames(layers):
    model, params, feats, n_frames = _init(layers=layers, seed=layers)
    ref = np.asarray(model.apply(params, feats, n_frames))
    got = np.asarray(FL.lstm_am_apply_prefused(params, feats, n_frames))
    for b, nf in enumerate(np.asarray(n_frames)):
        np.testing.assert_allclose(
            got[b, : int(nf)], ref[b, : int(nf)], rtol=2e-5, atol=2e-5
        )


def test_prefused_padding_invariance():
    model, params, feats, n_frames = _init(seed=3)
    got1 = np.asarray(FL.lstm_am_apply_prefused(params, feats, n_frames))
    # garbage in the padded tail (and extra pad frames) must not change
    # any valid-frame logits
    rng = np.random.default_rng(9)
    feats2 = np.asarray(feats).copy()
    for b, nf in enumerate(np.asarray(n_frames)):
        feats2[b, int(nf):] = rng.standard_normal(feats2[b, int(nf):].shape) * 40
    feats2 = jnp.concatenate(
        [jnp.asarray(feats2),
         jnp.asarray(rng.standard_normal((3, 5, feats.shape[-1])), jnp.float32)],
        axis=1,
    )
    got2 = np.asarray(FL.lstm_am_apply_prefused(params, feats2, n_frames))
    for b, nf in enumerate(np.asarray(n_frames)):
        np.testing.assert_allclose(
            got2[b, : int(nf)], got1[b, : int(nf)], rtol=1e-6, atol=1e-6
        )


def test_prefused_jitted_closure():
    model, params, feats, n_frames = _init(seed=5)
    fn = FL.make_prefused_lstm_logits(params)
    a = np.asarray(fn(feats, n_frames))
    b = np.asarray(FL.lstm_am_apply_prefused(params, feats, n_frames))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_prefused_rejects_non_lstm_tree():
    from mogasr.am.neural import MlpAm
    from mogasr.config import TrainConfig

    m = MlpAm(n_pdfs=4, hidden=8, layers=1, context=1)
    p = m.init(jax.random.key(0), jnp.zeros((2, 6, 5)), jnp.asarray([6, 6]))
    with pytest.raises(ValueError):
        FL.lstm_am_apply_prefused(p, jnp.zeros((2, 6, 5)), jnp.asarray([6, 6]))
