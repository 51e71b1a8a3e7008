"""Pallas LSTM recurrence kernel (mogasr.am.lstm_pallas): equality with the
stock LstmAm checkpoint on ragged batches (interpret mode on the CPU test
mesh), padding invariance, lane/row padding correctness at non-aligned
shapes, and the bf16 throughput variant staying decision-close."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.am import fast_lstm as FL
from mogasr.am import lstm_pallas as LP
from mogasr.am.neural import LstmAm


def _init(B=3, T=17, D=7, H=11, layers=2, seed=0):
    model = LstmAm(n_pdfs=5, hidden=H, layers=layers)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    n_frames = jnp.asarray(
        [T, max(T - 5, 1), min(4, T)] + list(rng.integers(1, T + 1, B - 3))
    )[:B]
    params = model.init(jax.random.key(1), feats, n_frames)
    return model, params, feats, n_frames


@pytest.mark.parametrize("layers", [1, 2])
def test_pallas_matches_stock_on_valid_frames(layers):
    model, params, feats, n_frames = _init(layers=layers, seed=layers)
    ref = np.asarray(model.apply(params, feats, n_frames))
    got = np.asarray(
        LP.lstm_am_apply_pallas(params, feats, n_frames, interpret=True))
    for b, nf in enumerate(np.asarray(n_frames)):
        np.testing.assert_allclose(
            got[b, : int(nf)], ref[b, : int(nf)], rtol=2e-5, atol=2e-5
        )


def test_pallas_matches_prefused_exactly_shaped():
    # H=128-aligned and B=8-aligned: no padding path at all
    model, params, feats, n_frames = _init(B=8, T=9, D=16, H=128, layers=1,
                                           seed=7)
    ref = np.asarray(FL.lstm_am_apply_prefused(params, feats, n_frames))
    got = np.asarray(
        LP.lstm_am_apply_pallas(params, feats, n_frames, interpret=True))
    for b, nf in enumerate(np.asarray(n_frames[:8])):
        np.testing.assert_allclose(
            got[b, : int(nf)], ref[b, : int(nf)], rtol=2e-5, atol=2e-5
        )


def test_pallas_padding_invariance():
    model, params, feats, n_frames = _init(seed=3)
    got1 = np.asarray(
        LP.lstm_am_apply_pallas(params, feats, n_frames, interpret=True))
    rng = np.random.default_rng(9)
    feats2 = np.asarray(feats).copy()
    for b, nf in enumerate(np.asarray(n_frames)):
        feats2[b, int(nf):] = rng.standard_normal(feats2[b, int(nf):].shape) * 40
    feats2 = jnp.concatenate(
        [jnp.asarray(feats2),
         jnp.asarray(rng.standard_normal((3, 5, feats.shape[-1])), jnp.float32)],
        axis=1,
    )
    got2 = np.asarray(
        LP.lstm_am_apply_pallas(params, feats2, n_frames, interpret=True))
    for b, nf in enumerate(np.asarray(n_frames)):
        np.testing.assert_allclose(
            got2[b, : int(nf)], got1[b, : int(nf)], rtol=1e-5, atol=1e-5
        )


def test_pallas_bf16_close_and_finite():
    model, params, feats, n_frames = _init(B=4, T=12, D=7, H=16, layers=1,
                                           seed=11)
    f32 = np.asarray(
        LP.lstm_am_apply_pallas(params, feats, n_frames, interpret=True))
    bf16 = np.asarray(LP.lstm_am_apply_pallas(
        params, feats, n_frames, compute_dtype="bfloat16", interpret=True))
    assert np.isfinite(bf16).all()
    # recurrent dot in bf16, everything else f32: loose but bounded drift
    for b, nf in enumerate(np.asarray(n_frames)):
        np.testing.assert_allclose(
            bf16[b, : int(nf)], f32[b, : int(nf)], rtol=0.05, atol=0.05
        )


def test_pallas_jitted_closure():
    model, params, feats, n_frames = _init(seed=5)
    fn = LP.make_pallas_lstm_logits(params)
    a = np.asarray(fn(feats, n_frames))
    b = np.asarray(
        LP.lstm_am_apply_pallas(params, feats, n_frames, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_rnnt_encoder_subtree_matches_stock_encode():
    # rnnt_encode routes the encoder submodule (an LstmAm) through the
    # kernel by passing its params subtree unchanged; the subtree
    # extraction must reproduce model.apply(method=encode) exactly.
    from mogasr.am.rnnt import RnntModel, build_rnnt_model

    model = build_rnnt_model(5, __import__("mogasr.config", fromlist=["TrainConfig"]).TrainConfig())
    rng = np.random.default_rng(3)
    B, T, D = 3, 13, 7
    feats = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    n_frames = jnp.asarray([T, T - 4, 2])
    labels = jnp.asarray(rng.integers(0, 5, (B, 6)), jnp.int32)
    params = model.init(jax.random.key(0), feats, n_frames, labels)
    ref = np.asarray(
        model.apply(params, feats, n_frames, method=RnntModel.encode))
    got = np.asarray(LP.lstm_am_apply_pallas(
        {"params": params["params"]["encoder"]}, feats, n_frames,
        interpret=True))
    mask = (np.arange(T)[None, :, None] < np.asarray(n_frames)[:, None, None])
    np.testing.assert_allclose(np.where(mask, got, 0.0),
                               np.where(mask, ref, 0.0), rtol=1e-5, atol=1e-5)


def test_routing_gate_demoted_everywhere(monkeypatch):
    """use_pallas_lstm is DEMOTED (round 3): the stock jitted XLA scan won
    the fair jitted-vs-jitted A/B (2722 vs 2437 utt/s), so the gate must
    be off on every backend/device-count combination — the round-2
    promotion A/B was eager-vs-jitted and void (TPU_NOTES round 3)."""
    model = LstmAm(n_pdfs=5, hidden=11, layers=1)
    for on_tpu in (True, False):
        for n_dev in (1, 8):
            monkeypatch.setattr(LP, "_on_tpu", lambda v=on_tpu: v)
            monkeypatch.setattr(LP.jax, "device_count", lambda v=n_dev: v)
            assert not LP.use_pallas_lstm(model)
