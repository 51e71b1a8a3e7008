"""Pruned RNN-T (mogasr.am.rnnt_pruned): banded loss == full loss when the
band covers the lattice (values AND gradients), factored grids vs a dense
oracle, bound validity invariants, the upper-bound property on a sub-band,
padding invariance, and learn-then-decode through the pruned train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.am import rnnt as R
from mogasr.am import rnnt_pruned as RP
from mogasr.config import TrainConfig

from test_rnnt import _make_unit_task, _rand_problem


def test_banded_equals_full_when_covering():
    logits, n_frames, labels, n_labels = _rand_problem(seed=3)
    B, T, U1, V = logits.shape
    u_start = jnp.zeros((B, T), jnp.int32)

    full = R.rnnt_loss(
        jnp.asarray(logits), jnp.asarray(n_frames),
        jnp.asarray(labels), jnp.asarray(n_labels),
    )
    banded = RP.rnnt_loss_banded(
        jnp.asarray(logits), u_start, jnp.asarray(n_frames),
        jnp.asarray(labels), jnp.asarray(n_labels),
    )
    np.testing.assert_allclose(np.asarray(banded), np.asarray(full),
                               rtol=1e-5, atol=1e-5)

    g_full = jax.grad(
        lambda x: jnp.sum(R.rnnt_loss(
            x, jnp.asarray(n_frames), jnp.asarray(labels),
            jnp.asarray(n_labels)))
    )(jnp.asarray(logits))
    g_band = jax.grad(
        lambda x: jnp.sum(RP.rnnt_loss_banded(
            x, u_start, jnp.asarray(n_frames), jnp.asarray(labels),
            jnp.asarray(n_labels)))
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_full),
                               rtol=1e-4, atol=1e-5)


def test_grids_simple_match_dense_oracle():
    rng = np.random.default_rng(7)
    B, T, U, V = 2, 5, 3, 4
    am = rng.standard_normal((B, T, V)).astype(np.float32)
    lm = rng.standard_normal((B, U + 1, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, (B, U)).astype(np.int32)

    blank, emit = RP.rnnt_grids_simple(
        jnp.asarray(am), jnp.asarray(lm), jnp.asarray(labels))

    dense = am[:, :, None, :] + lm[:, None, :, :]          # [B, T, U+1, V]
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(dense), axis=-1))
    np.testing.assert_allclose(np.asarray(blank), logp[..., V - 1],
                               rtol=1e-5, atol=1e-5)
    want_emit = np.take_along_axis(
        logp[:, :, :U, :], labels[:, None, :, None], axis=3)[..., 0]
    np.testing.assert_allclose(np.asarray(emit), want_emit,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("band", [2, 3])
def test_prune_bounds_invariants(band):
    logits, n_frames, labels, n_labels = _rand_problem(seed=5, B=4, T=8, U=4)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    blank = logp[..., -1]
    safe = jnp.maximum(jnp.asarray(labels), 0)
    emit = jnp.take_along_axis(
        logp[:, :, :-1, :], safe[:, None, :, None], axis=3)[..., 0]

    u_start = np.asarray(RP.rnnt_prune_bounds(
        blank, emit, jnp.asarray(n_frames), jnp.asarray(n_labels), band))

    for b in range(len(n_frames)):
        last = int(n_frames[b]) - 1
        us = u_start[b, : last + 1]
        assert us[0] == 0
        deltas = np.diff(us)
        assert (deltas >= 0).all() and (deltas <= band - 1).all(), us
        fin = max(int(n_labels[b]) + 1 - band, 0)
        assert us[last] == fin, (us, fin)
        # final node (last, n_labels) inside the band
        assert us[last] <= int(n_labels[b]) <= us[last] + band - 1


def test_banded_is_upper_bound_on_sub_band():
    # A strict sub-band can only LOSE paths: banded NLL >= full NLL.
    logits, n_frames, labels, n_labels = _rand_problem(seed=11, B=4, T=8, U=4)
    band = 3
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    blank = logp[..., -1]
    safe = jnp.maximum(jnp.asarray(labels), 0)
    emit = jnp.take_along_axis(
        logp[:, :, :-1, :], safe[:, None, :, None], axis=3)[..., 0]
    u_start = RP.rnnt_prune_bounds(
        blank, emit, jnp.asarray(n_frames), jnp.asarray(n_labels), band)

    # gather the band slice of the SAME logits
    idx = jnp.clip(
        u_start[:, :, None] + jnp.arange(band)[None, None, :],
        0, logits.shape[2] - 1,
    )
    logits_band = jnp.take_along_axis(
        jnp.asarray(logits), idx[..., None], axis=2)

    full = np.asarray(R.rnnt_loss(
        jnp.asarray(logits), jnp.asarray(n_frames),
        jnp.asarray(labels), jnp.asarray(n_labels)))
    banded = np.asarray(RP.rnnt_loss_banded(
        logits_band, u_start, jnp.asarray(n_frames),
        jnp.asarray(labels), jnp.asarray(n_labels)))
    assert (banded >= full - 1e-4).all(), (banded, full)
    assert np.isfinite(banded).all()


def test_banded_padding_invariance():
    logits, n_frames, labels, n_labels = _rand_problem(seed=13, B=3, T=6, U=3)
    B, T, U1, V = logits.shape
    band = 2
    args = (jnp.asarray(n_frames), jnp.asarray(n_labels))
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    blank = logp[..., -1]
    safe = jnp.maximum(jnp.asarray(labels), 0)
    emit = jnp.take_along_axis(
        logp[:, :, :-1, :], safe[:, None, :, None], axis=3)[..., 0]
    u_start = RP.rnnt_prune_bounds(blank, emit, *args, band)
    idx = jnp.clip(
        u_start[:, :, None] + jnp.arange(band)[None, None, :], 0, U1 - 1)
    logits_band = jnp.take_along_axis(jnp.asarray(logits), idx[..., None],
                                      axis=2)
    base = np.asarray(RP.rnnt_loss_banded(
        logits_band, u_start, *((args[0], jnp.asarray(labels), args[1]))))

    # trash the logits in padded frames: loss must not move
    rng = np.random.default_rng(17)
    trashed = np.asarray(logits_band).copy()
    for b in range(B):
        trashed[b, int(n_frames[b]):] = rng.standard_normal(
            trashed[b, int(n_frames[b]):].shape) * 20
    got = np.asarray(RP.rnnt_loss_banded(
        jnp.asarray(trashed), u_start, args[0], jnp.asarray(labels), args[1]))
    np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)


def test_pruned_step_trains_and_greedy_decodes():
    feats, n_frames, labels, n_labels, seqs = _make_unit_task()
    model = R.RnntModel(
        n_labels=3, enc_hidden=32, enc_layers=1, pred_hidden=16,
        joint_hidden=32, simple_heads=True,
    )
    cfg = TrainConfig(lr=5e-3, num_nn_steps=300)
    state = R.init_rnnt_train_state(
        model, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = RP.make_rnnt_pruned_train_step(model, cfg, band=2)
    first = None
    for _ in range(cfg.num_nn_steps):
        state, m = step(state, feats, n_frames, labels, n_labels)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.3, (first, float(m["loss"]))
    hyps = R.rnnt_greedy_decode(model, state.params, feats, n_frames)
    assert hyps == seqs, (hyps, seqs)


def test_pruned_step_rejects_model_without_simple_heads():
    model = R.RnntModel(n_labels=3, enc_hidden=8, enc_layers=1,
                        pred_hidden=8, joint_hidden=8)
    with pytest.raises(ValueError):
        RP.make_rnnt_pruned_train_step(model, TrainConfig(), band=2)


def test_infeasible_band_excluded_not_poisoning():
    # U=6 labels but only 3 frames with band=2 -> the band cannot traverse;
    # the pruned term must exclude the row instead of averaging ~1e30 in
    rng = np.random.default_rng(31)
    model = R.RnntModel(n_labels=8, enc_hidden=16, enc_layers=1,
                        pred_hidden=8, joint_hidden=8, simple_heads=True)
    B, T, U, D = 2, 3, 6, 5
    feats = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    n_frames = jnp.asarray([T, T])
    labels = jnp.asarray(rng.integers(0, 8, (B, U)), jnp.int32)
    n_labels = jnp.asarray([U, 1])   # row 0 infeasible, row 1 fine
    params = R.init_rnnt_train_state(
        model, TrainConfig(), D, U, jax.random.key(0)).params
    loss, _ = RP.rnnt_pruned_objective(
        model, params, feats, n_frames, labels, n_labels, band=2)
    assert np.isfinite(float(loss)) and abs(float(loss)) < 1e6, float(loss)


def test_band_below_two_rejected():
    model = R.RnntModel(n_labels=3, enc_hidden=8, enc_layers=1,
                        pred_hidden=8, joint_hidden=8, simple_heads=True)
    with pytest.raises(ValueError):
        RP.make_rnnt_pruned_train_step(model, TrainConfig(), band=1)
