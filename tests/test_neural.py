"""Neural AM tests: shapes, splice clamping, loss masking, training smoke
(loss decreases on a learnable synthetic task)."""

import numpy as np
import jax
import jax.numpy as jnp

from mogasr.am import neural as N
from mogasr.am.train_nn import init_train_state, make_train_step
from mogasr.config import TrainConfig


def test_splice_shapes_and_clamp():
    feats = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    out = N.splice_frames(feats, jnp.asarray([5, 3]), context=2)
    assert out.shape == (2, 5, 15)
    # frame 0 left context is clamped to frame 0
    np.testing.assert_allclose(out[0, 0, :3], feats[0, 0])
    np.testing.assert_allclose(out[0, 0, 3:6], feats[0, 0])
    # utterance 1 has only 3 valid frames: right context clamps to frame 2
    np.testing.assert_allclose(out[1, 2, -3:], feats[1, 2])


def test_mlp_forward_shape():
    model = N.MlpAm(n_pdfs=11, hidden=32, layers=2, context=1)
    feats = jnp.zeros((2, 7, 5))
    params = model.init(jax.random.key(0), feats, jnp.asarray([7, 7]))
    logits = model.apply(params, feats, jnp.asarray([7, 4]))
    assert logits.shape == (2, 7, 11)


def test_lstm_forward_shape():
    model = N.LstmAm(n_pdfs=9, hidden=16, layers=2)
    feats = jnp.zeros((2, 6, 5))
    params = model.init(jax.random.key(0), feats, jnp.asarray([6, 6]))
    logits = model.apply(params, feats, jnp.asarray([6, 3]))
    assert logits.shape == (2, 6, 9)


def test_loss_masking():
    logits = jnp.zeros((1, 4, 3))
    labels = jnp.asarray([[0, 1, -1, -1]])
    loss, acc = N.frame_ce_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(3), atol=1e-5)
    # garbage on padded frames must not change the loss
    logits2 = logits.at[:, 2:].set(100.0)
    loss2, _ = N.frame_ce_loss(logits2, labels)
    np.testing.assert_allclose(float(loss), float(loss2), atol=1e-6)


def test_priors_and_hybrid_conversion():
    labels = np.asarray([[0, 0, 1, -1]])
    lp = N.state_priors(labels, n_pdfs=3, smooth=0.0)
    assert lp.shape == (3,)
    np.testing.assert_allclose(np.exp(lp[0]), 2 / 3, atol=1e-6)
    logits = jnp.zeros((1, 2, 3))
    ll = N.posteriors_to_loglik(logits, jnp.asarray(np.nan_to_num(lp, neginf=-30)))
    assert ll.shape == (1, 2, 3)
    # lower prior => higher pseudo-likelihood
    assert float(ll[0, 0, 2]) > float(ll[0, 0, 0])


def test_training_learns():
    """Frames labeled by a linear rule: MLP should fit it quickly."""
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 20, 6)).astype(np.float32)
    labels = (feats.sum(-1) > 0).astype(np.int64)  # 2 classes
    cfg = TrainConfig(nn_hidden=32, nn_layers=2, nn_context=0, lr=1e-2, num_nn_steps=60)
    model = N.build_model("mlp", 2, cfg)
    state = init_train_state(model, cfg, 6, jax.random.key(0))
    step = make_train_step(model, cfg)
    n_frames = jnp.asarray([20] * 4)
    first = None
    for i in range(60):
        state, metrics = step(state, jnp.asarray(feats), n_frames, jnp.asarray(labels))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first * 0.5
    assert float(metrics["frame_acc"]) > 0.9


def test_blstm_forward_shape():
    model = N.BlstmAm(n_pdfs=9, hidden=8, layers=1)
    feats = jnp.zeros((2, 6, 5))
    params = model.init(jax.random.key(0), feats, jnp.asarray([6, 6]))
    logits = model.apply(params, feats, jnp.asarray([6, 3]))
    assert logits.shape == (2, 6, 9)


def test_tdnn_forward_shape_and_padding():
    model = N.TdnnAm(n_pdfs=7, hidden=8, layers=2)
    feats = jnp.ones((2, 10, 4))
    params = model.init(jax.random.key(0), feats, jnp.asarray([10, 10]))
    logits = model.apply(params, feats, jnp.asarray([10, 5]))
    assert logits.shape == (2, 10, 7)
    # padding frames zeroed before convs: valid-region logits of a short
    # utterance must not depend on garbage in its padding
    feats2 = feats.at[1, 5:].set(1e6)
    logits2 = model.apply(params, feats2, jnp.asarray([10, 5]))
    np.testing.assert_allclose(
        np.asarray(logits[1, :3]), np.asarray(logits2[1, :3]), atol=1e-5
    )


def test_build_model_archs():
    from mogasr.config import TrainConfig

    cfg = TrainConfig(nn_hidden=8, nn_layers=2)
    for arch in ["mlp", "lstm", "blstm", "tdnn"]:
        m = N.build_model(arch, 5, cfg)
        feats = jnp.zeros((1, 4, 3))
        params = m.init(jax.random.key(0), feats, jnp.asarray([4]))
        assert m.apply(params, feats, jnp.asarray([4])).shape == (1, 4, 5)


def test_spec_augment_masks_and_trains():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 40, 10)).astype(np.float32))
    out = N.spec_augment(feats, jnp.asarray([40, 40]), jax.random.key(0))
    assert out.shape == feats.shape
    zero_frac = float((np.asarray(out) == 0).mean())
    assert 0.05 < zero_frac < 0.9  # some masking happened, not everything
    # deterministic given the key
    out2 = N.spec_augment(feats, jnp.asarray([40, 40]), jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # training with augmentation still learns
    from mogasr.am.train_nn import init_train_state, make_train_step
    from mogasr.config import TrainConfig

    labels = (np.asarray(feats).sum(-1) > 0).astype(np.int64)
    cfg = TrainConfig(nn_hidden=32, nn_layers=2, nn_context=0, lr=1e-2, num_nn_steps=60)
    model = N.build_model("mlp", 2, cfg)
    state = init_train_state(model, cfg, 10, jax.random.key(0))
    step = make_train_step(model, cfg, spec_augment=True)
    for _ in range(60):
        state, metrics = step(state, feats, jnp.asarray([40, 40]), jnp.asarray(labels))
    assert float(metrics["frame_acc"]) > 0.8
