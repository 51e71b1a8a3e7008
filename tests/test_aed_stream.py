"""Streaming (chunked) Conformer encoder tests: the chunk-incremental
``encode_stream_step`` path must be EXACTLY equal to the offline
chunk-masked forward of the same checkpoint — the property that lets one
set of weights serve both batch decoding and live streaming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.am import aed


def _chunked_model(chunk_frames=4, left_chunks=1, enc_blocks=2, n_feats=8):
    model = aed.AedModel(
        n_units=3, d_model=32, enc_blocks=enc_blocks, dec_blocks=1, heads=2,
        conv_kernel=7, chunk_frames=chunk_frames, left_chunks=left_chunks,
    )
    T = 3 * 4 * chunk_frames  # 3 chunks of raw frames
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, T, n_feats))
    n_frames = jnp.full((2,), T, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(1), feats, n_frames,
        jnp.zeros((2, 3), jnp.int32),
    )
    return model, params, feats, n_frames


@pytest.mark.parametrize("left_chunks", [0, 1, 2])
@pytest.mark.parametrize("n_feats", [8, 9])
def test_stream_step_equals_offline_chunked(left_chunks, n_feats):
    model, params, feats, n_frames = _chunked_model(
        left_chunks=left_chunks, n_feats=n_feats
    )
    enc_off, n_out, ctc_off = model.apply(
        params, feats, n_frames, method=aed.AedModel.encode_with_ctc
    )
    step = aed.make_aed_stream_step(model, params)
    state = aed.aed_stream_init(model, batch=2, n_feats=n_feats)
    raw_per = 4 * model.chunk_frames
    encs, ctcs = [], []
    for c in range(feats.shape[1] // raw_per):
        enc_c, ctc_c, state = step(
            feats[:, c * raw_per : (c + 1) * raw_per], state
        )
        encs.append(enc_c)
        ctcs.append(ctc_c)
    np.testing.assert_allclose(
        np.concatenate(encs, axis=1), np.asarray(enc_off), atol=2e-5
    )
    np.testing.assert_allclose(
        np.concatenate(ctcs, axis=1), np.asarray(ctc_off), atol=2e-5
    )


def test_chunked_offline_is_causal_in_chunks():
    """The offline chunk-masked encoder must not look ahead past the
    current chunk: outputs for the first 2 chunks are unchanged when the
    3rd chunk's input changes."""
    model, params, feats, n_frames = _chunked_model()
    raw_per = 4 * model.chunk_frames
    enc_full, _ = model.apply(
        params, feats, n_frames, method=aed.AedModel.encode
    )
    feats2 = feats.at[:, 2 * raw_per :].add(10.0)
    enc_pert, _ = model.apply(
        params, feats2, n_frames, method=aed.AedModel.encode
    )
    C = model.chunk_frames
    np.testing.assert_allclose(
        np.asarray(enc_full[:, : 2 * C]), np.asarray(enc_pert[:, : 2 * C]),
        atol=1e-6,
    )
    # and the global (chunk_frames=0) encoder IS anticausal — the mask is
    # what makes the difference, not an accident of the architecture
    gmodel = aed.AedModel(
        n_units=3, d_model=32, enc_blocks=2, dec_blocks=1, heads=2,
        conv_kernel=7,
    )
    gparams = gmodel.init(
        jax.random.PRNGKey(1), feats, n_frames, jnp.zeros((2, 3), jnp.int32)
    )
    g_full, _ = gmodel.apply(gparams, feats, n_frames, method=aed.AedModel.encode)
    g_pert, _ = gmodel.apply(gparams, feats2, n_frames, method=aed.AedModel.encode)
    assert not np.allclose(
        np.asarray(g_full[:, : 2 * C]), np.asarray(g_pert[:, : 2 * C]),
        atol=1e-3,
    )


def test_chunked_aed_learns_unit_task():
    """The chunk-masked encoder must still LEARN (causality + limited
    context costs capacity, not trainability), and the streamed CTC head
    must emit the learned units — the streaming partials pipeline."""
    from mogasr.config import TrainConfig
    from tests.test_aed import _unit_task

    feats, n_frames, labels, n_labels, seqs = _unit_task()
    m = aed.AedModel(
        n_units=3, d_model=32, enc_blocks=1, dec_blocks=1, heads=2,
        conv_kernel=7, chunk_frames=2, left_chunks=2,
    )
    cfg = TrainConfig(lr=2e-3, num_nn_steps=400)
    state = aed.init_aed_train_state(
        m, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = aed.make_aed_train_step(m, cfg)
    first = None
    for _ in range(cfg.num_nn_steps):
        state, met = step(state, feats, n_frames, labels, n_labels)
        if first is None:
            first = float(met["loss"])
    assert float(met["loss"]) < first * 0.5, (first, float(met["loss"]))
    hyps = aed.aed_decode_batch(
        m, state.params, feats, n_frames, beam=2, max_tokens=8
    )
    assert hyps == seqs, (hyps, seqs)
    # streamed CTC-greedy partials on an all-valid utterance recover the
    # sequence too (collapse repeats/blanks), using only chunk dispatches
    b = 0
    T = int(n_frames[b])
    sstep = aed.make_aed_stream_step(m, state.params)
    st = aed.aed_stream_init(m, batch=1, n_feats=feats.shape[-1])
    raw_per = 4 * m.chunk_frames
    toks, prev = [], -1
    for c in range(T // raw_per):
        _e, logits, st = sstep(feats[b : b + 1, c * raw_per : (c + 1) * raw_per], st)
        for f in np.argmax(np.asarray(logits[0]), axis=-1):
            if f != prev and f != 3:  # 3 = blank (n_units)
                toks.append(int(f))
            prev = int(f)
    assert toks == seqs[b], (toks, seqs[b])


def test_stream_init_requires_chunked():
    model = aed.AedModel(n_units=3, d_model=32, enc_blocks=1, dec_blocks=1,
                         heads=2)
    with pytest.raises(ValueError):
        aed.aed_stream_init(model, batch=1, n_feats=8)


def test_build_aed_model_chunked_roundtrip():
    from mogasr.config import TrainConfig

    tcfg = TrainConfig(nn_hidden=32, nn_layers=1)
    m = aed.build_aed_model(3, tcfg, chunk_frames=4, left_chunks=2)
    assert m.chunk_frames == 4 and m.left_chunks == 2
    assert aed.build_aed_model(3, tcfg).chunk_frames == 0
