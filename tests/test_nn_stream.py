"""Streaming LSTM scorer: chunked stateful forward == offline LstmAm exactly,
and the full neural online pipeline (streaming scorer -> OnlineDecoder)
matches the offline hybrid decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.am.neural import (
    LstmAm, lstm_stream_init, make_lstm_stream_step, posteriors_to_loglik,
)


@pytest.fixture(scope="module")
def lstm_setup(rng):
    B, T, D, P = 3, 50, 8, 12
    model = LstmAm(n_pdfs=P, hidden=16, layers=2)
    feats = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    n_frames = jnp.asarray([50, 37, 21])
    params = model.init(jax.random.key(0), feats, n_frames)
    return model, params, feats, n_frames


@pytest.mark.parametrize("chunks", [[50], [7, 13, 30], [1] * 50])
def test_stream_matches_offline(lstm_setup, chunks, rng):
    model, params, feats, n_frames = lstm_setup
    B, T, D = feats.shape
    log_priors = jnp.asarray(
        np.log(rng.dirichlet(np.ones(model.n_pdfs))).astype(np.float32)
    )
    offline = posteriors_to_loglik(
        model.apply(params, feats, jnp.full((B,), T)), log_priors
    )

    step = make_lstm_stream_step(model, params, log_priors)
    carries = lstm_stream_init(model, B, D)
    outs = []
    t0 = 0
    for tc in chunks:
        carries, ll = step(carries, feats[:, t0 : t0 + tc])
        outs.append(ll)
        t0 += tc
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(offline), atol=1e-5)


def test_stream_param_tree_compatible(lstm_setup):
    """The streaming module consumes the OFFLINE LstmAm checkpoint as-is."""
    from mogasr.am.neural import LstmAmStream

    model, params, feats, n_frames = lstm_setup
    stream = LstmAmStream(n_pdfs=model.n_pdfs, hidden=model.hidden, layers=model.layers)
    carries = lstm_stream_init(model, feats.shape[0], feats.shape[2])
    sp = stream.init(jax.random.key(1), feats, carries)
    assert jax.tree.structure(sp) == jax.tree.structure(params)


def test_neural_online_pipeline_matches_offline(mini_system):
    """Streaming-LSTM hybrid decode == offline hybrid decode (same params):
    features (sliding CMVN) -> chunked LSTM scoring -> OnlineDecoder."""
    import dataclasses

    from mogasr import pipeline as pipe
    from mogasr.am.train_nn import init_train_state, make_train_step
    from mogasr.am.neural import state_priors
    from mogasr.config import (
        BatchConfig, DecodeConfig, FrontendConfig, TrainConfig,
    )
    from mogasr.data.synthetic import make_corpus, synth_utterance
    from mogasr.decoder import viterbi as vit
    from mogasr.decoder.online import OnlineDecoder
    from mogasr.frontend.streaming import StreamingFrontend
    from mogasr.hmm import graph as gr

    mlex, topo, gmm, vocab = mini_system
    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=100)
    bcfg = BatchConfig(batch_size=8, bucket_boundaries=(250, 400))
    # quick LSTM train on GMM alignments of the mini corpus
    train_utts = make_corpus(8, words_per_utt=(2, 3), seed=1, vocab=vocab)
    tb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in train_utts], fcfg, bcfg)
    tcfg = TrainConfig(nn_arch="lstm", nn_hidden=32, nn_layers=1, lr=2e-3,
                       num_nn_steps=30)
    model = LstmAm(n_pdfs=topo.n_pdfs, hidden=32, layers=1)
    state = init_train_state(model, tcfg, fcfg.feat_dim, jax.random.key(0))
    step_fn = make_train_step(model, tcfg)
    labeled = []
    for fb in tb:
        _r, labels, _ = pipe.align_batch(fb, gmm, mlex, topo)
        labeled.append((fb, labels))
    for i in range(tcfg.num_nn_steps):
        fb, labels = labeled[i % len(labeled)]
        state, _m = step_fn(state, fb.feats, fb.n_frames, labels)
    all_labels = np.concatenate([np.asarray(l).reshape(-1) for _, l in labeled])
    log_priors = jnp.asarray(state_priors(all_labels, topo.n_pdfs))

    # one eval utterance
    u = synth_utterance("nn-stream", ["see", "dog"], seed=21)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(mlex, topo, dcfg)
    graphs_np = gr.batch_graphs([graph])
    graphs = {k: jnp.asarray(v) for k, v in graphs_np.items()}

    # offline: batch featurize + full-sequence LSTM + offline viterbi
    fb = pipe.featurize(
        [(u.utt_id, u.wave, u.words)], fcfg,
        BatchConfig(batch_size=1, bucket_boundaries=(400,)),
    )[0]
    n = int(fb.n_frames[0])
    logits = model.apply(state.params, fb.feats[:, :n], jnp.asarray([n]))
    ll_off = posteriors_to_loglik(logits, log_priors)
    off = vit.viterbi(ll_off, graphs, jnp.asarray([n]), acoustic_scale=1.0)
    off_toks = vit.path_to_tokens(off, graph.labels, graphs_np["chain_id"])

    # online: stream audio -> features -> stateful LSTM -> OnlineDecoder
    sf = StreamingFrontend(fcfg)
    dec = OnlineDecoder(graphs, acoustic_scale=1.0)
    stream_step = make_lstm_stream_step(model, state.params, log_priors)
    carries = lstm_stream_init(model, 1, fcfg.feat_dim)
    chunks = [sf.process(u.wave[i : i + 4000]) for i in range(0, len(u.wave), 4000)]
    chunks.append(sf.finalize())
    for feats in chunks:
        if feats.size == 0:
            continue
        carries, ll = stream_step(carries, jnp.asarray(feats[None]))
        dec.process(ll, np.asarray([feats.shape[0]]))
    path, entered, _ = dec.finalize()

    from types import SimpleNamespace

    res = SimpleNamespace(path=path, entered=entered)
    on_toks = vit.path_to_tokens(res, graph.labels, graphs_np["chain_id"])
    assert on_toks[0] == off_toks[0]
