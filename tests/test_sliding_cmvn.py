"""Causal sliding-window CMVN: oracle/fused/streaming agreement, causality,
and the full online path (sliding features -> online decoder) matching the
offline pipeline exactly."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.config import BatchConfig, FrontendConfig
from mogasr.data.synthetic import synth_utterance
from mogasr.frontend.jax_frontend import make_frontend
from mogasr.frontend.numpy_ref import cmvn_sliding_np, extract_features_np
from mogasr.frontend.streaming import StreamingFrontend

SCFG = FrontendConfig(cmvn="sliding", cmvn_window=50)


def test_sliding_cmvn_np_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 5)).astype(np.float32)
    W = 10
    got = cmvn_sliding_np(x, W, norm_var=True)
    for t in range(x.shape[0]):
        seg = x[max(0, t - W + 1) : t + 1].astype(np.float64)
        want = (x[t] - seg.mean(0)) / np.sqrt(np.maximum(seg.var(0), 1e-10))
        np.testing.assert_allclose(got[t], want, atol=1e-4)


def test_fused_sliding_matches_oracle():
    u = synth_utterance("u", ["cat", "dog"], seed=3)
    ref = extract_features_np(u.wave, SCFG)
    fe = make_frontend(SCFG, len(u.wave))
    feats, nf = fe(jnp.asarray(u.wave[None]), jnp.asarray([len(u.wave)]))
    n = int(nf[0])
    assert n == ref.shape[0]
    # early frames divide by near-floor windowed variances, amplifying f32
    # cumsum noise — hence the looser tolerance vs the utterance-CMVN parity
    np.testing.assert_allclose(np.asarray(feats[0, :n]), ref, atol=6e-3)


@pytest.mark.parametrize("chunk", [800, 4096, 16000])
def test_streaming_sliding_matches_offline(chunk):
    u = synth_utterance("u", ["see", "sun", "tree"], seed=4)
    ref = extract_features_np(u.wave, SCFG)
    sf = StreamingFrontend(SCFG)
    outs = [sf.process(u.wave[i : i + chunk]) for i in range(0, len(u.wave), chunk)]
    outs.append(sf.finalize())
    got = np.concatenate([o for o in outs if o.size])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_sliding_is_causal():
    """Features emitted for a prefix never change when more audio arrives."""
    u = synth_utterance("u", ["fish", "cat"], seed=5)
    wave = u.wave
    half = len(wave) // 2
    sf_full = StreamingFrontend(SCFG)
    a = sf_full.process(wave[:half])
    sf_pref = StreamingFrontend(SCFG)
    b = sf_pref.process(wave[:half])
    np.testing.assert_array_equal(a, b)
    # feeding different futures does not rewrite the past
    more = sf_full.process(wave[half:])
    assert more.shape[0] > 0


def test_online_end_to_end_matches_offline(mini_system):
    """True-online ASR: sliding-CMVN streaming features + OnlineDecoder ==
    the offline pipeline (same features, offline Viterbi) exactly."""
    from mogasr import pipeline as pipe
    from mogasr.config import DecodeConfig
    from mogasr.decoder import viterbi as vit
    from mogasr.decoder.online import OnlineDecoder
    from mogasr.hmm import graph as gr

    mlex, topo, gmm, vocab = mini_system
    # NOTE: the GMM was trained on utterance-CMVN features; decode agreement
    # (online == offline), not accuracy, is the claim here, so any
    # normalization works as long as both paths share it.
    scfg = dataclasses.replace(SCFG, cmvn_window=100)
    u = synth_utterance("stream-0", ["see", "dog"], seed=11)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(mlex, topo, dcfg)

    # offline: batch featurize (sliding) + offline viterbi
    fbs = pipe.featurize(
        [(u.utt_id, u.wave, u.words)], scfg,
        BatchConfig(batch_size=1, bucket_boundaries=(400,)),
    )
    fb = fbs[0]
    scores = pipe.score_batch(fb.feats, gmm)
    graphs_np = gr.batch_graphs([graph])
    graphs = {k: jnp.asarray(v) for k, v in graphs_np.items()}
    off = vit.viterbi(scores, graphs, fb.n_frames, acoustic_scale=1.0)
    off_toks = vit.path_to_tokens(off, graph.labels, graphs_np["chain_id"])

    # online: stream audio in 0.25 s chunks -> features -> score -> decode
    sf = StreamingFrontend(scfg)
    dec = OnlineDecoder(graphs, acoustic_scale=1.0)
    chunks = [sf.process(u.wave[i : i + 4000]) for i in range(0, len(u.wave), 4000)]
    chunks.append(sf.finalize())
    for feats in chunks:
        if feats.size == 0:
            continue
        sc = pipe.score_batch(jnp.asarray(feats[None]), gmm)
        dec.process(sc, np.asarray([feats.shape[0]]))
    path, entered, score = dec.finalize()

    n = int(fb.n_frames[0])
    assert path.shape[1] == n
    np.testing.assert_array_equal(path[0], np.asarray(off.path)[0, :n])
    # per-frame f32 feature differences (~1e-3) accumulate over ~300 frames of
    # summed log-likelihoods; the decision path above is the exactness claim
    np.testing.assert_allclose(score[0], float(off.score[0]), atol=5.0)
    # token readout identical
    from types import SimpleNamespace

    res = SimpleNamespace(path=path, entered=entered)
    on_toks = vit.path_to_tokens(res, graph.labels, graphs_np["chain_id"])
    assert on_toks[0] == off_toks[0]
