"""Batched session engine tests: per-session results are IDENTICAL to a
dedicated StreamingFrontend + OnlineDecoder pair, under staggered starts,
ragged per-tick audio arrival, slot reuse, and empty sessions."""

import jax.numpy as jnp
import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig, FrontendConfig
from mogasr.data.synthetic import make_corpus
from mogasr.decoder.online import OnlineDecoder
from mogasr.frontend.streaming import StreamingFrontend
from mogasr.hmm import graph as gr
from mogasr.serving.engine import BatchedSessionEngine


def _words_of(graph, path, entered):
    toks = []
    for t in range(path.shape[0]):
        j = path[t]
        if j < 0:
            break
        if entered[t]:
            w = graph.labels[graph.chain_id[j]]
            if w not in ("<sil>", "sil"):
                toks.append(w)
    return toks


@pytest.fixture(scope="module")
def setup(trained_system):
    lex, topo, _batches, gmm = trained_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)

    def score_fn(feats):
        return pipe.score_batch(feats, gmm)

    utts = make_corpus(5, words_per_utt=(2, 3), seed=77)
    return graph, gmm, fcfg, dcfg, score_fn, utts


def _dedicated(graph, gmm, fcfg, dcfg, wave, chunk=3000):
    """The per-session reference pipeline (cli/serve.py GMM mode)."""
    fe = StreamingFrontend(fcfg)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([graph]).items()}
    dec = OnlineDecoder(graphs, acoustic_scale=dcfg.acoustic_scale)
    for i in range(0, len(wave), chunk):
        feats = fe.process(wave[i : i + chunk])
        if feats.size:
            dec.process(
                pipe.score_batch(jnp.asarray(feats[None]), gmm),
                np.asarray([feats.shape[0]]),
            )
    feats = fe.finalize()
    if feats.size:
        dec.process(
            pipe.score_batch(jnp.asarray(feats[None]), gmm),
            np.asarray([feats.shape[0]]),
        )
    path, entered, _ = dec.finalize()
    return _words_of(graph, path[0], entered[0])


def test_engine_matches_dedicated_sessions(setup):
    """5 sessions through a capacity-4 engine (the 5th reuses a freed slot),
    staggered starts, ragged chunk sizes — every final transcript equals the
    dedicated per-session pipeline's."""
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    want = {u.utt_id: _dedicated(graph, gmm, fcfg, dcfg, u.wave)
            for u in utts}

    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=4, tick_frames=16
    )
    rng = np.random.default_rng(3)
    pending = list(utts)
    cursors = {}   # sid -> sample offset
    ended = set()
    got = {}
    while len(got) < len(utts):
        # admit sessions as slots free up
        while pending and eng.n_live < eng.capacity:
            u = pending.pop(0)
            assert eng.start(u.utt_id)
            cursors[u.utt_id] = 0
        # ragged feeding: each live un-ended session gets a random bite
        for u in utts:
            sid = u.utt_id
            if sid not in cursors or sid in ended or sid in got:
                continue
            off = cursors[sid]
            if off >= len(u.wave):
                eng.end(sid)
                ended.add(sid)
                continue
            n = int(rng.integers(500, 5000))
            eng.feed(sid, u.wave[off : off + n])
            cursors[sid] = off + n
        eng.tick()
        # finalize drained sessions (frees their slots)
        for sid in list(ended):
            if eng.drained(sid):
                words, audio_s = eng.finalize(sid)
                got[sid] = words
                ended.discard(sid)
                u = next(x for x in utts if x.utt_id == sid)
                assert audio_s == pytest.approx(len(u.wave) / fcfg.sample_rate)
    assert got == want


def test_engine_partial_and_empty_session(setup):
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=16
    )
    u = utts[0]
    assert eng.start("s")
    assert eng.start("empty")
    eng.feed("s", u.wave[:8000])
    eng.tick()
    eng.tick()
    # partial is well-formed mid-stream (list of vocab words)
    part = eng.partial("s", delta_np=np.asarray(eng.delta))
    assert isinstance(part, list)
    eng.feed("s", u.wave[8000:])
    eng.end("s")
    eng.end("empty")
    words, _ = eng.run_to_drain("s")
    assert words == _dedicated(graph, gmm, fcfg, dcfg, u.wave)
    ew, audio_s = eng.run_to_drain("empty")
    assert ew == [] and audio_s == 0.0
    # capacity freed: a new session can start in the reused slots
    assert eng.start("again") and eng.n_live == 1


def test_engine_rejects_duplicate_and_overflow(setup):
    graph, _gmm, fcfg, dcfg, score_fn, _utts = setup
    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=8
    )
    assert eng.start("a") and eng.start("b")
    assert not eng.start("a")      # duplicate
    assert not eng.start("c")      # full
