"""Batched session engine tests: per-session results are IDENTICAL to a
dedicated StreamingFrontend + OnlineDecoder pair, under staggered starts,
ragged per-tick audio arrival, slot reuse, and empty sessions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """Mitigation for the full-suite XLA CPU segfault (VERDICT r3 #1a).

    A single-process `pytest tests/ -q` run reproducibly died with SIGSEGV
    inside `backend_compile_and_load` while compiling
    `aed_decode_batch` for test_aed_engine_matches_dedicated_sessions —
    after ~500 prior tests had JIT-compiled hundreds of CPU executables
    into the process — while the same test passes in a fresh interpreter.
    Dropping the accumulated executable cache before this module's large
    serving-engine compilations avoids the crash state.  tests/run_all.py
    remains the canonical crash-proof invocation.
    """
    jax.clear_caches()

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


@pytest.mark.parametrize("history", ["host", "device"])
def test_engine_matches_dedicated_sessions(setup, history):
    """5 sessions through a capacity-4 engine (the 5th reuses a freed slot —
    in device mode that also proves a reused slot's stale history rows are
    harmless), staggered starts, ragged chunk sizes — every final transcript
    equals the dedicated per-session pipeline's."""
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    want = {u.utt_id: _dedicated(graph, gmm, fcfg, dcfg, u.wave)
            for u in utts}

    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=4, tick_frames=16,
        history=history, max_frames=512,
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


@pytest.mark.parametrize("history", ["host", "device"])
def test_engine_partial_and_empty_session(setup, history):
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=16,
        history=history, max_frames=512,
    )
    u = utts[0]
    assert eng.start("s")
    assert eng.start("empty")
    eng.feed("s", u.wave[:8000])
    eng.tick()
    eng.tick()
    # partial is well-formed mid-stream (list of vocab words)
    part = eng.partial(
        "s", delta_np=None if history == "device" else np.asarray(eng.delta)
    )
    assert isinstance(part, list)
    assert eng.partials(["s", "empty"]) == {"s": part, "empty": []}
    eng.feed("s", u.wave[8000:])
    eng.end("s")
    eng.end("empty")
    words, _ = eng.run_to_drain("s")
    assert words == _dedicated(graph, gmm, fcfg, dcfg, u.wave)
    ew, audio_s = eng.run_to_drain("empty")
    assert ew == [] and audio_s == 0.0
    # capacity freed: a new session can start in the reused slots
    assert eng.start("again") and eng.n_live == 1


def test_engine_device_history_matches_host_partials_and_finals(setup):
    """Same feeding schedule through a host-history and a device-history
    engine: every rate-limited partial AND every final transcript must be
    identical — the device backtrace is a bit-exact re-implementation of
    the host chunk-list walk. Also covers finalize_many and the max_frames
    overflow guard."""
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    engs = {
        h: BatchedSessionEngine(
            graph, score_fn, fcfg, dcfg, capacity=4, tick_frames=16,
            history=h, max_frames=512,
        )
        for h in ("host", "device")
    }
    use = utts[:4]
    for u in use:
        for e in engs.values():
            assert e.start(u.utt_id)
    rng = np.random.default_rng(11)
    cursors = {u.utt_id: 0 for u in use}
    tick_i = 0
    while True:
        fed = False
        for u in use:
            off = cursors[u.utt_id]
            if off >= len(u.wave):
                continue
            n = int(rng.integers(1000, 4000))
            for e in engs.values():
                e.feed(u.utt_id, u.wave[off: off + n])
            cursors[u.utt_id] = off + n
            fed = True
        if not fed:
            break
        for e in engs.values():
            e.tick()
        tick_i += 1
        if tick_i % 3 == 0:
            sids = [u.utt_id for u in use]
            assert (engs["device"].partials(sids)
                    == engs["host"].partials(sids))
    for u in use:
        for e in engs.values():
            e.end(u.utt_id)
    while not all(engs["device"].drained(u.utt_id) for u in use):
        for e in engs.values():
            e.tick()
    while not all(engs["host"].drained(u.utt_id) for u in use):
        engs["host"].tick()
    got_dev = engs["device"].finalize_many([u.utt_id for u in use])
    got_host = {u.utt_id: engs["host"].finalize(u.utt_id) for u in use}
    assert got_dev == got_host


def test_engine_device_overflow_truncates_not_crashes(setup):
    """A session exceeding max_frames (device history) must NOT take the
    engine down (round-3 ADVICE): it is truncated at the cap — flagged via
    overflowed()/take_overflow_events(), still drainable and finalizable
    with the hypothesis of its first max_frames frames — while co-resident
    sessions finish untouched."""
    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    long_u = utts[0]
    short_wave = utts[1].wave[:6000]   # ~35 frames: stays under the cap
    cap = 78  # NOT a multiple of tick_frames: exercises mid-chunk truncation

    # dedicated reference for the truncated session: identical streaming
    # features, decode only the first `cap` frames
    fe = StreamingFrontend(fcfg)
    parts = [fe.process(long_u.wave), fe.finalize()]
    fa = np.concatenate([p for p in parts if p.size], axis=0)[:cap]
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([graph]).items()}
    dec = OnlineDecoder(graphs, acoustic_scale=dcfg.acoustic_scale)
    dec.process(pipe.score_batch(jnp.asarray(fa[None]), gmm),
                np.asarray([fa.shape[0]]))
    path, entered, _ = dec.finalize()
    want_long = _words_of(graph, path[0], entered[0])
    want_short = _dedicated(graph, gmm, fcfg, dcfg, short_wave)

    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=8,
        history="device", max_frames=cap,
    )
    assert eng.start("long") and eng.start("short")
    eng.feed("long", long_u.wave)
    eng.feed("short", short_wave)
    eng.end("long")
    eng.end("short")
    for _ in range(200):
        if eng.drained("long") and eng.drained("short"):
            break
        eng.tick()
    assert eng.drained("long") and eng.drained("short")
    assert eng.overflowed("long") and not eng.overflowed("short")
    assert eng.take_overflow_events() == ["long"]
    assert eng.take_overflow_events() == []   # reported once
    words_long, _ = eng.finalize("long")
    words_short, _ = eng.finalize("short")
    assert words_long == want_long
    assert words_short == want_short


def test_engine_device_backtrace_cached_per_tick(setup, monkeypatch):
    """Looping partial(sid) between ticks must cost ONE backtrace dispatch
    (round-3 ADVICE): the per-(tick, final) cache serves repeat calls, and a
    new tick invalidates it."""
    import mogasr.serving.engine as E

    graph, gmm, fcfg, dcfg, score_fn, utts = setup
    calls = {"n": 0}
    orig = E._bt_partial

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(E, "_bt_partial", counting)
    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=8,
        history="device", max_frames=256,
    )
    assert eng.start("a") and eng.start("b")
    eng.feed("a", utts[0].wave[:8000])
    eng.feed("b", utts[1].wave[:8000])
    for _ in range(6):
        eng.tick()
    p_a, p_b = eng.partial("a"), eng.partial("b")
    assert calls["n"] == 1                       # second call was cached
    assert eng.partials(["a", "b"]) == {"a": p_a, "b": p_b}
    assert calls["n"] == 1
    eng.tick()
    eng.partial("a")
    assert calls["n"] == 2                       # new tick -> recompute


def test_engine_rejects_duplicate_and_overflow(setup):
    graph, _gmm, fcfg, dcfg, score_fn, _utts = setup
    eng = BatchedSessionEngine(
        graph, score_fn, fcfg, dcfg, capacity=2, tick_frames=8
    )
    assert eng.start("a") and eng.start("b")
    assert not eng.start("a")      # duplicate
    assert not eng.start("c")      # full


def test_ctc_engine_matches_dedicated_sessions():
    """Neural CTC family: 3 sessions through a capacity-2 BatchedCtcEngine
    (slot reuse resets LSTM carries), ragged ticks — finals equal the
    dedicated per-session stateful-LSTM + CtcStreamDecoder pipeline."""
    import jax

    from mogasr.am.ctc import CtcStreamDecoder
    from mogasr.am.neural import LstmAmStream, lstm_stream_init
    from mogasr.serving.engine import BatchedCtcEngine

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)
    V = 12   # 11 units + blank
    stream = LstmAmStream(n_pdfs=V, hidden=16, layers=2)
    c1 = lstm_stream_init(stream, 1, fcfg.feat_dim)
    params = stream.init(
        jax.random.key(0), jnp.zeros((1, 4, fcfg.feat_dim)), c1
    )
    utts = make_corpus(3, words_per_utt=(2, 3), seed=5)

    def dedicated(wave, chunk=3100):
        fe = StreamingFrontend(fcfg)
        dec = CtcStreamDecoder(blank_id=V - 1, mode="greedy")
        carries = lstm_stream_init(stream, 1, fcfg.feat_dim)
        feats_list = [fe.process(wave[i : i + chunk])
                      for i in range(0, len(wave), chunk)]
        feats_list.append(fe.finalize())
        for feats in feats_list:
            if feats.size:
                logits, carries = stream.apply(
                    params, jnp.asarray(feats[None]), carries
                )
                dec.step(np.asarray(jax.nn.log_softmax(logits[0], axis=-1)))
        return list(dec.finalize())

    want = {u.utt_id: dedicated(u.wave) for u in utts}

    eng = BatchedCtcEngine(
        stream, params, lambda: CtcStreamDecoder(blank_id=V - 1, mode="greedy"),
        lstm_stream_init(stream, 2, fcfg.feat_dim), fcfg,
        capacity=2, tick_frames=16,
    )
    rng = np.random.default_rng(11)
    pending = list(utts)
    cursors, ended, got = {}, set(), {}
    while len(got) < len(utts):
        while pending and eng.n_live < eng.capacity:
            u = pending.pop(0)
            assert eng.start(u.utt_id)
            cursors[u.utt_id] = 0
        for u in utts:
            sid = u.utt_id
            if sid not in cursors or sid in ended or sid in got:
                continue
            off = cursors[sid]
            if off >= len(u.wave):
                eng.end(sid)
                ended.add(sid)
                continue
            n = int(rng.integers(800, 4500))
            eng.feed(sid, u.wave[off : off + n])
            cursors[sid] = off + n
        eng.tick()
        for sid in list(ended):
            if eng.drained(sid):
                units, audio_s = eng.finalize(sid)
                got[sid] = units
                ended.discard(sid)
    assert got == want
    # partial() is host-only and well-formed
    eng2 = BatchedCtcEngine(
        stream, params, lambda: CtcStreamDecoder(blank_id=V - 1, mode="greedy"),
        lstm_stream_init(stream, 2, fcfg.feat_dim), fcfg,
        capacity=2, tick_frames=16,
    )
    assert eng2.start("s")
    eng2.feed("s", utts[0].wave[:8000])
    eng2.tick()
    eng2.tick()
    assert isinstance(eng2.partial("s"), list)


def test_ctc_engine_idle_slots_preserve_carries():
    """Regression: a live slot that decodes NOTHING in a tick (n_valid=0)
    must keep its LSTM carry bit-for-bit (flax's seq_lengths=0 path corrupts
    it without the explicit restore in LstmAmStream). Strict one-session-
    per-batch interleaving guarantees idle decode rows."""
    import jax

    from mogasr.am.ctc import CtcStreamDecoder
    from mogasr.am.neural import LstmAmStream, lstm_stream_init
    from mogasr.serving.engine import BatchedCtcEngine

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)
    V = 12
    stream = LstmAmStream(n_pdfs=V, hidden=16, layers=1)
    params = stream.init(
        jax.random.key(2), jnp.zeros((1, 4, fcfg.feat_dim)),
        lstm_stream_init(stream, 1, fcfg.feat_dim),
    )
    utts = make_corpus(2, words_per_utt=(2, 2), seed=13)

    def dedicated(wave, chunk=4000):
        fe = StreamingFrontend(fcfg)
        dec = CtcStreamDecoder(blank_id=V - 1, mode="greedy")
        carries = lstm_stream_init(stream, 1, fcfg.feat_dim)
        chunks = [wave[i : i + chunk] for i in range(0, len(wave), chunk)]
        for c in chunks:
            feats = fe.process(c)
            if feats.size:
                logits, carries = stream.apply(
                    params, jnp.asarray(feats[None]), carries)
                dec.step(np.asarray(jax.nn.log_softmax(logits[0], axis=-1)))
        feats = fe.finalize()
        if feats.size:
            logits, carries = stream.apply(
                params, jnp.asarray(feats[None]), carries)
            dec.step(np.asarray(jax.nn.log_softmax(logits[0], axis=-1)))
        return list(dec.finalize())

    want = {u.utt_id: dedicated(u.wave) for u in utts}

    eng = BatchedCtcEngine(
        stream, params, lambda: CtcStreamDecoder(blank_id=V - 1, mode="greedy"),
        lstm_stream_init(stream, 4, fcfg.feat_dim), fcfg,
        capacity=4, tick_frames=24,
    )
    chunk = 4000
    for u in utts:
        assert eng.start(u.utt_id)
        eng.tick()
    # STRICT interleave: one session's chunk per tick -> the other is idle
    cs = {u.utt_id: [u.wave[i : i + chunk]
                     for i in range(0, len(u.wave), chunk)] for u in utts}
    i = 0
    while any(cs.values()):
        for u in utts:
            if cs[u.utt_id]:
                eng.feed(u.utt_id, cs[u.utt_id].pop(0))
                eng.tick()
                eng.tick()   # extra idle tick for every other session
    got = {}
    for u in utts:
        eng.end(u.utt_id)
        eng.tick()
    for u in utts:
        units, _ = eng.run_to_drain(u.utt_id)
        got[u.utt_id] = units
    assert got == want


def test_lstm_stream_n_valid_zero_is_noop():
    """LstmAmStream(n_valid=0) returns the carry UNCHANGED for that row."""
    import jax

    from mogasr.am.neural import LstmAmStream

    D = 7
    stream = LstmAmStream(n_pdfs=5, hidden=8, layers=2)
    rng = np.random.default_rng(0)
    carries = [
        (jnp.asarray(rng.standard_normal((2, 8)), jnp.float32),
         jnp.asarray(rng.standard_normal((2, 8)), jnp.float32))
        for _ in range(2)
    ]
    x = jnp.asarray(rng.standard_normal((2, 4, D)), jnp.float32)
    params = stream.init(jax.random.key(0), x, carries)
    _logits, new_carries = stream.apply(
        params, x, carries, jnp.asarray([0, 4]))
    for l in range(2):
        for part in range(2):
            np.testing.assert_array_equal(
                np.asarray(new_carries[l][part][0]),
                np.asarray(carries[l][part][0]),
            )
            assert not np.array_equal(
                np.asarray(new_carries[l][part][1]),
                np.asarray(carries[l][part][1]),
            )


def _tiny_rnnt(seed=0, emit_bias=True):
    """Random-init tiny RNN-T; emit_bias tilts the joint away from blank so
    greedy decode actually emits symbols (equality tests stay non-vacuous
    and the engine's per-tick harvest path is exercised)."""
    import jax

    from mogasr.am.rnnt import build_rnnt_model, init_rnnt_train_state
    from mogasr.config import TrainConfig

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)
    tcfg = TrainConfig(nn_arch="lstm", nn_hidden=16, nn_layers=2)
    model = build_rnnt_model(5, tcfg)
    params = init_rnnt_train_state(
        model, tcfg, fcfg.feat_dim, 4, jax.random.key(seed)
    ).params
    if emit_bias:
        bias = np.array(params["params"]["joint"]["out"]["bias"])
        bias[model.n_labels] = -1.5   # blank down
        bias[0] = 0.8
        bias[2] = 0.7
        params["params"]["joint"]["out"]["bias"] = jnp.asarray(bias)
    return fcfg, model, params


@pytest.mark.parametrize("greedy_impl", ["frame_scan", "label_loop"])
def test_rnnt_engine_matches_dedicated_streams(greedy_impl):
    """RNN-T family: 3 sessions through a capacity-2 BatchedRnntEngine
    (slot reuse resets encoder carries AND prediction state), ragged ticks —
    finals equal the dedicated per-session RnntDeviceStream pipeline, and
    symbols survive the per-tick hypothesis harvest. Parametrized over the
    chunk-greedy impl: the label loop must be a drop-in."""
    from mogasr.am.rnnt import RnntDeviceStream
    from mogasr.serving.engine import BatchedRnntEngine

    fcfg, model, params = _tiny_rnnt()
    utts = make_corpus(3, words_per_utt=(2, 3), seed=5)

    def dedicated(wave, chunk=3100):
        fe = StreamingFrontend(fcfg)
        stream = RnntDeviceStream(model, params, 1, fcfg.feat_dim, u_cap=4000)
        feats_list = [fe.process(wave[i : i + chunk])
                      for i in range(0, len(wave), chunk)]
        feats_list.append(fe.finalize())
        part = []
        for feats in feats_list:
            if feats.size:
                part = stream.consume(
                    jnp.asarray(feats[None]), np.asarray([feats.shape[0]])
                )
        return part[0] if part else []

    want = {u.utt_id: dedicated(u.wave) for u in utts}
    assert any(want.values()), "emit bias should produce symbols"

    eng = BatchedRnntEngine(model, params, fcfg, capacity=2, tick_frames=16,
                            greedy_impl=greedy_impl)
    rng = np.random.default_rng(11)
    pending = list(utts)
    cursors, ended, got, partial_seen = {}, set(), {}, False
    while len(got) < len(utts):
        while pending and eng.n_live < eng.capacity:
            u = pending.pop(0)
            assert eng.start(u.utt_id)
            cursors[u.utt_id] = 0
        for u in utts:
            sid = u.utt_id
            if sid not in cursors or sid in ended or sid in got:
                continue
            off = cursors[sid]
            if off >= len(u.wave):
                eng.end(sid)
                ended.add(sid)
                continue
            n = int(rng.integers(800, 4500))
            eng.feed(sid, u.wave[off : off + n])
            cursors[sid] = off + n
        eng.tick()
        for sid in list(cursors):
            if eng.has(sid) and sid not in got:
                partial_seen = partial_seen or bool(eng.partial(sid))
        for sid in list(ended):
            if eng.drained(sid):
                units, _audio_s = eng.finalize(sid)
                got[sid] = units
                ended.discard(sid)
    assert got == want
    assert partial_seen


def test_rnnt_engine_idle_slots_keep_state():
    """A live slot that decodes nothing in a tick keeps its encoder carries
    and prediction state: feeding session A while B is idle, then B, equals
    feeding B alone."""
    from mogasr.serving.engine import BatchedRnntEngine

    fcfg, model, params = _tiny_rnnt()
    utts = make_corpus(2, words_per_utt=(2, 2), seed=9)

    def run_solo(u):
        eng = BatchedRnntEngine(model, params, fcfg, capacity=2,
                                tick_frames=16)
        assert eng.start(u.utt_id)
        eng.feed(u.utt_id, u.wave)
        eng.end(u.utt_id)
        return eng.run_to_drain(u.utt_id)[0]

    want_b = run_solo(utts[1])

    eng = BatchedRnntEngine(model, params, fcfg, capacity=2, tick_frames=16)
    a, b = utts[0].utt_id, utts[1].utt_id
    assert eng.start(a) and eng.start(b)
    # A streams for a while; B sits idle (n_valid == 0 every tick)
    eng.feed(a, utts[0].wave[:16000])
    for _ in range(6):
        eng.tick()
    # now B streams its whole utterance
    eng.feed(b, utts[1].wave)
    eng.end(b)
    while not eng.drained(b):
        eng.tick()
    got_b, _ = eng.finalize(b)
    assert got_b == want_b


def test_aed_engine_matches_dedicated_sessions():
    """Chunked-AED family: 3 sessions through a capacity-2 BatchedAedEngine
    (atomic 4*chunk_frames chunks, masked cache merges, slot reuse) — CTC
    partials and exact attention finals equal the dedicated per-session
    pipeline (StreamingFrontend + encode_stream_step + bucketed final)."""
    import jax

    from mogasr.am import aed as A
    from mogasr.am.ctc import CtcStreamDecoder
    from mogasr.config import TrainConfig
    from mogasr.serving.engine import BatchedAedEngine, aed_final_max_tokens

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)
    tcfg = TrainConfig(nn_hidden=16, nn_layers=1)
    model = A.build_aed_model(5, tcfg, chunk_frames=2, left_chunks=1)
    params = A.init_aed_train_state(
        model, tcfg, fcfg.feat_dim, 4, jax.random.key(0)
    ).params
    raw_per = 4 * model.chunk_frames
    utts = make_corpus(3, words_per_utt=(2, 2), seed=5)
    step = A.make_aed_stream_step(model, params)

    def dedicated(wave, chunk=3100):
        fe = StreamingFrontend(fcfg)
        dec = CtcStreamDecoder(blank_id=model.n_units, mode="greedy")
        state = A.aed_stream_init(model, 1, fcfg.feat_dim)
        buf = np.zeros((0, fcfg.feat_dim), np.float32)
        all_feats = []
        feats_list = [fe.process(wave[i : i + chunk])
                      for i in range(0, len(wave), chunk)]
        feats_list.append(fe.finalize())
        for feats in feats_list:
            if not feats.size:
                continue
            all_feats.append(feats)
            buf = np.concatenate([buf, feats], axis=0)
            while buf.shape[0] >= raw_per:
                _e, ctc_logits, state = step(
                    jnp.asarray(buf[None, :raw_per]), state
                )
                dec.step(np.asarray(
                    jax.nn.log_softmax(ctc_logits[0], axis=-1)))
                buf = buf[raw_per:]
        fa = np.concatenate(all_feats, axis=0)
        T = fa.shape[0]
        Tb = -(-T // 256) * 256
        padded = np.zeros((1, Tb, fa.shape[1]), np.float32)
        padded[0, :T] = fa
        seqs = A.aed_decode_batch(
            model, params, jnp.asarray(padded),
            jnp.asarray([T], np.int32), beam=3,
            max_tokens=aed_final_max_tokens(Tb), ctc_weight=0.3,
        )
        return list(dec.partial()), seqs[0]

    want = {u.utt_id: dedicated(u.wave) for u in utts}

    eng = BatchedAedEngine(model, params, fcfg, capacity=2, beam=3,
                           ctc_weight=0.3)
    rng = np.random.default_rng(11)
    pending = list(utts)
    cursors, ended, got, got_part = {}, set(), {}, {}
    while len(got) < len(utts):
        while pending and eng.n_live < eng.capacity:
            u = pending.pop(0)
            assert eng.start(u.utt_id)
            cursors[u.utt_id] = 0
        for u in utts:
            sid = u.utt_id
            if sid not in cursors or sid in ended or sid in got:
                continue
            off = cursors[sid]
            if off >= len(u.wave):
                eng.end(sid)
                ended.add(sid)
                continue
            n = int(rng.integers(800, 4500))
            eng.feed(sid, u.wave[off : off + n])
            cursors[sid] = off + n
        eng.tick()
        for sid in list(ended):
            if eng.drained(sid):
                got_part[sid] = eng.partial(sid)
                units, _audio_s = eng.finalize(sid)
                got[sid] = units
                ended.discard(sid)
    for sid, (p_want, f_want) in want.items():
        assert got_part[sid] == p_want, sid
        assert got[sid] == f_want, sid


def test_aed_engine_finalize_many_matches_finalize():
    """finalize_many (one batched attention-beam dispatch per T-bucket,
    power-of-two batch padding with dummy rows) returns exactly what
    per-session finalize returns: two identically-fed engines, one drained
    via finalize, the other via one finalize_many call — same units, same
    audio seconds. Includes an empty session (started + ended, no audio)
    and a short session forcing a second T-bucket (final_bucket=64)."""
    import jax

    from mogasr.am import aed as A
    from mogasr.config import TrainConfig
    from mogasr.serving.engine import BatchedAedEngine

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=300)
    tcfg = TrainConfig(nn_hidden=16, nn_layers=1)
    model = A.build_aed_model(5, tcfg, chunk_frames=2, left_chunks=1)
    params = A.init_aed_train_state(
        model, tcfg, fcfg.feat_dim, 4, jax.random.key(0)
    ).params
    utts = make_corpus(2, words_per_utt=(2, 3), seed=7)
    waves = {
        "a": utts[0].wave,
        "b": utts[1].wave,
        "short": utts[0].wave[: 6400],   # ~0.4 s -> smaller T-bucket
        "empty": np.zeros((0,), np.float32),
    }

    def feed_all(eng):
        for sid, w in waves.items():
            assert eng.start(sid)
            if len(w):
                eng.feed(sid, w)
            eng.end(sid)
        for _ in range(200):
            if all(eng.drained(sid) for sid in waves):
                break
            eng.tick()
        else:
            raise AssertionError("engines did not drain")

    eng_a = BatchedAedEngine(model, params, fcfg, capacity=4, beam=3,
                             ctc_weight=0.3, final_bucket=64)
    feed_all(eng_a)
    want = {sid: eng_a.finalize(sid) for sid in waves}

    eng_b = BatchedAedEngine(model, params, fcfg, capacity=4, beam=3,
                             ctc_weight=0.3, final_bucket=64)
    feed_all(eng_b)
    got = eng_b.finalize_many(list(waves))

    assert set(got) == set(want)
    for sid in waves:
        assert got[sid][0] == want[sid][0], sid
        assert abs(got[sid][1] - want[sid][1]) < 1e-9, sid
    assert want["empty"][0] == []
    # slots actually freed by finalize_many
    assert eng_b.n_live == 0
