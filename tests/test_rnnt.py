"""RNN-T tests: loss vs an independent NumPy DP oracle (values + numerical
gradients), padding invariance, and learn-then-greedy-decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.am import rnnt as R
from mogasr.config import TrainConfig


def _rand_problem(seed=0, B=3, T=6, U=3, V=5):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    n_frames = rng.integers(2, T + 1, B).astype(np.int32)
    n_labels = rng.integers(1, U + 1, B).astype(np.int32)
    labels = np.full((B, U), -1, np.int32)
    for b in range(B):
        labels[b, : n_labels[b]] = rng.integers(0, V - 1, n_labels[b])
    return logits, n_frames, labels, n_labels


def test_rnnt_loss_matches_numpy_oracle():
    logits, n_frames, labels, n_labels = _rand_problem()
    got = np.asarray(
        R.rnnt_loss(
            jnp.asarray(logits), jnp.asarray(n_frames),
            jnp.asarray(labels), jnp.asarray(n_labels),
        )
    )
    for b in range(logits.shape[0]):
        logp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits[b, : n_frames[b]]), axis=-1)
        )
        want = R.rnnt_loss_np(logp, list(labels[b, : n_labels[b]]))
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_rnnt_loss_grad_matches_finite_differences():
    logits, n_frames, labels, n_labels = _rand_problem(seed=1, B=1, T=4, U=2, V=4)

    def f(x):
        return R.rnnt_loss(
            jnp.asarray(x), jnp.asarray(n_frames),
            jnp.asarray(labels), jnp.asarray(n_labels),
        )[0]

    g = np.asarray(jax.grad(lambda x: f(x))(jnp.asarray(logits)))
    rng = np.random.default_rng(2)
    eps = 1e-3
    for _ in range(6):
        idx = tuple(rng.integers(0, s) for s in logits.shape)
        if idx[1] >= n_frames[0]:
            continue
        d = np.zeros_like(logits)
        d[idx] = eps
        num = (float(f(logits + d)) - float(f(logits - d))) / (2 * eps)
        np.testing.assert_allclose(g[idx], num, rtol=2e-2, atol=2e-3)


def test_rnnt_loss_padding_invariance():
    logits, n_frames, labels, n_labels = _rand_problem(seed=3)
    base = np.asarray(
        R.rnnt_loss(
            jnp.asarray(logits), jnp.asarray(n_frames),
            jnp.asarray(labels), jnp.asarray(n_labels),
        )
    )
    B, T, U1, V = logits.shape
    pad = np.concatenate(
        [logits, 37.0 * np.ones((B, 2, U1, V), np.float32)], axis=1
    )
    for b in range(B):
        pad[b, n_frames[b]:] = 99.0  # garbage on padded frames
    pad = np.concatenate(
        [pad, 55.0 * np.ones((B, T + 2, 2, V), np.float32)], axis=2
    )
    pad_labels = np.concatenate([labels, np.full((B, 2), -1, np.int32)], axis=1)
    out = np.asarray(
        R.rnnt_loss(
            jnp.asarray(pad), jnp.asarray(n_frames),
            jnp.asarray(pad_labels), jnp.asarray(n_labels),
        )
    )
    np.testing.assert_allclose(out, base, rtol=1e-4)


def _make_unit_task(seed=0, B=4, n_units=3, units_T=6, frames_per=5):
    rng = np.random.default_rng(seed)
    D = n_units + 1
    T = units_T * frames_per
    seqs, feats, n_frames = [], [], []
    for b in range(B):
        n = int(rng.integers(2, units_T + 1))
        seq = []
        while len(seq) < n:  # no consecutive repeats: keeps the task about
            u = int(rng.integers(0, n_units))  # transduction, not counting
            if not seq or seq[-1] != u:
                seq.append(u)
        x = np.zeros((T, D), np.float32)
        t = 0
        for u in seq:
            for _ in range(frames_per):
                x[t, u] = 1.0
                t += 1
        x += 0.05 * rng.standard_normal((T, D)).astype(np.float32)
        seqs.append(seq)
        feats.append(x)
        n_frames.append(t)
    U = max(len(s) for s in seqs)
    labels = np.full((B, U), -1, np.int32)
    for b, s in enumerate(seqs):
        labels[b, : len(s)] = s
    n_labels = np.asarray([len(s) for s in seqs], np.int32)
    return (
        jnp.asarray(np.stack(feats)), jnp.asarray(np.asarray(n_frames, np.int32)),
        jnp.asarray(labels), jnp.asarray(n_labels), seqs,
    )


@pytest.fixture(scope="module")
def trained_unit_rnnt():
    feats, n_frames, labels, n_labels, seqs = _make_unit_task()
    model = R.RnntModel(
        n_labels=3, enc_hidden=32, enc_layers=1, pred_hidden=16, joint_hidden=32,
    )
    cfg = TrainConfig(lr=5e-3, num_nn_steps=300)
    state = R.init_rnnt_train_state(
        model, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = R.make_rnnt_train_step(model, cfg)
    for _ in range(cfg.num_nn_steps):
        state, _ = step(state, feats, n_frames, labels, n_labels)
    return model, state.params, feats, n_frames, seqs


def test_rnnt_beam_decode_matches_greedy_on_peaked(trained_unit_rnnt):
    model, params, feats, n_frames, seqs = trained_unit_rnnt
    greedy = R.rnnt_greedy_decode(model, params, feats, n_frames)
    for b in range(feats.shape[0]):
        ranked = R.rnnt_beam_decode(
            model, params, feats[b:b + 1], n_frames[b:b + 1], beam_size=4
        )
        assert ranked[0][1] == greedy[b] == seqs[b]
        scores = [s for s, _ in ranked]
        assert scores == sorted(scores, reverse=True)
        prefixes = [tuple(p) for _, p in ranked]
        assert len(set(prefixes)) == len(prefixes)


def test_rnnt_beam_batch_equals_per_utterance(trained_unit_rnnt):
    """rnnt_beam_decode_batch (one fused dispatch per expansion round for
    the whole batch) returns the SAME ranked (score, seq) lists as the
    per-utterance reference beam — on the trained model AND a random one
    (where beams genuinely diverge and merging/pruning matter)."""
    model, params, feats, n_frames, _seqs = trained_unit_rnnt
    for m, p in [
        (model, params),
        (model, R.init_rnnt_train_state(
            model, TrainConfig(), feats.shape[-1], 4,
            jax.random.key(9)).params),
    ]:
        got = R.rnnt_beam_decode_batch(
            m, p, feats, n_frames, beam_size=4, u_cap=40)
        for b in range(feats.shape[0]):
            want = R.rnnt_beam_decode(
                m, p, feats[b:b + 1], n_frames[b:b + 1], beam_size=4,
                u_cap=40)
            assert [seq for _, seq in got[b]] == [seq for _, seq in want]
            np.testing.assert_allclose(
                [s for s, _ in got[b]], [s for s, _ in want],
                rtol=1e-5, atol=1e-5)


def test_rnnt_device_greedy_equals_host(trained_unit_rnnt):
    """The single-dispatch lax.scan greedy == the host greedy loop exactly,
    on both a trained model and a random one (equal caps)."""
    model, params, feats, n_frames, seqs = trained_unit_rnnt
    host = R.rnnt_greedy_decode(model, params, feats, n_frames, max_symbols=50)
    dev = R.rnnt_greedy_decode_device(model, params, feats, n_frames, max_symbols=50)
    assert dev == host == seqs

    rand = R.RnntModel(n_labels=3, enc_hidden=32, enc_layers=1,
                       pred_hidden=16, joint_hidden=32)
    cfg = TrainConfig()
    rstate = R.init_rnnt_train_state(rand, cfg, feats.shape[-1], 4, jax.random.key(3))
    host_r = R.rnnt_greedy_decode(rand, rstate.params, feats, n_frames, max_symbols=30)
    dev_r = R.rnnt_greedy_decode_device(rand, rstate.params, feats, n_frames, max_symbols=30)
    assert dev_r == host_r


def test_rnnt_streaming_greedy_exact(trained_unit_rnnt):
    """Chunked stateful encoder + incremental greedy == offline greedy for
    ragged chunkings, with monotone partials."""
    model, params, feats, n_frames, seqs = trained_unit_rnnt
    offline = R.rnnt_greedy_decode(model, params, feats, n_frames)
    B, T, D = feats.shape
    nf = np.asarray(n_frames)
    for chunks in ([7, 11, T - 18], [T], [1] * 5 + [T - 5]):
        assert sum(chunks) == T
        step, carries = R.make_rnnt_stream_encoder(model, params, B, D)
        dec = R.RnntGreedyState(R.make_rnnt_decoder_fns(model, params), B, 100)
        pos = 0
        lens = []
        for c in chunks:
            carries, enc_chunk = step(carries, feats[:, pos:pos + c])
            n_valid = np.clip(nf - pos, 0, c)
            dec.consume(enc_chunk, n_valid)
            lens.append([len(h) for h in dec.partial()])
            pos += c
        assert dec.partial() == offline, chunks
        for b in range(B):
            col = [l[b] for l in lens]
            assert col == sorted(col)


def test_rnnt_device_stream_equals_offline(trained_unit_rnnt):
    """RnntDeviceStream (stateful encoder chunks + chunk-resumable device
    greedy) == the offline device greedy for ragged chunkings."""
    model, params, feats, n_frames, seqs = trained_unit_rnnt
    offline = R.rnnt_greedy_decode_device(model, params, feats, n_frames, max_symbols=60)
    B, T, D = feats.shape
    nf = np.asarray(n_frames)
    for chunks in ([9, 12, T - 21], [T], [2] * 4 + [T - 8]):
        assert sum(chunks) == T
        stream = R.RnntDeviceStream(model, params, B, D, u_cap=60)
        pos = 0
        lens_hist = []
        for c in chunks:
            part = stream.consume(feats[:, pos:pos + c], np.clip(nf - pos, 0, c))
            lens_hist.append([len(h) for h in part])
            pos += c
        assert stream.partial() == offline == seqs, chunks
        for b in range(B):
            col = [l[b] for l in lens_hist]
            assert col == sorted(col)  # partials grow monotonically


def test_rnnt_stateless_aux_ctc_trains_and_decodes():
    """The low-data recipe (stateless prediction net + auxiliary CTC loss):
    trains on the unit task, host and device greedy agree and recover."""
    feats, n_frames, labels, n_labels, seqs = _make_unit_task(seed=2)
    model = R.RnntModel(
        n_labels=3, enc_hidden=32, enc_layers=1, pred_hidden=16, joint_hidden=32,
        pred_arch="stateless", aux_ctc=True,
    )
    cfg = TrainConfig(lr=5e-3, num_nn_steps=250)
    state = R.init_rnnt_train_state(
        model, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = R.make_rnnt_train_step(model, cfg, ctc_weight=0.3)
    for _ in range(cfg.num_nn_steps):
        state, m = step(state, feats, n_frames, labels, n_labels)
    host = R.rnnt_greedy_decode(model, state.params, feats, n_frames, max_symbols=50)
    dev = R.rnnt_greedy_decode_device(model, state.params, feats, n_frames, max_symbols=50)
    assert host == dev == seqs, (host, seqs)


def test_rnnt_speech_phone_recognition():
    """Pipeline-level RNN-T on real synthetic speech with the DEFAULT
    low-data recipe (stateless prediction + aux CTC): train-set greedy PER
    must be low. (The stateless net cannot memorize transcripts, so unlike
    the classic-transducer config this does not reach 0.0 quickly —
    held-out quality is demo_accuracy's job.)"""
    from mogasr import pipeline as pipe
    from mogasr.am import ctc as C
    from mogasr.am.rnnt import rnnt_greedy_decode
    from mogasr.config import BatchConfig, FrontendConfig
    from mogasr.data.synthetic import LEXICON, make_corpus
    from mogasr.eval.wer import corpus_wer
    from mogasr.hmm.lexicon import make_lexicon

    vocab = ["fish", "cat", "see", "sun", "tree", "dog"]
    lex = make_lexicon({w: LEXICON[w] for w in vocab})
    fcfg = FrontendConfig()
    utts = make_corpus(16, words_per_utt=(2, 2), seed=7, vocab=vocab)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    tcfg = TrainConfig(nn_hidden=128, nn_layers=2, lr=3e-3, num_nn_steps=500)
    model, params = pipe.train_rnnt(batches, lex, tcfg)
    refs, hyps = [], []
    for fb in batches:
        out = rnnt_greedy_decode(model, params, fb.feats, fb.n_frames)
        for b in range(fb.size):
            refs.append([lex.phones[p] for p in C.ctc_labels_from_words(lex, fb.words[b])])
            hyps.append([lex.phones[p] for p in out[b]])
    per, _ = corpus_wer(refs, hyps)
    assert per < 0.3, per


def test_rnnt_trains_and_greedy_decodes():
    feats, n_frames, labels, n_labels, seqs = _make_unit_task()
    n_units = 3
    model = R.RnntModel(
        n_labels=n_units, enc_hidden=32, enc_layers=1,
        pred_hidden=16, joint_hidden=32,
    )
    cfg = TrainConfig(lr=5e-3, num_nn_steps=300)
    state = R.init_rnnt_train_state(
        model, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = R.make_rnnt_train_step(model, cfg)
    first = None
    for _ in range(cfg.num_nn_steps):
        state, m = step(state, feats, n_frames, labels, n_labels)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.3, (first, float(m["loss"]))
    hyps = R.rnnt_greedy_decode(model, state.params, feats, n_frames)
    assert hyps == seqs, (hyps, seqs)


def test_rnnt_seq_logprob_matches_numpy_oracle():
    """rnnt_seq_logprob == -rnnt_loss_np on each row (the alignment-
    marginal sequence probability the MWER estimator reweights)."""
    logits, n_frames, labels, n_labels = _rand_problem(seed=7, B=3, T=6, U=3)
    model = R.RnntModel(n_labels=4, enc_hidden=8, enc_layers=1,
                        pred_hidden=8, joint_hidden=8)
    # bypass the network: check the public helper's DP against the oracle
    got = np.asarray(-R.rnnt_loss(logits, n_frames, labels, n_labels))
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for b in range(3):
        T = int(n_frames[b])
        lab = [int(x) for x in np.asarray(labels[b, : n_labels[b]])]
        want = -R.rnnt_loss_np(logp[b, :T, : len(lab) + 1], lab)
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


def test_rnnt_mwer_shifts_mass_to_low_risk_hyp():
    feats, n_frames, labels, n_labels, seqs = _make_unit_task()
    model = R.RnntModel(
        n_labels=3, enc_hidden=16, enc_layers=1, pred_hidden=8, joint_hidden=16,
    )
    cfg = TrainConfig(lr=5e-3, num_nn_steps=40)
    state = R.init_rnnt_train_state(
        model, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    B, L = labels.shape
    hyps = np.full((B, 2, L), -1, np.int32)
    n_h = np.zeros((B, 2), np.int32)
    risks = np.zeros((B, 2), np.float32)
    for b, s in enumerate(seqs):
        hyps[b, 0, : len(s)] = s
        n_h[b, 0] = len(s)
        bad = list(s)
        bad[0] = (bad[0] + 1) % 3
        hyps[b, 1, : len(bad)] = bad
        n_h[b, 1] = len(bad)
        risks[b, 1] = 1.0
    h_mask = np.ones((B, 2), bool)

    def pref(params):
        lp = R.rnnt_seq_logprob(
            model, params,
            jnp.repeat(feats, 2, axis=0), jnp.repeat(n_frames, 2, axis=0),
            jnp.asarray(hyps.reshape(B * 2, L)),
            jnp.asarray(n_h.reshape(B * 2)),
        ).reshape(B, 2)
        return float(jnp.mean(lp[:, 0] - lp[:, 1]))

    before = pref(state.params)
    step = R.make_rnnt_mwer_step(model, cfg, anchor_weight=0.0)
    for _ in range(cfg.num_nn_steps):
        state, met = step(
            state, feats, n_frames, jnp.asarray(hyps), jnp.asarray(n_h),
            jnp.asarray(h_mask), jnp.asarray(risks), labels, n_labels,
        )
    after = pref(state.params)
    assert after > before, (before, after)
    assert np.isfinite(float(met["loss"]))


def test_finetune_rnnt_mwer_reduces_expected_risk(trained_unit_rnnt):
    from mogasr import pipeline as pipe

    model, params, feats, n_frames, seqs = trained_unit_rnnt

    class _Fb:
        pass

    fb = _Fb()
    fb.feats, fb.n_frames, fb.size = feats, n_frames, len(seqs)
    fb.words = {b: seqs[b] for b in range(len(seqs))}
    new_params, hist = pipe.finetune_rnnt_mwer(
        model, params, [fb], lambda s: list(s),
        TrainConfig(lr=1e-3, num_nn_steps=12), n_hyps=3, anchor_weight=0.05,
    )
    assert len(hist) == 12
    assert np.mean(hist[-3:]) <= np.mean(hist[:3]) + 1e-6, hist


def test_rnnt_label_loop_equals_frame_scan(trained_unit_rnnt):
    """Round-3 promotion (VERDICT item 6): the label-loop greedy
    (sequential depth = emission count, enc_proj hoisted, one batched
    [B,T,V] joint per round) must equal the frame-scan greedy EXACTLY —
    same labels, same emission frames via identical per-frame symbol-cap
    semantics — across caps that force cap hits, on a trained lstm-pred
    model and a random stateless-pred model."""
    model, params, feats, n_frames, seqs = trained_unit_rnnt
    enc = R.rnnt_encode(model, params, feats, n_frames)
    for u_cap, cap in ((50, 4), (7, 2), (50, 1)):
        d_new = R.make_rnnt_device_greedy(
            model, params, u_cap=u_cap, max_symbols_per_frame=cap)
        d_old = R.make_rnnt_device_greedy(
            model, params, u_cap=u_cap, max_symbols_per_frame=cap,
            impl="frame_scan")
        h1, l1 = d_new(enc, n_frames)
        h2, l2 = d_old(enc, n_frames)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    rand = R.RnntModel(n_labels=5, enc_hidden=16, enc_layers=1,
                       pred_hidden=8, joint_hidden=16, pred_arch="stateless")
    cfg = TrainConfig()
    rstate = R.init_rnnt_train_state(
        rand, cfg, feats.shape[-1], 4, jax.random.key(9))
    enc_r = R.rnnt_encode(rand, rstate.params, feats, n_frames)
    # random weights emit aggressively -> the u_cap and per-frame caps bind
    for u_cap, cap in ((30, 4), (5, 3)):
        d_new = R.make_rnnt_device_greedy(
            rand, rstate.params, u_cap=u_cap, max_symbols_per_frame=cap)
        d_old = R.make_rnnt_device_greedy(
            rand, rstate.params, u_cap=u_cap, max_symbols_per_frame=cap,
            impl="frame_scan")
        h1, l1 = d_new(enc_r, n_frames)
        h2, l2 = d_old(enc_r, n_frames)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_rnnt_label_loop_chunked_equals_frame_scan(trained_unit_rnnt):
    """The chunk-resumable label loop (the serving-engine tick shape) must
    equal the chunk-resumable frame scan state-for-state across ragged
    chunk boundaries: same carried prediction state, same hypothesis
    buffer, same lengths after EVERY chunk — on a trained lstm-pred model
    and a cap-binding random stateless-pred model."""
    import jax.numpy as jnp

    model, params, feats, n_frames, seqs = trained_unit_rnnt
    rand = R.RnntModel(n_labels=5, enc_hidden=16, enc_layers=1,
                       pred_hidden=8, joint_hidden=16, pred_arch="stateless")
    cfg = TrainConfig()
    rstate = R.init_rnnt_train_state(
        rand, cfg, feats.shape[-1], 4, jax.random.key(9))

    for mdl, prm, u_cap, cap in ((model, params, 50, 4),
                                 (rand, rstate.params, 12, 2)):
        enc = R.rnnt_encode(mdl, prm, feats, n_frames)
        B, T, _ = enc.shape
        init_fs, consume_fs = R._chunk_greedy_fn(mdl, u_cap, cap, "frame_scan")
        init_ll, consume_ll = R._chunk_greedy_fn(mdl, u_cap, cap, "label_loop")
        st_fs = init_fs(prm, B)
        st_ll = init_ll(prm, B)
        rng = np.random.default_rng(5)
        t = 0
        while t < T:
            tc = int(rng.integers(3, 9))
            chunk = enc[:, t: t + tc]
            # ragged validity: each row has its own frame budget left
            nv = np.clip(np.asarray(n_frames) - t, 0, chunk.shape[1])
            st_fs = consume_fs(prm, st_fs, chunk, jnp.asarray(nv))
            st_ll = consume_ll(prm, st_ll, chunk, jnp.asarray(nv))
            for a, b in zip(jax.tree.leaves(st_fs), jax.tree.leaves(st_ll)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=0)
            t += tc
        # and the chunked result equals the offline greedy
        off = R.make_rnnt_device_greedy(
            mdl, prm, u_cap=u_cap, max_symbols_per_frame=cap,
            impl="frame_scan")
        h_off, l_off = off(enc, n_frames)
        np.testing.assert_array_equal(np.asarray(st_ll[3]), np.asarray(l_off))
        np.testing.assert_array_equal(np.asarray(st_ll[2]), np.asarray(h_off))
