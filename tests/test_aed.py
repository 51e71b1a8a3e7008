"""AED (Conformer encoder + attention decoder) tests: teacher-batch and
label-smoothing oracles, encoder padding invariance, beam-search sanity
(beam-1 == stepwise greedy), and learn-then-decode on the unit task."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.am import aed
from mogasr.config import TrainConfig


def _tiny_model(n_units=3):
    return aed.AedModel(
        n_units=n_units, d_model=32, enc_blocks=1, dec_blocks=1, heads=2,
        conv_kernel=7,
    )


def _unit_task(seed=0, B=4, n_units=3, units_T=6, frames_per=8):
    """Unit id u -> a one-hot feature burst of frames_per frames (the
    test_rnnt task at a frame rate that survives the 4x subsampling)."""
    rng = np.random.default_rng(seed)
    D = n_units + 1
    T = units_T * frames_per
    seqs, feats, n_frames = [], [], []
    for _ in range(B):
        n = int(rng.integers(2, units_T + 1))
        seq = []
        while len(seq) < n:
            u = int(rng.integers(0, n_units))
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
        jnp.asarray(np.stack(feats)),
        jnp.asarray(np.asarray(n_frames, np.int32)),
        jnp.asarray(labels), jnp.asarray(n_labels), seqs,
    )


def test_subsampled_frames():
    n = jnp.asarray([0, 1, 2, 3, 4, 5, 100, 101])
    got = np.asarray(aed.subsampled_frames(n))
    want = np.asarray([0, 1, 1, 1, 1, 2, 25, 26])  # two ceil-div-2 steps
    np.testing.assert_array_equal(got, want)


def test_make_teacher_batch():
    labels = jnp.asarray([[0, 1, 2, -1], [3, -1, -1, -1]])
    n_labels = jnp.asarray([3, 1])
    dec_in, tgt, mask = aed.make_teacher_batch(labels, n_labels, sos=4, eos=5)
    np.testing.assert_array_equal(
        np.asarray(dec_in), [[4, 0, 1, 2, 0], [4, 3, 0, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(tgt), [[0, 1, 2, 5, 5], [3, 5, 5, 5, 5]]
    )
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[True, True, True, True, False],
         [True, True, False, False, False]],
    )


def test_smoothed_ce_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 3, 5)).astype(np.float32)
    tgt = np.asarray([[0, 2, 4], [1, 3, 0]])
    mask = np.asarray([[True, True, False], [True, True, True]])
    eps = 0.1
    got = np.asarray(
        aed.smoothed_ce(jnp.asarray(logits), jnp.asarray(tgt),
                        jnp.asarray(mask), smoothing=eps)
    )
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = np.zeros(2)
    for b in range(2):
        for u in range(3):
            if mask[b, u]:
                want[b] -= (1 - eps) * logp[b, u, tgt[b, u]] + eps * logp[
                    b, u
                ].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_encoder_padding_invariance():
    """Garbage in the padded frames must not change valid encoder outputs,
    the subsampled frame counts, or the training loss."""
    m = _tiny_model()
    feats, n_frames, labels, n_labels, _ = _unit_task(seed=3)
    params = m.init(
        jax.random.key(0), feats, n_frames,
        jnp.zeros((feats.shape[0], labels.shape[1] + 1), jnp.int32),
    )
    enc, n_out = m.apply(params, feats, n_frames, method=aed.AedModel.encode)

    rng = np.random.default_rng(1)
    mask = np.arange(feats.shape[1])[None, :] < np.asarray(n_frames)[:, None]
    junk = np.where(
        mask[..., None], np.asarray(feats),
        100.0 * rng.standard_normal(feats.shape).astype(np.float32),
    )
    enc2, n_out2 = m.apply(
        params, jnp.asarray(junk), n_frames, method=aed.AedModel.encode
    )
    np.testing.assert_array_equal(np.asarray(n_out), np.asarray(n_out2))
    vmask = np.arange(enc.shape[1])[None, :] < np.asarray(n_out)[:, None]
    np.testing.assert_allclose(
        np.asarray(enc)[vmask], np.asarray(enc2)[vmask], rtol=1e-5, atol=1e-5
    )
    l1, _ = aed.aed_objective(m, params, feats, n_frames, labels, n_labels)
    l2, _ = aed.aed_objective(
        m, params, jnp.asarray(junk), n_frames, labels, n_labels
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_beam1_equals_stepwise_greedy():
    """make_aed_decoder(beam=1) must reproduce a hand-rolled greedy loop
    over decode_logits (validates the scan/top-k/finished machinery)."""
    m = _tiny_model()
    feats, n_frames, _, _, _ = _unit_task(seed=5, B=3)
    params = m.init(
        jax.random.key(1), feats, n_frames, jnp.zeros((3, 7), jnp.int32)
    )
    U = 7
    dec = aed.make_aed_decoder(m, params, beam=1, max_tokens=U)
    toks, n_toks, _ = jax.tree.map(np.asarray, dec(feats, n_frames))

    enc, n_out = m.apply(params, feats, n_frames, method=aed.AedModel.encode)
    B = feats.shape[0]
    buf = np.full((B, U), m.eos, np.int32)
    done = np.zeros(B, bool)
    for u in range(U):
        dec_in = np.concatenate(
            [np.full((B, 1), m.sos, np.int32), buf[:, :-1]], axis=1
        )
        logits = np.array(
            m.apply(params, enc, n_out, jnp.asarray(dec_in),
                    method=aed.AedModel.decode_logits)
        )[:, u]
        logits[:, m.sos] = -np.inf
        nxt = logits.argmax(-1)
        nxt = np.where(done, m.eos, nxt)
        buf[:, u] = nxt
        done |= nxt == m.eos
    for b in range(B):
        n = int(np.argmax(buf[b] == m.eos)) if (buf[b] == m.eos).any() else U
        assert n == n_toks[b], (b, buf[b], toks[b])
        np.testing.assert_array_equal(toks[b, :n], buf[b, :n])


def test_early_exit_beam_equals_full_scan():
    """The while_loop early-exit decoder (default — the serving finals'
    worst-case token budget must not cost its worst case) returns bitwise
    the same hypotheses, counts, and scores as the fixed-length scan, with
    a generous token budget so the exit path actually triggers."""
    m = _tiny_model()
    feats, n_frames, _, _, _ = _unit_task(seed=9, B=3)
    params = m.init(
        jax.random.key(2), feats, n_frames, jnp.zeros((3, 7), jnp.int32)
    )
    for kw in ({}, {"ctc_weight": 0.3}, {"return_all": True},
               {"length_penalty": 0.5}):
        d_fast = aed.make_aed_decoder(
            m, params, beam=3, max_tokens=24, early_exit=True, **kw)
        d_ref = aed.make_aed_decoder(
            m, params, beam=3, max_tokens=24, early_exit=False, **kw)
        fast = jax.tree.map(np.asarray, d_fast(feats, n_frames))
        ref = jax.tree.map(np.asarray, d_ref(feats, n_frames))
        for a, b in zip(fast, ref):
            np.testing.assert_array_equal(a, b, err_msg=str(kw))


def test_aed_train_step_spec_augment():
    """SpecAugment in the AED step: runs, finite loss, updates params, and
    masking actually changes the loss vs the clean step."""
    feats, n_frames, labels, n_labels, _ = _unit_task()
    m = _tiny_model()
    cfg = TrainConfig(lr=1e-3, num_nn_steps=10)
    state = aed.init_aed_train_state(
        m, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step_sa = aed.make_aed_train_step(m, cfg, spec_augment=True)
    step_plain = aed.make_aed_train_step(m, cfg, spec_augment=False)
    _, met_sa = step_sa(state, feats, n_frames, labels, n_labels)
    _, met_plain = step_plain(state, feats, n_frames, labels, n_labels)
    assert np.isfinite(float(met_sa["loss"]))
    assert float(met_sa["loss"]) != float(met_plain["loss"])
    # params move once past LR warmup (warmup LR is 0 at step 0)
    new_state = state
    for _ in range(3):
        new_state, _m = step_sa(new_state, feats, n_frames, labels, n_labels)
    leaves0 = jax.tree.leaves(state.params)
    leaves1 = jax.tree.leaves(new_state.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_aed_learns_unit_task():
    feats, n_frames, labels, n_labels, seqs = _unit_task()
    m = _tiny_model()
    cfg = TrainConfig(lr=2e-3, num_nn_steps=300)
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
    # joint CTC rescoring must not break the solved task
    hyps_joint = aed.aed_decode_batch(
        m, state.params, feats, n_frames, beam=2, max_tokens=8, ctc_weight=0.3
    )
    assert hyps_joint == seqs, (hyps_joint, seqs)


def test_aed_seq_logprob_matches_manual():
    """aed_seq_logprob == sum of token log-softmaxes along the teacher path
    (incl. the eos emission), computed manually from decode_logits."""
    feats, n_frames, labels, n_labels, _ = _unit_task(B=2)
    m = _tiny_model()
    cfg = TrainConfig(lr=1e-3, num_nn_steps=1)
    state = aed.init_aed_train_state(
        m, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    enc, n_out = m.apply(state.params, feats, n_frames, method=aed.AedModel.encode)
    got = np.asarray(aed.aed_seq_logprob(
        m, state.params, enc, n_out, labels, n_labels
    ))
    dec_in, tgt, mask = aed.make_teacher_batch(labels, n_labels, m.sos, m.eos)
    logits = m.apply(state.params, enc, n_out, dec_in,
                     method=aed.AedModel.decode_logits)
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = np.zeros(2)
    for b in range(2):
        for u in range(tgt.shape[1]):
            if bool(mask[b, u]):
                want[b] += lp[b, u, int(tgt[b, u])]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mwer_shifts_mass_to_low_risk_hyp():
    """With a 2-slot N-best (reference risk 0, corrupted risk > 0) and no CE
    anchor, MWER steps must increase the model's preference for the
    low-risk hypothesis."""
    feats, n_frames, labels, n_labels, seqs = _unit_task(B=4)
    m = _tiny_model()
    cfg = TrainConfig(lr=2e-3, num_nn_steps=50)
    state = aed.init_aed_train_state(
        m, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    B, L = labels.shape
    U = L
    hyps = np.full((B, 2, U), -1, np.int32)
    n_h = np.zeros((B, 2), np.int32)
    risks = np.zeros((B, 2), np.float32)
    for b, s in enumerate(seqs):
        hyps[b, 0, : len(s)] = s
        n_h[b, 0] = len(s)
        bad = list(s)
        bad[0] = (bad[0] + 1) % 3  # one substitution
        hyps[b, 1, : len(bad)] = bad
        n_h[b, 1] = len(bad)
        risks[b, 1] = 1.0
    h_mask = np.ones((B, 2), bool)
    args = (jnp.asarray(hyps), jnp.asarray(n_h), jnp.asarray(h_mask),
            jnp.asarray(risks))

    def pref(params):
        enc, n_out = m.apply(params, feats, n_frames, method=aed.AedModel.encode)
        enc2 = jnp.repeat(enc, 2, axis=0)
        n2 = jnp.repeat(n_out, 2, axis=0)
        lp = aed.aed_seq_logprob(
            m, params, enc2, n2,
            jnp.asarray(hyps.reshape(B * 2, U)),
            jnp.asarray(n_h.reshape(B * 2)),
        ).reshape(B, 2)
        return float(jnp.mean(lp[:, 0] - lp[:, 1]))

    before = pref(state.params)
    step = aed.make_aed_mwer_step(m, cfg, ce_weight=0.0)
    for _ in range(cfg.num_nn_steps):
        state, met = step(state, feats, n_frames, *args, labels, n_labels)
    after = pref(state.params)
    assert after > before, (before, after)
    assert np.isfinite(float(met["loss"]))


def test_finetune_aed_mwer_reduces_expected_risk():
    """End-to-end on-policy MWER: CE-pretrain briefly (imperfect model),
    then pipeline.finetune_aed_mwer — the expected risk criterion falls."""
    from mogasr import pipeline as pipe

    feats, n_frames, labels, n_labels, seqs = _unit_task(B=4)
    m = _tiny_model()
    cfg = TrainConfig(lr=2e-3, num_nn_steps=80)
    state = aed.init_aed_train_state(
        m, cfg, feats.shape[-1], labels.shape[1], jax.random.key(0)
    )
    step = aed.make_aed_train_step(m, cfg)
    for _ in range(cfg.num_nn_steps):
        state, _met = step(state, feats, n_frames, labels, n_labels)

    class _Fb:
        pass

    fb = _Fb()
    fb.feats, fb.n_frames, fb.size = feats, n_frames, len(seqs)
    fb.words = {b: seqs[b] for b in range(len(seqs))}
    params, hist = pipe.finetune_aed_mwer(
        m, state.params, [fb], lambda s: list(s),
        TrainConfig(lr=1e-3, num_nn_steps=30), n_hyps=3, ce_weight=0.05,
    )
    assert len(hist) == 30
    assert np.mean(hist[-5:]) <= np.mean(hist[:5]) + 1e-6, hist
