"""Knowledge-distillation tests (mogasr.am.distill): KL vs a NumPy oracle,
padding invariance, pure-soft-target convergence toward a fixed teacher,
and an end-to-end teacher->student recipe whose student decodes like the
teacher. CLI chain: train teacher -> distill student -> decode student."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.am import ctc as C
from mogasr.am import distill as D
from mogasr.config import DecodeConfig, TrainConfig


def _rand_logits(seed=0, B=3, T=18, V=7):
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((B, T, V)).astype(np.float32)
    t = rng.standard_normal((B, T, V)).astype(np.float32)
    n = rng.integers(4, T + 1, B).astype(np.int32)
    return jnp.asarray(s), jnp.asarray(t), jnp.asarray(n)


@pytest.mark.parametrize("tau", [1.0, 2.5])
def test_distill_kl_matches_numpy_oracle(tau):
    s, t, n = _rand_logits()
    ours = float(D.distill_kl(s, t, n, temperature=tau))
    oracle = D.distill_kl_oracle_np(s, t, n, temperature=tau)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)
    assert ours >= 0.0


def test_distill_kl_zero_on_identical_logits():
    s, _t, n = _rand_logits(seed=3)
    assert float(D.distill_kl(s, s, n, temperature=2.0)) == pytest.approx(
        0.0, abs=1e-6
    )


def test_distill_kl_padding_invariance():
    s, t, n = _rand_logits(seed=5)
    val = float(D.distill_kl(s, t, n, temperature=1.5))
    # junk in the padded tail must not change the masked mean
    rng = np.random.default_rng(9)
    pad_s = jnp.concatenate(
        [s, jnp.asarray(rng.standard_normal((3, 6, 7)) * 50, s.dtype)], axis=1
    )
    pad_t = jnp.concatenate(
        [t, jnp.asarray(rng.standard_normal((3, 6, 7)) * 50, t.dtype)], axis=1
    )
    np.testing.assert_allclose(
        float(D.distill_kl(pad_s, pad_t, n, temperature=1.5)), val,
        rtol=1e-5, atol=1e-6,
    )


def test_pure_soft_targets_converge_to_teacher():
    """alpha=1 distillation is posterior matching: a same-capacity student
    driven only by the KL term must approach ANY fixed teacher — no corpus
    or labels involved beyond shapes."""
    from mogasr.am.neural import build_model

    V, Dfeat, B, T = 6, 10, 4, 16
    # num_nn_steps sizes the warmup-cosine schedule — must match the loop
    tcfg = TrainConfig(nn_arch="mlp", nn_hidden=32, nn_layers=2,
                       nn_context=1, lr=3e-3, num_nn_steps=150)
    teacher = build_model("mlp", V, tcfg)
    student = build_model("mlp", V, tcfg)
    t_params = teacher.init(jax.random.key(1),
                            jnp.zeros((2, 8, Dfeat)), jnp.asarray([8, 8]))
    state = C.init_ctc_train_state(student, tcfg, Dfeat, jax.random.key(2))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, Dfeat)), jnp.float32)
    n_frames = jnp.asarray([T, T - 3, T, T - 5])
    labels = jnp.zeros((B, 2), jnp.int32)
    n_labels = jnp.asarray([1, 1, 1, 1])

    def kl_now(params):
        tl = teacher.apply(t_params, feats, n_frames)
        sl = student.apply(params, feats, n_frames)
        return float(D.distill_kl(sl, tl, n_frames, temperature=2.0))

    step = D.make_distill_train_step(
        student, teacher, t_params, tcfg, alpha=1.0, temperature=2.0
    )
    kl0 = kl_now(state.params)
    for _ in range(150):
        state, m = step(state, feats, n_frames, labels, n_labels)
    kl1 = kl_now(state.params)
    assert kl1 < 0.25 * kl0, (kl0, kl1)
    # the CTC term is inert at alpha=1: metrics still report it
    assert set(m) == {"loss", "kl", "ctc", "utt_nll"}


@pytest.fixture(scope="module")
def distilled_system():
    from mogasr import pipeline as pipe
    from mogasr.config import BatchConfig, FrontendConfig
    from mogasr.data.synthetic import LEXICON, make_corpus
    from mogasr.hmm.lexicon import make_lexicon

    vocab = ["fish", "cat", "see", "sun", "tree", "dog"]
    lex = make_lexicon({w: LEXICON[w] for w in vocab})
    fcfg = FrontendConfig()
    utts = make_corpus(24, words_per_utt=(2, 3), seed=7, vocab=vocab)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    tcfg = TrainConfig(nn_hidden=128, nn_layers=2, nn_context=3, lr=3e-3,
                       num_nn_steps=220)
    teacher, t_params = pipe.train_ctc(batches, lex, tcfg, arch="mlp")

    scfg = TrainConfig(nn_hidden=64, nn_layers=2, nn_context=3, lr=3e-3,
                       num_nn_steps=220)
    encode = lambda words: C.ctc_labels_from_words(lex, words)  # noqa: E731
    student, s_params = pipe.distill_ctc_units(
        batches, teacher, t_params, encode, lex.n_phones, scfg,
        student_arch="mlp", alpha=0.5, temperature=2.0,
    )
    return lex, batches, teacher, t_params, student, s_params


def test_distilled_student_agrees_with_teacher(distilled_system):
    """Frame-level argmax agreement on valid frames — the direct measure of
    posterior transfer (blank-dominated, so the bar is high)."""
    lex, batches, teacher, t_params, student, s_params = distilled_system
    agree = total = 0
    for fb in batches:
        tl = np.asarray(teacher.apply(t_params, fb.feats, fb.n_frames))
        sl = np.asarray(student.apply(s_params, fb.feats, fb.n_frames))
        for b in range(fb.size):
            nf = int(fb.n_frames[b])
            agree += int(
                (tl[b, :nf].argmax(-1) == sl[b, :nf].argmax(-1)).sum()
            )
            total += nf
    assert total > 0 and agree / total > 0.8, agree / total


def test_distilled_student_decodes_words(distilled_system):
    from mogasr import pipeline as pipe

    lex, batches, _teacher, _tp, student, s_params = distilled_system
    scorer = C.make_ctc_scorer(student, s_params)
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    graph = C.ctc_decode_graph(lex, dcfg)
    metrics = pipe.evaluate(batches, None, lex, None, dcfg,
                            scorer=scorer, graph=graph)
    assert metrics["wer"] < 0.30, metrics


def test_distill_cli_teacher_student_decode(tmp_path, monkeypatch):
    """CLI chain: train a tiny CTC teacher, distill an LSTM student from its
    checkpoint, decode with the student checkpoint (mechanics smoke)."""
    from cli import decode, train_nn

    def run_cli(module, argv):
        monkeypatch.setattr(sys, "argv", ["prog"] + argv)
        module.main()

    run_cli(train_nn,
            ["--synthetic", "3", "--run-dir", str(tmp_path / "teach"),
             "--arch", "mlp", "--hidden", "16", "--layers", "2",
             "--steps", "6", "--objective", "ctc"])
    run_cli(train_nn,
            ["--synthetic", "3", "--run-dir", str(tmp_path / "stud"),
             "--arch", "lstm", "--hidden", "16", "--layers", "2",
             "--steps", "6", "--objective", "ctc",
             "--distill-from", str(tmp_path / "teach" / "nn_ctc_mlp"),
             "--distill-teacher-arch", "mlp",
             "--distill-teacher-hidden", "16",
             "--distill-teacher-layers", "2"])
    out = str(tmp_path / "hyp.jsonl")
    run_cli(decode,
            ["--synthetic", "2", "--run-dir", str(tmp_path / "dec"),
             "--am", "lstm", "--ctc",
             "--nn-ckpt", str(tmp_path / "stud" / "nn_ctc_lstm"),
             "--nn-hidden", "16", "--nn-layers", "2", "--out", out])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2 and all("hyp" in r for r in recs)
