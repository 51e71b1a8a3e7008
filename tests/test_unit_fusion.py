"""Unit-bigram shallow fusion in the CTC prefix beam: telescoping algebra,
LM-steers-ambiguous-acoustics, streaming==offline, composition with
biasing, save/load, and the CLI path."""

import json

import numpy as np

from mogasr.lm.unit_ngram import (
    UnitBigramLm,
    compose_ext_scores,
    estimate_unit_bigram,
    fusion_score,
    load_unit_lm,
    save_unit_lm,
    unit_perplexity,
    unit_seq_logp,
)

NEG = -25.0


def _train_seqs():
    # strong bigram structure: 0->1->2 cycles only
    return [[0, 1, 2, 0, 1, 2], [1, 2, 0, 1], [2, 0, 1, 2, 0]] * 10


def test_fusion_telescopes_to_sequence_logp():
    lm = estimate_unit_bigram(_train_seqs(), 4)
    ext = fusion_score(lm, weight=1.0)
    seq = [0, 1, 2, 0, 1]
    total = sum(ext(tuple(seq[:i]), seq[i]) for i in range(len(seq)))
    assert np.isclose(total, unit_seq_logp(lm, seq), atol=1e-6)


def test_fusion_weight_scales_and_zero_is_inert():
    lm = estimate_unit_bigram(_train_seqs(), 4)
    e1 = fusion_score(lm, weight=1.0)
    e2 = fusion_score(lm, weight=2.0)
    e0 = fusion_score(lm, weight=0.0)
    for prefix, u in [((), 1), ((0,), 1), ((0, 1), 2)]:
        assert np.isclose(e2(prefix, u), 2.0 * e1(prefix, u))
        assert e0(prefix, u) == 0.0


def test_compose_ext_scores():
    f = lambda p, u: 1.5
    g = lambda p, u: -0.25
    assert compose_ext_scores([None, None]) is None
    assert compose_ext_scores([f, None]) is f
    h = compose_ext_scores([f, g, None])
    assert np.isclose(h((), 0), 1.25)


def test_save_load_roundtrip(tmp_path):
    lm = estimate_unit_bigram(_train_seqs(), 4)
    path = str(tmp_path / "unit_lm.npz")
    save_unit_lm(path, lm)
    lm2 = load_unit_lm(path)
    np.testing.assert_allclose(lm2.pair_logp, lm.pair_logp)
    np.testing.assert_allclose(lm2.init_logp, lm.init_logp)
    assert lm2.n_units == lm.n_units
    seqs = [[0, 1, 2], [2, 0, 1, 2]]
    assert np.isclose(unit_perplexity(lm2, seqs), unit_perplexity(lm, seqs))


def _ambiguous_logp():
    """Frames whose acoustics very slightly prefer the OUT-of-language
    continuation 0->2; the LM (trained on 0->1->2) must flip it.
    V=4: units 0..2 + blank 3. Frame layout: [0] [1 vs 2 ambiguous] [2]."""
    V = 4
    logp = np.full((3, V), NEG, np.float64)
    logp[0, 0] = -0.05           # clearly unit 0
    logp[1, 1] = -0.75           # in-language (0->1) ...
    logp[1, 2] = -0.60           # ... but acoustics lean 2
    logp[2, 2] = -0.05           # clearly unit 2
    # normalize-ish: leave as log scores; prefix beam only compares
    return logp


def test_fusion_flips_ambiguous_decision():
    from mogasr.am.ctc import ctc_prefix_beam_decode

    lm = estimate_unit_bigram(_train_seqs(), 4)
    logp = _ambiguous_logp()
    plain = ctc_prefix_beam_decode(logp, beam_size=8, blank_id=3)[0][1]
    fused = ctc_prefix_beam_decode(
        logp, beam_size=8, blank_id=3,
        ext_score=fusion_score(lm, weight=1.0),
    )[0][1]
    assert plain == [0, 2, 2] or 1 not in plain
    assert fused == [0, 1, 2]


def test_fusion_streaming_equals_offline():
    from mogasr.am.ctc import CtcStreamDecoder, ctc_prefix_beam_decode

    lm = estimate_unit_bigram(_train_seqs(), 4)
    rng = np.random.default_rng(3)
    V = 4
    logp = np.log(rng.dirichlet(np.ones(V), size=40)).astype(np.float64)
    ext = fusion_score(lm, weight=0.7)
    want = ctc_prefix_beam_decode(logp, beam_size=6, blank_id=3,
                                  ext_score=ext)[0][1]
    for chunks in ([7, 13, 20], [1] * 40, [40]):
        dec = CtcStreamDecoder(blank_id=3, mode="beam", beam_size=6,
                               ext_score=ext)
        off = 0
        for c in chunks:
            dec.step(logp[off : off + c])
            off += c
        assert list(dec.finalize()) == want


def test_unit_lm_cli_fusion(tmp_path, monkeypatch):
    """train_nn (BPE-CTC) -> train_lm --unit-ngram -> decode --fusion-lm."""
    from cli import decode, train_lm, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "6", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "8",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    run_cli(
        train_lm,
        ["--synthetic", "24", "--run-dir", str(tmp_path / "lm"),
         "--unit-ngram", "--bpe", str(tmp_path / "run" / "bpe.json")],
        monkeypatch,
    )
    lm_path = tmp_path / "lm" / "unit_lm.npz"
    assert lm_path.exists()
    metrics = [json.loads(l) for l in open(tmp_path / "lm" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_unit_lm_done"]
    assert done and done[0]["heldout_unit_ppl"] > 1.0

    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "dec"),
         "--am", "lstm", "--ctc", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2", "--mode", "word",
         "--fusion-lm", str(lm_path), "--fusion-weight", "0.3",
         "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 3
    for r in recs:
        assert isinstance(r["hyp"], list)


def test_ctc_nbest_nnlm_rescore_cli(tmp_path, monkeypatch):
    """decode --ctc --bpe --nnlm-rescore: neural word LM re-ranks the
    prefix-beam N-best (the e2e analogue of the lattice rescoring pass)."""
    from cli import decode, train_lm, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "6", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "8",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    run_cli(
        train_lm,
        ["--synthetic", "16", "--run-dir", str(tmp_path / "lm"),
         "--hidden", "16", "--steps", "30"],
        monkeypatch,
    )
    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "dec"),
         "--am", "lstm", "--ctc", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2", "--mode", "word",
         "--nnlm-rescore", str(tmp_path / "lm" / "nnlm"),
         "--nnlm-nbest", "4", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 3
    for r in recs:
        assert isinstance(r["hyp"], list)


def test_aed_fusion_matrix_semantics():
    from mogasr.am.aed import aed_fusion_matrix, build_aed_model
    from mogasr.config import TrainConfig

    lm = estimate_unit_bigram(_train_seqs(), 4)
    model = build_aed_model(4, TrainConfig(nn_hidden=16, nn_layers=1))
    m = np.asarray(aed_fusion_matrix(model, lm, weight=0.5))
    V, sos, eos = model.vocab, model.sos, model.eos
    assert m.shape == (V, V)
    np.testing.assert_allclose(m[:4, :4], 0.5 * lm.pair_logp, rtol=1e-6)
    np.testing.assert_allclose(m[sos, :4], 0.5 * lm.init_logp, rtol=1e-6)
    # ending a hypothesis and the post-finish forced-eos steps are LM-free
    assert (m[:, eos] == 0).all() and (m[:, sos] == 0).all()
    assert (m[eos] == 0).all()


def test_aed_zero_fusion_is_exact_noop():
    """fusion == zero matrix decodes bit-identically to fusion == None
    (the gather wiring adds nothing but the LM term)."""
    import jax
    import jax.numpy as jnp

    from mogasr.am.aed import (
        build_aed_model, init_aed_train_state, make_aed_decoder,
    )
    from mogasr.config import TrainConfig

    tcfg = TrainConfig(nn_hidden=16, nn_layers=1)
    model = build_aed_model(5, tcfg)
    params = init_aed_train_state(model, tcfg, 13, 4, jax.random.key(0)).params
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 24, 13)), jnp.float32)
    n = jnp.asarray([24, 17], jnp.int32)
    plain = make_aed_decoder(model, params, beam=3, max_tokens=8)
    fused = make_aed_decoder(
        model, params, beam=3, max_tokens=8,
        fusion=jnp.zeros((model.vocab, model.vocab), jnp.float32),
    )
    for a, b in zip(plain(feats, n), fused(feats, n)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aed_fusion_cli(tmp_path, monkeypatch):
    """decode --aed --bpe --fusion-lm: on-device fused beam end-to-end."""
    from cli import decode, train_lm, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "aed", "--bpe-merges", "20"],
        monkeypatch,
    )
    run_cli(
        train_lm,
        ["--synthetic", "16", "--run-dir", str(tmp_path / "lm"),
         "--unit-ngram", "--bpe", str(tmp_path / "run" / "bpe.json")],
        monkeypatch,
    )
    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "dec"),
         "--aed", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--nn-hidden", "16", "--nn-layers", "2", "--mode", "word",
         "--fusion-lm", str(tmp_path / "lm" / "unit_lm.npz"),
         "--fusion-weight", "0.3", "--aed-beam", "3", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    for r in recs:
        assert isinstance(r["hyp"], list)


def test_rnnt_beam_ext_score_steers():
    """ext_score in the RNN-T beam: a crushing penalty on the first unit the
    plain beam emits removes it from the fused beam's hypothesis."""
    import jax
    import jax.numpy as jnp

    from mogasr.am.rnnt import build_rnnt_model, init_rnnt_train_state, rnnt_beam_decode
    from mogasr.config import TrainConfig

    tcfg = TrainConfig(nn_arch="lstm", nn_hidden=16, nn_layers=2)
    model = build_rnnt_model(5, tcfg)
    params = init_rnnt_train_state(
        model, tcfg, 13, 4, jax.random.key(0)
    ).params
    # tilt the joint away from blank so the beam emits symbols
    bias = np.array(params["params"]["joint"]["out"]["bias"])
    bias[model.n_labels] = -1.5
    bias[0] = 0.8
    bias[2] = 0.7
    params["params"]["joint"]["out"]["bias"] = jnp.asarray(bias)

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 20, 13)), jnp.float32)
    n = jnp.asarray([20], np.int32)
    plain = rnnt_beam_decode(model, params, feats, n, beam_size=4)[0][1]
    assert plain, "emit bias should produce symbols"
    banned = plain[0]
    fused = rnnt_beam_decode(
        model, params, feats, n, beam_size=4,
        ext_score=lambda p, u: -1e9 if u == banned else 0.0,
    )[0][1]
    assert banned not in fused


def test_rnnt_beam_fusion_cli(tmp_path, monkeypatch):
    """decode --rnnt --rnnt-beam with a PHONE-unit fusion LM
    (train_lm --unit-ngram without --bpe)."""
    from cli import decode, train_lm, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt"],
        monkeypatch,
    )
    run_cli(
        train_lm,
        ["--synthetic", "16", "--run-dir", str(tmp_path / "lm"),
         "--unit-ngram"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "lm" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_unit_lm_done"]
    assert done and done[0]["units"] == "phone"

    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "dec"),
         "--am", "lstm", "--rnnt", "--rnnt-beam", "3",
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--mode", "phone", "--nn-hidden", "16", "--nn-layers", "2",
         "--fusion-lm", str(tmp_path / "lm" / "unit_lm.npz"),
         "--fusion-weight", "0.3", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    for r in recs:
        assert isinstance(r["hyp"], list)
