"""Contextual biasing (phrase boosting) tests: the telescoping partial
credit, retraction on broken matches, permanent completion credit, and the
end-to-end property — the boosted phrase wins an ambiguous decode it would
otherwise lose, offline AND streaming (same callback, exact equivalence)."""

import numpy as np
import pytest

from mogasr.decoder.biasing import ContextBiaser, biaser_from_words, load_phrases


def _cum(biaser, seq):
    """Total bias accumulated decoding seq token by token."""
    total, prefix = 0.0, ()
    for u in seq:
        total += biaser.score(prefix, u)
        prefix = prefix + (u,)
    return total


def test_partial_credit_and_retraction():
    b = ContextBiaser([[1, 2, 3]], weight=2.0, completion_scale=1.0)
    # entering the phrase earns per-token credit...
    assert b.score((), 1) == 2.0
    assert b.score((1,), 2) == 2.0 * (2 - 1)
    # ...a broken match retracts everything (telescoping)
    assert _cum(b, [1, 2, 9]) == pytest.approx(0.0)
    assert _cum(b, [1, 9]) == pytest.approx(0.0)
    # unrelated tokens never score
    assert _cum(b, [7, 8, 9]) == 0.0


def test_completion_credit_is_permanent():
    b = ContextBiaser([[1, 2, 3]], weight=2.0, completion_scale=1.0)
    # completing: transient (len-1) retracts, permanent weight*len lands
    assert _cum(b, [1, 2, 3]) == pytest.approx(2.0 * 3)
    # and survives any continuation
    assert _cum(b, [1, 2, 3, 9, 9]) == pytest.approx(2.0 * 3)
    # two occurrences both count
    assert _cum(b, [1, 2, 3, 1, 2, 3]) == pytest.approx(2.0 * 6)


def test_overlapping_phrases():
    # a full phrase that is also the prefix of a longer one: both credited
    b = ContextBiaser([[1, 2], [1, 2, 3]], weight=1.0, completion_scale=1.0)
    # completes [1,2] (permanent 2) AND is live toward [1,2,3] (transient 2)
    assert _cum(b, [1, 2]) == pytest.approx(2.0 + 2.0)
    assert _cum(b, [1, 2, 3]) == pytest.approx(2 + 3)  # completes both
    assert _cum(b, [1, 2, 9]) == pytest.approx(2.0)    # keeps only [1,2]


def test_biased_beam_recovers_rare_phrase():
    """Ambiguous CTC posteriors: unit 1 beats unit 2 by a small margin every
    frame, so the unbiased beam decodes [1,...]; with phrase [2, 3] in the
    bias list the boosted path wins — and the streaming decoder (same
    callback through CtcStreamDecoder) agrees exactly."""
    from mogasr.am.ctc import CtcStreamDecoder, ctc_prefix_beam_decode

    V = 5  # units 0..3, blank 4
    logp = np.full((2, V), -8.0, np.float32)
    logp[0, 1] = np.log(0.52)   # unit 1 narrowly beats unit 2...
    logp[0, 2] = np.log(0.44)
    logp[1, 3] = np.log(0.96)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))

    plain = ctc_prefix_beam_decode(logp, beam_size=8, blank_id=4)
    assert plain[0][1] == [1, 3]

    b = ContextBiaser([[2, 3]], weight=1.5, completion_scale=1.0)
    biased = ctc_prefix_beam_decode(
        logp, beam_size=8, blank_id=4, ext_score=b.score
    )
    assert biased[0][1] == [2, 3]

    stream = CtcStreamDecoder(blank_id=4, mode="beam", beam_size=8,
                              ext_score=b.score)
    stream.step(logp[:1])
    stream.step(logp[1:])
    assert stream.finalize() == [2, 3]


def test_bias_cli_ctc_bpe(tmp_path, monkeypatch, capsys):
    """--bias end to end: lexicon-free BPE-CTC decode and the streaming
    path both accept a phrase file and produce hypotheses."""
    import json

    from cli import decode, stream, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    bias = tmp_path / "phrases.txt"
    bias.write_text("sun\ncat run\n")
    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--am", "lstm", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2",
         "--bias", str(bias), "--bias-weight", "1.0", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run3"), "--ctc",
         "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2", "--bias", str(bias)],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert any("final" in e for e in events)


def test_biaser_from_words_and_load(tmp_path):
    from mogasr.hmm.lexicon import synthetic_lexicon

    lex = synthetic_lexicon()
    w = sorted(lex.words)[0]
    bi = biaser_from_words(lex, [[w]], weight=1.0)
    ids = lex.words_to_phone_ids([w], interword_sil=False, edge_sil=False)
    assert _cum(bi, ids) == pytest.approx(float(len(ids)))

    p = tmp_path / "phrases.txt"
    p.write_text(f"# comment\n{w}\n\n{w} {w}\n")
    phrases = load_phrases(str(p))
    assert phrases == [[w], [w, w]]
