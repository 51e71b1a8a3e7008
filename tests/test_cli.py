"""CLI smoke tests: each entry script runs end-to-end on a tiny synthetic
corpus (in-process, CPU backend via conftest)."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


def test_features_cli(tmp_path, monkeypatch):
    from cli import features

    out = str(tmp_path / "feats.npz")
    run_cli(
        features,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--check-parity", "--out", out],
        monkeypatch,
    )
    data = np.load(out)
    assert len(data.files) == 4
    for k in data.files:
        assert data[k].shape[1] == 39
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    parity = [m for m in metrics if m.get("stage") == "parity"]
    assert parity and parity[0]["pass"]


def test_score_cli(tmp_path, monkeypatch):
    from cli import score

    out = str(tmp_path / "ll.npz")
    run_cli(
        score,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-states", "50", "--num-components", "4", "--out", out],
        monkeypatch,
    )
    data = np.load(out)
    assert len(data.files) == 3
    for k in data.files:
        assert data[k].shape[1] == 50


def test_align_cli(tmp_path, monkeypatch):
    from cli import align

    out = str(tmp_path / "ali.jsonl")
    run_cli(
        align,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3
    assert all(len(l["pdfs"]) == len(l["phones"]) > 0 for l in lines)
    # alignment starts and ends in silence (edge sil in the align graph)
    assert lines[0]["phones"][0] == "sil" and lines[0]["phones"][-1] == "sil"


def test_decode_cli(tmp_path, monkeypatch):
    from cli import decode

    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--mode", "phone", "--num-components", "1", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3


def test_eval_cli(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4
    assert "wer" in ev[0] and "utts_per_sec_per_chip" in ev[0]
    # resume file exists and eval is idempotent on rerun
    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1"],
        monkeypatch,
    )
    metrics2 = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [m for m in metrics2 if m.get("stage") == "eval"][-1]["utts"] == 4


def test_train_gmm_cli(tmp_path, monkeypatch):
    from cli import train_gmm

    run_cli(
        train_gmm,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "2", "--num-iters", "3"],
        monkeypatch,
    )
    assert os.path.isdir(tmp_path / "run" / "gmm")
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_gmm_done"]
    assert done and done[0]["iters"] == 3


def test_train_nn_then_nn_decode_cli(tmp_path, monkeypatch):
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "10",
         "--bootstrap-iters", "2", "--bootstrap-components", "1"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_nn_done"]
    assert done and done[0]["steps"] == 10

    out = str(tmp_path / "nn_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--am", "mlp", "--nn-ckpt", str(tmp_path / "run" / "nn_mlp"),
         "--nn-hidden", "32", "--nn-layers", "1", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 4


def test_train_nn_moe_then_decode_cli(tmp_path, monkeypatch):
    """--arch moe: the production MoE frame classifier trains through the
    standard CE path (load-balance aux via the sown 'losses' collection) and
    decodes through --am moe — the EP-sharded twin of this exact parameter
    tree is equality-tested in test_expert_parallel.py."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "moe", "--hidden", "32", "--layers", "2", "--experts", "2",
         "--steps", "10", "--bootstrap-iters", "2",
         "--bootstrap-components", "1"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_nn_done"]
    assert done and done[0]["steps"] == 10

    out = str(tmp_path / "moe_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--am", "moe", "--nn-ckpt", str(tmp_path / "run" / "nn_moe"),
         "--nn-hidden", "32", "--nn-layers", "2", "--nn-experts", "2",
         "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 4

    # moe is scoped to the CE objective — other objectives reject it loudly
    with pytest.raises(SystemExit, match="moe supports --objective ce"):
        run_cli(
            train_nn,
            ["--synthetic", "2", "--run-dir", str(tmp_path / "g"),
             "--arch", "moe", "--objective", "ctc", "--steps", "1"],
            monkeypatch,
        )


def test_eval_cli_hybrid_nn(tmp_path, monkeypatch):
    """eval --am mlp: the hybrid frame classifier through the DP-sharded
    word-loop sweep, at every precision tier."""
    from cli import eval as eval_cli
    from cli import train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "10",
         "--bootstrap-iters", "2", "--bootstrap-components", "1"],
        monkeypatch,
    )
    for prec in ["float32", "int8"]:
        run_cli(
            eval_cli,
            ["--synthetic", "4", "--run-dir", str(tmp_path / f"e_{prec}"),
             "--am", "mlp", "--nn-ckpt", str(tmp_path / "run" / "nn_mlp"),
             "--nn-hidden", "32", "--nn-layers", "1",
             "--nn-precision", prec],
            monkeypatch,
        )
        metrics = [json.loads(l)
                   for l in open(tmp_path / f"e_{prec}" / "metrics.jsonl")]
        ev = [m for m in metrics if m.get("stage") == "eval"]
        assert ev and ev[0]["utts"] == 4

    # guards: hybrid without ckpt / with GMM adaptation
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="requires --nn-ckpt"):
        run_cli(eval_cli, ["--synthetic", "2", "--am", "mlp",
                           "--run-dir", str(tmp_path / "g1")], monkeypatch)
    with _pytest.raises(SystemExit, match="GMM adaptation"):
        run_cli(eval_cli, ["--synthetic", "2", "--am", "mlp",
                           "--nn-ckpt", str(tmp_path / "run" / "nn_mlp"),
                           "--fmllr",
                           "--run-dir", str(tmp_path / "g2")], monkeypatch)


def test_decode_cli_bigram_lm(tmp_path, monkeypatch):
    from cli import decode

    out = str(tmp_path / "hyp_lm.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--bigram-lm", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3


def test_decode_cli_trigram_nbest(tmp_path, monkeypatch):
    from cli import decode

    out = str(tmp_path / "hyp_tri.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--trigram-rescore", "--nbest", "3",
         "--multi-pron", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3
    for rec in lines:
        nb = rec["nbest"]
        assert 1 <= len(nb) <= 3
        assert rec["hyp"] == nb[0]["hyp"]  # 1-best consistent with N-best head
        logps = [h["logp"] for h in nb]
        assert logps == sorted(logps, reverse=True)


def test_decode_cli_arpa_roundtrip(tmp_path, monkeypatch):
    """Export the trigram as ARPA, re-decode reading it back: same hyps."""
    from cli import decode

    arpa = str(tmp_path / "lm.arpa")
    out1, out2 = str(tmp_path / "h1.jsonl"), str(tmp_path / "h2.jsonl")
    common = ["--synthetic", "3", "--num-components", "1", "--trigram-rescore"]
    run_cli(
        decode,
        common + ["--run-dir", str(tmp_path / "r1"), "--write-arpa", arpa,
                  "--out", out1],
        monkeypatch,
    )
    assert open(arpa).readline().strip() == "\\data\\"
    run_cli(
        decode,
        common + ["--run-dir", str(tmp_path / "r2"), "--arpa", arpa,
                  "--out", out2],
        monkeypatch,
    )
    h1 = [json.loads(l)["hyp"] for l in open(out1)]
    h2 = [json.loads(l)["hyp"] for l in open(out2)]
    assert h1 == h2


def test_eval_cli_profile_writes_trace(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--profile"],
        monkeypatch,
    )
    prof = tmp_path / "run" / "profile"
    assert prof.is_dir() and any(prof.rglob("*"))


def test_train_gmm_cli_triphones(tmp_path, monkeypatch):
    from cli import train_gmm

    run_cli(
        train_gmm,
        ["--synthetic", "6", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--num-iters", "2", "--triphones", "120"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    cd = [m for m in metrics if m.get("stage") == "train_cd_done"]
    assert cd and cd[0]["tied_pdfs"] > 0
    assert os.path.isdir(tmp_path / "run" / "gmm_cd")


def test_train_gmm_cli_lda(tmp_path, monkeypatch):
    from cli import train_gmm

    run_cli(
        train_gmm,
        ["--synthetic", "6", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--num-iters", "2",
         "--lda", "2", "--lda-dim", "16"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_lda_mllt_done"]
    assert done and done[0]["lda_dim"] == 16
    assert os.path.isdir(tmp_path / "run" / "gmm_lda")


def test_train_gmm_cli_discriminative(tmp_path, monkeypatch):
    """ML EM -> MMI -> sMBR refinement through the train_gmm CLI."""
    from cli import train_gmm

    run_cli(
        train_gmm,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--num-iters", "2", "--mmi", "1", "--smbr", "1"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    stages = {m.get("stage") for m in metrics}
    assert {"train_mmi_done", "train_smbr_done"} <= stages, stages


def test_decode_cli_grammar(tmp_path, monkeypatch):
    from cli import decode

    gfile = tmp_path / "grammar.txt"
    gfile.write_text("cat fish\ndog tree\n")
    out = str(tmp_path / "hyp_gr.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--grammar", str(gfile), "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 3
    for r in recs:
        for w in r["hyp"]:
            assert w in {"cat", "fish", "dog", "tree"}, r


def test_train_rnnt_then_decode_cli(tmp_path, monkeypatch):
    """RNN-transducer smoke: train_nn --objective rnnt -> decode --rnnt
    (greedy phone mode)."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "32", "--layers", "2", "--steps", "6",
         "--objective", "rnnt"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "train_rnnt_done" for m in metrics)

    out = str(tmp_path / "rnnt_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--am", "lstm", "--rnnt", "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--mode", "phone", "--nn-hidden", "32", "--nn-layers", "2", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3


def test_stream_cli_ctc(tmp_path, monkeypatch, capsys):
    """Online neural CTC: stateful LSTM chunks -> OnlineDecoder on the CTC
    graph, partial events then a final hypothesis."""
    from cli import stream, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "ctc"],
        monkeypatch,
    )
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2"],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    partials = [e for e in events if "partial" in e]
    finals = [e for e in events if "final" in e]
    assert len(partials) >= 3 and len(finals) == 1
    assert isinstance(finals[0]["final"], list)


def test_stream_cli_aed(tmp_path, monkeypatch, capsys):
    """Streaming AED: train a chunked (streaming-capable) Conformer with
    train_nn --aed-chunk, then stream it — CTC-greedy partial events per
    chunk plus an exact attention-beam final hypothesis."""
    from cli import stream, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--hidden", "32", "--layers", "1", "--steps", "6",
         "--objective", "aed", "--aed-chunk", "4"],
        monkeypatch,
    )
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--aed",
         "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--nn-hidden", "32", "--nn-layers", "1", "--aed-chunk", "4",
         "--aed-beam", "2"],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    partials = [e for e in events if "partial" in e]
    finals = [e for e in events if "final" in e]
    assert len(partials) >= 3 and len(finals) == 1
    assert isinstance(finals[0]["final"], list)


def test_transcribe_cli_ctc(tmp_path, monkeypatch):
    """Long-audio transcription (VAD -> segments) with a CTC acoustic model:
    word confidences/timestamps via FB over the skip-transition CTC graph."""
    from cli import train_nn, transcribe

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "8",
         "--objective", "ctc"],
        monkeypatch,
    )
    out = str(tmp_path / "t.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_mlp"),
         "--nn-arch", "mlp", "--nn-hidden", "32", "--nn-layers", "1",
         "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert recs
    for r in recs:
        assert r["end_s"] > r["start_s"]
        assert len(r["words"]) == len(r["confidences"])
        for c in r["confidences"]:
            assert 0.0 <= c <= 1.0


def test_train_rnnt_mwer_cli(tmp_path, monkeypatch):
    """train_nn --objective rnnt --mwer-steps: the transducer MWER
    fine-tune phase runs and logs its criterion."""
    from cli import train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt", "--mwer-steps", "2"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "mwer_done"]
    assert done and done[0]["steps"] == 2
    assert np.isfinite(done[0]["expected_risk_last"])


def test_transcribe_cli_aed(tmp_path, monkeypatch):
    """Long-audio transcription with the AED family: VAD segments ->
    per-segment attention beam decode, segment timestamps (no word times)."""
    from cli import train_nn, transcribe

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--hidden", "32", "--layers", "1", "--steps", "6",
         "--objective", "aed"],
        monkeypatch,
    )
    out = str(tmp_path / "t.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--aed",
         "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--nn-hidden", "32", "--nn-layers", "1",
         "--aed-beam", "2", "--aed-max-tokens", "16", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert recs
    for r in recs:
        assert r["end_s"] > r["start_s"]
        assert isinstance(r["words"], list)
    # --ctm needs word alignments the AED doesn't produce
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        run_cli(
            transcribe,
            ["--synthetic-demo", "--run-dir", str(tmp_path / "run3"), "--aed",
             "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
             "--ctm", str(tmp_path / "x.ctm")],
            monkeypatch,
        )


def test_eval_cli_consensus(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--consensus"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any("wer" in m for m in metrics)


def test_train_ctc_bpe_then_decode_cli(tmp_path, monkeypatch):
    """Lexicon-free path: CTC on BPE subwords -> greedy word decode."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "10",
         "--objective", "ctc", "--bpe-merges", "30"],
        monkeypatch,
    )
    bpe_file = tmp_path / "run" / "bpe.json"
    assert bpe_file.exists()
    out = str(tmp_path / "bpe_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--am", "mlp", "--ctc", "--bpe", str(bpe_file),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_mlp"),
         "--nn-hidden", "32", "--nn-layers", "1", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 4


def test_stream_cli_ctc_bpe(tmp_path, monkeypatch, capsys):
    """Streaming OPEN-VOCABULARY recognition: BPE-CTC LSTM chunks -> greedy
    unit collapse -> words, no lexicon or decode graph."""
    from cli import stream, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2"],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    partials = [e for e in events if "partial" in e]
    finals = [e for e in events if "final" in e]
    assert len(partials) >= 3 and len(finals) == 1
    assert isinstance(finals[0]["final"], list)


def test_stream_cli_rnnt(tmp_path, monkeypatch, capsys):
    """Online RNN-T: encoder chunks + chunk-resumable device greedy."""
    from cli import stream, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt"],
        monkeypatch,
    )
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--rnnt",
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2"],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    partials = [e for e in events if "partial" in e]
    finals = [e for e in events if "final" in e]
    assert len(partials) >= 3 and len(finals) == 1
    assert isinstance(finals[0]["final"], list)


def test_kws_cli(tmp_path, monkeypatch):
    from cli import search

    out = str(tmp_path / "hits.jsonl")
    run_cli(
        search,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--terms", "cat,dog fish",
         "--threshold", "0.1", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 3
    for r in recs:
        for h in r["hits"]:
            assert h["end_sec"] >= h["start_sec"] >= 0
            assert 0 <= h["posterior"] <= 1.0001


def test_kws_cli_ctc(tmp_path, monkeypatch):
    """Keyword spotting with a CTC acoustic model (CTC-topology lattices)."""
    from cli import search, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "8",
         "--objective", "ctc"],
        monkeypatch,
    )
    out = str(tmp_path / "hits.jsonl")
    run_cli(
        search,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_mlp"),
         "--nn-arch", "mlp", "--nn-hidden", "32", "--nn-layers", "1",
         "--terms", "cat,dog", "--threshold", "0.05", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 3
    for r in recs:
        for h in r["hits"]:
            assert 0 <= h["posterior"] <= 1.0001


def test_decode_cli_consensus_and_kn(tmp_path, monkeypatch):
    """Lattice consensus (CN) + Kneser-Ney smoothing through the decode CLI."""
    from cli import decode

    out = str(tmp_path / "hyp_cn.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--consensus", "cn", "--lm-smoothing", "kn",
         "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3
    out2 = str(tmp_path / "hyp_mbr.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--num-components", "1", "--consensus", "mbr", "--out", out2],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out2)]) == 3


def test_train_ctc_then_ctc_decode_cli(tmp_path, monkeypatch):
    """Alignment-free path: train_nn --objective ctc (no GMM bootstrap) ->
    decode --ctc in word mode (CTC graph) and phone mode (greedy)."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "10",
         "--objective", "ctc"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "train_ctc_done" for m in metrics)

    ckpt = str(tmp_path / "run" / "nn_ctc_mlp")
    out = str(tmp_path / "ctc_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--am", "mlp", "--ctc", "--nn-ckpt", ckpt,
         "--nn-hidden", "32", "--nn-layers", "1", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 4

    out2 = str(tmp_path / "ctc_phones.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run3"),
         "--am", "mlp", "--ctc", "--nn-ckpt", ckpt, "--mode", "phone",
         "--nn-hidden", "32", "--nn-layers", "1", "--out", out2],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out2)]) == 4


def test_transcribe_cli(tmp_path, monkeypatch):
    from cli import transcribe

    out = str(tmp_path / "transcript.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 4  # 4 synthetic utterances separated by silence
    for i in range(1, len(lines)):
        assert lines[i]["start_s"] >= lines[i - 1]["end_s"] - 0.5
    assert all("words" in l for l in lines)
    for rec in lines:
        assert len(rec["word_times"]) == len(rec["words"])
        for (t0, t1), prev in zip(rec["word_times"], [None] + rec["word_times"]):
            assert rec["start_s"] - 0.01 <= t0 <= t1 <= rec["end_s"] + 0.5
            if prev is not None:
                assert t0 >= prev[0]  # word times are monotone


def test_transcribe_cli_ctm(tmp_path, monkeypatch):
    from cli import transcribe

    out = str(tmp_path / "t.jsonl")
    ctm = str(tmp_path / "t.ctm")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--out", out, "--ctm", ctm],
        monkeypatch,
    )
    rows = [l.split() for l in open(ctm)]
    n_words = sum(len(json.loads(l)["words"]) for l in open(out))
    assert len(rows) == n_words
    for r in rows:
        assert len(r) == 6  # utt chan start dur word conf
        assert float(r[3]) > 0
        assert 0.0 <= float(r[5]) <= 1.0


def test_transcribe_cli_nbest(tmp_path, monkeypatch):
    from cli import transcribe

    out = str(tmp_path / "transcript.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--nbest", "3", "--out", out],
        monkeypatch,
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 4
    for rec in lines:
        nb = rec["nbest"]
        assert 1 <= len(nb) <= 3
        logps = [h["logp"] for h in nb]
        assert logps == sorted(logps, reverse=True)


def test_stream_cli(tmp_path, monkeypatch, capsys):
    from cli import stream

    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--chunk-ms", "500"],
        monkeypatch,
    )
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    partials = [l for l in lines if "partial" in l]
    finals = [l for l in lines if "final" in l]
    assert len(partials) >= 2  # several chunks of a multi-second utterance
    assert len(finals) == 1
    # audio time advances monotonically across partial events
    ts = [l["t_audio_s"] for l in partials]
    assert ts == sorted(ts)


def test_eval_cli_fmllr(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--fmllr"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4


def test_eval_cli_mllr(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--mllr"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4


def test_eval_cli_vtln(tmp_path, monkeypatch):
    from cli import eval as eval_cli

    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--vtln"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4


def test_train_aed_then_decode_cli(tmp_path, monkeypatch):
    """Attention encoder-decoder smoke: train_nn --objective aed ->
    decode --aed (on-device beam search, phone mode)."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--hidden", "32", "--layers", "1", "--steps", "6",
         "--objective", "aed"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "train_aed_done" for m in metrics)

    out = str(tmp_path / "aed_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--aed", "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--mode", "phone", "--nn-hidden", "32", "--nn-layers", "1",
         "--aed-beam", "2", "--aed-max-tokens", "16", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3


def test_train_aed_chunked_then_decode_cli(tmp_path, monkeypatch):
    """Chunk-trained AED checkpoint decoded with the MATCHING chunk mask
    (decode --aed-chunk): restore + beam decode round-trip."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--hidden", "32", "--layers", "1", "--steps", "6",
         "--objective", "aed", "--aed-chunk", "4", "--spec-augment",
         "--mwer-steps", "3"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "mwer_done" for m in metrics)
    out = str(tmp_path / "aed_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--aed", "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--mode", "phone", "--nn-hidden", "32", "--nn-layers", "1",
         "--aed-chunk", "4", "--aed-beam", "2", "--aed-max-tokens", "16",
         "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3


def test_train_aed_bpe_then_decode_cli(tmp_path, monkeypatch):
    """Lexicon-free AED: train_nn --objective aed --bpe-merges ->
    decode --aed --bpe (open-vocabulary word mode)."""
    from cli import decode, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--hidden", "32", "--layers", "1", "--steps", "6",
         "--objective", "aed", "--bpe-merges", "20"],
        monkeypatch,
    )
    bpe_file = tmp_path / "run" / "bpe.json"
    assert bpe_file.exists()

    out = str(tmp_path / "aed_bpe_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--aed", "--bpe", str(bpe_file),
         "--nn-ckpt", str(tmp_path / "run" / "nn_aed_mlp"),
         "--mode", "word", "--nn-hidden", "32", "--nn-layers", "1",
         "--aed-beam", "2", "--aed-max-tokens", "16", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3


def test_train_lm_then_nnlm_rescore_cli(tmp_path, monkeypatch):
    """Neural-LM second pass: train_lm (reports held-out PPL vs the KN
    bigram baseline) -> decode --nnlm-rescore over lattice N-best."""
    from cli import decode, train_lm

    run_cli(
        train_lm,
        ["--synthetic", "12", "--run-dir", str(tmp_path / "run"),
         "--hidden", "16", "--layers", "1", "--steps", "40"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "train_nnlm_done"]
    assert done and done[0]["heldout_ppl"] > 0

    out = str(tmp_path / "nnlm_hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--mode", "word", "--num-components", "1",
         "--nnlm-rescore", str(tmp_path / "run" / "nnlm"),
         "--nnlm-nbest", "4", "--nbest", "2", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4 and all("nbest" in r for r in recs)
    # rescored N-best lists are sorted by combined score
    for r in recs:
        lps = [e["logp"] for e in r["nbest"]]
        assert lps == sorted(lps, reverse=True)


def test_train_gmm_cli_augmented(tmp_path, monkeypatch):
    """--speed-perturb triples the EM corpus; --aug-snr/--aug-gain perturb
    waveforms. The run must train end-to-end on the expanded corpus."""
    from cli import train_gmm

    run_cli(
        train_gmm,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--num-iters", "2",
         "--speed-perturb", "--aug-snr", "15,25", "--aug-gain=-3,3"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    em = [m for m in metrics if m.get("stage") == "em"]
    assert em, "EM never ran"
    # 4 utts x 3 speeds
    done = [m for m in metrics if m.get("stage") == "train_gmm_done"]
    assert done and done[0].get("utts", 12) == 12


def test_stream_cli_endpoint(tmp_path, monkeypatch, capsys):
    """--endpoint stops the streaming decode at the rule-1 trailing-silence
    endpoint instead of consuming the padded tail."""
    from cli import stream

    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--endpoint"],
        monkeypatch,
    )
    events = [json.loads(l) for l in capsys.readouterr().out.splitlines()
              if l.startswith("{")]
    finals = [e for e in events if "final" in e]
    assert finals and finals[0].get("endpoint") == "rule1_trailing_silence"
    # the endpoint fires inside the 2 s silence pad, before the audio ends
    assert finals[0]["endpoint_t_s"] < 4.0


def test_eval_cli_ctc(tmp_path, monkeypatch):
    """eval --ctc: DP-sharded lexicon-free BPE-CTC sweep with per-chunk
    resume (same protocol as the GMM sweep)."""
    from cli import eval as eval_cli
    from cli import train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    args = ["--synthetic", "4", "--run-dir", str(tmp_path / "ev"),
            "--ctc", "--bpe", str(tmp_path / "run" / "bpe.json"),
            "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_lstm"),
            "--nn-hidden", "16", "--nn-layers", "2"]
    run_cli(eval_cli, args, monkeypatch)
    metrics = [json.loads(l) for l in open(tmp_path / "ev" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4 and "wer" in ev[0]
    hyps1 = open(tmp_path / "ev" / "eval_hyps.jsonl").read()
    # rerun resumes from the hypothesis file: idempotent
    run_cli(eval_cli, args, monkeypatch)
    metrics2 = [json.loads(l) for l in open(tmp_path / "ev" / "metrics.jsonl")]
    assert [m for m in metrics2 if m.get("stage") == "eval"][-1]["utts"] == 4
    assert open(tmp_path / "ev" / "eval_hyps.jsonl").read() == hyps1


def test_rnnt_bpe_train_decode_stream_cli(tmp_path, monkeypatch, capsys):
    """Open-vocabulary BPE-RNNT through the CLIs: train_nn --objective rnnt
    --bpe-merges -> decode --rnnt --bpe (word WER) -> stream --rnnt --bpe
    (word partials)."""
    from cli import decode, stream, train_nn

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt", "--bpe-merges", "20"],
        monkeypatch,
    )
    capsys.readouterr()
    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "dec"),
         "--am", "lstm", "--rnnt", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--mode", "word", "--nn-hidden", "16", "--nn-layers", "2",
         "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2 and all(isinstance(r["hyp"], list) for r in recs)
    capsys.readouterr()
    run_cli(
        stream,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--rnnt",
         "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--nn-hidden", "16", "--nn-layers", "2"],
        monkeypatch,
    )
    events = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert sum("partial" in e for e in events) >= 3
    finals = [e for e in events if "final" in e]
    assert len(finals) == 1 and isinstance(finals[0]["final"], list)

    # contextual biasing inside the RNN-T beam (same ext_score hook as the
    # CTC prefix beam, composed through the monotonic beam search)
    (tmp_path / "phrases.txt").write_text("cat fish\n")
    out2 = str(tmp_path / "hyp_bias.jsonl")
    run_cli(
        decode,
        ["--synthetic", "2", "--run-dir", str(tmp_path / "dec2"),
         "--am", "lstm", "--rnnt", "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--mode", "word", "--nn-hidden", "16", "--nn-layers", "2",
         "--rnnt-beam", "3", "--bias", str(tmp_path / "phrases.txt"),
         "--bias-weight", "1.0", "--out", out2],
        monkeypatch,
    )
    recs2 = [json.loads(l) for l in open(out2)]
    assert len(recs2) == 2 and all(isinstance(r["hyp"], list) for r in recs2)
    # --bias without a beam is an explicit error, not a silent no-op
    with pytest.raises(SystemExit):
        run_cli(
            decode,
            ["--synthetic", "1", "--run-dir", str(tmp_path / "dec3"),
             "--am", "lstm", "--rnnt",
             "--bpe", str(tmp_path / "run" / "bpe.json"),
             "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
             "--mode", "word", "--nn-hidden", "16", "--nn-layers", "2",
             "--bias", str(tmp_path / "phrases.txt")],
            monkeypatch,
        )


def test_train_lm_transformer_cli(tmp_path, monkeypatch):
    """--nnlm-arch transformer trains the causal-attention LM, records the
    arch in nnlm.json, and decode --nnlm-rescore restores it transparently."""
    from cli import decode, train_lm

    run_cli(
        train_lm,
        ["--synthetic", "12", "--run-dir", str(tmp_path / "run"),
         "--nnlm-arch", "transformer",
         "--hidden", "16", "--layers", "1", "--steps", "40"],
        monkeypatch,
    )
    meta = json.load(open(tmp_path / "run" / "nnlm" / "nnlm.json"))
    assert meta["arch"] == "transformer"

    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "run2"),
         "--mode", "word", "--num-components", "1",
         "--nnlm-rescore", str(tmp_path / "run" / "nnlm"),
         "--nnlm-nbest", "4", "--nbest", "2", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4 and all("nbest" in r for r in recs)


def test_eval_cli_rnnt_and_aed(tmp_path, monkeypatch):
    """eval --rnnt / --aed: the lexicon-free transducer and attention
    families through the same DP-sharded sweep + resume protocol as --ctc."""
    from cli import eval as eval_cli
    from cli import train_nn

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "rn"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt", "--bpe-merges", "20"],
        monkeypatch,
    )
    args_r = ["--synthetic", "4", "--run-dir", str(tmp_path / "evr"),
              "--rnnt", "--bpe", str(tmp_path / "rn" / "bpe.json"),
              "--nn-ckpt", str(tmp_path / "rn" / "nn_rnnt_lstm"),
              "--nn-arch", "lstm", "--nn-hidden", "16", "--nn-layers", "2"]
    run_cli(eval_cli, args_r, monkeypatch)
    metrics = [json.loads(l) for l in open(tmp_path / "evr" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4 and "wer" in ev[0]
    hyps1 = open(tmp_path / "evr" / "eval_hyps.jsonl").read()
    run_cli(eval_cli, args_r, monkeypatch)  # resume is idempotent
    assert open(tmp_path / "evr" / "eval_hyps.jsonl").read() == hyps1

    # quality path: the batched monotonic beam through the same sweep
    run_cli(eval_cli,
            ["--synthetic", "4", "--run-dir", str(tmp_path / "evrb"),
             "--rnnt", "--rnnt-beam", "4",
             "--bpe", str(tmp_path / "rn" / "bpe.json"),
             "--nn-ckpt", str(tmp_path / "rn" / "nn_rnnt_lstm"),
             "--nn-arch", "lstm", "--nn-hidden", "16", "--nn-layers", "2"],
            monkeypatch)
    mb = [json.loads(l) for l in open(tmp_path / "evrb" / "metrics.jsonl")]
    evb = [m for m in mb if m.get("stage") == "eval"]
    assert evb and evb[0]["utts"] == 4 and "wer" in evb[0]

    run_cli(
        train_nn,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "ae"),
         "--hidden", "16", "--layers", "1", "--steps", "6",
         "--objective", "aed", "--bpe-merges", "20"],
        monkeypatch,
    )
    run_cli(
        eval_cli,
        ["--synthetic", "4", "--run-dir", str(tmp_path / "eva"),
         "--aed", "--bpe", str(tmp_path / "ae" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "ae" / "nn_aed_mlp"),
         "--nn-hidden", "16", "--nn-layers", "1",
         "--aed-beam", "2", "--aed-max-tokens", "12"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "eva" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4 and "wer" in ev[0]


def test_transcribe_cli_ctc_bpe(tmp_path, monkeypatch):
    """Lexicon-free long-audio transcription: --ctc --bpe decodes
    open-vocabulary words with timestamps from the greedy emission frames
    and posterior confidences; --ctm is emitted from the same spans."""
    from cli import train_nn, transcribe

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "8",
         "--objective", "ctc", "--bpe-merges", "20"],
        monkeypatch,
    )
    out = str(tmp_path / "t.jsonl")
    ctm = str(tmp_path / "t.ctm")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--ctc",
         "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_mlp"),
         "--nn-arch", "mlp", "--nn-hidden", "32", "--nn-layers", "1",
         "--out", out, "--ctm", ctm],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert recs
    for r in recs:
        assert r["end_s"] > r["start_s"]
        assert len(r["words"]) == len(r["confidences"]) == len(r["word_times"])
        for c in r["confidences"]:
            assert 0.0 <= c <= 1.0
        prev_start = r["start_s"]
        for t0, t1 in r["word_times"]:
            # monotone, inside the segment, end after start
            assert r["start_s"] - 1e-6 <= t0 <= r["end_s"] + 1e-6
            assert t1 > t0 - 1e-6 and t0 >= prev_start - 1e-6
            prev_start = t0
    n_words = sum(len(r["words"]) for r in recs)
    assert len(open(ctm).read().strip().splitlines()) == n_words
    # --nbest has no lattice on the lexicon-free path: explicit error
    with pytest.raises(SystemExit):
        run_cli(
            transcribe,
            ["--synthetic-demo", "--run-dir", str(tmp_path / "run3"),
             "--ctc", "--bpe", str(tmp_path / "run" / "bpe.json"),
             "--nn-ckpt", str(tmp_path / "run" / "nn_ctc_mlp"),
             "--nbest", "2"],
            monkeypatch,
        )


def test_transcribe_cli_rnnt(tmp_path, monkeypatch):
    """Long-audio transcription with an RNN-transducer: device-greedy decode
    per VAD segment, open-vocabulary words with --bpe, segment timestamps."""
    from cli import train_nn, transcribe

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "lstm", "--hidden", "16", "--layers", "2", "--steps", "6",
         "--objective", "rnnt", "--bpe-merges", "20"],
        monkeypatch,
    )
    out = str(tmp_path / "t.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run2"), "--rnnt",
         "--bpe", str(tmp_path / "run" / "bpe.json"),
         "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
         "--nn-arch", "lstm", "--nn-hidden", "16", "--nn-layers", "2",
         "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert recs
    for r in recs:
        assert r["end_s"] > r["start_s"] and isinstance(r["words"], list)
    # no frame alignment on the transducer path: --ctm is an explicit error
    with pytest.raises(SystemExit):
        run_cli(
            transcribe,
            ["--synthetic-demo", "--run-dir", str(tmp_path / "run3"),
             "--rnnt", "--bpe", str(tmp_path / "run" / "bpe.json"),
             "--nn-ckpt", str(tmp_path / "run" / "nn_rnnt_lstm"),
             "--ctm", str(tmp_path / "x.ctm")],
            monkeypatch,
        )


def test_transcribe_cli_diarize(tmp_path, monkeypatch):
    """--diarize tags every transcript segment with a speaker label from the
    per-recording i-vector clustering (known-K mode)."""
    from cli import transcribe

    out = str(tmp_path / "t.jsonl")
    run_cli(
        transcribe,
        ["--synthetic-demo", "--run-dir", str(tmp_path / "run"),
         "--num-components", "1", "--diarize", "--num-speakers", "2",
         "--diarize-components", "4", "--diarize-rank", "2", "--out", out],
        monkeypatch,
    )
    recs = [json.loads(l) for l in open(out)]
    assert recs
    spk = {r["speaker"] for r in recs}
    assert all("speaker" in r for r in recs)
    assert spk <= {0, 1, None} and (spk - {None})  # labels from known-K AHC
