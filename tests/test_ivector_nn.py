"""I-vector-augmented hybrid NN training: feature append semantics and the
train -> decode CLI round trip with a matching extractor checkpoint."""

import json

import numpy as np
import jax.numpy as jnp

from mogasr.config import BatchConfig, FrontendConfig
from mogasr.data.synthetic import make_corpus
from mogasr.pipeline import append_ivectors, featurize


def test_append_ivectors_shapes_and_constancy():
    from mogasr.am.ivector import train_ivector_extractor, utterance_ivectors

    fcfg = FrontendConfig()
    utts = make_corpus(6, words_per_utt=(2, 3), seed=11)
    batches = featurize(
        [(u.utt_id, u.wave, u.words) for u in utts], fcfg, BatchConfig()
    )
    ex = train_ivector_extractor(batches, n_components=4, rank=3,
                                 ubm_iters=3, tv_iters=2)
    aug = append_ivectors(batches, ex)
    for fb, afb in zip(batches, aug):
        assert afb.feats.shape == (
            fb.feats.shape[0], fb.feats.shape[1], fb.feats.shape[2] + 3
        )
        # original features untouched; appended dims constant over frames
        np.testing.assert_array_equal(
            np.asarray(afb.feats[..., : fb.feats.shape[2]]),
            np.asarray(fb.feats),
        )
        tail = np.asarray(afb.feats[..., fb.feats.shape[2]:])
        np.testing.assert_allclose(
            tail, np.broadcast_to(tail[:, :1, :], tail.shape), atol=1e-6
        )
        # and they equal the extractor's (length-normalized) i-vectors
        vecs = utterance_ivectors(ex, fb.feats, fb.n_frames)
        np.testing.assert_allclose(tail[:, 0, :], vecs, atol=1e-5)
        norms = np.linalg.norm(vecs[: fb.size], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_train_nn_cli_ivector_then_decode(tmp_path, monkeypatch):
    from cli import decode, train_nn
    from tests.test_cli import run_cli

    run_cli(
        train_nn,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run"),
         "--arch", "mlp", "--hidden", "16", "--layers", "1", "--steps", "8",
         "--bootstrap-iters", "2", "--ivector-dim", "3",
         "--ivector-components", "4"],
        monkeypatch,
    )
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("stage") == "ivector_extractor" for m in metrics)
    out = str(tmp_path / "hyp.jsonl")
    run_cli(
        decode,
        ["--synthetic", "3", "--run-dir", str(tmp_path / "run2"),
         "--am", "mlp", "--nn-ckpt", str(tmp_path / "run" / "nn_mlp"),
         "--nn-hidden", "16", "--nn-layers", "1",
         "--ivector-ckpt", str(tmp_path / "run" / "ivector_extractor"),
         "--ivector-dim", "3", "--ivector-components", "4", "--out", out],
        monkeypatch,
    )
    assert len([json.loads(l) for l in open(out)]) == 3
