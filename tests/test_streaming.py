"""Streaming front end: chunked output must equal the offline front end
exactly, for arbitrary chunk sizes (SURVEY.md §7 chunk-boundary correctness)."""

import numpy as np
import pytest

from mogasr.config import FrontendConfig
from mogasr.data.synthetic import synth_utterance
from mogasr.frontend import numpy_ref as npref
from mogasr.frontend.streaming import StreamingFrontend

CFG = FrontendConfig(cmvn="none")


@pytest.fixture(scope="module")
def wave():
    return synth_utterance("s0", ["cat", "moon", "tree"], seed=11).wave


@pytest.mark.parametrize("chunk", [160, 1600, 4096, 100000])
def test_streaming_matches_offline(wave, chunk):
    ref = npref.extract_features_np(wave, CFG)
    sf = StreamingFrontend(CFG)
    outs = []
    for i in range(0, len(wave), chunk):
        outs.append(sf.process(wave[i : i + chunk]))
    outs.append(sf.finalize())
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_streaming_emits_incrementally(wave):
    sf = StreamingFrontend(CFG)
    first = sf.process(wave[:8000])  # 0.5 s
    assert first.shape[0] > 0  # emits before utterance end
    rest = np.concatenate([sf.process(wave[8000:]), sf.finalize()])
    ref = npref.extract_features_np(wave, CFG)
    np.testing.assert_allclose(np.concatenate([first, rest]), ref, atol=2e-4, rtol=2e-4)


def test_streaming_ragged_chunks(wave):
    ref = npref.extract_features_np(wave, CFG)
    rng = np.random.default_rng(0)
    sf = StreamingFrontend(CFG)
    outs, i = [], 0
    while i < len(wave):
        n = int(rng.integers(1, 3000))
        outs.append(sf.process(wave[i : i + n]))
        i += n
    outs.append(sf.finalize())
    np.testing.assert_allclose(np.concatenate(outs), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("use_energy", [False, True])
def test_streaming_plp_matches_offline(wave, use_energy):
    cfg = FrontendConfig(feature_type="plp", cmvn="none", use_energy=use_energy)
    ref = npref.extract_features_np(wave, cfg)
    sf = StreamingFrontend(cfg)
    outs = [sf.process(wave[i : i + 3000]) for i in range(0, len(wave), 3000)]
    outs.append(sf.finalize())
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=4e-4, rtol=4e-4)


def test_streaming_global_cmvn(wave):
    cfg = FrontendConfig(cmvn="global")
    base = npref.extract_features_np(wave, FrontendConfig(cmvn="none"))
    mean = base.mean(0)
    istd = 1.0 / np.sqrt(np.maximum(base.var(0), 1e-10))
    sf = StreamingFrontend(cfg, cmvn_mean=mean, cmvn_istd=istd)
    out = np.concatenate([sf.process(wave), sf.finalize()])
    np.testing.assert_allclose(out, (base - mean) * istd, atol=2e-3, rtol=2e-3)


def test_featurize_streaming_matches_offline():
    """pipeline.featurize_streaming == pipeline.featurize, per utterance."""
    import jax.numpy as jnp

    from mogasr import pipeline as pipe
    from mogasr.config import BatchConfig, FrontendConfig
    from mogasr.data.synthetic import make_corpus

    fcfg = FrontendConfig()  # utterance CMVN (deferred in streaming)
    bcfg = BatchConfig(batch_size=4, bucket_boundaries=(150, 250, 400))
    utts = make_corpus(6, words_per_utt=(2, 3), seed=31)
    triples = [(u.utt_id, u.wave, u.words) for u in utts]
    off = pipe.featurize(triples, fcfg, bcfg)
    st = pipe.featurize_streaming(triples, fcfg, bcfg, chunk_samples=4000)

    def by_id(batches):
        out = {}
        for fb in batches:
            feats = np.asarray(fb.feats)
            nf = np.asarray(fb.n_frames)
            for i, uid in enumerate(fb.utt_ids):
                out[uid] = feats[i, : nf[i]]
        return out

    o, s = by_id(off), by_id(st)
    assert set(o) == set(s)
    for uid in o:
        assert o[uid].shape == s[uid].shape
        np.testing.assert_allclose(o[uid], s[uid], atol=5e-4, rtol=5e-4)


def test_eval_cli_streaming(tmp_path):
    import json as _json
    import sys as _sys

    from cli import eval as eval_cli

    argv_save = _sys.argv
    _sys.argv = ["prog", "--synthetic", "4", "--run-dir", str(tmp_path / "run"),
                 "--num-components", "1", "--streaming"]
    try:
        eval_cli.main()
    finally:
        _sys.argv = argv_save
    metrics = [_json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    ev = [m for m in metrics if m.get("stage") == "eval"]
    assert ev and ev[0]["utts"] == 4
