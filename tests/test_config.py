"""Config system: JSON round-trip, overrides, derived properties."""

import numpy as np

from mogasr.config import (
    BatchConfig, FrontendConfig, GmmConfig, PipelineConfig, override,
)


def test_json_roundtrip():
    cfg = PipelineConfig(
        frontend=FrontendConfig(n_mels=23, feature_type="fbank"),
        gmm=GmmConfig(n_states=42),
        batch=BatchConfig(bucket_boundaries=(10, 20)),
    )
    back = PipelineConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.frontend.n_mels == 23
    assert back.batch.bucket_boundaries == (10, 20)


def test_override():
    f = FrontendConfig()
    f2 = override(f, n_mels=80)
    assert f2.n_mels == 80 and f.n_mels == 40


def test_derived_properties():
    f = FrontendConfig()
    assert f.frame_length == 400 and f.frame_shift == 160
    assert f.feat_dim == 39  # 13 ceps x (1 + 2 deltas)
    fb = FrontendConfig(feature_type="fbank", delta_order=1, n_mels=24)
    assert fb.feat_dim == 48


def test_lazy_public_api():
    import mogasr

    assert callable(mogasr.extract_features)
    assert callable(mogasr.corpus_wer)
    assert callable(mogasr.viterbi)
    assert callable(mogasr.forward_backward)
    try:
        mogasr.nope
        assert False
    except AttributeError:
        pass
