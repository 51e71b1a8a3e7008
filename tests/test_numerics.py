"""Numerics guards: decode decisions invariant to bf16 scoring, no NaNs
through the pipeline under jax_debug_nans (SURVEY.md §5 non-determinism /
sanitizer row), global CMVN stats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig, FrontendConfig

FCFG = FrontendConfig()


@pytest.fixture(scope="module")
def system(trained_system):
    return trained_system


def test_bf16_scoring_preserves_decode_decisions(system):
    """bf16 scorer noise (~0.1 nats on ~100-nat margins) must not change the
    decoded words — the 'matched WER' guarantee for the bf16 throughput path."""
    from mogasr.am.gmm_pallas import gmm_loglik_batched

    lex, topo, batches, gmm = system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    for fb in batches[:1]:
        s32 = gmm_loglik_batched(fb.feats, gmm, tile_m=64, compute_dtype="float32")
        s16 = gmm_loglik_batched(fb.feats, gmm, tile_m=64, compute_dtype="bfloat16")
        h32 = pipe.decode_batch(fb, s32, graph, dcfg)
        h16 = pipe.decode_batch(fb, s16, graph, dcfg)
        assert h32 == h16


def test_no_nans_in_pipeline(system):
    """Full scoring+decode under jax_debug_nans: any NaN raises immediately."""
    lex, topo, batches, gmm = system
    with jax.debug_nans(True):
        fb = batches[0]
        scores = pipe.score_batch(fb.feats, gmm)
        graph = pipe.word_decode_graph(lex, topo, DecodeConfig())
        pipe.decode_batch(fb, scores, graph, DecodeConfig(acoustic_scale=1.0))


def test_global_cmvn_stats(system):
    lex, topo, batches, gmm = system
    mean, istd = pipe.compute_global_cmvn(batches)
    assert mean.shape == (FCFG.feat_dim,)
    # features are already per-utterance CMVN'd, so global stats ~ (0, 1)
    np.testing.assert_allclose(mean, 0.0, atol=0.1)
    np.testing.assert_allclose(1.0 / istd, 1.0, atol=0.15)


def test_int8_scoring_preserves_decode_decisions(system):
    """int8 quantized scoring must keep the decoded words on the trained
    system (same guarantee as bf16, tested end-to-end)."""
    from mogasr.am.gmm_pallas import gmm_loglik_batched

    lex, topo, batches, gmm = system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    for fb in batches[:1]:
        s32 = gmm_loglik_batched(fb.feats, gmm, tile_m=64, compute_dtype="float32")
        s8 = gmm_loglik_batched(fb.feats, gmm, tile_m=64, compute_dtype="int8")
        assert pipe.decode_batch(fb, s32, graph, dcfg) == pipe.decode_batch(fb, s8, graph, dcfg)
