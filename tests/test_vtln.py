"""VTLN tests: warp math, and two-pass warp estimation on a vocal-tract-
scaled synthetic speaker."""

import dataclasses

import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import BatchConfig, DecodeConfig, FrontendConfig
from mogasr.data.synthetic import make_corpus
from mogasr.eval.wer import corpus_wer
from mogasr.frontend.numpy_ref import mel_filterbank_matrix, vtln_warp_freq


def test_warp_identity_and_endpoints():
    cfg = FrontendConfig()
    np.testing.assert_array_equal(
        mel_filterbank_matrix(cfg),
        mel_filterbank_matrix(dataclasses.replace(cfg, vtln_warp=1.0)),
    )
    for warp in (0.88, 1.12):
        m = mel_filterbank_matrix(dataclasses.replace(cfg, vtln_warp=warp))
        assert np.abs(m - mel_filterbank_matrix(cfg)).max() > 0.1
        assert (m.sum(axis=0) > 0).all()  # every filter keeps support
    # mid-band scales by 1/warp, endpoints fixed
    f = np.array([20.0, 4000.0, 8000.0])
    w = vtln_warp_freq(f, 0.9, 100.0, 7400.0, 20.0, 8000.0)
    np.testing.assert_allclose(w[0], 20.0)
    np.testing.assert_allclose(w[1], 4000.0 / 0.9)
    np.testing.assert_allclose(w[2], 8000.0)


def test_two_pass_vtln_picks_compensating_warp(mini_system):
    """A 'speaker' synthesized with formants scaled x1.12: warp estimation
    must move off 1.0 and the adapted decode must not be worse than the
    unadapted one (usually strictly better)."""
    mlex, topo, gmm, vocab = mini_system
    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=8, bucket_boundaries=(250, 400))
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)

    test_utts = make_corpus(
        8, words_per_utt=(2, 3), seed=77, vocab=vocab, formant_scale=1.12
    )
    triples = [(u.utt_id, u.wave, u.words) for u in test_utts]
    refs = {u.utt_id: [w.lower() for w in u.words] for u in test_utts}

    def wer_of(hyp_map):
        r, h = [], []
        for uid, ref in refs.items():
            r.append(ref)
            h.append([w.lower() for w in hyp_map[uid]])
        return corpus_wer(r, h)[0]

    # unadapted decode
    graph = pipe.word_decode_graph(mlex, topo, dcfg)
    si = {}
    for fb in pipe.featurize(triples, fcfg, bcfg):
        out = pipe.decode_batch(fb, pipe.score_batch(fb.feats, gmm), graph, dcfg)
        for b in range(fb.size):
            si[fb.utt_ids[b]] = out[b]
    wer_si = wer_of(si)

    hyps, warps = pipe.decode_with_vtln(
        triples, gmm, mlex, topo, fcfg, bcfg, dcfg
    )
    assert len(warps) == 1  # one synthetic speaker ('synth' prefix)
    (warp,) = warps.values()
    assert warp != 1.0, warps
    wer_vtln = wer_of(hyps)
    assert wer_vtln <= wer_si, (wer_si, wer_vtln, warps)


def test_vtln_keeps_matched_speaker_at_identity(mini_system):
    """Unscaled audio from the training distribution: the estimator must
    keep warp == 1.0 (no spurious adaptation)."""
    mlex, topo, gmm, vocab = mini_system
    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=8, bucket_boundaries=(250, 400))
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    utts = make_corpus(6, words_per_utt=(2, 3), seed=99, vocab=vocab)
    triples = [(u.utt_id, u.wave, u.words) for u in utts]
    _hyps, warps = pipe.decode_with_vtln(triples, gmm, mlex, topo, fcfg, bcfg, dcfg)
    assert set(warps.values()) == {1.0}, warps
