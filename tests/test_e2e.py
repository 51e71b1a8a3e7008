"""End-to-end integration (SURVEY.md §4): tiny synthetic corpus, full
featurize -> flat start -> EM(+splitting) -> realign -> decode -> WER."""

import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import (
    BatchConfig,
    DecodeConfig,
    FrontendConfig,
    GmmConfig,
    TopologyConfig,
    TrainConfig,
)
from mogasr.data.synthetic import make_corpus
from mogasr.hmm.lexicon import synthetic_lexicon
from mogasr.hmm.topology import build_topology

FCFG = FrontendConfig()
BCFG = BatchConfig(batch_size=8, bucket_boundaries=(150, 250, 400))


@pytest.fixture(scope="module")
def setup():
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(16, words_per_utt=(2, 3), seed=42)
    triples = [(u.utt_id, u.wave, u.words) for u in utts]
    batches = pipe.featurize(triples, FCFG, BCFG)
    return lex, topo, batches


def test_featurize_shapes(setup):
    lex, topo, batches = setup
    assert sum(fb.size for fb in batches) == 16
    for fb in batches:
        assert fb.feats.shape[-1] == FCFG.feat_dim
        assert fb.feats.shape[0] == len(fb.utt_ids) or fb.feats.shape[0] == BCFG.batch_size


def test_full_loop_trains_and_decodes(setup):
    lex, topo, batches = setup
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=FCFG.feat_dim)
    tcfg = TrainConfig(num_em_iters=6)
    gmm, history = pipe.train_gmm(batches, lex, topo, gcfg, tcfg)
    assert gmm.n_components == 2
    # loglik improves over training (compare within same-K segments)
    assert history[1] >= history[0] - 1e-3
    assert history[-1] > history[0]

    metrics = pipe.evaluate(
        batches, gmm, lex, topo, DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    )
    # synthetic phones are nearly separable: decoding its own training corpus
    # must beat 30% WER by a wide margin
    assert metrics["wer"] < 0.3, metrics
    assert metrics["n_utts"] == 16


def test_held_out_generalization(setup):
    """Train on 16 utts, decode 8 UNSEEN utts — the honest WER claim."""
    lex, topo, batches = setup
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=FCFG.feat_dim)
    gmm, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=6))

    test_utts = make_corpus(8, words_per_utt=(2, 3), seed=4242)  # disjoint seed
    test_batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in test_utts], FCFG, BCFG
    )
    metrics = pipe.evaluate(
        test_batches, gmm, lex, topo,
        DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0),
    )
    assert metrics["wer"] < 0.4, metrics


def test_alignment_matches_synthesis_boundaries(setup):
    """Forced alignment recovers the known synthetic phone timing: frame-level
    phone agreement well above chance (config[2] quality gate)."""
    lex, topo, batches = setup
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=FCFG.feat_dim)
    gmm, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=6))

    utts = {u.utt_id: u for u in make_corpus(16, words_per_utt=(2, 3), seed=42)}
    pdf_to_phone = topo.pdf_to_phone()
    hop, fl = FCFG.frame_shift, FCFG.frame_length
    agree, total = 0, 0
    for fb in batches:
        _res, labels, _ = pipe.align_batch(fb, gmm, lex, topo)
        labels_np = np.asarray(labels)
        nf = np.asarray(fb.n_frames)
        for i, uid in enumerate(fb.utt_ids):
            u = utts[uid]
            for t in range(int(nf[i])):
                center = t * hop + fl // 2
                k = np.searchsorted(u.phone_bounds, center, side="right") - 1
                true_ph = u.phones[min(k, len(u.phones) - 1)]
                got_ph = lex.phones[pdf_to_phone[labels_np[i, t]]]
                agree += got_ph == true_ph
                total += 1
    assert total > 1000
    assert agree / total > 0.7, agree / total


def test_oov_handling(setup):
    lex, topo, _ = setup
    import pytest as _pytest

    with _pytest.raises(KeyError):
        lex.words_to_phone_ids(["cat", "qqq"])
    skipped = lex.words_to_phone_ids(["cat", "qqq"], oov="skip")
    as_sil = lex.words_to_phone_ids(["cat", "qqq"], oov="sil")
    only = lex.words_to_phone_ids(["cat"])
    assert len(as_sil) == len(skipped) + 1
    # sil cat sil qqq-dropped sil -> same phones as "cat" plus one extra sil
    assert len(skipped) == len(only) + 1


def test_baum_welch_training(setup):
    """Soft-EM (full Baum-Welch) path: loglik improves, decode still works."""
    lex, topo, batches = setup
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=FCFG.feat_dim)
    tcfg = TrainConfig(num_em_iters=5)
    gmm, history = pipe.train_gmm(batches, lex, topo, gcfg, tcfg, mode="baum-welch")
    # forward loglik (recorded from the E-step) improves over training
    assert history[-1] > history[0]
    metrics = pipe.evaluate(
        batches, gmm, lex, topo, DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    )
    assert metrics["wer"] < 0.3, metrics
