"""BPE subword units: roundtrip/merge properties and lexicon-free CTC
word recognition end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr.data.bpe import BOUNDARY, Bpe, train_bpe


def test_bpe_roundtrip_and_merges():
    corpus = [["cat", "fish"], ["cat", "dog"], ["fish", "cat"], ["dog"]] * 5
    bpe = train_bpe(corpus, n_merges=20)
    # frequent words collapse into few units
    assert len(bpe.encode_word("cat")) <= 2
    # exact roundtrip through ids
    for words in (["cat", "fish", "dog"], ["dog", "cat"]):
        assert bpe.decode(bpe.encode(words)) == words
    # unseen word over a seen alphabet still encodes and roundtrips
    assert bpe.decode(bpe.encode(["gato"])) == ["gato"]


def test_bpe_intermediate_merge_products_are_units():
    """Regression: 'abc' merges a+b then ab+c▁, leaving no corpus occurrence
    of the intermediate 'ab' — an unseen word ('abx') whose merge replay
    stops there must still encode and roundtrip exactly."""
    bpe = train_bpe([["abc"]] * 10, n_merges=5)
    assert "ab" in bpe.units
    # 'abb' replays merge a+b then stops at the intermediate 'ab' (pre-fix:
    # 'ab' was missing from the inventory and silently skipped -> 'b')
    assert bpe.decode(bpe.encode(["abb"])) == ["abb"]
    assert bpe.decode(bpe.encode(["cab"])) == ["cab"]


def test_bpe_boundary_marks_words():
    bpe = train_bpe([["ab"]], n_merges=0)
    units = bpe.encode_word("ab")
    assert units[-1].endswith(BOUNDARY)
    assert bpe.decode(bpe.encode(["ab", "ab"])) == ["ab", "ab"]


def test_bpe_rnnt_trains_and_decodes_units():
    """The transducer twin: train_rnnt_bpe on subword targets, device greedy
    decode roundtrips through bpe.decode to word lists (smoke-level: tiny
    model/steps; quality gates live in the CTC-BPE and RNN-T suites)."""
    from mogasr import pipeline as pipe
    from mogasr.am.rnnt import rnnt_greedy_decode_device
    from mogasr.config import BatchConfig, FrontendConfig, TrainConfig
    from mogasr.data.synthetic import make_corpus

    utts = make_corpus(4, words_per_utt=(2, 2), seed=3)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        FrontendConfig(), BatchConfig(batch_size=4, bucket_boundaries=(250, 400)),
    )
    transcripts = [fb.words[b] for fb in batches for b in range(fb.size)]
    bpe = train_bpe(transcripts, n_merges=20)
    tcfg = TrainConfig(nn_hidden=32, nn_layers=2, lr=3e-3, num_nn_steps=12)
    model, params = pipe.train_rnnt_bpe(batches, bpe, tcfg)
    assert model.n_labels == bpe.n_units
    fb = batches[0]
    out = rnnt_greedy_decode_device(model, params, fb.feats, fb.n_frames)
    for seq in out[: fb.size]:
        words = bpe.decode(seq)
        assert isinstance(words, list)


def test_bpe_ctc_lexicon_free_word_recognition():
    """Train CTC on BPE targets, decode greedily, join units to words —
    word recognition with NO lexicon and NO decode graph."""
    from mogasr import pipeline as pipe
    from mogasr.am import ctc as C
    from mogasr.config import BatchConfig, FrontendConfig, TrainConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.eval.wer import corpus_wer

    vocab = ["fish", "cat", "see", "sun", "tree", "dog"]
    fcfg = FrontendConfig()
    utts = make_corpus(24, words_per_utt=(2, 3), seed=7, vocab=vocab)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    transcripts = [fb.words[b] for fb in batches for b in range(fb.size)]
    bpe = train_bpe(transcripts, n_merges=40)

    tcfg = TrainConfig(nn_hidden=128, nn_layers=2, nn_context=3, lr=3e-3,
                       num_nn_steps=260)
    model, params = pipe.train_ctc_bpe(batches, bpe, tcfg, arch="mlp")

    refs, hyps = [], []
    for fb in batches:
        logits = model.apply(params, fb.feats, fb.n_frames)
        out = C.ctc_greedy_decode(logits, fb.n_frames)
        for b in range(fb.size):
            refs.append([w.lower() for w in fb.words[b]])
            hyps.append(bpe.decode(out[b]))
    wer, _ = corpus_wer(refs, hyps)
    assert wer < 0.25, wer


def test_decode_with_spans_matches_decode():
    from mogasr.data.bpe import train_bpe

    bpe = train_bpe([["fish", "cat"], ["sunny", "cat"]], n_merges=10)
    ids = bpe.encode(["sunny", "fish", "cat"])
    spans = bpe.decode_with_spans(ids)
    assert [w for w, _a, _b in spans] == bpe.decode(ids)
    # spans tile the id sequence in order without overlap
    last = -1
    for _w, a, b in spans:
        assert a == last + 1 and b >= a
        last = b
    assert last == len(ids) - 1
