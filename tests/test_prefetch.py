"""Prefetching input pipeline (mogasr.data.prefetch): order preservation,
bounded lookahead, exception propagation, device_put pass-through, and the
composed featurize_iter -> prefetch -> evaluate path matching the eager
featurize results exactly."""

import threading
import time

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.data.prefetch import device_put_batches, prefetch


def test_order_preserved_and_complete():
    items = list(range(57))
    assert list(prefetch(iter(items), depth=3)) == items
    assert list(prefetch(iter(items), depth=1)) == items
    assert list(prefetch(iter(items), depth=0)) == items  # passthrough


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("producer boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="producer boom"):
        next(it)


def test_bounded_lookahead():
    produced = []
    gate = threading.Event()

    def gen():
        for i in range(10):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    # give the producer time to run ahead; it must stop at depth + the one
    # item blocked in q.put (queue maxsize semantics)
    time.sleep(0.3)
    assert len(produced) <= 4, produced
    assert list(it) == list(range(10))
    gate.set()


def test_featurize_iter_prefetch_matches_eager():
    from mogasr.config import BatchConfig, FrontendConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.pipeline import featurize, featurize_iter

    corpus = [(u.utt_id, u.wave, u.words) for u in make_corpus(
        6, words_per_utt=(2, 3), seed=23)]
    fcfg, bcfg = FrontendConfig(), BatchConfig()
    eager = featurize(corpus, fcfg, bcfg)
    lazy = list(prefetch(device_put_batches(
        featurize_iter(corpus, fcfg, bcfg)), depth=2))
    assert len(lazy) == len(eager)
    for a, b in zip(lazy, eager):
        assert a.utt_ids == b.utt_ids
        np.testing.assert_allclose(np.asarray(a.feats), np.asarray(b.feats),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a.n_frames),
                                      np.asarray(b.n_frames))


def test_evaluate_accepts_prefetched_generator(trained_system):
    from mogasr.config import DecodeConfig
    from mogasr.pipeline import evaluate

    lex, topo, batches, gmm = trained_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    ref = evaluate(batches, gmm, lex, topo, dcfg)
    got = evaluate(prefetch(iter(batches), depth=2), gmm, lex, topo, dcfg)
    assert got == ref


def test_abandoned_consumer_releases_producer():
    started = threading.active_count()
    consumed = []

    def gen():
        for i in range(1000):
            yield i

    it = prefetch(gen(), depth=2)
    for i, x in enumerate(it):
        consumed.append(x)
        if i == 3:
            break
    it.close()  # abandon: the producer thread must exit, not pin the rest
    deadline = time.time() + 5
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started, "producer thread leaked"
    assert consumed == [0, 1, 2, 3]
