"""Neural LM (mogasr.lm.neural): batching oracle, masking/padding
invariance, learns-a-toy-language (beats unigram PPL), N-best rescoring
prefers in-language hypotheses, save/load roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mogasr.config import TrainConfig
from mogasr.lm import neural as NL


@pytest.fixture(scope="module")
def toy_corpus():
    # A tiny deterministic phrase language: subject verb object.
    rng = np.random.default_rng(0)
    subj = ["cat", "dog", "bird"]
    verb = ["sees", "eats"]
    obj = ["fish", "corn"]
    sents = [
        [rng.choice(subj), rng.choice(verb), rng.choice(obj)]
        for _ in range(200)
    ]
    return sents


def test_lm_batch_layout():
    vocab = NL.LmVocab(("a", "b", "c"))
    inp, tgt, n = NL.lm_batch([[0, 2], [1]], vocab, u_max=4)
    assert inp.shape == tgt.shape == (2, 4)
    # input starts with <s>, then the sequence
    assert inp[0, 0] == vocab.bos and list(inp[0, 1:3]) == [0, 2]
    # target is the sequence then </s>
    assert list(tgt[0, :3]) == [0, 2, vocab.eos]
    assert n[0] == 3 and n[1] == 2
    # padding rows are eos (masked out by n)
    assert inp[1, 2] == vocab.eos


def test_encode_unk():
    vocab = NL.LmVocab(("cat", "dog"))
    assert vocab.encode(["cat", "zebra", "DOG"]) == [0, vocab.unk, 1]


def test_scorer_padding_invariance():
    """Total logp of a sequence must not depend on how far the batch is
    padded or what other rows contain."""
    vocab = NL.LmVocab(tuple("abcdef"))
    cfg = TrainConfig(nn_hidden=16, nn_layers=1, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg)
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(1))
    score = NL.make_nnlm_scorer(model, state.params)

    seq = [0, 3, 2]
    inp1, tgt1, n1 = NL.lm_batch([seq], vocab, u_max=4)
    inp2, tgt2, n2 = NL.lm_batch([seq, [1, 1, 1, 1, 1]], vocab, u_max=9)
    lp1 = np.asarray(score(jnp.asarray(inp1), jnp.asarray(tgt1), jnp.asarray(n1)))
    lp2 = np.asarray(score(jnp.asarray(inp2), jnp.asarray(tgt2), jnp.asarray(n2)))
    np.testing.assert_allclose(lp1[0], lp2[0], rtol=1e-5)


def test_learns_toy_language_beats_unigram(toy_corpus):
    train, held = toy_corpus[:160], toy_corpus[160:]
    vocab = NL.vocab_from_transcripts(train)
    cfg = TrainConfig(nn_hidden=32, nn_layers=1, lr=5e-3, num_nn_steps=300)
    model, params = NL.train_nnlm(train, vocab, cfg, batch_size=32)
    ppl = NL.nnlm_perplexity(model, params, vocab, held)

    # unigram baseline with the same +eos-token convention
    counts = {}
    total = 0
    for s in train:
        for w in s + ["</s>"]:
            counts[w] = counts.get(w, 0) + 1
            total += 1
    nll = 0.0
    n_tok = 0
    for s in held:
        for w in s + ["</s>"]:
            nll -= np.log(counts[w] / total)
            n_tok += 1
    unigram_ppl = float(np.exp(nll / n_tok))
    # positional structure (subject/verb/object slots) is invisible to the
    # unigram model; the LSTM must exploit it
    assert ppl < 0.8 * unigram_ppl, (ppl, unigram_ppl)


def test_rescoring_prefers_in_language(toy_corpus):
    train = toy_corpus[:160]
    vocab = NL.vocab_from_transcripts(train)
    cfg = TrainConfig(nn_hidden=32, nn_layers=1, lr=5e-3, num_nn_steps=300)
    model, params = NL.train_nnlm(train, vocab, cfg, batch_size=32)

    # two hypotheses with IDENTICAL first-pass scores: in-language word order
    # vs scrambled order of the same words
    nbest = [[
        (["fish", "sees", "cat"], -5.0),
        (["cat", "sees", "fish"], -5.0),
    ]]
    out = NL.rescore_nbest_nnlm(model, params, vocab, nbest, weight=1.0)
    assert out[0][0][0] == ["cat", "sees", "fish"]
    # scores are sorted descending
    assert out[0][0][1] >= out[0][1][1]


def test_save_load_roundtrip(tmp_path):
    vocab = NL.LmVocab(("x", "y", "z"))
    cfg = TrainConfig(nn_hidden=16, nn_layers=1, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg)
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(3))
    NL.save_nnlm(str(tmp_path / "lm"), model, state.params, vocab)
    model2, params2, vocab2 = NL.load_nnlm(str(tmp_path / "lm"))
    assert vocab2.tokens == vocab.tokens

    inp, tgt, n = NL.lm_batch([[0, 1, 2]], vocab, u_max=4)
    lp1 = NL.make_nnlm_scorer(model, state.params)(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(n)
    )
    lp2 = NL.make_nnlm_scorer(model2, params2)(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(n)
    )
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-6)


def test_rescore_empty_lists():
    vocab = NL.LmVocab(("a",))
    cfg = TrainConfig(nn_hidden=8, nn_layers=1, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg)
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(0))
    out = NL.rescore_nbest_nnlm(model, state.params, vocab, [[], []])
    assert out == [[], []]


# --------------------------------------------------------------------------
# Causal Transformer LM (same contract, GEMM-parallel over positions)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def transformer_lm(toy_corpus):
    train = toy_corpus[:160]
    vocab = NL.vocab_from_transcripts(train)
    cfg = TrainConfig(nn_hidden=48, nn_layers=2, lr=3e-3, num_nn_steps=300)
    model, params = NL.train_nnlm(
        train, vocab, cfg, batch_size=32, arch="transformer"
    )
    return vocab, model, params


def test_transformer_causality():
    """Changing a FUTURE input token must not change logits at earlier
    positions — the property that makes next-token training valid."""
    vocab = NL.LmVocab(tuple("abcdef"))
    cfg = TrainConfig(nn_hidden=16, nn_layers=2, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg, arch="transformer")
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(1))

    inp1, _, n = NL.lm_batch([[0, 1, 2, 3, 4]], vocab, u_max=6)
    inp2 = inp1.copy()
    inp2[0, 4] = 5  # position 4 differs; positions 0..3 must be unaffected
    l1 = np.asarray(model.apply(state.params, jnp.asarray(inp1), jnp.asarray(n)))
    l2 = np.asarray(model.apply(state.params, jnp.asarray(inp2), jnp.asarray(n)))
    np.testing.assert_allclose(l1[0, :4], l2[0, :4], rtol=1e-5, atol=1e-6)
    assert np.abs(l1[0, 4:] - l2[0, 4:]).max() > 1e-4


def test_transformer_scorer_padding_invariance():
    vocab = NL.LmVocab(tuple("abcdef"))
    cfg = TrainConfig(nn_hidden=16, nn_layers=1, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg, arch="transformer")
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(1))
    score = NL.make_nnlm_scorer(model, state.params)

    seq = [0, 3, 2]
    inp1, tgt1, n1 = NL.lm_batch([seq], vocab, u_max=4)
    inp2, tgt2, n2 = NL.lm_batch([seq, [1, 1, 1, 1, 1]], vocab, u_max=9)
    lp1 = np.asarray(score(jnp.asarray(inp1), jnp.asarray(tgt1), jnp.asarray(n1)))
    lp2 = np.asarray(score(jnp.asarray(inp2), jnp.asarray(tgt2), jnp.asarray(n2)))
    np.testing.assert_allclose(lp1[0], lp2[0], rtol=1e-5)


def test_transformer_learns_toy_language(toy_corpus, transformer_lm):
    held = toy_corpus[160:]
    train = toy_corpus[:160]
    vocab, model, params = transformer_lm
    ppl = NL.nnlm_perplexity(model, params, vocab, held)

    counts, total = {}, 0
    for s in train:
        for w in s + ["</s>"]:
            counts[w] = counts.get(w, 0) + 1
            total += 1
    nll, n_tok = 0.0, 0
    for s in held:
        for w in s + ["</s>"]:
            nll -= np.log(counts[w] / total)
            n_tok += 1
    unigram_ppl = float(np.exp(nll / n_tok))
    assert ppl < 0.8 * unigram_ppl, (ppl, unigram_ppl)


def test_transformer_rescoring_prefers_in_language(transformer_lm):
    vocab, model, params = transformer_lm
    nbest = [[
        (["fish", "sees", "cat"], -5.0),
        (["cat", "sees", "fish"], -5.0),
    ]]
    out = NL.rescore_nbest_nnlm(model, params, vocab, nbest, weight=1.0)
    assert out[0][0][0] == ["cat", "sees", "fish"]


def test_transformer_save_load_records_arch(tmp_path):
    vocab = NL.LmVocab(("x", "y", "z"))
    cfg = TrainConfig(nn_hidden=16, nn_layers=1, num_nn_steps=1)
    model = NL.build_nnlm(vocab, cfg, arch="transformer")
    state = NL.init_nnlm_train_state(model, cfg, jax.random.key(3))
    NL.save_nnlm(str(tmp_path / "lm"), model, state.params, vocab)
    model2, params2, vocab2 = NL.load_nnlm(str(tmp_path / "lm"))
    assert isinstance(model2, NL.TransformerLm)
    assert vocab2.tokens == vocab.tokens

    inp, tgt, n = NL.lm_batch([[0, 1, 2]], vocab, u_max=4)
    lp1 = NL.make_nnlm_scorer(model, state.params)(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(n)
    )
    lp2 = NL.make_nnlm_scorer(model2, params2)(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(n)
    )
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-6)
