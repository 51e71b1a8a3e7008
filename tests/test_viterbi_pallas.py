"""Pallas Viterbi kernel (decoder/viterbi_pallas): EXACT equality with the
XLA scan path (path, entered, score — including tie-breaking) on align,
phone-loop, and word-loop graphs with ragged batches; padding invariance;
the skip-topology gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.config import TopologyConfig
from mogasr.hmm import graph as gr
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology
from mogasr.decoder import viterbi as vit
from mogasr.decoder.viterbi_pallas import viterbi_pallas


@pytest.fixture(scope="module")
def topo():
    lex = make_lexicon({"ab": ["a", "b"], "ba": ["b", "a"], "aa": ["a", "a"]})
    return build_topology(lex, TopologyConfig(states_per_phone=2, sil_states=1))


def _both(emit, graphs, n_frames, scale=1.0):
    ref = vit.viterbi(emit, graphs, n_frames, acoustic_scale=scale)
    got = viterbi_pallas(emit, graphs, n_frames, acoustic_scale=scale,
                         interpret=True)
    return ref, got


def _assert_equal(ref, got, n_frames):
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.path), np.asarray(ref.path))
    np.testing.assert_array_equal(np.asarray(got.entered),
                                  np.asarray(ref.entered))


@pytest.mark.parametrize("kind", ["align", "phone_loop", "word_loop"])
def test_exact_equality_ragged_batch(topo, kind):
    rng = np.random.default_rng(3)
    lex = topo.lexicon
    if kind == "align":
        gs = [gr.align_graph(topo, lex.words_to_phone_ids(["ab"], edge_sil=True)),
              gr.align_graph(topo, lex.words_to_phone_ids(["ab", "ba"])),
              gr.align_graph(topo, lex.words_to_phone_ids(["aa"]))]
    elif kind == "phone_loop":
        gs = [gr.loop_graph(topo)] * 3
    else:
        tokens = [(w, lex.words_to_phone_ids([w])) for w in lex.words]
        gs = [gr.loop_graph(topo, tokens=tokens)] * 3
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs(gs).items()}
    T = 14
    emit = jnp.asarray(
        rng.standard_normal((3, T, topo.n_pdfs)).astype(np.float32) * 2)
    n_frames = jnp.asarray([T, 9, 4])
    ref, got = _both(emit, graphs, n_frames, scale=0.7)
    _assert_equal(ref, got, n_frames)


def test_padding_invariance(topo):
    rng = np.random.default_rng(5)
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g, g]).items()}
    T = 10
    emit = rng.standard_normal((2, T, topo.n_pdfs)).astype(np.float32)
    n_frames = jnp.asarray([6, T])
    base = viterbi_pallas(jnp.asarray(emit), graphs, n_frames,
                          interpret=True)
    trashed = emit.copy()
    trashed[0, 6:] = rng.standard_normal(trashed[0, 6:].shape) * 50
    got = viterbi_pallas(jnp.asarray(trashed), graphs, n_frames,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(base.score),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.path),
                                  np.asarray(base.path))


def test_no_backtrace_scores_only(topo):
    rng = np.random.default_rng(7)
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    emit = jnp.asarray(rng.standard_normal((1, 8, topo.n_pdfs)).astype(np.float32))
    nf = jnp.asarray([8])
    ref = vit.viterbi(emit, graphs, nf, with_backtrace=False)
    got = viterbi_pallas(emit, graphs, nf, with_backtrace=False,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score),
                               rtol=1e-6)


def test_skip_topology_rejected(topo):
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    graphs["skip_logp"] = jnp.zeros_like(graphs["self_logp"])
    emit = jnp.zeros((1, 4, topo.n_pdfs))
    with pytest.raises(NotImplementedError):
        viterbi_pallas(emit, graphs, jnp.asarray([4]), interpret=True)
