"""Pallas forward-backward (decoder/fb_pallas): float-tolerance equality
with the XLA path (log_gamma on valid frames + loglik) on align and loop
graphs with ragged batches; posterior normalization; padding invariance;
skip-topology gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.config import TopologyConfig
from mogasr.hmm import graph as gr
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology
from mogasr.decoder import forward_backward as fbd
from mogasr.decoder.fb_pallas import forward_backward_pallas


@pytest.fixture(scope="module")
def topo():
    lex = make_lexicon({"ab": ["a", "b"], "ba": ["b", "a"]})
    return build_topology(lex, TopologyConfig(states_per_phone=2, sil_states=1))


@pytest.mark.parametrize("kind", ["align", "loop"])
def test_matches_xla_fb(topo, kind):
    rng = np.random.default_rng(2)
    lex = topo.lexicon
    if kind == "align":
        gs = [gr.align_graph(topo, lex.words_to_phone_ids(["ab"], edge_sil=True)),
              gr.align_graph(topo, lex.words_to_phone_ids(["ba"])),
              gr.align_graph(topo, lex.words_to_phone_ids(["ab", "ba"]))]
    else:
        gs = [gr.loop_graph(topo)] * 3
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs(gs).items()}
    T = 12
    emit = jnp.asarray(
        rng.standard_normal((3, T, topo.n_pdfs)).astype(np.float32))
    n_frames = jnp.asarray([T, 8, 5])

    ref = fbd.forward_backward(emit, graphs, n_frames, acoustic_scale=0.8)
    got = forward_backward_pallas(emit, graphs, n_frames,
                                  acoustic_scale=0.8, interpret=True)
    np.testing.assert_allclose(np.asarray(got.loglik),
                               np.asarray(ref.loglik), rtol=1e-5, atol=1e-5)
    for b, n in enumerate(np.asarray(n_frames)):
        r = np.asarray(ref.log_gamma[b, :n])
        g = np.asarray(got.log_gamma[b, :n])
        # compare where the posterior is non-negligible (NEG_INF zones can
        # differ by the -1e30 arithmetic path without meaning anything)
        sel = r > -30
        np.testing.assert_allclose(g[sel], r[sel], rtol=1e-4, atol=1e-4)
        # and both agree on what is negligible
        assert (np.asarray(got.log_gamma[b, :n])[~sel] < -25).all()


def test_posteriors_normalize(topo):
    rng = np.random.default_rng(4)
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    emit = jnp.asarray(rng.standard_normal((1, 9, topo.n_pdfs)).astype(np.float32))
    nf = jnp.asarray([9])
    got = forward_backward_pallas(emit, graphs, nf, interpret=True)
    gamma = np.exp(np.asarray(got.log_gamma[0, :9]))
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, rtol=1e-4)


def test_padding_invariance(topo):
    rng = np.random.default_rng(6)
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    T = 10
    emit = rng.standard_normal((1, T, topo.n_pdfs)).astype(np.float32)
    nf = jnp.asarray([6])
    base = forward_backward_pallas(jnp.asarray(emit), graphs, nf,
                                   interpret=True)
    trashed = emit.copy()
    trashed[0, 6:] = rng.standard_normal(trashed[0, 6:].shape) * 40
    got = forward_backward_pallas(jnp.asarray(trashed), graphs, nf,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got.loglik),
                               np.asarray(base.loglik), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.log_gamma[0, :6]),
                               np.asarray(base.log_gamma[0, :6]), rtol=1e-6)


def test_skip_rejected(topo):
    g = gr.loop_graph(topo)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    graphs["skip_logp"] = jnp.zeros_like(graphs["self_logp"])
    with pytest.raises(NotImplementedError):
        forward_backward_pallas(jnp.zeros((1, 4, topo.n_pdfs)), graphs,
                                jnp.asarray([4]), interpret=True)
