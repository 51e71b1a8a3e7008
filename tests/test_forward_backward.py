"""Forward-backward tests: brute-force path-sum equivalence on toy graphs,
posterior normalization, soft-EM consistency with hard EM (SURVEY.md §4)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am import em
from mogasr.am.gmm import GmmSet
from mogasr.config import TopologyConfig
from mogasr.decoder import forward_backward as fb
from mogasr.hmm import graph as gr
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology


@pytest.fixture(scope="module")
def topo():
    lex = make_lexicon({"ab": ["a", "b"]})
    return build_topology(lex, TopologyConfig(states_per_phone=1, sil_states=1))


def brute_force_posteriors(emit, g):
    """Exact path-sum state posteriors by enumeration."""
    T, J = emit.shape[0], g.n_states
    trans = np.full((J, J), -np.inf)
    for j in range(J):
        trans[j, j] = np.logaddexp(trans[j, j], g.self_logp[j])
        if j + 1 < J:
            trans[j, j + 1] = np.logaddexp(trans[j, j + 1], g.adv_logp[j + 1])
        for j2 in range(J):
            trans[j, j2] = np.logaddexp(trans[j, j2], g.exit_logp[j] + g.enter_logp[j2])
    logZ = -np.inf
    post = np.full((T, J), -np.inf)
    for path in itertools.product(range(J), repeat=T):
        s = g.init_logp[path[0]] + emit[0, g.emit_id[path[0]]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + emit[t, g.emit_id[path[t]]]
        s += g.final_logp[path[-1]]
        if s < -1e20:
            continue
        logZ = np.logaddexp(logZ, s)
        for t in range(T):
            post[t, path[t]] = np.logaddexp(post[t, path[t]], s)
    return post - logZ, logZ


def run_fb(emit, g):
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    return fb.forward_backward(
        jnp.asarray(emit[None]), graphs, jnp.asarray([emit.shape[0]])
    )


def test_align_graph_matches_brute_force(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab"])  # 4 states
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((6, topo.n_pdfs)).astype(np.float32)
    ref_post, ref_logZ = brute_force_posteriors(emit, g)
    res = run_fb(emit, g)
    assert abs(float(res.loglik[0]) - ref_logZ) < 1e-3
    got = np.asarray(res.log_gamma[0])
    valid = ref_post > -1e15
    np.testing.assert_allclose(got[valid], ref_post[valid], atol=1e-3)


def test_loop_graph_matches_brute_force(topo, rng):
    g = gr.loop_graph(topo)
    emit = rng.standard_normal((4, topo.n_pdfs)).astype(np.float32)
    ref_post, ref_logZ = brute_force_posteriors(emit, g)
    res = run_fb(emit, g)
    assert abs(float(res.loglik[0]) - ref_logZ) < 1e-3
    got = np.asarray(res.log_gamma[0])
    valid = ref_post > -1e15
    np.testing.assert_allclose(got[valid], ref_post[valid], atol=1e-3)


def test_posteriors_normalize(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab", "ab"])
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((12, topo.n_pdfs)).astype(np.float32)
    res = run_fb(emit, g)
    gamma = np.exp(np.asarray(res.log_gamma[0]))
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-4)


def test_fb_loglik_upper_bounds_viterbi(topo, rng):
    from mogasr.decoder import viterbi as vit

    pids = topo.lexicon.words_to_phone_ids(["ab"])
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((8, topo.n_pdfs)).astype(np.float32)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    res_v = vit.viterbi(jnp.asarray(emit[None]), graphs, jnp.asarray([8]))
    res_f = run_fb(emit, g)
    assert float(res_f.loglik[0]) >= float(res_v.score[0]) - 1e-4


def test_pdf_posterior_collapse(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab"])
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((6, topo.n_pdfs)).astype(np.float32)
    res = run_fb(emit, g)
    graphs = gr.batch_graphs([g])
    post = fb.state_posteriors_to_pdf(
        res.log_gamma, jnp.asarray(graphs["emit_id"]), topo.n_pdfs
    )
    assert post.shape == (1, 6, topo.n_pdfs)
    np.testing.assert_allclose(np.asarray(post[0]).sum(-1), 1.0, atol=1e-4)


def test_soft_stats_match_hard_when_certain(rng):
    """One-hot posteriors must reproduce hard-EM stats exactly."""
    S, K, D, N = 4, 3, 5, 50
    g = GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, D))).astype(np.float32)),
    )
    feats = rng.standard_normal((N, D)).astype(np.float32)
    labels = rng.integers(0, S, N)
    onehot = np.zeros((N, S), np.float32)
    onehot[np.arange(N), labels] = 1.0
    hard = em.accumulate_stats(g, jnp.asarray(feats), jnp.asarray(labels))
    soft = em.accumulate_stats_soft(g, jnp.asarray(feats), jnp.asarray(onehot), state_chunk=3)
    np.testing.assert_allclose(np.asarray(soft.occ), np.asarray(hard.occ), atol=1e-3)
    np.testing.assert_allclose(np.asarray(soft.sx), np.asarray(hard.sx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(soft.sxx), np.asarray(hard.sxx), atol=2e-3)


def test_soft_em_improves_loglik(topo, rng):
    """Baum-Welch on a toy GMM-HMM: forward loglik increases per iteration."""
    pids = topo.lexicon.words_to_phone_ids(["ab"])
    g = gr.align_graph(topo, pids)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    D = 2
    feats = np.concatenate([
        rng.standard_normal((5, D)) + m for m in ([0, 0], [3, 3], [-3, 3], [0, 0])
    ]).astype(np.float32)
    T = feats.shape[0]
    gmm = GmmSet(
        jnp.ones((topo.n_pdfs, 1)),
        jnp.asarray(0.1 * rng.standard_normal((topo.n_pdfs, 1, D)).astype(np.float32)),
        jnp.ones((topo.n_pdfs, 1, D)),
    )
    from mogasr.am.gmm import gmm_loglik

    lls = []
    for _ in range(5):
        ll = gmm_loglik(jnp.asarray(feats), gmm)[None]  # [1, T, S]
        res = fb.forward_backward(ll, graphs, jnp.asarray([T]))
        lls.append(float(res.loglik[0]))
        post = fb.state_posteriors_to_pdf(
            res.log_gamma, graphs["emit_id"], topo.n_pdfs
        )[0]
        stats = em.accumulate_stats_soft(
            gmm, jnp.asarray(feats), post, state_chunk=3
        )
        gmm = em.m_step(gmm, stats)
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:])), lls
    assert lls[-1] > lls[0]
