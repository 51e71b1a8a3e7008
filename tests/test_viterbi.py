"""Viterbi tests: brute-force path enumeration on a toy HMM, alignment
recovery on synthetic data structure, beam==inf equivalence (SURVEY.md §4)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.config import TopologyConfig
from mogasr.hmm import graph as gr
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology
from mogasr.decoder import viterbi as vit


@pytest.fixture(scope="module")
def topo():
    lex = make_lexicon({"ab": ["a", "b"], "ba": ["b", "a"]})
    return build_topology(lex, TopologyConfig(states_per_phone=1, sil_states=1))


def brute_force_best(emit, g):
    """Enumerate all paths through a Graph (small J, T only)."""
    T = emit.shape[0]
    J = g.n_states
    best_score, best_path = -np.inf, None
    # transition matrix incl. loop-state epsilon paths
    trans = np.full((J, J), float(gr.NEG_INF))
    for j in range(J):
        trans[j, j] = max(trans[j, j], g.self_logp[j])
        if j + 1 < J:
            trans[j, j + 1] = max(trans[j, j + 1], g.adv_logp[j + 1])
        for j2 in range(J):
            via_loop = g.exit_logp[j] + g.enter_logp[j2]
            trans[j, j2] = max(trans[j, j2], via_loop)
    for path in itertools.product(range(J), repeat=T):
        s = g.init_logp[path[0]] + emit[0, g.emit_id[path[0]]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + emit[t, g.emit_id[path[t]]]
        s += g.final_logp[path[-1]]
        if s > best_score:
            best_score, best_path = s, path
    return best_score, best_path


def run_viterbi(emit, g, beam=0.0):
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items() if k != "n_states"}
    graphs["n_states"] = jnp.asarray([g.n_states])
    res = vit.viterbi(
        jnp.asarray(emit[None]), graphs, jnp.asarray([emit.shape[0]]), beam=beam
    )
    return float(res.score[0]), tuple(int(x) for x in np.asarray(res.path[0]))


def test_align_graph_matches_brute_force(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab"], edge_sil=True)  # sil a b sil
    g = gr.align_graph(topo, pids)
    assert g.n_states == 4
    emit = rng.standard_normal((6, topo.n_pdfs)).astype(np.float32)
    ref_score, ref_path = brute_force_best(emit, g)
    score, path = run_viterbi(emit, g)
    assert abs(score - ref_score) < 1e-3
    assert path == ref_path


def test_loop_graph_matches_brute_force(topo, rng):
    g = gr.loop_graph(topo)  # free phone decode: chains sil, a, b
    emit = rng.standard_normal((5, topo.n_pdfs)).astype(np.float32) * 2
    ref_score, ref_path = brute_force_best(emit, g)
    score, path = run_viterbi(emit, g)
    assert abs(score - ref_score) < 1e-3
    assert path == ref_path


def test_word_loop_graph_matches_brute_force(topo, rng):
    lex = topo.lexicon
    tokens = [(w, lex.word_phone_ids(w)) for w in lex.words]
    tokens.append(("<sil>", [lex.sil_id]))
    g = gr.loop_graph(topo, tokens=tokens, insertion_penalty=0.5)
    emit = rng.standard_normal((5, topo.n_pdfs)).astype(np.float32) * 2
    ref_score, ref_path = brute_force_best(emit, g)
    score, path = run_viterbi(emit, g)
    assert abs(score - ref_score) < 1e-3
    assert path == ref_path


def test_beam_inf_equals_exact(topo, rng):
    g = gr.loop_graph(topo)
    emit = rng.standard_normal((20, topo.n_pdfs)).astype(np.float32) * 3
    s_exact, p_exact = run_viterbi(emit, g, beam=0.0)
    s_wide, p_wide = run_viterbi(emit, g, beam=1e9)
    assert abs(s_exact - s_wide) < 1e-3
    assert p_exact == p_wide


def test_forced_alignment_is_monotone(topo, rng):
    """Alignment path must be nondecreasing and cover all states."""
    pids = topo.lexicon.words_to_phone_ids(["ab", "ba"])
    g = gr.align_graph(topo, pids)
    T = 30
    emit = rng.standard_normal((T, topo.n_pdfs)).astype(np.float32)
    score, path = run_viterbi(emit, g)
    diffs = np.diff(np.asarray(path))
    assert np.all((diffs == 0) | (diffs == 1))
    assert path[0] == 0 and path[-1] == g.n_states - 1


def test_padding_frames_ignored(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab"])
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((8, topo.n_pdfs)).astype(np.float32)
    s1, p1 = run_viterbi(emit, g)
    # pad with garbage frames beyond n_frames
    emit_pad = np.concatenate([emit, 100 * np.ones((4, topo.n_pdfs), np.float32)])
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    res = vit.viterbi(jnp.asarray(emit_pad[None]), graphs, jnp.asarray([8]))
    assert abs(float(res.score[0]) - s1) < 1e-3
    assert tuple(int(x) for x in np.asarray(res.path[0, :8])) == p1
    assert np.all(np.asarray(res.path[0, 8:]) == -1)


def test_batched_mixed_graphs(topo, rng):
    """Different-size graphs padded into one batch give per-utt answers."""
    g1 = gr.align_graph(topo, topo.lexicon.words_to_phone_ids(["ab"]))
    g2 = gr.align_graph(topo, topo.lexicon.words_to_phone_ids(["ab", "ba"]))
    e1 = rng.standard_normal((7, topo.n_pdfs)).astype(np.float32)
    e2 = rng.standard_normal((12, topo.n_pdfs)).astype(np.float32)
    s1, p1 = run_viterbi(e1, g1)
    s2, p2 = run_viterbi(e2, g2)
    batch = gr.batch_graphs([g1, g2])
    graphs = {k: jnp.asarray(v) for k, v in batch.items()}
    emit = np.zeros((2, 12, topo.n_pdfs), np.float32)
    emit[0, :7] = e1
    emit[1] = e2
    res = vit.viterbi(jnp.asarray(emit), graphs, jnp.asarray([7, 12]))
    assert abs(float(res.score[0]) - s1) < 1e-3
    assert abs(float(res.score[1]) - s2) < 1e-3
    assert tuple(int(x) for x in np.asarray(res.path[0, :7])) == p1
    assert tuple(int(x) for x in np.asarray(res.path[1])) == p2


def test_path_to_pdfs(topo, rng):
    pids = topo.lexicon.words_to_phone_ids(["ab"])
    g = gr.align_graph(topo, pids)
    emit = rng.standard_normal((8, topo.n_pdfs)).astype(np.float32)
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g]).items()}
    res = vit.viterbi(jnp.asarray(emit[None]), graphs, jnp.asarray([8]))
    pdfs = np.asarray(vit.path_to_pdfs(res, graphs))
    path = np.asarray(res.path[0])
    for t in range(8):
        assert pdfs[0, t] == g.emit_id[path[t]]
