"""Online (chunked) decoder tests: exact equivalence with offline Viterbi."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig
from mogasr.decoder import viterbi as vit
from mogasr.decoder.online import OnlineDecoder
from mogasr.hmm import graph as gr


@pytest.fixture(scope="module")
def setup(trained_system):
    lex, topo, batches, gmm = trained_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    fb = batches[0]
    scores = pipe.score_batch(fb.feats, gmm)
    graphs_np = gr.batch_graphs([graph] * scores.shape[0])
    graphs = {k: jnp.asarray(v) for k, v in graphs_np.items()}
    return graph, graphs_np, graphs, fb, scores


@pytest.mark.parametrize("chunks", [[13, 7, 50, 400], [1, 399], [250, 250]])
def test_online_matches_offline(setup, chunks):
    graph, graphs_np, graphs, fb, scores = setup
    T = scores.shape[1]
    assert sum(chunks) >= T

    off = vit.viterbi(scores, graphs, fb.n_frames, acoustic_scale=1.0)

    dec = OnlineDecoder(graphs, acoustic_scale=1.0)
    n_frames = np.asarray(fb.n_frames)
    off_t = 0
    for tc in chunks:
        tc = min(tc, T - off_t)
        if tc <= 0:
            break
        n_valid = np.clip(n_frames - off_t, 0, tc)
        dec.process(scores[:, off_t : off_t + tc], n_valid)
        off_t += tc

    path, entered, score = dec.finalize()
    off_path = np.asarray(off.path)
    off_entered = np.asarray(off.entered)
    B = fb.size
    for b in range(B):
        n = int(n_frames[b])
        np.testing.assert_array_equal(path[b, :n], off_path[b, :n])
        np.testing.assert_array_equal(entered[b, :n], off_entered[b, :n])
    np.testing.assert_allclose(
        score[:B], np.asarray(off.score)[:B], rtol=0, atol=1e-3
    )


def test_online_tokens_match_offline(setup):
    graph, graphs_np, graphs, fb, scores = setup
    off = vit.viterbi(scores, graphs, fb.n_frames, acoustic_scale=1.0)
    off_toks = vit.path_to_tokens(off, graph.labels, graphs_np["chain_id"])

    dec = OnlineDecoder(graphs, acoustic_scale=1.0)
    n_frames = np.asarray(fb.n_frames)
    T = scores.shape[1]
    for t0 in range(0, T, 37):
        tc = min(37, T - t0)
        dec.process(scores[:, t0 : t0 + tc], np.clip(n_frames - t0, 0, tc))
    path, entered, _ = dec.finalize()
    # pad the host path to [B, T] so path_to_tokens sees the same shape
    padded = np.full((path.shape[0], T), -1, np.int64)
    padded[:, : path.shape[1]] = path
    ent_p = np.zeros((path.shape[0], T), bool)
    ent_p[:, : entered.shape[1]] = entered
    res = SimpleNamespace(path=padded, entered=ent_p)
    on_toks = vit.path_to_tokens(res, graph.labels, graphs_np["chain_id"])
    assert on_toks[: fb.size] == off_toks[: fb.size]


def test_partial_prefix_is_consistent(setup):
    """partial() mid-stream: decoded tokens form a plausible prefix — after
    consuming ALL frames, partial() and finalize() agree except possibly the
    final-weight tie-break on the last state."""
    graph, graphs_np, graphs, fb, scores = setup
    n_frames = np.asarray(fb.n_frames)
    dec = OnlineDecoder(graphs, acoustic_scale=1.0)
    T = scores.shape[1]
    half = T // 2
    dec.process(scores[:, :half], np.clip(n_frames, 0, half))
    p_path, p_ent, p_score = dec.partial()
    assert p_path.shape[1] == half
    assert np.isfinite(p_score[: fb.size]).all()
    dec.process(scores[:, half:], np.clip(n_frames - half, 0, T - half))
    f_path, _, f_score = dec.finalize()
    assert f_path.shape[1] == T
    assert np.isfinite(f_score[: fb.size]).all()
