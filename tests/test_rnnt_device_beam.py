"""On-device batched RNN-T beam == the per-utterance reference beam.

Round 5 (VERDICT r4 item 2): make_rnnt_beam_device runs the ENTIRE
monotonic beam — encoder, expansion rounds, prefix merging (logaddexp),
done-threshold pruning, top-K — as one jitted lax.scan, with shallow
fusion and contextual biasing as precomputed-table row gathers. These
tests pin it against rnnt_beam_decode (the dict-based per-utterance
reference) on short utterances where the f32-vs-f64 score-accumulation
contract cannot flip rankings:

- identical ranked label sequences, scores allclose (~1e-4), for both
  prediction-network architectures (lstm / stateless);
- ragged n_frames in one batch (per-row inertia past each length);
- unit-LM fusion table == the ext_score callback path;
- compiled biasing automaton == the ContextBiaser callback path
  (including retraction and completion bonuses).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mogasr.am.rnnt import (
    build_rnnt_model,
    init_rnnt_train_state,
    rnnt_beam_decode,
    rnnt_beam_decode_device,
    rnnt_fusion_matrix,
)
from mogasr.config import TrainConfig


def _setup(pred_arch="lstm", seed=0, V=6, D=5):
    tcfg = TrainConfig(nn_arch="lstm", nn_hidden=12, nn_layers=1)
    model = build_rnnt_model(V, tcfg, pred_arch=pred_arch)
    params = init_rnnt_train_state(
        model, tcfg, D, 4, jax.random.key(seed)).params
    # tilt away from blank so beams branch and prefix merges occur
    bias = np.array(params["params"]["joint"]["out"]["bias"])
    bias[model.n_labels] = -1.0
    bias[0] = 0.6
    bias[1] = 0.5
    params["params"]["joint"]["out"]["bias"] = jnp.asarray(bias)
    return model, params


def _ref_nbest(model, params, feats, n_frames, **kw):
    out = []
    for b in range(feats.shape[0]):
        out.append(rnnt_beam_decode(
            model, params, feats[b : b + 1], n_frames[b : b + 1], **kw))
    return out


def _assert_same(got, want, tol=2e-4):
    assert len(got) == len(want)
    for b, (g, w) in enumerate(zip(got, want)):
        assert [labels for _s, labels in g] == \
            [labels for _s, labels in w], f"row {b} ranked lists differ"
        for (gs, _gl), (ws, _wl) in zip(g, w):
            assert abs(gs - ws) <= tol * max(1.0, abs(ws)), (b, gs, ws)




@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """Mitigation for the full-suite XLA CPU segfault (VERDICT r3 #1a,
    root-caused docs/TPU_NOTES.md round 4: compiler-state accumulation
    after hundreds of jitted executables). Round 5 grew the suite with
    compile-heavy device-beam/device-feature modules, which moved the
    crash point EARLIER (observed in test_serve.py at ~82% of the grown
    suite); dropping the accumulated cache before each heavy module keeps
    single-process `pytest tests/` viable. tests/run_all.py remains the
    crash-proof sharded fallback."""
    import jax

    jax.clear_caches()

@pytest.mark.parametrize("pred_arch", ["lstm", "stateless"])
def test_device_beam_matches_reference(pred_arch):
    model, params = _setup(pred_arch)
    rng = np.random.default_rng(3)
    B, T, D = 3, 12, 5
    feats = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    n_frames = jnp.asarray([12, 7, 1], np.int32)

    got = rnnt_beam_decode_device(
        model, params, feats, n_frames, beam_size=3,
        max_symbols_per_frame=2, u_cap=30)
    want = _ref_nbest(model, params, feats, np.asarray(n_frames),
                      beam_size=3, max_symbols_per_frame=2, u_cap=30)
    _assert_same(got, want)


def test_device_beam_zero_frames_row():
    model, params = _setup()
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
    got = rnnt_beam_decode_device(
        model, params, feats, jnp.asarray([6, 0], np.int32),
        beam_size=2, max_symbols_per_frame=2, u_cap=20)
    assert got[1] == [(0.0, [])]   # empty-audio row: the empty hypothesis


def test_device_beam_u_cap_stops_growth():
    model, params = _setup()
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((1, 10, 5)).astype(np.float32))
    n = jnp.asarray([10], np.int32)
    kw = dict(beam_size=3, max_symbols_per_frame=3, u_cap=4)
    got = rnnt_beam_decode_device(model, params, feats, n, **kw)
    want = _ref_nbest(model, params, feats, np.asarray(n), **kw)
    _assert_same(got, want)
    assert all(len(labels) <= 4 for _s, labels in got[0])


def test_device_beam_fusion_matrix_matches_ext_score():
    from mogasr.lm.unit_ngram import estimate_unit_bigram, fusion_score

    model, params = _setup(V=5)
    rng = np.random.default_rng(6)
    seqs = [list(rng.integers(0, 5, size=rng.integers(2, 6)))
            for _ in range(30)]
    lm = estimate_unit_bigram(seqs, 5)
    w = 0.7
    fm = rnnt_fusion_matrix(model, lm, w)

    feats = jnp.asarray(rng.standard_normal((2, 9, 5)).astype(np.float32))
    n = jnp.asarray([9, 5], np.int32)
    got = rnnt_beam_decode_device(
        model, params, feats, n, beam_size=3, max_symbols_per_frame=2,
        u_cap=20, fusion=fm)
    want = _ref_nbest(model, params, feats, np.asarray(n), beam_size=3,
                      max_symbols_per_frame=2, u_cap=20,
                      ext_score=fusion_score(lm, w), ext_weight=1.0)
    _assert_same(got, want)


def test_device_beam_compiled_bias_matches_callback():
    from mogasr.decoder.biasing import CompiledBiaser, ContextBiaser

    model, params = _setup(V=5, seed=2)
    biaser = ContextBiaser([[0, 1], [1, 2, 3], [0]], weight=1.5,
                           completion_scale=0.5)
    comp = CompiledBiaser(biaser, n_units=5)

    # table exactness on random walks (independent of the beam)
    rng = np.random.default_rng(7)
    for _ in range(50):
        walk = [int(u) for u in rng.integers(0, 5, size=rng.integers(0, 9))]
        u = int(rng.integers(0, 5))
        node = 0
        for x in walk:
            node = comp.next_state[node, x]
        assert comp.delta[node, u] == pytest.approx(
            biaser.score(tuple(walk), u))

    feats = jnp.asarray(rng.standard_normal((2, 8, 5)).astype(np.float32))
    n = jnp.asarray([8, 6], np.int32)
    got = rnnt_beam_decode_device(
        model, params, feats, n, beam_size=3, max_symbols_per_frame=2,
        u_cap=20, bias_next=comp.next_state, bias_delta=comp.delta)
    want = _ref_nbest(model, params, feats, np.asarray(n), beam_size=3,
                      max_symbols_per_frame=2, u_cap=20,
                      ext_score=biaser.score, ext_weight=1.0)
    _assert_same(got, want)
