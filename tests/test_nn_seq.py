"""Hybrid-NN sequence training (mogasr.am.nn_seq): the autodiff gradient of
the FB log-likelihood equals the classical pdf occupancies (the identity
that makes MMI-by-backprop correct), the autodiff gradient of the expected
frame accuracy equals am/smbr.py's hand-derived signed weights (ditto for
sMBR), both criteria ascend during fine-tuning, and the CLI path runs
CE -> MMI -> sMBR end-to-end."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.config import BatchConfig, DecodeConfig, FrontendConfig, TrainConfig


def test_fb_loglik_grad_equals_pdf_occupancies():
    """d loglik / d emit_ll[t, p] = sum of state posteriors of the states
    emitting pdf p at frame t (acoustic_scale folded in linearly)."""
    from mogasr import pipeline as pipe
    from mogasr.data.synthetic import LEXICON
    from mogasr.decoder import forward_backward as fbd
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology
    from mogasr.config import TopologyConfig

    lex = make_lexicon({w: LEXICON[w] for w in ["cat", "dog"]})
    topo = build_topology(lex, TopologyConfig())
    words = [["cat"], ["dog", "cat"]]
    graphs = {k: jnp.asarray(v)
              for k, v in pipe.build_align_graphs(words, lex, topo).items()}
    # frame counts must exceed the longest alignment chain (sil + phones·3 +
    # sil states), or the FB path is infeasible (loglik = -1e30) and the
    # identity is vacuous — guarded below
    B, T, P = 2, 40, topo.n_pdfs
    rng = np.random.default_rng(0)
    ll = jnp.asarray(rng.standard_normal((B, T, P)), jnp.float32)
    n_frames = jnp.asarray([40, 32])
    kappa = 0.3

    grad = jax.grad(
        lambda x: jnp.sum(fbd.forward_backward(
            x, graphs, n_frames, acoustic_scale=kappa).loglik)
    )(ll)
    res = fbd.forward_backward(ll, graphs, n_frames, acoustic_scale=kappa)
    assert np.all(np.asarray(res.loglik) > -1e29), "infeasible path"
    occ = fbd.state_posteriors_to_pdf(res.log_gamma, graphs["emit_id"], P)
    # padding frames carry zero gradient and zero occupancy
    mask = (jnp.arange(T)[None, :] < n_frames[:, None])[..., None]
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(kappa * occ * mask),
        rtol=1e-4, atol=1e-5,
    )


def test_smbr_autodiff_grad_equals_signed_weights():
    """d E[acc] / d emit_ll == kappa * smbr_quantities().weights_pdf: the
    autodiff backward pass reproduces the hand-derived accuracy-carrying
    (ahat/bhat) accumulator scans of am/smbr.py."""
    from mogasr import pipeline as pipe
    from mogasr.am.smbr import smbr_quantities
    from mogasr.data.synthetic import LEXICON
    from mogasr.decoder import forward_backward as fbd
    from mogasr.hmm import graph as gr
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology
    from mogasr.config import TopologyConfig

    lex = make_lexicon({w: LEXICON[w] for w in ["cat", "dog"]})
    topo = build_topology(lex, TopologyConfig())
    den = pipe.word_decode_graph(lex, topo, DecodeConfig(acoustic_scale=0.3))
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([den, den]).items()}
    B, T, P = 2, 24, topo.n_pdfs
    rng = np.random.default_rng(1)
    ll = jnp.asarray(rng.standard_normal((B, T, P)), jnp.float32)
    ref_pdf = jnp.asarray(rng.integers(0, P, (B, T)), jnp.int32)
    n_frames = jnp.asarray([24, 17])
    kappa = 0.3
    mask = jnp.arange(T)[None, :] < n_frames[:, None]
    ref_pdf = jnp.where(mask, ref_pdf, -1)

    def e_acc_total(x):
        res = fbd.forward_backward(x, graphs, n_frames, acoustic_scale=kappa)
        acc = (graphs["emit_id"][:, None, :] == ref_pdf[:, :, None])
        gam = jnp.where(mask[..., None],
                        jnp.exp(jnp.maximum(res.log_gamma, -80.0)), 0.0)
        return jnp.sum(gam * acc.astype(gam.dtype))

    grad = jax.grad(e_acc_total)(ll)
    q = smbr_quantities(ll, graphs, ref_pdf, n_frames,
                        acoustic_scale=kappa, n_pdfs=P)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(kappa * q.weights_pdf),
        rtol=2e-3, atol=2e-4,
    )
    # and the objectives agree (gamma-dot-acc vs forward ahat accumulator)
    np.testing.assert_allclose(
        float(e_acc_total(ll)), float(jnp.sum(q.expected_acc)), rtol=1e-4)


@pytest.fixture(scope="module")
def ce_system():
    from mogasr import pipeline as pipe
    from mogasr.am.neural import build_model, state_priors
    from mogasr.am.train_nn import init_train_state, make_train_step
    from mogasr.data.synthetic import LEXICON, make_corpus
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology
    from mogasr.config import GmmConfig, TopologyConfig

    vocab = ["fish", "cat", "see", "sun"]
    lex = make_lexicon({w: LEXICON[w] for w in vocab})
    topo = build_topology(lex, TopologyConfig())
    fcfg = FrontendConfig()
    utts = make_corpus(16, words_per_utt=(2, 3), seed=3, vocab=vocab)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=1,
                     feat_dim=fcfg.feat_dim)
    gmm, _h = pipe.train_gmm(batches, lex, topo, gcfg,
                             TrainConfig(num_em_iters=3))
    labeled = []
    for fb in batches:
        _res, labels, _ = pipe.align_batch(fb, gmm, lex, topo)
        labeled.append((fb, labels))
    all_labels = np.concatenate(
        [np.asarray(l).reshape(-1) for _, l in labeled])
    log_priors = state_priors(all_labels, topo.n_pdfs)

    tcfg = TrainConfig(nn_arch="mlp", nn_hidden=64, nn_layers=2,
                       nn_context=3, lr=3e-3, num_nn_steps=120)
    model = build_model("mlp", topo.n_pdfs, tcfg)
    state = init_train_state(model, tcfg, fcfg.feat_dim, jax.random.key(0))
    step = make_train_step(model, tcfg)
    i = 0
    while i < 120:
        for fb, labels in labeled:
            state, _m = step(state, fb.feats, fb.n_frames, labels)
            i += 1
            if i >= 120:
                break
    return lex, topo, batches, labeled, model, state.params, log_priors


def _full_set_mmi(batches, lex, topo, model, params, log_priors, kappa):
    """Per-frame MMI criterion averaged over ALL batches — per-batch history
    entries are not comparable across batches (each batch has its own
    intrinsic num/den gap), so ascent must be measured on the full set."""
    from mogasr import pipeline as pipe
    from mogasr.am.nn_seq import nn_mmi_objective
    from mogasr.hmm import graph as gr

    den_graph = pipe.word_decode_graph(
        lex, topo, DecodeConfig(acoustic_scale=kappa))
    tot = 0.0
    for fb in batches:
        rows = int(fb.feats.shape[0])
        num_g = {k: jnp.asarray(v) for k, v in
                 pipe.build_align_graphs(fb.words, lex, topo).items()}
        den_g = {k: jnp.asarray(v) for k, v in
                 gr.batch_graphs([den_graph] * rows).items()}
        _loss, mmi = nn_mmi_objective(
            model, params, log_priors, fb.feats, fb.n_frames,
            num_g, den_g, kappa)
        tot += float(mmi)
    return tot / len(batches)


def test_nn_mmi_criterion_ascends(ce_system):
    from mogasr.am.nn_seq import finetune_nn_mmi

    lex, topo, batches, _labeled, model, params, log_priors = ce_system
    lp = jnp.asarray(log_priors)
    tcfg = TrainConfig(nn_arch="mlp", nn_hidden=64, nn_layers=2,
                       nn_context=3, lr=1e-3, num_nn_steps=20)
    before = _full_set_mmi(batches, lex, topo, model, params, lp, 0.1)
    new_params, hist = finetune_nn_mmi(
        batches, lex, topo, model, params, lp,
        tcfg, steps=20, acoustic_scale=0.1,
    )
    assert len(hist) == 20 and np.isfinite(hist).all()
    # the criterion the step maximizes must actually go up on the full set
    after = _full_set_mmi(batches, lex, topo, model, new_params, lp, 0.1)
    assert after > before, (before, after)
    # and parameters moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(new_params))
    )
    assert moved


def test_nn_mmi_decode_not_degraded(ce_system):
    from mogasr import pipeline as pipe
    from mogasr.am.nn_seq import finetune_nn_mmi

    lex, topo, batches, _labeled, model, params, log_priors = ce_system
    tcfg = TrainConfig(nn_arch="mlp", nn_hidden=64, nn_layers=2,
                       nn_context=3, lr=1e-4, num_nn_steps=20)
    new_params, _h = finetune_nn_mmi(
        batches, lex, topo, model, params, jnp.asarray(log_priors),
        tcfg, steps=20, acoustic_scale=0.1,
    )
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    graph = pipe.word_decode_graph(lex, topo, dcfg)

    def wer_of(p):
        scorer = pipe.make_nn_scorer(model, p, jnp.asarray(log_priors))
        return pipe.evaluate(batches, None, lex, None, dcfg,
                             scorer=scorer, graph=graph)["wer"]

    assert wer_of(new_params) <= wer_of(params) + 0.05


def _full_set_smbr(labeled, lex, topo, model, params, log_priors, kappa):
    """Per-frame expected accuracy over ALL batches (same reasoning as
    _full_set_mmi: per-batch history entries are not cross-comparable)."""
    from mogasr import pipeline as pipe
    from mogasr.am.nn_seq import nn_smbr_objective
    from mogasr.hmm import graph as gr

    den_graph = pipe.word_decode_graph(
        lex, topo, DecodeConfig(acoustic_scale=kappa))
    tot = 0.0
    for fb, labels in labeled:
        rows = int(fb.feats.shape[0])
        den_g = {k: jnp.asarray(v) for k, v in
                 gr.batch_graphs([den_graph] * rows).items()}
        _loss, acc = nn_smbr_objective(
            model, params, log_priors, fb.feats, fb.n_frames,
            den_g, jnp.asarray(labels), kappa)
        tot += float(acc)
    return tot / len(labeled)


def test_nn_smbr_criterion_ascends(ce_system):
    from mogasr.am.nn_seq import finetune_nn_smbr

    lex, topo, batches, labeled, model, params, log_priors = ce_system
    lp = jnp.asarray(log_priors)
    tcfg = TrainConfig(nn_arch="mlp", nn_hidden=64, nn_layers=2,
                       nn_context=3, lr=1e-3, num_nn_steps=20)
    before = _full_set_smbr(labeled, lex, topo, model, params, lp, 0.1)
    assert 0.0 < before < 1.0  # a per-frame accuracy, non-degenerate
    new_params, hist = finetune_nn_smbr(
        labeled, lex, topo, model, params, lp,
        tcfg, steps=20, acoustic_scale=0.1,
    )
    assert len(hist) == 20 and np.isfinite(hist).all()
    after = _full_set_smbr(labeled, lex, topo, model, new_params, lp, 0.1)
    assert after > before, (before, after)


def test_train_nn_seq_mmi_cli(tmp_path, monkeypatch):
    from cli import train_nn

    monkeypatch.setattr(sys, "argv", [
        "prog", "--synthetic", "4", "--run-dir", str(tmp_path / "run"),
        "--arch", "mlp", "--hidden", "32", "--layers", "1", "--steps", "8",
        "--bootstrap-iters", "2", "--bootstrap-components", "1",
        "--seq-mmi-steps", "3", "--seq-smbr-steps", "3"])
    train_nn.main()
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    done = [m for m in metrics if m.get("stage") == "nn_mmi_done"]
    assert done and np.isfinite(done[0]["mmi_per_frame_last"])
    sdone = [m for m in metrics if m.get("stage") == "nn_smbr_done"]
    assert sdone and np.isfinite(sdone[0]["acc_per_frame_last"])
    # expected accuracy is a probability-weighted frame-accuracy in [0, 1]
    assert 0.0 <= sdone[0]["acc_per_frame_last"] <= 1.0
