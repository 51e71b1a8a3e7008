"""Hybrid NN-HMM end-to-end (config[3]): GMM-bootstrap alignments -> NN
training -> prior-scaled decode -> WER comparable to the GMM system."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mogasr import pipeline as pipe
from mogasr.am.neural import build_model, state_priors
from mogasr.am.train_nn import init_train_state, make_train_step
from mogasr.config import DecodeConfig, FrontendConfig, TrainConfig

FCFG = FrontendConfig()


@pytest.fixture(scope="module")
def system(trained_system):
    return trained_system


@pytest.mark.parametrize("arch", ["mlp", "lstm"])
def test_nn_trains_on_alignments_and_decodes(system, arch):
    lex, topo, batches, gmm = system
    # labels from forced alignment (stack 3.4: GMM bootstrap)
    labeled = []
    for fb in batches:
        _res, labels, _ = pipe.align_batch(fb, gmm, lex, topo)
        labeled.append((fb, labels))

    tcfg = TrainConfig(
        nn_arch=arch, nn_hidden=64, nn_layers=2, nn_context=2, lr=3e-3,
        num_nn_steps=150,
    )
    model = build_model(arch, topo.n_pdfs, tcfg)
    state = init_train_state(model, tcfg, FCFG.feat_dim, jax.random.key(0))
    step = make_train_step(model, tcfg)
    for i in range(tcfg.num_nn_steps):
        fb, labels = labeled[i % len(labeled)]
        state, metrics = step(state, fb.feats, fb.n_frames, labels)
    assert float(metrics["frame_acc"]) > 0.75, float(metrics["frame_acc"])

    all_labels = np.concatenate(
        [np.asarray(l).reshape(-1) for _, l in labeled]
    )
    log_priors = jnp.asarray(state_priors(all_labels, topo.n_pdfs))
    scorer = pipe.make_nn_scorer(model, state.params, log_priors)
    metrics = pipe.evaluate(
        batches, None, lex, topo,
        DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0),
        scorer=scorer,
    )
    assert metrics["wer"] < 0.4, metrics
