"""Speaker-adaptive training (SAT): fMLLR inside the EM loop.

A two-"speaker" corpus where speaker B's features are an affine corruption
of the front-end output: SAT must (a) improve the per-frame alignment
loglik across iterations, (b) estimate a strongly non-identity transform
for the corrupted speaker, and (c) beat continuing plain (unadapted) EM
for the same number of iterations."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mogasr import pipeline as pipe
from mogasr.config import (
    BatchConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
)
from mogasr.data.synthetic import make_corpus
from mogasr.hmm.lexicon import synthetic_lexicon
from mogasr.hmm.topology import build_topology


def _two_speaker_batches():
    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(16, words_per_utt=(2, 3), seed=11)
    named = [
        (f"spk{'B' if i % 2 else 'A'}-{i:03d}", u.wave, u.words)
        for i, u in enumerate(utts)
    ]
    batches = pipe.featurize(
        named, fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    # corrupt speaker B rows with a fixed affine distortion
    rng = np.random.default_rng(5)
    D = fcfg.feat_dim
    A = (np.eye(D) * 0.75).astype(np.float32)
    b = (0.6 * rng.standard_normal(D)).astype(np.float32)
    out = []
    for fb in batches:
        feats = np.asarray(fb.feats).copy()
        for bi, uid in enumerate(fb.utt_ids):
            if uid.startswith("spkB"):
                feats[bi] = feats[bi] @ A.T + b
        out.append(pipe.FeatBatch(fb.utt_ids, jnp.asarray(feats), fb.n_frames, fb.words))
    return out, fcfg, lex, topo


def test_sat_improves_loglik_and_finds_transform():
    batches, fcfg, lex, topo = _two_speaker_batches()
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=fcfg.feat_dim)
    gmm_si, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=5))

    gmm_sat, transforms, hist = pipe.train_sat(
        batches, lex, topo, gcfg, gmm_si, n_iters=3,
    )
    assert hist[-1] > hist[0], hist
    # the corrupted speaker's transform must be far from identity, and
    # farther than the clean speaker's
    D = fcfg.feat_dim
    eye = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    dev = {spk: float(np.abs(W - eye).max()) for spk, W in transforms.items()}
    assert set(dev) == {"spkA", "spkB"}
    assert dev["spkB"] > 0.2, dev
    assert dev["spkB"] > dev["spkA"], dev

    # SAT beats continuing UNADAPTED EM for the same number of iterations
    gmm_plain, hist_plain = pipe.train_gmm(
        batches, lex, topo, gcfg, TrainConfig(num_em_iters=3), gmm=gmm_si,
    )
    assert hist[-1] > hist_plain[-1], (hist, hist_plain)
