"""Test configuration: run everything on a faked 8-device CPU mesh.

SURVEY.md §4: `xla_force_host_platform_device_count=8` is the TPU-world
equivalent of a mock distributed backend — multi-chip sharding tests run on any
box. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU plugin with
# jax_platforms="axon,cpu", overriding the env var — override it back so the
# test suite runs hermetically on the faked 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def trained_system():
    """One shared small trained system (lex, topo, batches, gmm): 16 synthetic
    utts (seed 42), K=2, 6 Viterbi-EM iters, buckets (250, 400). Session-scoped
    because several suites need an identical setup and training costs ~20 s."""
    from mogasr import pipeline as pipe
    from mogasr.config import (
        BatchConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
    )
    from mogasr.data.synthetic import make_corpus
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    utts = make_corpus(16, words_per_utt=(2, 3), seed=42)
    batches = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        fcfg, BatchConfig(batch_size=8, bucket_boundaries=(250, 400)),
    )
    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=2, feat_dim=fcfg.feat_dim)
    gmm, _ = pipe.train_gmm(batches, lex, topo, gcfg, TrainConfig(num_em_iters=6))
    return lex, topo, batches, gmm
