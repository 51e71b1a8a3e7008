"""System-bundle export/import roundtrip (mogasr/utils/bundle.py): the
artifact bench.py times must be exactly the system that was trained."""

import numpy as np
import jax.numpy as jnp
import pytest

from mogasr.am.gmm import GmmSet, gmm_loglik
from mogasr.config import FrontendConfig, TopologyConfig
from mogasr.hmm.lexicon import make_lexicon
from mogasr.hmm.topology import build_topology
from mogasr.hmm.triphone import TiedTriphones
from mogasr.utils.bundle import load_system, save_system


@pytest.fixture
def system(rng):
    lex = make_lexicon({"ab": ["a", "b"], "ba": ["b", "a"], "q": ["q"]})
    topo = build_topology(lex, TopologyConfig()).with_transitions(
        np.array([0.8, 0.6, 0.7, 0.65]))
    S, K, D = topo.n_pdfs, 3, 6
    gmm = GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, D))).astype(np.float32)),
    )
    return gmm, topo, lex


def test_bundle_roundtrip_mono(tmp_path, system, rng):
    gmm, topo, lex = system
    fcfg = FrontendConfig(use_energy=True, dither=1e-4)
    save_system(str(tmp_path), gmm, topo, fcfg, meta={"wer": 0.123})
    g2, topo2, fcfg2, tied2, meta = load_system(str(tmp_path))

    assert tied2 is None
    assert meta["wer"] == 0.123
    assert fcfg2 == fcfg
    assert topo2.lexicon.phones == lex.phones
    assert topo2.lexicon.prons == lex.prons
    assert topo2.per_phone_self_prob == topo.per_phone_self_prob
    for a, b in [(gmm.weights, g2.weights), (gmm.means, g2.means),
                 (gmm.vars, g2.vars)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the loaded system scores identically (the property that matters)
    x = rng.standard_normal((5, gmm.means.shape[-1])).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gmm_loglik(jnp.asarray(x), gmm)),
        np.asarray(gmm_loglik(jnp.asarray(x), g2)), rtol=1e-6)


def test_bundle_roundtrip_tied(tmp_path, system):
    gmm, topo, lex = system
    a, b, q, s = (lex.phone_id(p) for p in ("a", "b", "q", "sil"))
    tied = TiedTriphones(
        topo=topo,
        tying={(s, a, b, 0): 1, (b, a, s, 0): 2, (a, b, a, 0): 3},
        backoff={(a, 0): 1, (b, 0): 3, (q, 0): 2},
        n_pdfs=4,
    )
    save_system(str(tmp_path), gmm, topo, FrontendConfig(), tied=tied)
    _g2, topo2, _f, tied2, _m = load_system(str(tmp_path))
    assert tied2 is not None
    assert tied2.n_pdfs == 4
    assert tied2.tying == tied.tying
    assert tied2.backoff == tied.backoff
    # pdf lookup behaves identically incl. backoff for unseen contexts
    assert tied2.pdf_of(s, a, b, 0) == 1
    assert tied2.pdf_of(q, a, q, 0) == 1     # backoff
    np.testing.assert_array_equal(tied2.pdf_to_phone(), tied.pdf_to_phone())
