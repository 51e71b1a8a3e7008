"""EM tests: recovery of known GMM params on synthetic data, monotone
loglik, splitting and flooring behavior (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from mogasr.am import em
from mogasr.am.gmm import GmmSet, gmm_loglik_np


def _sample_gmm(rng, weights, means, variances, n):
    """Sample n points from a single state's GMM."""
    K, D = means.shape
    comps = rng.choice(K, size=n, p=weights)
    return means[comps] + rng.standard_normal((n, D)) * np.sqrt(variances[comps])


def test_em_recovers_known_gmm(rng):
    """Two well-separated components in one state: EM recovers them."""
    true_mu = np.array([[-2.0, 0.0], [3.0, 1.0]])
    true_var = np.array([[0.5, 0.3], [0.4, 0.6]])
    true_w = np.array([0.4, 0.6])
    x = _sample_gmm(rng, true_w, true_mu, true_var, 4000).astype(np.float32)
    labels = np.zeros(4000, np.int64)

    g = GmmSet(
        weights=jnp.array([[0.5, 0.5]]),
        means=jnp.array([[[-1.0, -1.0], [1.0, 1.0]]]),
        vars=jnp.ones((1, 2, 2)),
    )
    lls = []
    for _ in range(20):
        stats = em.accumulate_stats(g, jnp.asarray(x), jnp.asarray(labels))
        lls.append(float(stats.loglik))
        g = em.m_step(g, stats)
    # monotone nondecreasing loglik
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:])), lls
    mu = np.asarray(g.means[0])
    w = np.asarray(g.weights[0])
    order = np.argsort(mu[:, 0])
    np.testing.assert_allclose(mu[order], true_mu, atol=0.15)
    np.testing.assert_allclose(w[order], true_w, atol=0.05)
    np.testing.assert_allclose(np.asarray(g.vars[0])[order], true_var, atol=0.15)


def test_padding_frames_excluded(rng):
    x = rng.standard_normal((100, 3)).astype(np.float32)
    labels = np.zeros(100, np.int64)
    labels[50:] = -1
    g = GmmSet(jnp.ones((1, 1)), jnp.zeros((1, 1, 3)), jnp.ones((1, 1, 3)))
    stats = em.accumulate_stats(g, jnp.asarray(x), jnp.asarray(labels))
    assert float(stats.n_frames) == 50
    np.testing.assert_allclose(float(stats.occ.sum()), 50, atol=1e-4)
    # equals stats over only the valid prefix
    stats2 = em.accumulate_stats(g, jnp.asarray(x[:50]), jnp.asarray(labels[:50]))
    np.testing.assert_allclose(np.asarray(stats.sx), np.asarray(stats2.sx), atol=1e-4)


def test_multi_state_separation(rng):
    """Frames routed by label to distinct states stay distinct."""
    xa = rng.standard_normal((200, 2)).astype(np.float32) + np.array([5, 0], np.float32)
    xb = rng.standard_normal((200, 2)).astype(np.float32) + np.array([-5, 0], np.float32)
    x = np.concatenate([xa, xb])
    labels = np.concatenate([np.zeros(200, np.int64), np.ones(200, np.int64)])
    g = GmmSet(jnp.ones((2, 1)), jnp.zeros((2, 1, 2)), jnp.ones((2, 1, 2)))
    stats = em.accumulate_stats(g, jnp.asarray(x), jnp.asarray(labels))
    g = em.m_step(g, stats)
    assert float(g.means[0, 0, 0]) > 4.0
    assert float(g.means[1, 0, 0]) < -4.0


def test_split_components():
    g = GmmSet(jnp.ones((2, 1)), jnp.zeros((2, 1, 3)), jnp.ones((2, 1, 3)))
    g2 = em.split_components(g, perturb=0.2)
    assert g2.weights.shape == (2, 2)
    assert g2.means.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(g2.weights.sum(-1)), 1.0, atol=1e-6)
    # split means straddle the original
    assert float(g2.means[0, 0, 0]) < 0 < float(g2.means[0, 1, 0])


def test_split_components_occupancy_gated():
    """States below min_frames_per_comp keep their comps; duplicates inert."""
    g = GmmSet(jnp.ones((2, 1)), jnp.zeros((2, 1, 3)), jnp.ones((2, 1, 3)))
    # state 0: 1000 frames (split), state 1: 10 frames (gated out)
    g2 = em.split_components(
        g, perturb=0.2, state_occ=np.array([1000.0, 10.0]),
        min_frames_per_comp=40.0,
    )
    assert g2.weights.shape == (2, 2)
    # state 0 split: two half-weight comps straddling the original
    np.testing.assert_allclose(np.asarray(g2.weights[0]), [0.5, 0.5])
    assert float(g2.means[0, 0, 0]) < 0 < float(g2.means[0, 1, 0])
    # state 1 gated: original comp untouched, duplicate has weight exactly 0
    np.testing.assert_allclose(np.asarray(g2.weights[1]), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(g2.means[1, 0]), 0.0)
    # scoring is unchanged for the gated state (inert comp contributes 0)
    from mogasr.am.gmm import gmm_loglik

    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 3)), jnp.float32)
    ll1 = gmm_loglik(x, g)
    ll2 = gmm_loglik(x, g2)
    np.testing.assert_allclose(
        np.asarray(ll1[:, 1]), np.asarray(ll2[:, 1]), rtol=1e-5, atol=1e-5
    )
    # an m_step keeps the inert slot at weight 0 (no resurrection by floor)
    stats = em.accumulate_stats(
        g2, x, jnp.ones((5,), jnp.int64)
    )
    g3 = em.m_step(g2, stats)
    assert float(g3.weights[1, 1]) == 0.0


def test_var_floor():
    """Degenerate data (all identical) must hit the variance floor, not 0."""
    x = np.ones((50, 2), np.float32)
    labels = np.zeros(50, np.int64)
    g = GmmSet(jnp.ones((1, 1)), jnp.zeros((1, 1, 2)), jnp.ones((1, 1, 2)))
    stats = em.accumulate_stats(g, jnp.asarray(x), jnp.asarray(labels))
    g = em.m_step(g, stats, var_floor=1e-3)
    assert np.all(np.asarray(g.vars) >= 1e-3 - 1e-9)


def test_low_occupancy_keeps_old_params():
    x = np.zeros((1, 2), np.float32)
    labels = np.array([-1])  # nothing assigned
    g = GmmSet(jnp.ones((1, 1)), 7.0 * jnp.ones((1, 1, 2)), 2.0 * jnp.ones((1, 1, 2)))
    stats = em.accumulate_stats(g, jnp.asarray(x), jnp.asarray(labels))
    g2 = em.m_step(g, stats)
    np.testing.assert_allclose(np.asarray(g2.means), 7.0)
    np.testing.assert_allclose(np.asarray(g2.vars), 2.0)


def test_init_from_labels(rng):
    x = np.concatenate(
        [rng.standard_normal((100, 2)) + 3, rng.standard_normal((100, 2)) - 3]
    ).astype(np.float32)
    labels = np.concatenate([np.zeros(100, np.int64), np.ones(100, np.int64)])
    g = em.init_from_labels(x, labels, n_states=3)
    assert g.means.shape == (3, 1, 2)
    assert abs(float(g.means[0, 0, 0]) - 3) < 0.5
    assert abs(float(g.means[1, 0, 0]) + 3) < 0.5
    # state 2 unseen -> global stats
    assert abs(float(g.means[2, 0, 0])) < 0.5


def test_stats_are_psummable():
    a = em.zero_stats(2, 1, 3)
    b = em.zero_stats(2, 1, 3)
    c = em.add_stats(a, b)
    assert c.occ.shape == (2, 1)


def test_map_adaptation_interpolates():
    """MAP: lots of data -> ML estimate; no data -> prior; tau controls blend.

    Uses a local rng (NOT the session-scoped fixture): the assertion below is
    the exact Gauvain-Lee identity mu = occ*xbar/(occ+tau) against the
    realized sample mean, so it cannot drift when the suite composition
    changes how much of a shared stream earlier tests consume."""
    rng = np.random.default_rng(0)
    prior = GmmSet(jnp.ones((1, 1)), jnp.zeros((1, 1, 2)), jnp.ones((1, 1, 2)))
    x = (rng.standard_normal((400, 2)) + 5.0).astype(np.float32)
    labels = np.zeros(400, np.int64)
    stats = em.accumulate_stats(prior, jnp.asarray(x), jnp.asarray(labels))

    adapted = em.m_step_map(prior, stats, tau=10.0)
    mu = float(adapted.means[0, 0, 0])
    xbar = float(x[:, 0].mean())
    # exact interpolation: occ=400, prior mean 0 -> mu = 400*xbar/410
    np.testing.assert_allclose(mu, 400.0 * xbar / 410.0, rtol=1e-5)
    assert 0.0 < mu < xbar  # shrunk toward the prior, but dominated by data
    # huge tau: stays at the prior
    heavy = em.m_step_map(prior, stats, tau=1e9)
    np.testing.assert_allclose(np.asarray(heavy.means), 0.0, atol=1e-3)
    # no data: exactly the prior
    empty = em.accumulate_stats(prior, jnp.asarray(x[:1]), jnp.asarray([-1]))
    same = em.m_step_map(prior, empty, tau=10.0)
    np.testing.assert_allclose(np.asarray(same.means), np.asarray(prior.means), atol=1e-6)
    # variance adaptation moves vars toward the data's
    av = em.m_step_map(prior, stats, tau=10.0, adapt_vars=True)
    assert not np.allclose(np.asarray(av.vars), np.asarray(prior.vars))
