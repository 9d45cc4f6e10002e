"""Device profiled-likelihood maps on one observed dataset
(BinnedToyStudy.profile_map) — the batched twin of scanning
plot_likelihood_ratio's per-point host fits (reference:
blueice/inference.py:392-443)."""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.inference import bestfit_scipy
from blueice_tpu.parallel import BinnedToyStudy


def _lf_and_data(seed=5):
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    study = BinnedToyStudy(lf)
    counts = np.asarray(study.simulate(jax.random.PRNGKey(seed), 1))[0]
    # Bind the identical dataset host-side: events at bin centers
    centers = [-5.0, 0.0, 5.0]
    xs = np.concatenate([np.full(int(counts[i]), centers[i])
                         for i in range(3)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    return lf, study, counts


def test_profile_map_2d_is_exact_against_host_ll():
    """With every parameter on the grid, nothing is profiled: the map must
    equal direct host likelihood evaluations."""
    lf, study, counts = _lf_and_data()
    g_r = np.linspace(0.8, 1.2, 3)
    g_mu = np.linspace(-0.5, 0.5, 4)
    t, free, cond = study.profile_map(
        [('s0_rate_multiplier', g_r), ('mu', g_mu)], counts=counts)
    assert t.shape == (3, 4)
    assert free.max_ll.shape == (1,)
    llf = float(free.max_ll[0])
    for i, r in enumerate(g_r):
        for j, m in enumerate(g_mu):
            ll = lf(s0_rate_multiplier=float(r), mu=float(m))
            assert np.isclose(t[i, j], max(2.0 * (llf - ll), 0.0),
                              rtol=1e-6, atol=1e-5)


def test_profile_map_1d_matches_host_profiled_fits():
    lf, study, counts = _lf_and_data()
    grid = np.linspace(0.7, 1.3, 5)
    t, free, cond = study.profile_map([('s0_rate_multiplier', grid)],
                                      counts=counts)
    assert t.shape == (5,)
    assert (t >= 0).all()
    # Host: profile mu at each grid point with scipy, reference-style
    _, llf_host = bestfit_scipy(lf)
    for i, r in enumerate(grid):
        _, llc_host = bestfit_scipy(lf, s0_rate_multiplier=float(r))
        t_host = max(2.0 * (llf_host - llc_host), 0.0)
        assert abs(t[i] - t_host) < 5e-3
    # The conditional results carry the profiled nuisance per grid point
    assert cond.max_ll.shape == (5,)
    assert 'mu' in cond.names


def test_profile_map_default_counts_from_set_data():
    lf, study, counts = _lf_and_data()
    grid = np.linspace(0.8, 1.2, 4)
    t_explicit, _, _ = study.profile_map([('s0_rate_multiplier', grid)],
                                         counts=counts)
    t_default, _, _ = study.profile_map([('s0_rate_multiplier', grid)])
    np.testing.assert_allclose(t_default, t_explicit, rtol=0, atol=0)


def test_profile_map_validation():
    lf, study, counts = _lf_and_data()
    with pytest.raises(ValueError, match="1 or 2"):
        study.profile_map([('s0_rate_multiplier', [1.0]), ('mu', [0.0]),
                           ('mu', [0.0])], counts=counts)
    with pytest.raises(ValueError, match="empty grid"):
        study.profile_map([('s0_rate_multiplier', [])], counts=counts)
    with pytest.raises(ValueError, match="shape"):
        study.profile_map([('s0_rate_multiplier', [1.0])],
                          counts=counts[:-1])
    with pytest.raises(ValueError):   # out-of-anchor-range grid point
        study.profile_map([('mu', [0.0, 7.0])], counts=counts)
    lf2 = BinnedLogLikelihood(conf_for_test(
        mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
        n_events_for_pdf=int(1e5)))
    lf2.add_rate_parameter('s0')
    lf2.prepare()
    study2 = BinnedToyStudy(lf2)
    with pytest.raises(ValueError, match="no data bound"):
        study2.profile_map([('s0_rate_multiplier', [1.0])])
