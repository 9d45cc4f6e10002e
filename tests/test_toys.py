"""Batched toy studies: statistical sanity, mesh sharding, Wilks behavior."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy, make_mesh,
                                  shard_toys)


def _binned_lf():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    return lf


def test_binned_toys_recover_truth():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)

    res = study.run(jax.random.PRNGKey(0), n_toys=200,
                    truth={'s0_rate_multiplier': 1.0})
    fitted = res['s0_rate_multiplier']
    # ~1000 events/toy: per-toy sigma ~3.2%, so the ensemble mean of 200 toys
    # pins the truth to ~0.3%
    assert abs(fitted.mean() - 1.0) < 0.015
    assert 0.01 < fitted.std() < 0.08
    # mu nuisance also recovered on average
    assert abs(res['mu'].mean()) < 0.05
    assert np.isfinite(res.max_ll).all()


def test_binned_toys_match_host_fit():
    """A single toy fit through the batched path is a true maximum of the host
    likelihood, with a consistent LL value."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    counts = study.simulate(jax.random.PRNGKey(2), 1)
    res = study.fit_toys(counts)

    # Host: bind the same counts as a dataset (events at bin centers)
    c = np.asarray(counts[0])
    centers = [-5.0, 0.0, 5.0]
    xs = np.concatenate([np.full(int(c[i]), centers[i]) for i in range(3)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)

    r_hat = float(res['s0_rate_multiplier'][0])
    mu_hat = float(res['mu'][0])
    ll_host_at_opt = lf(s0_rate_multiplier=r_hat, mu=mu_hat)

    # Value consistency between batched-device and host evaluations
    assert abs(res.max_ll[0] - ll_host_at_opt) < 1e-6 * abs(ll_host_at_opt)

    # Optimality on the host surface: perturbations only decrease the LL
    for dr, dm in [(0.02, 0), (-0.02, 0), (0, 0.02), (0, -0.02),
                   (0.01, 0.01), (-0.01, -0.01)]:
        assert lf(s0_rate_multiplier=r_hat + dr, mu=mu_hat + dm) \
            <= ll_host_at_opt + 1e-9


def test_binned_profile_ts_wilks():
    """Under the null, the profile LR statistic is ~chi2(1): its median should
    be near chi2(1).ppf(0.5) = 0.455."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(1), n_toys=300,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0,
                                     truth={'s0_rate_multiplier': 1.0})
    assert (t >= 0).all()
    med = np.median(t)
    assert 0.2 < med < 0.8, med
    # ~90% of toys below the Wilks 90% critical value (2.71)
    frac = (t < stats.chi2(1).ppf(0.9)).mean()
    assert 0.83 < frac < 0.96, frac


def test_binned_toys_on_mesh():
    """The same study partitioned over the 8-device CPU mesh."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    res = study.run(jax.random.PRNGKey(3), n_toys=64, mesh=mesh)
    assert len(res.max_ll) == 64
    assert abs(res['s0_rate_multiplier'].mean() - 1.0) < 0.05

    # Sharded and unsharded ensembles agree (up to partitioned-reduction
    # reassociation at the 1e-10 level)
    res2 = study.run(jax.random.PRNGKey(3), n_toys=64, mesh=None)
    np.testing.assert_allclose(res.x, res2.x, rtol=1e-7, atol=1e-7)


def test_unbinned_toys_recover_truth():
    conf = conf_for_test(mc=True, events_per_day=200.,
                         n_events_for_pdf=int(2e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    study = UnbinnedToyStudy(lf)
    res = study.run(jax.random.PRNGKey(0), n_toys=100)
    fitted = res['s0_rate_multiplier']
    assert abs(fitted.mean() - 1.0) < 0.03
    assert 0.02 < fitted.std() < 0.2
    assert abs(res['mu'].mean()) < 0.05


def test_unbinned_toys_on_mesh():
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    mesh = make_mesh()
    # 30 toys rounds up to 32 (next multiple of the 8-device mesh)
    res = study.run(jax.random.PRNGKey(2), n_toys=30, mesh=mesh)
    assert len(res.max_ll) == 32
    assert np.isfinite(res.max_ll).all()


def test_unbinned_piecewise_scoring():
    """Unbinned toys with piecewise pdf interpolation score via bin lookup."""
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5),
                         pdf_interpolation_method='piecewise')
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    assert study._method == 'piecewise'
    res = study.run(jax.random.PRNGKey(3), n_toys=32)
    assert np.isfinite(res.max_ll).all()
    assert abs(res['s0_rate_multiplier'].mean() - 1.0) < 0.1


def test_unbinned_profile_ts():
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()

    study = UnbinnedToyStudy(lf)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(5), n_toys=100,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0)
    assert (t >= 0).all()
    frac = (t < stats.chi2(1).ppf(0.9)).mean()
    assert 0.75 < frac < 1.0, frac
