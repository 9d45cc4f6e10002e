"""Correlated (multivariate-Gaussian) nuisance constraints:
priors.MultivariateNormalPrior + composition.correlated_gaussian_constraint.
Oracle: scipy.stats.multivariate_normal. Beyond the reference (its priors are
one callable per parameter, blueice/likelihood.py:488-504)."""

import pickle

import numpy as np
import numpy.testing as npt
import pytest
from scipy import stats

from blueice_tpu.priors import MultivariateNormalPrior, NormalPrior
from blueice_tpu.composition import (correlated_gaussian_constraint,
                                     LogLikelihoodSum)
from blueice_tpu.likelihood import UnbinnedLogLikelihood
from blueice_tpu.test_helpers import conf_for_test, almost_equal

MEAN = np.array([1.0, 2.0])
COV = np.array([[0.04, 0.015], [0.015, 0.09]])


def test_matches_scipy():
    prior = MultivariateNormalPrior(MEAN, COV)
    oracle = stats.multivariate_normal(MEAN, COV)
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = MEAN + rng.normal(size=2) * 0.5
        npt.assert_allclose(prior(x), oracle.logpdf(x), rtol=1e-12)
    # list-of-floats and dict forms
    npt.assert_allclose(prior([1.1, 1.8]), oracle.logpdf([1.1, 1.8]))
    from collections import OrderedDict
    npt.assert_allclose(prior(OrderedDict(a=1.1, b=1.8)),
                        oracle.logpdf([1.1, 1.8]))


def test_jax_twin_and_grad():
    import jax
    import jax.numpy as jnp
    prior = MultivariateNormalPrior(MEAN, COV)
    x = np.array([0.9, 2.3])
    npt.assert_allclose(float(jax.jit(prior)(jnp.asarray(x))), prior(x),
                        rtol=1e-10)
    g = jax.grad(prior)(jnp.asarray(x))
    # gradient of the Gaussian log-density: -cov^{-1} (x - mean)
    npt.assert_allclose(np.asarray(g),
                        -np.linalg.solve(COV, x - MEAN), rtol=1e-8)


def test_validation():
    with pytest.raises(ValueError, match='symmetric'):
        MultivariateNormalPrior([0, 0], [[1.0, 0.5], [0.1, 1.0]])
    with pytest.raises(ValueError, match='positive definite'):
        MultivariateNormalPrior([0, 0], [[1.0, 2.0], [2.0, 1.0]])
    with pytest.raises(ValueError, match='cov must be'):
        MultivariateNormalPrior([0, 0, 0], COV)
    with pytest.raises(ValueError, match='parameter names'):
        correlated_gaussian_constraint(['a'], MEAN, COV)


def test_value_semantics_and_pickle():
    p1 = MultivariateNormalPrior(MEAN, COV)
    p2 = pickle.loads(pickle.dumps(p1))
    assert p1 == p2 and hash(p1) == hash(p2)
    assert p1([1.0, 2.0]) == p2([1.0, 2.0])
    assert p1 != MultivariateNormalPrior(MEAN, COV * 2)


def _sum_with_constraint():
    # Distinguishable sources (different means) + asymmetric truth, so the
    # unconstrained fit resolves distinct multipliers the constraint can pull
    conf = conf_for_test(n_sources=2)
    conf['sources'] = [dict(name='s0', mu=0.0), dict(name='s1', mu=2.5)]
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.prepare()
    lf.set_data(lf.base_model.simulate(
        rate_multipliers=dict(s0=1.3, s1=0.7),
        rng=np.random.default_rng(7)))
    constraint = correlated_gaussian_constraint(
        ['s0_rate_multiplier', 's1_rate_multiplier'],
        [1.0, 1.0], [[0.01, 0.008], [0.008, 0.01]])
    return lf, constraint, LogLikelihoodSum([lf, constraint])


def test_composed_host_value():
    lf, constraint, joint = _sum_with_constraint()
    oracle = stats.multivariate_normal([1.0, 1.0],
                                       [[0.01, 0.008], [0.008, 0.01]])
    for kw in [dict(), dict(s0_rate_multiplier=1.1),
               dict(s0_rate_multiplier=0.9, s1_rate_multiplier=1.2)]:
        x = [kw.get('s0_rate_multiplier', 1.0),
             kw.get('s1_rate_multiplier', 1.0)]
        assert almost_equal(joint(**kw), lf(**kw) + oracle.logpdf(x), 1e-12)


def test_composed_compiled_and_fit():
    from blueice_tpu.compile import build_logl
    lf, constraint, joint = _sum_with_constraint()
    c = build_logl(joint)
    for kw in [dict(), dict(s0_rate_multiplier=1.15, s1_rate_multiplier=0.85)]:
        assert almost_equal(float(c(**kw)), joint(**kw), 1e-9), kw

    # The tight rho=0.8 constraint pulls the fitted multipliers together:
    # their fitted difference must be well inside the unconstrained spread
    from blueice_tpu.inference import bestfit_scipy
    res_con, _ = bestfit_scipy(joint)
    res_unc, _ = bestfit_scipy(lf)
    d_con = abs(res_con['s0_rate_multiplier'] - res_con['s1_rate_multiplier'])
    d_unc = abs(res_unc['s0_rate_multiplier'] - res_unc['s1_rate_multiplier'])
    assert d_con < d_unc
    # and both fitted values sit near the constraint center
    assert abs(res_con['s0_rate_multiplier'] - 1) < 0.3
    assert abs(res_con['s1_rate_multiplier'] - 1) < 0.3


@pytest.mark.slow
def test_correlated_constraint_in_toy_study():
    """The MVN constraint traces inside the vmapped toy-fit program and
    tightens the correlated pair relative to the unconstrained fit."""
    import jax
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.parallel.toys import BinnedToyStudy
    from blueice_tpu.test_helpers import GaussianMCSource

    conf = conf_for_test(mc=True, n_sources=2, events_per_day=500.,
                         n_events_for_pdf=int(1e5))
    conf['sources'] = [dict(name='s0', mu=0.0), dict(name='s1', mu=2.0)]
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.prepare()

    free = BinnedToyStudy(lf).run(jax.random.PRNGKey(2), n_toys=128)
    constraint = correlated_gaussian_constraint(
        ['s0_rate_multiplier', 's1_rate_multiplier'],
        [1.0, 1.0], np.array([[1e-4, 8e-5], [8e-5, 1e-4]]))
    joint = LogLikelihoodSum([lf, constraint])
    con = BinnedToyStudy(joint).run(jax.random.PRNGKey(2), n_toys=128)

    for p in ('s0_rate_multiplier', 's1_rate_multiplier'):
        assert con[p].std() < 0.7 * free[p].std(), p
    # rho = 0.8: the fitted multipliers co-move across toys
    corr = np.corrcoef(con['s0_rate_multiplier'],
                       con['s1_rate_multiplier'])[0, 1]
    assert corr > 0.3, corr


def test_correlation_matters():
    """The off-diagonal term changes the joint value: correlated != the
    product of two independent NormalPriors at off-center points."""
    corr = correlated_gaussian_constraint(['a', 'b'], [0., 0.],
                                          [[1.0, 0.9], [0.9, 1.0]])
    indep = (NormalPrior(0, 1)(1.0) + NormalPrior(0, 1)(-1.0))
    anti = corr(a=1.0, b=-1.0)      # strongly disfavored under rho=+0.9
    aligned = corr(a=1.0, b=1.0)    # favored
    assert aligned > indep > anti
