"""Edge-case semantics parity: allow_negative sources, unphysical policies,
binned compute_pdf, outlier floor."""

import numpy as np
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test, almost_equal
from blueice_tpu.likelihood import (UnbinnedLogLikelihood,
                                    BinnedLogLikelihood)
from blueice_tpu.compile import build_logl


def test_allow_negative_source():
    conf = conf_for_test(n_sources=2, events_per_day=1.)
    conf['sources'][0]['allow_negative'] = True
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.set_data(np.zeros(1, dtype=[('x', float), ('source', int)]))

    # Bounds open up for the negative-allowed source only
    assert lf.get_bounds('s0_rate_multiplier') == (-float('inf'), float('inf'))
    assert lf.get_bounds('s1_rate_multiplier') == (0, float('inf'))

    # A negative allowed-source rate with positive total is evaluable
    ll = lf(s0_rate_multiplier=-0.5, s1_rate_multiplier=2.0)
    assert np.isfinite(ll)
    oracle = -1.5 + np.log(1.5 * stats.norm.pdf(0))
    assert almost_equal(ll, oracle, 1e-9)

    # Negative total -> -inf; negative non-allowed source -> -inf
    assert lf(s0_rate_multiplier=-3.0) == -float('inf')
    assert lf(s1_rate_multiplier=-1.0) == -float('inf')

    # Compiled path agrees. (No re-prepare here: prepare() invalidates bound
    # data — same contract as the reference's prepare, which also resets
    # is_data_set — and set_data already auto-prepared this shape-free model.)
    c = build_logl(lf)
    assert almost_equal(
        float(c(s0_rate_multiplier=-0.5, s1_rate_multiplier=2.0)), ll, 1e-9)
    assert float(c(s0_rate_multiplier=-3.0)) == -np.inf


def test_outlier_likelihood_floor():
    """An event with zero density gets the outlier floor instead of -inf."""
    lf = UnbinnedLogLikelihood(conf_for_test(events_per_day=1.),
                               likelihood_config={'outlier_likelihood': 1e-6})
    d = np.zeros(2, dtype=[('x', float), ('source', int)])
    d['x'] = [0.0, 1e8]   # second event has pdf == 0 (underflow far away)
    lf.set_data(d)
    ll = lf()
    oracle = -1 + np.log(stats.norm.pdf(0)) + np.log(1e-6)
    assert almost_equal(ll, oracle, 1e-9)


def test_binned_compute_pdf_numeric():
    """compute_pdf=True rebuilds exact templates for binned likelihoods too."""
    conf = conf_for_test(mc=True, analysis_space=[['x', [-40, 0, 40]]],
                         n_events_for_pdf=int(3e4))
    lf = BinnedLogLikelihood(conf)
    lf.add_shape_parameter('mu', (-1., 0., 1.))
    lf.prepare()
    lf.set_data(np.zeros(1, dtype=[('x', float), ('source', int)]))

    # Exact rebuild at the off-anchor point mu=0.5: bin split by the
    # Gaussian cdf (up to MC statistics of the fresh template)
    exact = lf(compute_pdf=True, mu=0.5)
    p_lo = stats.norm.cdf(0, loc=0.5)
    oracle = (stats.poisson(1000 * p_lo).logpmf(0)
              + stats.poisson(1000 * (1 - p_lo)).logpmf(1))
    assert almost_equal(exact, oracle, 3e-2)
    # the interpolated value exists and differs in general (pmf nonlinear in mu)
    interp = lf(compute_pdf=False, mu=0.5)
    assert np.isfinite(interp)


def test_unphysical_error_mode_compiled_is_minus_inf():
    """The compiled path always uses -inf masking (no raising inside jit)."""
    lf = UnbinnedLogLikelihood(conf_for_test(),
                               likelihood_config={'unphysical_behaviour':
                                                  'error'})
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))
    with pytest.raises(ValueError, match="Unphysical"):
        lf(s0_rate_multiplier=-1)
    c = build_logl(lf)
    assert float(c(s0_rate_multiplier=-1)) == -np.inf
