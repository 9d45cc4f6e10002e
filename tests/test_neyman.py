"""Neyman construction: toy-calibrated critical values feeding the interval
root-finder."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.parallel import BinnedToyStudy, NeymanConstruction


def _lf():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf


def test_neyman_scan_and_ppf():
    lf = _lf()
    study = BinnedToyStudy(lf)
    nc = NeymanConstruction(study, 's0_rate_multiplier')
    with pytest.raises(RuntimeError):
        nc.t_ppf(1.0, 0.9)

    nc.scan(jax.random.PRNGKey(0), hypotheses=[0.7, 1.0, 1.3], n_toys=400)
    assert nc.t_sorted.shape == (3, 400)

    # Wilks regime: the toy critical value for a one-sided 90% level must
    # match Wilks' norm.ppf(0.9)^2 = chi2(1).ppf(0.8) ~ 1.64 — NOT the 0.9
    # quantile of the two-sided t (2.71), which would overcover
    wilks = stats.norm.ppf(0.9) ** 2
    for h in (0.7, 1.0, 1.3):
        crit = nc.t_ppf(h, 0.9)
        assert 0.6 * wilks < crit < 1.6 * wilks, (h, crit, wilks)
    # and the lower-limit quantile (1 - CL) mirrors to the same value
    assert nc.t_ppf(1.0, 0.1) == nc.t_ppf(1.0, 0.9)

    # ppf interpolates between hypotheses and clamps outside the scan range
    mid = nc.t_ppf(0.85, 0.9)
    assert min(nc.t_ppf(0.7, 0.9), nc.t_ppf(1.0, 0.9)) - 1e-9 <= mid \
        <= max(nc.t_ppf(0.7, 0.9), nc.t_ppf(1.0, 0.9)) + 1e-9
    assert nc.t_ppf(0.1, 0.9) == nc.t_ppf(0.7, 0.9)

    # By construction ~|2q-1| = 80% of toys fall below their own critical
    # value (the one-sided-consistent quantile of the two-sided statistic)
    cov = nc.coverage_check(0.9)
    assert np.all(np.abs(cov - 0.8) < 0.05), cov


def test_neyman_one_sided_statistic():
    """statistic='upper' calibrates the one-sided (q-tilde-style) statistic:
    exact one-sided coverage by construction, and in the symmetric Gaussian
    regime its critical value agrees with the two-sided |2q-1| mapping."""
    lf = _lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(3)
    two = NeymanConstruction(study, 's0_rate_multiplier').scan(
        key, hypotheses=[0.9, 1.0, 1.1], n_toys=600)
    up = NeymanConstruction(study, 's0_rate_multiplier',
                            statistic='upper').scan(
        key, hypotheses=[0.9, 1.0, 1.1], n_toys=600)

    # exact construction: ~10% of toys exceed the 90% one-sided critical
    # value of the one-sided statistic
    cov = up.coverage_check(0.9)
    assert np.all(np.abs(cov - 0.9) < 0.04), cov
    # symmetric regime: agrees with the mapped two-sided critical value
    for h in (0.9, 1.0, 1.1):
        c2, cu = two.t_ppf(h, 0.9), up.t_ppf(h, 0.9)
        assert abs(cu - c2) < 0.35 * max(c2, 1.0), (h, c2, cu)
    # roughly half the toys are zeroed (best fit above the true hypothesis)
    frac_zero = (up.t_sorted == 0).mean(axis=1)
    assert np.all((frac_zero > 0.3) & (frac_zero < 0.7)), frac_zero

    with pytest.raises(ValueError, match="statistic"):
        NeymanConstruction(study, 's0_rate_multiplier', statistic='weird')


def test_neyman_interval_end_to_end():
    """Toy-calibrated upper limit lands near the Wilks limit in the asymptotic
    regime, via the reference t_ppf hook."""
    lf = _lf()
    study = BinnedToyStudy(lf)
    nc = NeymanConstruction(study, 's0_rate_multiplier')
    nc.scan(jax.random.PRNGKey(1), hypotheses=np.linspace(0.7, 1.6, 4),
            n_toys=400)

    d = lf.base_model.simulate(rng=np.random.default_rng(5))
    lf.set_data(d)
    ul_neyman = lf.one_parameter_interval('s0_rate_multiplier', bound=3,
                                          kind='upper', confidence_level=0.9,
                                          t_ppf=nc.t_ppf)
    ul_wilks = lf.one_parameter_interval('s0_rate_multiplier', bound=3,
                                         kind='upper', confidence_level=0.9)
    assert 0.8 * ul_wilks < ul_neyman < 1.25 * ul_wilks


def test_profile_scan_shares_compilation():
    """Scanning hypotheses must reuse one compiled program (runtime
    hypothesis), not recompile per value."""
    lf = _lf()
    study = BinnedToyStudy(lf)
    ts = study.profile_ts_scan(jax.random.PRNGKey(0), 's0_rate_multiplier',
                               hypotheses=[0.9, 1.0, 1.1], n_toys=50)
    assert ts.shape == (3, 50)
    # the cache holds exactly one compiled profile program
    assert len(study._profile_cache) == 1
