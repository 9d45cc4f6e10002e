"""Saturated-model goodness-of-fit (parallel/gof.py): statistic value against
a hand-computed oracle, bootstrap p-value behavior for good and bad models,
and the chi-squared regime sanity check."""

import numpy as np
import jax
import pytest
from scipy import stats, special

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  saturated_logl, gof_ts, gof_pvalue)

TARGET = 's0_rate_multiplier'


def _study(events_per_day=200.0, n_bins=None, x_range=(-10, 10)):
    space = ([['x', [-10, -1, 1, 10]]] if n_bins is None
             else [['x', np.linspace(*x_range, n_bins + 1)]])
    conf = conf_for_test(n_sources=2, mc=True, analysis_space=space,
                         n_events_for_pdf=int(2e5))
    conf['sources'][0]['events_per_day'] = events_per_day
    conf['sources'][1]['mu'] = 3.0
    conf['sources'][1]['events_per_day'] = events_per_day
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf, BinnedToyStudy(lf)


def test_saturated_logl_oracle():
    _, study = _study()
    counts = np.array([3.0, 7.0, 0.0])
    expect = sum(stats.poisson.logpmf(int(k), k) for k in counts if k > 0)
    assert saturated_logl(study, counts) == pytest.approx(expect, rel=1e-12)
    batch = np.stack([counts, 2 * counts])
    out = saturated_logl(study, batch, batched=True)
    assert out.shape == (2,)
    assert out[0] == pytest.approx(expect, rel=1e-12)


def test_gof_ts_matches_host_double_computation():
    """t equals 2(LL_sat - LL_hat) with LL_hat from the host best fit."""
    lf, study = _study()
    counts = np.asarray(study.simulate(jax.random.PRNGKey(2), 1,
                                       {TARGET: 1.0}))[0]
    t, fit = gof_ts(study, counts=counts)
    centers = [-5.5, 0.0, 5.5]
    xs = np.concatenate([np.full(int(counts[j]), centers[j])
                         for j in range(3)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    _, ll_hat = lf.bestfit_jax()
    t_host = 2.0 * (saturated_logl(study, counts) - ll_hat)
    assert t == pytest.approx(t_host, rel=1e-4, abs=1e-6)
    assert t >= -1e-9       # no priors in this model: LL_sat >= LL_hat


def test_gof_pvalue_well_specified_model():
    """Data simulated FROM the model: p should be unremarkable (not in
    either extreme tail)."""
    _, study = _study()
    counts = np.asarray(study.simulate(jax.random.PRNGKey(3), 1,
                                       {TARGET: 1.0}))[0]
    out = gof_pvalue(study, jax.random.PRNGKey(4), 256, counts=counts)
    assert 0.02 < out['p'] < 0.999
    assert out['t_toys'].shape == (256,)
    assert out['truth'][TARGET] == pytest.approx(
        float(np.asarray(out['fit'][TARGET])[0]))


def test_gof_pvalue_rejects_bad_model():
    """Data the model cannot describe (all events piled in one bin at 5x the
    possible rate) must give a tiny p."""
    _, study = _study()
    bad = np.array([0.0, 2000.0, 0.0])
    out = gof_pvalue(study, jax.random.PRNGKey(5), 256, counts=bad)
    assert out['p'] <= 2.0 / 257 + 1e-12, out['p']
    assert out['t_obs'] > np.quantile(out['t_toys'], 0.999)


def test_gof_chi2_regime():
    """Many high-count bins, Gaussian regime: the bootstrap t distribution
    should roughly track chi2(n_bins - n_free)."""
    # Every bin well-populated (the space hugs the two Gaussians), so all
    # bins contribute a full unit of df
    _, study = _study(events_per_day=2000.0, n_bins=9, x_range=(-3, 6))
    expected = np.asarray(study.expected_counts(**{TARGET: 1.0}))
    assert (expected > 5.0).all()
    counts = np.asarray(study.simulate(jax.random.PRNGKey(6), 1,
                                       {TARGET: 1.0}))[0]
    out = gof_pvalue(study, jax.random.PRNGKey(7), 384, counts=counts)
    df = 9 - 1
    med = float(np.median(out['t_toys']))
    assert abs(med - stats.chi2.ppf(0.5, df)) < 0.35 * df, (med, df)


def test_gof_rejects_unbinned():
    conf = conf_for_test(n_sources=1, mc=True,
                         analysis_space=[['x', [-10, 0, 10]]],
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    with pytest.raises(TypeError, match="binned"):
        gof_ts(study)
