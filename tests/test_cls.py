"""CLs exclusion limits (parallel/cls.py): observed curve/limit and expected
band, checked for the defining CLs properties (CLs >= CLsb, limits never
tighter than the plain frequentist ones) and against the Wilks regime."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  cls_curve, cls_upper_limit,
                                  cls_expected_band, observed_interval)

TARGET = 's0_rate_multiplier'


def _conf():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['mu'] = 3.0
    conf['sources'][1]['events_per_day'] = 50.0
    return conf


def _study():
    lf = BinnedLogLikelihood(_conf())
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf, BinnedToyStudy(lf)


def test_cls_curve_properties():
    lf, study = _study()
    counts = np.asarray(study.simulate(jax.random.PRNGKey(2), 1,
                                       {TARGET: 0.0}))[0]
    hyps = np.linspace(0.05, 2.5, 13)
    curve = cls_curve(study, jax.random.PRNGKey(0), TARGET, hyps,
                      n_toys=128, counts=counts)
    # CLb is a probability and CLs = CLsb/CLb >= CLsb everywhere
    assert np.all(curve['clb'] > 0) and np.all(curve['clb'] <= 1)
    assert np.all(curve['cls'] >= curve['clsb'] - 1e-12)
    assert np.all(curve['q_obs'] >= 0)
    assert curve['q_sb'].shape == (13, 128)
    assert curve['q_b'].shape == (13, 128)
    # CLsb must fall with mu for a background-like dataset (grossly —
    # Monte-Carlo noise allows local wiggles)
    assert curve['clsb'][-1] < curve['clsb'][0]


def test_cls_limit_not_tighter_than_clsb():
    """The CLs upper limit must sit at or above the plain frequentist
    (CLsb-crossing) limit on the same curve — the whole point of the
    prescription."""
    lf, study = _study()
    counts = np.asarray(study.simulate(jax.random.PRNGKey(5), 1,
                                       {TARGET: 0.0}))[0]
    hyps = np.linspace(0.05, 3.0, 16)
    ul, curve = cls_upper_limit(study, jax.random.PRNGKey(1), TARGET, hyps,
                                n_toys=192, counts=counts, cl=0.9,
                                return_curve=True)
    assert np.isfinite(ul) and hyps[0] <= ul <= hyps[-1]
    # CLsb-only crossing of the same alpha
    from blueice_tpu.parallel.cls import _cls_crossing
    ul_clsb = _cls_crossing(curve['hypotheses'], curve['clsb'], 0.1)
    assert ul >= ul_clsb - 1e-9, (ul, ul_clsb)


def test_cls_tracks_wilks_in_asymptotic_regime():
    """With plenty of statistics and the best fit well inside the bounds,
    CLb ~ 0.5 at the limit and the CLs 90% limit lands near the
    Wilks-based 95% CLsb one (Read 2002 relation: CLs(0.1) with CLb=0.5
    equals CLsb = 0.05). Loose agreement with observed_interval."""
    conf = _conf()
    conf['sources'][0]['events_per_day'] = 40.0
    conf['sources'][1]['events_per_day'] = 400.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = BinnedToyStudy(lf)
    # A mild upward-fluctuation dataset so the best fit is interior
    counts = np.asarray(study.simulate(jax.random.PRNGKey(21), 1,
                                       {TARGET: 0.35}))[0]
    hyps = np.linspace(0.02, 1.6, 25)
    ul, curve = cls_upper_limit(study, jax.random.PRNGKey(3), TARGET, hyps,
                                n_toys=400, counts=counts, cl=0.9,
                                return_curve=True)
    # Interior best fit: the asymptotic relation needs x_hat > 0
    assert curve['x_hat'] > 0.05
    ul_wilks95 = observed_interval(study, TARGET, hypotheses=hyps,
                                   counts=counts, kind='upper', cl=0.95)
    assert np.isfinite(ul) and np.isfinite(ul_wilks95)
    assert abs(ul - ul_wilks95) / ul_wilks95 < 0.25, (ul, ul_wilks95)


def test_cls_expected_band():
    lf, study = _study()
    hyps = np.linspace(0.05, 4.0, 15)
    out = cls_expected_band(study, jax.random.PRNGKey(4), TARGET, hyps,
                            n_toys=96, cl=0.9)
    band = out['band']
    vals = [band[q] for q in sorted(band)]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    assert np.isfinite(band[0.5])
    assert len(out['limits']) == 96
    # Median expected CLs limit >= the median plain-frequentist expectation
    # of the same model scale (sanity: it is O(the Wilks sensitivity), not 0)
    assert hyps[0] <= band[0.5] <= hyps[-1]


def test_cls_rejects_bad_grid_and_unbinned_counts():
    lf, study = _study()
    with pytest.raises(ValueError, match="grid"):
        cls_curve(study, jax.random.PRNGKey(0), TARGET, [1.0], n_toys=8)

    conf = _conf()
    ulf = UnbinnedLogLikelihood(conf)
    ulf.add_rate_parameter('s0')
    ulf.prepare()
    ustudy = UnbinnedToyStudy(ulf)
    with pytest.raises(ValueError, match="binned"):
        cls_curve(ustudy, jax.random.PRNGKey(0), TARGET,
                  np.linspace(0.1, 1, 4), n_toys=8, counts=np.ones(3))
