"""Nuisance pulls/constraints/impacts (parallel/ranking.py).

Oracle: a single-bin counting model n = B*s1 + S*s0 with a tight Gaussian
prior on the background multiplier s1. In one bin the two rates are exactly
degenerate, so everything is computable on Asimov data (n = B + S):

* the free fit sits at (1, 1) (prior center, Poisson exact);
* s1's profile is prior-only (s0 absorbs the Poisson term EXACTLY in one
  bin): t(s1=v) = ((v-1)/sigma_p)^2 — post-fit error = sigma_p,
  constraint = 1, pull = 0;
* fixing s1 = 1 +- sigma_p re-profiles s0 to keep the Poisson term exact:
  Delta s0 = -+ B*sigma_p/S, exactly (both pre- and post-fit);
* the POI's own profile carries BOTH the Poisson and the prior piece
  (sigma_mu^2 ~ n/S^2 + (B*sigma_p/S)^2); the test pins it against an
  independent scipy profile of the same one-bin likelihood.
"""

import numpy as np
import jax
import pytest
from scipy import optimize

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  nuisance_ranking)

TARGET = 's0_rate_multiplier'
B = 400.0
S = 40.0        # large enough that the POI's -1 sigma edge stays above 0
SIGMA_P = 0.02
N = B + S       # Asimov observed count


def _t_poi_exact(m):
    """Exact profile-LR statistic of the one-bin likelihood at s0 = m,
    profiling s1 (independent scipy implementation)."""
    def f(s1):
        lam = B * s1 + S * m
        return 2.0 * (lam - N * np.log(lam)) + ((s1 - 1.0) / SIGMA_P) ** 2
    res = optimize.minimize_scalar(f, bounds=(1e-6, 3.0), method='bounded',
                                   options={'xatol': 1e-12})
    f_global = 2.0 * (N - N * np.log(N))    # optimum at (1, 1)
    return res.fun - f_global


def _study():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-30.0, 30.0]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = S
    conf['sources'][1]['events_per_day'] = B
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_uncertainty('s1', SIGMA_P)
    lf.prepare()
    return BinnedToyStudy(lf)


def test_ranking_counting_oracle():
    study = _study()
    counts = study.expected_counts()        # Asimov at defaults (1, 1)
    out = nuisance_ranking(study, TARGET, counts=counts)
    assert out['target'] == TARGET
    assert out['target_hat'] == pytest.approx(1.0, abs=1e-3)
    scale = B * SIGMA_P / S                 # = 0.2
    lo, hi = out['target_interval']
    # Exact scipy twin: the t = 1 crossings of the profiled one-bin LR
    lo_ref = optimize.brentq(lambda m: _t_poi_exact(m) - 1.0, 1e-3, 1.0)
    hi_ref = optimize.brentq(lambda m: _t_poi_exact(m) - 1.0, 1.0, 3.0)
    assert lo == pytest.approx(lo_ref, rel=5e-3)
    assert hi == pytest.approx(hi_ref, rel=5e-3)

    (row,) = out['nuisances']
    assert row['name'] == 's1_rate_multiplier'
    assert row['theta_hat'] == pytest.approx(1.0, abs=1e-4)
    assert row['pull'] == pytest.approx(0.0, abs=0.05)
    # Grid-interpolated t=1 crossings carry ~1% resolution error
    assert row['sigma_lo'] == pytest.approx(SIGMA_P, rel=2e-2)
    assert row['sigma_hi'] == pytest.approx(SIGMA_P, rel=2e-2)
    assert row['constraint'] == pytest.approx(1.0, rel=2e-2)
    assert row['prior_mu'] == 1.0 and row['prior_sigma'] == SIGMA_P
    # Fixing s1 DOWN frees up events for the signal: impact_lo = +scale
    assert row['impact_lo'] == pytest.approx(+scale, rel=1e-2)
    assert row['impact_hi'] == pytest.approx(-scale, rel=1e-2)
    # Post-fit error == prior width here, so prefit == postfit impacts
    assert row['prefit_impact_lo'] == pytest.approx(row['impact_lo'],
                                                    rel=1e-2)
    assert row['prefit_impact_hi'] == pytest.approx(row['impact_hi'],
                                                    rel=1e-2)


def test_ranking_orders_by_impact_and_validates_target():
    study = _study()
    counts = study.expected_counts()
    with pytest.raises(ValueError, match="unknown target"):
        nuisance_ranking(study, 'nope', counts=counts)
    # Fixing the only nuisance leaves an empty ranking
    out = nuisance_ranking(study, TARGET, counts=counts,
                           fixed={'s1_rate_multiplier': 1.0})
    assert out['nuisances'] == []


def test_ranking_unbinned_smoke():
    """The unbinned path (set_data dataset, no counts=) runs and returns the
    full key set; pull ~ 0 on a dataset simulated at the defaults."""
    conf = conf_for_test(n_sources=2, mc=False)
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_uncertainty('s1', 0.15)
    lf.prepare()
    np.random.seed(42)
    lf.set_data(lf.base_model.simulate())
    study = UnbinnedToyStudy(lf)
    with pytest.raises(ValueError, match="binned"):
        nuisance_ranking(study, TARGET, counts=np.zeros(3))
    out = nuisance_ranking(study, TARGET)
    (row,) = out['nuisances']
    assert row['name'] == 's1_rate_multiplier'
    assert abs(row['pull']) < 3.0
    assert np.isfinite(row['impact_lo']) and np.isfinite(row['impact_hi'])
    assert np.isfinite(out['target_hat'])
