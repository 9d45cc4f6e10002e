"""Coverage validation (parallel/coverage.py) and unified intervals
(toy_unified_intervals / observed_interval(kind='unified')).

Oracle: the single-bin counting model (B = 400, S = 20 expected events), where
sigma(mu_hat) ~ sqrt(B)/S = 1.0 and Wilks is accurate — coverage of the
one-sided q_mu upper limit at truth 1.0 is ~0.90-0.92 (the boundary at 0
truncates only otherwise-uncovered downward fluctuations), and the unified
interval coincides with the central one away from the boundary."""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, NeymanConstruction,
                                  coverage_check, clopper_pearson,
                                  toy_unified_intervals,
                                  toy_central_intervals, observed_interval)

TARGET = 's0_rate_multiplier'
B = 400.0
S = 20.0


def _counting_study():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-30.0, 30.0]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = S
    conf['sources'][1]['events_per_day'] = B
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return BinnedToyStudy(lf)


def test_clopper_pearson_basics():
    lo, hi = clopper_pearson(90, 100, conf=0.95)
    assert lo < 0.9 < hi and 0.8 < lo and hi < 0.96
    assert clopper_pearson(0, 50)[0] == 0.0
    assert clopper_pearson(50, 50)[1] == 1.0
    # Wider confidence -> wider interval
    lo68, hi68 = clopper_pearson(45, 50, conf=0.68)
    lo95, hi95 = clopper_pearson(45, 50, conf=0.95)
    assert lo95 < lo68 and hi95 > hi68


def test_upper_limit_coverage_counting_oracle():
    """Wilks q_mu upper limits at truth 1.0 cover ~0.90-0.92 (closed-form
    Gaussian-plus-boundary argument in the module docstring)."""
    study = _counting_study()
    out = coverage_check(study, jax.random.PRNGKey(11), TARGET,
                         true_values=[1.0], n_toys=512, kind='upper', cl=0.9)
    cov = float(out['coverage'][0])
    assert 0.86 < cov < 0.96
    lo, hi = out['ci'][0]
    assert lo <= cov <= hi
    assert out['n_covered'][0] == round(cov * 512)
    assert out['kind'] == 'upper' and out['nominal'] == 0.9


def test_central_coverage_counting_oracle():
    study = _counting_study()
    out = coverage_check(study, jax.random.PRNGKey(12), TARGET,
                         true_values=[2.0], n_toys=512, kind='central',
                         cl=0.9)
    assert 0.85 < float(out['coverage'][0]) < 0.95


def test_neyman_calibrated_coverage_is_exact():
    """Closing the loop: upper limits with a one-sided Neyman-calibrated
    critical curve cover at the nominal level by construction (independent
    keys for calibration and validation)."""
    study = _counting_study()
    nc = NeymanConstruction(study, TARGET, statistic='upper',
                            truth={TARGET: 1.0})
    nc.scan(jax.random.PRNGKey(100), hypotheses=np.linspace(0.0, 5.0, 11),
            n_toys=2048)
    out = coverage_check(study, jax.random.PRNGKey(200), TARGET,
                         true_values=[1.0], n_toys=1024, kind='upper',
                         cl=0.9, t_ppf=nc.t_ppf)
    assert float(out['coverage'][0]) == pytest.approx(0.9, abs=0.05)


def test_coverage_multiple_truths_and_bad_kind():
    study = _counting_study()
    out = coverage_check(study, jax.random.PRNGKey(13), TARGET,
                         true_values=[0.5, 1.5], n_toys=64, kind='upper')
    assert out['coverage'].shape == (2,) and out['ci'].shape == (2, 2)
    assert len(out['edges']) == 2
    # Independent sub-keys: ensembles at the two truths differ
    with pytest.raises(ValueError, match="kind"):
        coverage_check(study, jax.random.PRNGKey(0), TARGET, [1.0], 8,
                       kind='bogus')


def test_unified_matches_central_away_from_boundary():
    """Under the default Wilks hook both kinds cross the same chi2(1).ppf(cl)
    curve, so unified == central wherever the central edges resolve; where
    the central lower edge dives below the parameter's bound (NaN), the
    unified edge IS the bound — the Feldman-Cousins transition."""
    study = _counting_study()
    key = jax.random.PRNGKey(21)
    truth = {TARGET: 2.0}
    lo_u, hi_u = toy_unified_intervals(study, key, TARGET, 'auto', 256,
                                       truth=truth, cl=0.9)
    lo_c, hi_c = toy_central_intervals(study, key, TARGET, 'auto', 256,
                                       truth=truth, cl=0.9)
    fin = np.isfinite(lo_c)
    assert fin.mean() > 0.5          # most toys sit away from the boundary
    assert np.allclose(lo_u[fin], lo_c[fin], rtol=1e-6, atol=1e-9)
    ok = np.isfinite(hi_c)
    assert np.allclose(hi_u[ok], hi_c[ok], rtol=1e-6, atol=1e-9)
    # Boundary transition: unresolved central lower edges become the bound
    assert np.all(lo_u[~fin] == 0.0)
    assert not np.isnan(lo_u).any()   # unified intervals are never empty
    assert np.all(hi_u[np.isfinite(hi_u)] >= lo_u[np.isfinite(hi_u)])


def test_unified_coverage():
    study = _counting_study()
    out = coverage_check(study, jax.random.PRNGKey(22), TARGET,
                         true_values=[1.0], n_toys=512, kind='unified',
                         cl=0.9)
    assert 0.85 < float(out['coverage'][0]) < 0.97


def test_observed_unified_interval():
    """One observed dataset: a strong-signal run gives a two-sided interval
    agreeing with kind='central'; a background-like run returns a
    lower edge at the bound (upper-limit transition) with the same upper
    edge as kind='upper' at the matching quantile."""
    study = _counting_study()
    lf = study.lf
    # Asimov-like strong-signal dataset: expected counts at multiplier 3
    counts = study.expected_counts(**{TARGET: 3.0})
    lo, hi = observed_interval(study, TARGET, kind='unified', cl=0.9,
                               counts=counts)
    lo_c, hi_c = observed_interval(study, TARGET, kind='central', cl=0.9,
                                   counts=counts)
    assert 0.0 < lo < 3.0 < hi
    assert lo == pytest.approx(lo_c, rel=1e-6)
    assert hi == pytest.approx(hi_c, rel=1e-6)
    # Background-only Asimov dataset: boundary transition
    counts_bg = study.expected_counts(**{TARGET: 0.0})
    lo_bg, hi_bg = observed_interval(study, TARGET, kind='unified', cl=0.9,
                                     counts=counts_bg)
    assert lo_bg == 0.0 and 0.0 < hi_bg < 3.0
