"""Asimov expected limits (parallel/asymptotics.py): the asymptotic
(arXiv:1007.1727) twin of the toy sensitivity band.

Oracle: a single-bin counting experiment, where q_mu on the Asimov dataset
has the closed form 2[lam - b - b*ln(lam/b)], lam = b + mu*s — so sigma(mu)
and every band edge are hand-computable. The toy cross-check pins the
asymptotic median against the exact toy-band median at high counts."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  asimov_sigma, asimov_expected_limits,
                                  asimov_median_limit, sensitivity_band)

TARGET = 's0_rate_multiplier'
B = 400.0      # expected background events (1 bin, 1 day)
S = 20.0       # expected signal events at multiplier 1


def _counting_lf():
    """One-bin counting model: everything lands in the single bin, the
    background rate is a fixed setting (no parameter), the signal rate
    multiplier is the target."""
    # MC-templated sources, but the single bin covers everything: the pmf
    # per bin is exactly 1 and fraction_in_range exactly 1, so the counting
    # oracle is MC-noise-free
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-30.0, 30.0]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = S
    conf['sources'][1]['events_per_day'] = B
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf


def _q_asimov_exact(mu):
    """Closed-form q_mu on the n = B Asimov dataset of the counting model."""
    lam = B + mu * S
    return 2.0 * (lam - B - B * np.log(lam / B))


def test_asimov_sigma_counting_oracle():
    study = BinnedToyStudy(_counting_lf())
    for mu in (0.5, 1.0, 2.0):
        sig = asimov_sigma(study, TARGET, mu)
        expected = mu / np.sqrt(_q_asimov_exact(mu))
        assert sig == pytest.approx(expected, rel=2e-3)


def test_asimov_sigma_rejects_null_hypothesis():
    study = BinnedToyStudy(_counting_lf())
    with pytest.raises(ValueError, match="must exceed"):
        asimov_sigma(study, TARGET, 0.0)


def test_band_matches_counting_oracle():
    """Every band edge solves mu = sigma(mu) * c_N on the closed-form
    sigma(mu) of the counting model."""
    study = BinnedToyStudy(_counting_lf())
    cl = 0.9
    out = asimov_expected_limits(study, TARGET, cl=cl)
    band = out['band']
    assert abs(out['x_hat_asimov']) < 0.05
    z = stats.norm.ppf(cl)
    for q, edge in band.items():
        c = z + stats.norm.ppf(q)
        if c <= 0:
            assert edge == 0.0
            continue
        # Solve the same fixed point on the EXACT sigma curve
        mu = 1.0
        for _ in range(200):
            mu = c * mu / np.sqrt(_q_asimov_exact(mu))
        assert edge == pytest.approx(mu, rel=5e-3)
    # Band is monotone in the quantile
    vals = list(band.values())
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_cls_band_never_below_plain():
    study = BinnedToyStudy(_counting_lf())
    plain = asimov_expected_limits(study, TARGET, cl=0.9)['band']
    clsb = asimov_expected_limits(study, TARGET, cl=0.9, cls=True)['band']
    for q in plain:
        assert clsb[q] >= plain[q] - 1e-9
    # The CLs median is strictly above the plain one (Phi^-1(0.95) vs
    # Phi^-1(0.9) critical offsets at cl=0.9)
    assert clsb[0.5] > plain[0.5] * 1.1


def test_median_limit_matches_toy_band():
    """At B = 400 counts the Gaussian asymptotic should agree with the exact
    toy-band median to a few percent."""
    study = BinnedToyStudy(_counting_lf())
    med_a = asimov_median_limit(study, TARGET, cl=0.9)
    toy = sensitivity_band(study, jax.random.PRNGKey(7), TARGET,
                           hypotheses='auto', n_toys=512, cl=0.9)
    med_t = toy['band'][0.5]
    assert med_a == pytest.approx(med_t, rel=0.12)


def test_unbinned_study_rejected():
    conf = conf_for_test(n_sources=1, mc=False)
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    with pytest.raises(TypeError, match="binned"):
        asimov_expected_limits(UnbinnedToyStudy(lf), TARGET)
    with pytest.raises(TypeError, match="binned"):
        asimov_sigma(UnbinnedToyStudy(lf), TARGET, 1.0)
