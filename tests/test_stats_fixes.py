"""Regression tests for review findings in the statistics toolkit:

- calibration ensembles must SIMULATE ``fixed=`` parameter values, not just
  constrain the fits there (discovery / cls / limits / neyman / gof /
  asimov) — otherwise the toy statistics belong to a different model than
  the fits that evaluate them;
- the shared add-one tail-fraction estimator (one implementation, with
  relative + absolute tie tolerance);
- asimov_expected_limits clamps band edges to the target's upper bound;
- coverage_check flags truth-beyond-grid toys as undecided instead of
  silently scoring them uncovered, and reports the actual ensemble size.
"""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, NeymanConstruction,
                                  observed_discovery, discovery_ts,
                                  cls_curve, toy_upper_limits,
                                  coverage_check, gof_pvalue)
from blueice_tpu.parallel import asymptotics
from blueice_tpu.parallel._stats import simulation_truth, tail_fraction

TARGET = 's0_rate_multiplier'
NUIS = 's1_rate_multiplier'


def _study():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['events_per_day'] = 30.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.prepare()
    return BinnedToyStudy(lf)


def _spy_simulate(study, calls):
    """Record the truth dict of every ensemble the study simulates."""
    orig = study.simulate

    def spy(key, n_toys, truth=None, mesh=None):
        calls.append(dict(truth or {}))
        return orig(key, n_toys, truth, mesh)

    study.simulate = spy


def test_simulation_truth_precedence():
    assert simulation_truth(None, None) == {}
    assert simulation_truth({'a': 1.0}, {'b': 2.0}) == {'a': 1.0, 'b': 2.0}
    # Explicit truth wins over fixed; keyword overrides win over both
    assert simulation_truth({'a': 1.0}, {'a': 2.0}) == {'a': 1.0}
    assert simulation_truth({'a': 1.0}, {'a': 2.0}, a=3.0) == {'a': 3.0}


def test_tail_fraction():
    s = np.sort(np.array([0.0, 1.0, 2.0, 3.0]))
    assert tail_fraction(s, 10.0) == pytest.approx(1.0 / 5.0)
    # Ties count as >= at both a positive value and exactly zero
    assert tail_fraction(s, 2.0) == pytest.approx(3.0 / 5.0)
    assert tail_fraction(s, 0.0) == pytest.approx(1.0)
    np.testing.assert_allclose(tail_fraction(s, np.array([10.0, -1.0])),
                               [0.2, 1.0])


def test_discovery_calibration_simulates_fixed():
    study = _study()
    calls = []
    _spy_simulate(study, calls)
    res = observed_discovery(study, TARGET, counts=study.expected_counts(),
                             fixed={NUIS: 1.5},
                             key=jax.random.PRNGKey(0), n_calibration=8)
    assert 'p_toys' in res
    assert calls, "toy calibration must simulate an ensemble"
    assert all(c.get(NUIS) == 1.5 for c in calls)
    assert all(c.get(TARGET) == 0.0 for c in calls)

    # Explicit truth wins over fixed for the simulated value
    calls.clear()
    discovery_ts(study, jax.random.PRNGKey(1), 8, TARGET,
                 truth={NUIS: 0.5}, fixed={NUIS: 1.5})
    assert calls[0][NUIS] == 0.5


def test_cls_calibration_simulates_fixed():
    study = _study()
    calls = []
    _spy_simulate(study, calls)
    cls_curve(study, jax.random.PRNGKey(2), TARGET, [1.0, 2.0], 8,
              counts=study.expected_counts(), fixed={NUIS: 1.5})
    # Two s+b ensembles (one per hypothesis) + one b-only ensemble
    assert len(calls) == 3
    assert all(c.get(NUIS) == 1.5 for c in calls)


def test_limits_simulate_fixed():
    study = _study()
    calls = []
    _spy_simulate(study, calls)
    toy_upper_limits(study, jax.random.PRNGKey(3), TARGET,
                     np.linspace(0.0, 8.0, 6), 8, fixed={NUIS: 1.5})
    assert calls and all(c.get(NUIS) == 1.5 for c in calls)
    assert all(c.get(TARGET) == 0.0 for c in calls)


def test_neyman_truth_folds_fixed():
    study = _study()
    nc = NeymanConstruction(study, TARGET, fixed={NUIS: 1.5})
    assert nc.truth[NUIS] == 1.5
    nc2 = NeymanConstruction(study, TARGET, fixed={NUIS: 1.5},
                             truth={NUIS: 0.5})
    assert nc2.truth[NUIS] == 0.5


def test_gof_explicit_truth_folds_fixed():
    study = _study()
    calls = []
    _spy_simulate(study, calls)
    gof_pvalue(study, jax.random.PRNGKey(4), 8,
               counts=study.expected_counts(),
               truth={TARGET: 1.0}, fixed={NUIS: 1.5})
    assert calls[0][NUIS] == 1.5 and calls[0][TARGET] == 1.0


class _FakeCompiled:
    def __init__(self):
        self.bounds = {'s': (0.0, 2.0)}
        self.defaults = {'s': 1.0}


class _FakeAsimovStudy:
    """Constant-sigma oracle: q_mu^Asimov = (mu / sigma_true)^2, so every
    asymptotic edge is sigma_true * c_N before clamping."""
    sigma_true = 3.0

    def __init__(self):
        self.compiled = _FakeCompiled()
        self.count_calls = []

    def expected_counts(self, **kw):
        self.count_calls.append(dict(kw))
        return np.zeros(3)

    def profile_map(self, space, counts=None, fixed=None):
        (name, hyps), = space
        t = (np.asarray(hyps, float) / self.sigma_true) ** 2
        return t, {name: np.array([0.0])}, None


def test_asimov_sigma_oracle():
    study = _FakeAsimovStudy()
    assert asymptotics.asimov_sigma(study, 's', 1.0) == pytest.approx(3.0)


def test_asimov_band_clamps_to_upper_bound():
    study = _FakeAsimovStudy()
    out = asymptotics.asimov_expected_limits(study, 's', cl=0.9,
                                             fixed={'b': 0.7})
    # Unclamped, the 97.5% edge would be sigma * (1.2816 + 1.96) ~ 9.7;
    # the parameter space ends at 2.0 and so must the band
    assert max(out['band'].values()) <= 2.0 + 1e-9
    assert out['band'][0.975] == pytest.approx(2.0)
    # fixed= values shape the Asimov dataset (with the target at the null)
    assert study.count_calls[0] == {'b': 0.7, 's': 0.0}


def test_coverage_undecided_edges_flagged():
    study = _study()
    # Truth far beyond an explicit grid: the upper edges are unresolved on
    # the truth's own side — undecidable, flagged, scored not covered
    with pytest.warns(UserWarning, match="NOT covered"):
        out = coverage_check(study, jax.random.PRNGKey(5), TARGET,
                             true_values=[30.0], n_toys=8, kind='upper',
                             cl=0.9, hypotheses=np.linspace(0.0, 1.0, 4))
    assert out['n_undecided'][0] > 0
    assert out['n_toys'] == 8
    assert out['coverage'][0] < 1.0
