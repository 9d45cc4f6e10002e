"""Weighted-MC density estimation: weight-sum templates, effective
(Beeston-Barlow) counts n_eff = (sum w)^2 / sum w^2, weight-based
fraction_in_range, and template-drawn toys.

Beyond the reference (its density estimation is unweighted-only,
blueice/source.py:272-310); the oracle here is closed-form arithmetic on
literal event/weight lists.
"""

import numpy as np
import numpy.testing as npt
import pytest
from scipy import stats

from blueice_tpu.models import Model
from blueice_tpu.models.source import DensityEstimatingSource, MonteCarloSource
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.test_helpers import (conf_for_test, make_data,
                                      FixedSampleSource)


class WeightedSampleSource(DensityEstimatingSource):
    """Density estimated from literal (events, weights) in the config.
    The generated weight is the sum of the returned weights (the weighted
    contract: cut events come back with weight 0)."""

    def get_events_for_density_estimate(self):
        d = self.config['data']
        return d, float(np.sum(d[self.config['weight_field']]))


class WeightedGaussianMCSource(MonteCarloSource):
    """Gaussian MC generator emitting a constant per-event weight — the
    unit-weight case must reproduce the unweighted pipeline exactly."""

    def simulate(self, n_events, rng=None):
        if rng is None or rng is np.random:
            rng = np.random.default_rng(np.random.randint(2 ** 31))
        d = np.zeros(n_events, dtype=[('x', float), ('source', int),
                                      ('w', float)])
        d['x'] = rng.normal(self.config['mu'], self.config['sigma'], n_events)
        d['w'] = self.config.get('event_weight', 1.0)
        return d


def _weighted_events(xs, ws):
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int), ('w', float)])
    d['x'] = xs
    d['w'] = ws
    return d


def test_effective_counts_closed_form():
    # bin [0,1): weights 1,2,3 -> sumw 6, sumw2 14, n_eff 36/14
    # bin [1,2): weight 2      -> sumw 2, sumw2 4,  n_eff 1
    # bin [2,3): empty         -> n_eff 0
    data = _weighted_events([0.5, 0.5, 0.5, 1.5], [1.0, 2.0, 3.0, 2.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1, 2, 3]]],
                         weight_field='w', data=data)
    s = Model(conf).sources[0]

    npt.assert_allclose(s._n_events_histogram.values, [36 / 14, 1.0, 0.0])
    # Template: per-bin weight share / bin volume
    npt.assert_allclose(s._pdf_histogram.values, [6 / 8, 2 / 8, 0.0])
    assert s.fraction_in_range == 1.0


def test_unit_weights_match_unweighted():
    data_w = _weighted_events([0.5, 0.5, 1.5, 2.5, 2.5, 2.5], np.ones(6))
    data_u, _ = make_data([dict(n_events=2, x=0.5), dict(n_events=1, x=1.5),
                           dict(n_events=3, x=2.5)])
    space = [['x', [0, 1, 2, 3]]]
    sw = Model(conf_for_test(default_source_class=WeightedSampleSource,
                             analysis_space=space, weight_field='w',
                             data=data_w)).sources[0]
    su = Model(conf_for_test(default_source_class=FixedSampleSource,
                             analysis_space=space,
                             data=data_u)).sources[0]
    npt.assert_array_equal(sw._pdf_histogram.values, su._pdf_histogram.values)
    npt.assert_array_equal(sw._n_events_histogram.values,
                           su._n_events_histogram.values)
    assert sw.fraction_in_range == su.fraction_in_range == 1.0


def test_constant_weights_add_no_information():
    # Scaling every weight by a constant changes neither the template nor
    # the effective counts: n_eff = (c*n)^2/(c^2*n) = n
    data1 = _weighted_events([0.5, 0.5, 1.5], [1.0, 1.0, 1.0])
    data7 = _weighted_events([0.5, 0.5, 1.5], [7.0, 7.0, 7.0])
    space = [['x', [0, 1, 2]]]
    s1 = Model(conf_for_test(default_source_class=WeightedSampleSource,
                             analysis_space=space, weight_field='w',
                             data=data1)).sources[0]
    s7 = Model(conf_for_test(default_source_class=WeightedSampleSource,
                             analysis_space=space, weight_field='w',
                             data=data7)).sources[0]
    npt.assert_allclose(s7._pdf_histogram.values, s1._pdf_histogram.values)
    npt.assert_allclose(s7._n_events_histogram.values, [2.0, 1.0])
    npt.assert_allclose(s1._n_events_histogram.values, [2.0, 1.0])


def test_weighted_fraction_in_range():
    # 3.0 of 4.0 total generated weight lands inside the analysis space
    data = _weighted_events([0.5, 5.0], [3.0, 1.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1]]],
                         weight_field='w', data=data)
    s = Model(conf).sources[0]
    assert s.fraction_in_range == 0.75
    # expected_events scales with the weighted in-range fraction
    assert s.expected_events == conf['events_per_day'] * 0.75


def test_weighted_mc_source_batches():
    """MonteCarloSource sums returned weights across batches for the
    generated-weight total."""
    np.random.seed(0)
    conf = conf_for_test(default_source_class=WeightedGaussianMCSource,
                         n_events_for_pdf=int(3e4),
                         pdf_sampling_batch_size=int(1e4),
                         event_weight=2.5, weight_field='w',
                         force_recalculation=True)
    s = Model(conf).sources[0]
    # Constant weights: fraction_in_range is count-based, ~1 for +-10 sigma
    assert s.fraction_in_range > 0.999
    # Effective counts equal raw counts for constant weights
    assert abs(s._n_events_histogram.n - 3e4 * s.fraction_in_range) < 0.5
    assert abs(s.pdf([0.0])[0] - stats.norm.pdf(0)) < 0.02


def test_weighted_toys_come_from_template():
    """Model.simulate on a weighted source draws unweighted toys from the
    built template — NOT from the weighted generator."""
    # Generator puts equal event counts in two bins, but 3:1 in weight
    data = _weighted_events([0.5] * 10 + [1.5] * 10, [3.0] * 10 + [1.0] * 10)
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         weight_field='w', data=data,
                         events_per_day=4000.)
    m = Model(conf)
    rng = np.random.default_rng(42)
    toys = m.simulate(rng=rng)
    assert 'w' not in (toys.dtype.names or ())
    n_lo = int(np.sum(toys['x'] < 1))
    n_hi = int(np.sum(toys['x'] >= 1))
    assert n_lo + n_hi > 3000
    ratio = n_lo / n_hi
    assert 2.5 < ratio < 3.5      # weight ratio, not the 1:1 count ratio


def test_negative_net_bin_rejects_toy_sampling():
    data = _weighted_events([0.5, 1.5, 1.5], [2.0, 0.5, -1.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         weight_field='w', data=data)
    s = Model(conf).sources[0]
    with pytest.raises(ValueError, match='net-negative'):
        s.simulate_toy(100, rng=np.random.default_rng(0))


def test_fraction_above_one_rejects_toy_sampling():
    """Net-negative OUT-of-range weight gives fraction_in_range > 1; the
    1/fraction scale-up cannot be undone by thinning, so host toy simulation
    must refuse instead of silently under-populating every toy."""
    data = _weighted_events([0.5, 5.0], [3.0, -1.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1]]],
                         weight_field='w', data=data)
    s = Model(conf).sources[0]
    assert s.fraction_in_range == 1.5
    with pytest.raises(ValueError, match='fraction_in_range'):
        s.simulate_toy(100, rng=np.random.default_rng(0))


def test_nonpositive_total_weight_rejected_at_build():
    data = _weighted_events([0.5, 0.5], [1.0, -1.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1]]],
                         weight_field='w', data=data)
    with pytest.raises(ValueError, match='positive net weight'):
        Model(conf)


def test_negative_net_bins_carry_no_mc_information():
    """A net-negative bin has no scaled-Poisson meaning: its effective count
    is 0, so the BB modes treat it like an empty-MC bin, not a healthy one."""
    data = _weighted_events([0.5, 1.5, 1.5], [2.0, 0.5, -1.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         weight_field='w', data=data)
    s = Model(conf).sources[0]
    assert s._n_events_histogram.values[1] == 0.0
    # ... and the host likelihood over the negative-pmf bin is finite
    # (penalized like the compiled path), never silently nan
    lf = BinnedLogLikelihood(conf)
    lf.prepare()
    obs, _ = make_data([dict(n_events=2, x=0.5), dict(n_events=1, x=1.5)])
    lf.set_data(obs)
    assert np.isfinite(lf())


def test_mixed_weighted_unweighted_sources_simulate():
    """Template-drawn toys (source+dims dtype) concatenate with generator
    events that carry extra fields (e.g. the weight column)."""
    class UnweightedWithW(WeightedGaussianMCSource):
        # generator emits a 'w' column but the source is NOT weighted
        pass

    data = _weighted_events([0.5] * 10, np.ones(10))
    conf = conf_for_test(
        n_sources=2,
        analysis_space=[['x', [0, 1, 2]]],
        events_per_day=500.,
        sources=[dict(name='sig', **{'class': WeightedSampleSource},
                      weight_field='w', data=data),
                 dict(name='bg', **{'class': UnweightedWithW})],
        mu=0.5, sigma=0.2, n_events_for_pdf=int(2e4))
    m = Model(conf)
    toys = m.simulate(rng=np.random.default_rng(1))
    assert len(toys) > 500
    assert set(toys.dtype.names) >= {'source', 'x'}


def test_bb_lite_consumes_effective_counts():
    """End-to-end: the bb_lite likelihood on a weighted source profiles
    against the per-bin EFFECTIVE counts."""
    from blueice_tpu.ops.bb_lite import bb_lite_logl_host

    data = _weighted_events([0.5] * 3 + [1.5], [1.0, 2.0, 3.0, 2.0])
    conf = conf_for_test(default_source_class=WeightedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         weight_field='w', data=data,
                         events_per_day=8. / 5.)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_lite'})
    lf.prepare()
    observed, _ = make_data([dict(n_events=5, x=0.5), dict(n_events=1, x=1.5)])
    lf.set_data(observed)

    mu = lf.base_model.expected_events()
    pmfs = np.array([[6 / 8, 2 / 8]])
    neff = np.array([[36 / 14, 1.0]])
    expected = bb_lite_logl_host(np.atleast_1d(mu), pmfs, neff,
                                 np.array([5.0, 1.0]))
    npt.assert_allclose(lf(), expected, rtol=1e-12)

    # and the effective counts really matter: raw counts give a different value
    raw = bb_lite_logl_host(np.atleast_1d(mu), pmfs, np.array([[3.0, 1.0]]),
                            np.array([5.0, 1.0]))
    assert abs(raw - expected) > 1e-6
