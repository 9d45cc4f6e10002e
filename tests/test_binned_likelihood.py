import numpy as np
import pytest
from scipy import stats

from blueice_tpu.test_helpers import (conf_for_test, almost_equal, make_data,
                                      FixedSampleSource)
from blueice_tpu.likelihood import BinnedLogLikelihood


def test_single_bin():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-40, 40]]])

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    lf.set_data(np.zeros(1, dtype=[('x', float), ('source', int)]))

    assert almost_equal(lf(), stats.poisson(1000).logpmf(1), 1e-12)
    assert almost_equal(lf(s0_rate_multiplier=5.4),
                        stats.poisson(5400).logpmf(1), 1e-12)


def test_twobin_mc():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-40, 0, 40]]])

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    lf.set_data(np.ones(100, dtype=[('x', float), ('source', int)]))

    assert almost_equal(
        lf(),
        stats.poisson(500).logpmf(100) + stats.poisson(500).logpmf(0),
        1e-2)


def test_multi_bin_single_dim():
    instructions_mc = [dict(n_events=24, x=0.5), dict(n_events=56, x=1.5)]
    data, n_mc = make_data(instructions_mc)

    conf = conf_for_test(events_per_day=42, analysis_space=[['x', [0, 1, 5]]],
                         default_source_class=FixedSampleSource, data=data)

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')

    instructions_data = [dict(n_events=18, x=0.5), dict(n_events=70, x=1.5)]
    data, _ = make_data(instructions_data)
    lf.set_data(data)

    mus = [42 / n_mc * i['n_events'] for i in instructions_mc]
    seen = [i['n_events'] for i in instructions_data]

    assert almost_equal(lf(),
                        np.sum([stats.poisson(mu).logpmf(s)
                                for mu, s in zip(mus, seen)]), 1e-6)


def test_multi_bin():
    instructions_mc = [dict(n_events=24, x=0.5, y=0.5),
                       dict(n_events=56, x=1.5, y=0.5),
                       dict(n_events=6, x=0.5, y=2),
                       dict(n_events=14, x=1.5, y=2)]
    data, n_mc = make_data(instructions_mc)

    conf = conf_for_test(events_per_day=42,
                         default_source_class=FixedSampleSource, data=data,
                         analysis_space=[['x', [0, 1, 5]], ['y', [0, 1, 4]]])

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('strlen_multiplier', {1: 'x', 2: 'hi', 3: 'wha'},
                           base_value=1)
    lf.prepare()

    instructions_data = [dict(n_events=18, x=0.5, y=0.5),
                         dict(n_events=70, x=1.5, y=0.5),
                         dict(n_events=4, x=0.5, y=2),
                         dict(n_events=10, x=1.5, y=2)]
    data, _ = make_data(instructions_data)
    lf.set_data(data)

    mus = [42 / n_mc * i['n_events'] for i in instructions_mc]
    seen = [i['n_events'] for i in instructions_data]

    assert almost_equal(lf(strlen_multiplier=1),
                        np.sum([stats.poisson(mu).logpmf(s)
                                for mu, s in zip(mus, seen)]))

    # compute_pdf with a non-numeric shape parameter is not supported
    with pytest.raises(NotImplementedError):
        lf(compute_pdf=True, strlen_multiplier=2)

    assert almost_equal(lf(compute_pdf=False, strlen_multiplier=2),
                        np.sum([stats.poisson(2 * mu).logpmf(s)
                                for mu, s in zip(mus, seen)]))

    # Interpolating at z=2.3: rate scales by 2.3 between the anchors
    assert almost_equal(lf(strlen_multiplier=2.3),
                        np.sum([stats.poisson(2.3 * mu).logpmf(s)
                                for mu, s in zip(mus, seen)]))
