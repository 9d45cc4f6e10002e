import numpy as np

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.models import Model


def test_rates():
    m = Model(conf_for_test(n_sources=1))
    np.testing.assert_array_equal(m.expected_events(), np.array([1000]))

    for source in m.sources:
        source.config['livetime_days'] = 2
    np.testing.assert_array_equal(m.expected_events(), np.array([2000]))
    for source in m.sources:
        source.config['livetime_days'] = 1

    m.sources[0].fraction_in_range = 0.5
    np.testing.assert_array_equal(m.expected_events(), np.array([500]))
    m.sources[0].fraction_in_range = 1

    # Modifying some_multiplier after the fact has no effect: it was applied in
    # GaussianSource's template computation
    m.config['some_multiplier'] = 2
    np.testing.assert_array_equal(m.expected_events(), np.array([1000]))
    m.config['some_multiplier'] = 1

    # A new model does pick it up
    conf = conf_for_test(n_sources=2)
    conf['some_multiplier'] = 2
    m = Model(conf)
    np.testing.assert_array_equal(m.expected_events(), np.array([2000, 2000]))

    # Source access by index and (substring of) name
    assert m.get_source(1) == m.sources[1]
    assert m.get_source_i(1) == 1
    assert m.get_source_i('s1') == 1
    assert m.get_source('s1') == m.sources[1]

    # Non-numeric settings scale the rate via strlen_multiplier
    conf = conf_for_test(n_sources=1)
    conf['strlen_multiplier'] = 'hi'
    m = Model(conf)
    np.testing.assert_array_equal(m.expected_events(), np.array([2000]))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        can_plot = True
    except ImportError:
        can_plot = False
    if can_plot:
        m.show(m.simulate())
        plt.close()


def test_simulate_deterministic_with_rng():
    """With an explicit generator, toy datasets are fully reproducible (both
    the Poisson counts and the event coordinates)."""
    m = Model(conf_for_test())
    d1 = m.simulate(rng=np.random.default_rng(42))
    d2 = m.simulate(rng=np.random.default_rng(42))
    np.testing.assert_array_equal(d1['x'], d2['x'])


def test_simulate_range_cut():
    m = Model(conf_for_test(analysis_space=[['x', np.linspace(-1, 1, 10)]]))
    d = m.simulate(rng=np.random.default_rng(0))
    assert (np.abs(d['x']) <= 1).all()

    # Rate multipliers scale simulated statistics
    d_hi = m.simulate(rate_multipliers={'s0': 10},
                      rng=np.random.default_rng(0))
    assert len(d_hi) > 3 * len(d)
