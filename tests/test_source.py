import numpy as np
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.models import Model


def test_mcsource():
    conf = conf_for_test(mc=True)
    m = Model(conf)
    s = m.sources[0]
    bins = conf['analysis_space'][0][1]
    assert s.events_per_day == 1000
    assert s.fraction_in_range > 0.9999    # ten-sigma events happen sometimes
    assert abs(s.pdf([0]) - stats.norm.pdf(0)) < 0.01

    # Linear interpolation between bin centers is exact at midpoints
    assert ((s.pdf([bins[0]]) + s.pdf([bins[1]])) / 2
            == s.pdf([(bins[0] + bins[1]) / 2]))


def test_cache_roundtrip():
    conf = conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=1.7)
    m1 = Model(conf)
    assert not m1.sources[0].from_cache

    # Same config -> cache hit with identical template payload
    m2 = Model(conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=1.7))
    s1, s2 = m1.sources[0], m2.sources[0]
    assert s2.from_cache
    assert s1.hash == s2.hash
    np.testing.assert_array_equal(s1._pdf_histogram.values,
                                  s2._pdf_histogram.values)

    # Changing a hashed setting changes the identity
    m3 = Model(conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=1.8))
    assert m3.sources[0].hash != s1.hash
    assert not m3.sources[0].from_cache

    # Changing an unhashed setting does not
    m4 = Model(conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=1.7,
                             pdf_sampling_batch_size=12345))
    assert m4.sources[0].hash == s1.hash
    assert m4.sources[0].from_cache


def test_force_and_never_cache():
    conf = conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=2.2)
    Model(conf)
    m = Model(conf_for_test(mc=True, n_events_for_pdf=int(1e4), sigma=2.2,
                            force_recalculation=True))
    assert not m.sources[0].from_cache
