import numpy as np
import pytest
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


def test_hash_distinguishes_source_classes():
    """Two source classes with identical configs must not share a cached
    template (their compute_pdf/simulate differ)."""
    from blueice_tpu.test_helpers import GaussianSource, GaussianMCSource

    conf = conf_for_test()['sources'][0]
    base = conf_for_test()
    base.update(name='s0', rate_multiplier=1)
    _, c1 = GaussianSource.normalized_config(dict(base))
    _, c2 = GaussianMCSource.normalized_config(dict(base))
    assert c1['hash'] != c2['hash']
    # ... while the name stays out of the hash (same-physics sources under
    # different names legitimately share one template)
    _, c3 = GaussianSource.normalized_config(dict(base, name='other'))
    assert c1['hash'] == c3['hash']


def test_mc_sampling_batches_cover_remainder():
    """Non-integer multiples of the batch size still simulate the configured
    statistics (the remainder batch must not be dropped)."""
    from blueice_tpu.test_helpers import GaussianMCSource

    conf = conf_for_test(mc=True, n_events_for_pdf=int(2.5e4),
                         pdf_sampling_batch_size=1e4)
    conf = dict(conf, **conf['sources'][0], rate_multiplier=1,
                livetime_days=1)
    s = GaussianMCSource(dict(conf, name='s0', force_recalculation=True))
    assert float(s._n_events_histogram.n) == pytest.approx(2.5e4, rel=0.02)


def test_source_entry_rate_multiplier_respected():
    """A per-entry 'rate_multiplier' source setting must reach the source
    (a global '<name>_rate_multiplier' still takes precedence)."""
    from blueice_tpu.models.model import expand_source_configs

    conf = conf_for_test()
    conf['sources'] = [dict(name='s0', rate_multiplier=2.5)]
    (_, merged), = expand_source_configs(conf)
    assert merged['rate_multiplier'] == 2.5

    conf['s0_rate_multiplier'] = 4.0
    (_, merged), = expand_source_configs(conf)
    assert merged['rate_multiplier'] == 4.0


def test_hash_ignores_data_dirs():
    """Model.defaults declares nohash_settings=['data_dirs', ...]: the same
    config under a different data-directory root must hit the same cached
    template (regression: the declaration existed but was never honored)."""
    from blueice_tpu.test_helpers import GaussianSource

    base = conf_for_test()
    base.update(name='s0', rate_multiplier=1,
                nohash_settings=['data_dirs', 'pdf_sampling_batch_size',
                                 'force_recalculation'])
    _, c1 = GaussianSource.normalized_config(dict(base, data_dirs='.'))
    _, c2 = GaussianSource.normalized_config(dict(base, data_dirs='/tmp'))
    assert c1['hash'] == c2['hash']


def test_mc_source_applies_rate_hooks():
    """GaussianMCSource honors the scenario rate hooks like its analytic
    twin (regression: some_multiplier was a silent no-op for mc=True
    scenarios — a flat likelihood direction instead of a rate scan)."""
    from blueice_tpu.models.model import Model

    conf = conf_for_test(mc=True, some_multiplier=2)
    conf['sources'][0]['n_events_for_pdf'] = int(1e4)
    m = Model(conf)
    assert m.sources[0].events_per_day == pytest.approx(2000.0)
    m1 = Model(conf_for_test(mc=True))
    assert m1.sources[0].events_per_day == pytest.approx(1000.0)
