"""Template smoothing (template_smoothing_sigma, bin units) on
density-estimated sources — mass-preserving Gaussian kernel; raw counts kept
for the MC-statistics modes. Beyond the reference (blueice has no template
smoothing)."""

import numpy as np
import numpy.testing as npt
import pytest
from scipy.ndimage import gaussian_filter

from blueice_tpu.models import Model
from blueice_tpu.test_helpers import (conf_for_test, make_data,
                                      FixedSampleSource)


def _delta_conf(**kw):
    # all events in one central bin: the smoothed template IS the kernel
    data, _ = make_data([dict(n_events=100, x=4.5)])
    return conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', np.arange(0, 10.5, 1.0)]],
                         data=data, **kw)


def test_smoothing_matches_scipy_kernel():
    s = Model(_delta_conf(template_smoothing_sigma=1.5)).sources[0]
    raw = np.zeros(10)
    raw[4] = 100.0
    expected = gaussian_filter(raw, 1.5, mode='constant', cval=0.0)
    expected *= raw.sum() / expected.sum()
    npt.assert_allclose(s._pdf_histogram.values, expected / 100.0, rtol=1e-12)
    # mass preserved exactly (bin volume 1): pdf sums to 1
    npt.assert_allclose(s._pdf_histogram.values.sum(), 1.0, rtol=1e-12)


def test_zero_sigma_is_identity_and_counts_stay_raw():
    s0 = Model(_delta_conf()).sources[0]
    sz = Model(_delta_conf(template_smoothing_sigma=0.0)).sources[0]
    ss = Model(_delta_conf(template_smoothing_sigma=2.0)).sources[0]
    npt.assert_array_equal(sz._pdf_histogram.values, s0._pdf_histogram.values)
    # the MC-statistics histogram is the RAW sample either way
    npt.assert_array_equal(ss._n_events_histogram.values,
                           s0._n_events_histogram.values)
    assert ss.fraction_in_range == s0.fraction_in_range == 1.0


def test_per_axis_sigma_2d():
    data, _ = make_data([dict(n_events=50, x=2.5, y=2.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', np.arange(0, 5.5, 1.0)],
                                         ['y', np.arange(0, 5.5, 1.0)]],
                         data=data, template_smoothing_sigma=[1.0, 0.0])
    s = Model(conf).sources[0]
    vals = s._pdf_histogram.values
    # smoothing along x only: the y profile keeps a single occupied column
    assert np.sum(np.any(vals > 0, axis=0)) == 1      # y columns
    assert np.sum(np.any(vals > 0, axis=1)) > 1       # x rows spread


def test_smoothing_changes_hash():
    s0 = Model(_delta_conf()).sources[0]
    s1 = Model(_delta_conf(template_smoothing_sigma=1.0)).sources[0]
    assert s0.hash != s1.hash


def test_validation():
    with pytest.raises(ValueError, match='>= 0'):
        Model(_delta_conf(template_smoothing_sigma=-1.0))
    with pytest.raises(ValueError, match='one per analysis axis'):
        Model(_delta_conf(template_smoothing_sigma=[1.0, 2.0]))
