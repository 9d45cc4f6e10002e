"""The native histogram kernel must match numpy.histogramdd exactly."""

import numpy as np
import pytest

from blueice_tpu import native


def test_native_builds():
    # g++ is part of this environment; the kernel must be available
    assert native.available()


@pytest.mark.parametrize("ndim,n", [(1, 10000), (2, 20000), (3, 5000)])
def test_matches_histogramdd(ndim, n):
    rng = np.random.default_rng(ndim)
    sample = rng.normal(0, 2, size=(n, ndim))
    # Mixed uniform / irregular axes, including exact-edge values
    edges = []
    for d in range(ndim):
        if d % 2 == 0:
            edges.append(np.linspace(-3, 3, 7 + d))
        else:
            edges.append(np.array([-4.0, -1.0, -0.5, 0.25, 2.0, 5.0]))
    # Inject values exactly on edges (incl. first/last) and NaN/inf
    sample[:50, 0] = edges[0][rng.integers(0, len(edges[0]), 50)]
    sample[50] = np.nan
    sample[51] = np.inf

    expected, _ = np.histogramdd(sample, bins=edges)
    got = native.histogram_nd(sample, edges)
    np.testing.assert_array_equal(got, expected)

    # Weighted
    w = rng.random(n)
    expected_w, _ = np.histogramdd(sample, bins=edges, weights=w)
    got_w = native.histogram_nd(sample, edges, weights=w)
    np.testing.assert_allclose(got_w, expected_w, rtol=1e-12)


def test_native_speed_sanity():
    """Not a strict benchmark, but the native path should not be slower than
    numpy by more than noise on a realistic template-build workload."""
    import time
    rng = np.random.default_rng(0)
    sample = rng.normal(0, 2, size=(500_000, 2))
    edges = [np.linspace(-5, 5, 51), np.linspace(-5, 5, 63)]

    native.histogram_nd(sample, edges)   # warm (and build)
    t0 = time.time()
    native.histogram_nd(sample, edges)
    t_native = time.time() - t0

    t0 = time.time()
    np.histogramdd(sample, bins=edges)
    t_numpy = time.time() - t0
    assert t_native < max(2 * t_numpy, 0.5), (t_native, t_numpy)


def test_histogram_nd_validates_weights_and_dims():
    from blueice_tpu.native import histogram_nd
    sample = np.full((5, 1), 0.25)
    edges = [np.linspace(0, 1, 3)]
    with pytest.raises(ValueError):
        histogram_nd(sample, edges, weights=np.ones(3))
    with pytest.raises(ValueError):
        histogram_nd(sample, edges + edges)
    # well-formed call still matches numpy
    h = histogram_nd(sample, edges, weights=np.full(5, 2.0))
    np.testing.assert_array_equal(h, [10.0, 0.0])
