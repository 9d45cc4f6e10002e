"""Seeded property fuzz: random small binned models; the batched device fit
must (a) report LL values consistent with the host likelihood at its own
optimum and (b) reach optima at least as good as sequential scipy on the
identical datasets."""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.parallel import BinnedToyStudy


def _host_dataset(counts, centers):
    xs = np.concatenate([np.full(int(c), centers[i])
                         for i, c in enumerate(counts)]) \
        if counts.sum() else np.zeros(0)
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    return d


# scipy's numerical differentiation probes the -inf boundary: harmless,
# reference-identical invalid-value warnings
@pytest.mark.filterwarnings('ignore::RuntimeWarning')
@pytest.mark.parametrize('seed', range(4))
def test_random_binned_models_match_host_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n_sources = int(rng.integers(1, 4))
    n_bins = int(rng.integers(3, 10))
    edges = np.round(np.linspace(-10, 10, n_bins + 1), 6)

    conf = conf_for_test(n_sources=n_sources, mc=True,
                         analysis_space=[['x', list(edges)]],
                         n_events_for_pdf=int(2e4),
                         events_per_day=float(rng.uniform(80, 300)))
    with_shape = bool(rng.random() < 0.7)
    for i in range(1, n_sources):
        conf['sources'][i]['mu'] = float(rng.uniform(-2, 2))
        conf['sources'][i]['sigma'] = float(rng.uniform(0.8, 3.0))

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    if with_shape:
        lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    study = BinnedToyStudy(lf)
    n_toys = 4
    counts = study.simulate(jax.random.PRNGKey(seed), n_toys)
    res = study.fit_toys(counts)
    counts_np = np.asarray(counts)
    centers = 0.5 * (edges[1:] + edges[:-1])

    for ti in range(n_toys):
        lf.set_data(_host_dataset(counts_np[ti], centers))
        point = {n: float(res.x[ti, j]) for j, n in enumerate(res.names)}
        ll_host_at_device_opt = lf(**point)
        # (a) value consistency between the engines at the same point
        assert np.isclose(res.max_ll[ti], ll_host_at_device_opt,
                          rtol=1e-8, atol=1e-6), (seed, ti)
        # (b) the device optimum is at least as good as scipy's
        _, ll_scipy = lf.bestfit_scipy()
        assert res.max_ll[ti] >= ll_scipy - 1e-6, \
            (seed, ti, res.max_ll[ti], ll_scipy)


@pytest.mark.filterwarnings('ignore::RuntimeWarning')
@pytest.mark.parametrize('seed', range(3))
def test_random_unbinned_models_match_host_oracle(seed):
    """Unbinned twin: device-scored padded toys, fit on device, host LL
    cross-check at the device optimum."""
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel import UnbinnedToyStudy

    rng = np.random.default_rng(300 + seed)
    n_sources = int(rng.integers(1, 3))
    conf = conf_for_test(n_sources=n_sources, mc=True,
                         n_events_for_pdf=int(3e4),
                         events_per_day=float(rng.uniform(60, 200)))
    for i in range(1, n_sources):
        conf['sources'][i]['mu'] = float(rng.uniform(-2, 2))

    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    with_shape = bool(rng.random() < 0.7)
    if with_shape:
        lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    study = UnbinnedToyStudy(lf)
    weights = study.expected_weights()
    key = jax.random.PRNGKey(seed)
    # run() splits the key per toy: reconstruct toy 0's dataset on host with
    # the same per-toy key
    toy_key = jax.random.split(key, 1)[0]
    coords, mask, bins = study._sample_one(toy_key, np.asarray(weights))
    events = np.asarray(coords[np.asarray(mask), 0])
    d = np.zeros(len(events), dtype=[('x', float), ('source', int)])
    d['x'] = events
    lf.set_data(d)

    res = study.run(key, n_toys=1)
    point = {n: float(res.x[0, j]) for j, n in enumerate(res.names)}
    ll_host_at_device_opt = lf(**point)
    assert np.isclose(res.max_ll[0], ll_host_at_device_opt,
                      rtol=1e-7, atol=1e-5), (seed,)
    _, ll_scipy = lf.bestfit_scipy()
    assert res.max_ll[0] >= ll_scipy - 1e-5, \
        (seed, res.max_ll[0], ll_scipy)


@pytest.mark.filterwarnings('ignore::RuntimeWarning')
@pytest.mark.parametrize('seed', range(3))
def test_random_models_compiled_matches_host_at_random_points(seed):
    """Random configs, random (valid) parameter points: the compiled XLA
    likelihood must reproduce the host float64 value everywhere, not just at
    optima."""
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.compile import build_logl

    rng = np.random.default_rng(500 + seed)
    binned = bool(rng.random() < 0.5)
    n_sources = int(rng.integers(1, 4))
    conf = conf_for_test(n_sources=n_sources, mc=True,
                         n_events_for_pdf=int(2e4),
                         events_per_day=float(rng.uniform(50, 200)))
    for i in range(1, n_sources):
        conf['sources'][i]['mu'] = float(rng.uniform(-2, 2))

    cls = BinnedLogLikelihood if binned else UnbinnedLogLikelihood
    lf = cls(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    d = lf.base_model.simulate(rng=rng)
    lf.set_data(d)
    c = build_logl(lf)

    for _ in range(6):
        point = {'s0_rate_multiplier': float(rng.uniform(0.2, 3.0)),
                 'mu': float(rng.uniform(-1.0, 1.0))}
        ll_host = lf(**point)
        ll_dev = float(c(**point))
        assert np.isclose(ll_dev, ll_host, rtol=1e-9, atol=1e-7), \
            (seed, binned, point, ll_dev, ll_host)

    # out-of-anchor-range shape value: both paths -inf
    assert lf(mu=2.5) == -np.inf
    assert float(c(mu=2.5)) == -np.inf
