"""Seeded property fuzz for the Beeston-Barlow fast path: random small binned
models with ``bb_single`` MC-statistics handling (reference:
blueice/likelihood.py:618-660). The batched device fit must (a) report LL
values consistent with the host Beeston-Barlow likelihood at its own optimum
and (b) reach optima at least as good as sequential scipy on identical
datasets. Random bin counts / source counts / MC sample sizes exercise the
per-bin branch structure (general root, U == 0, empty-MC bins) far off the
hand-built oracle scenarios of test_BeestonBarlow.py."""

import numpy as np
import jax
import pytest

from blueice_tpu.exceptions import OptimizationFailed
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


@pytest.mark.filterwarnings('ignore::RuntimeWarning')
@pytest.mark.parametrize('seed', range(4))
def test_random_bb_models_match_host_oracle(seed):
    rng = np.random.default_rng(700 + seed)
    n_sources = int(rng.integers(1, 4))
    n_bins = int(rng.integers(3, 10))
    edges = np.round(np.linspace(-10, 10, n_bins + 1), 6)
    # Small MC sample sizes make the finite-MC correction matter and
    # produce genuinely empty MC bins in the tails
    n_mc = int(rng.integers(300, 3000))
    bb_i = int(rng.integers(0, n_sources))

    conf = conf_for_test(n_sources=n_sources, mc=True,
                         analysis_space=[['x', list(edges)]],
                         n_events_for_pdf=n_mc,
                         events_per_day=float(rng.uniform(80, 300)))
    with_shape = bool(rng.random() < 0.7)
    for i in range(1, n_sources):
        conf['sources'][i]['mu'] = float(rng.uniform(-2, 2))
        conf['sources'][i]['sigma'] = float(rng.uniform(0.8, 3.0))

    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_single',
        'bb_single_source': bb_i})
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
                          rtol=1e-8, atol=1e-6), \
            (seed, ti, res.max_ll[ti], ll_host_at_device_opt)
        # (b) the device optimum is at least as good as scipy's (a scipy
        # failure on a hard toy is reference behavior, not a device defect
        # — the device fit above already succeeded on the same dataset)
        try:
            _, ll_scipy = lf.bestfit_scipy()
        except OptimizationFailed:
            continue
        assert res.max_ll[ti] >= ll_scipy - 1e-6, \
            (seed, ti, res.max_ll[ti], ll_scipy)


@pytest.mark.filterwarnings('ignore::RuntimeWarning')
def test_random_bb_profile_ts_finite_and_truth_recovered():
    """A small BB profile-statistic ensemble: t >= 0, finite, truth
    recovered on average (the BB adjustment must not bias the rate fit)."""
    rng = np.random.default_rng(42)
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', list(np.linspace(-8, 8, 9))]],
                         n_events_for_pdf=2000,
                         events_per_day=float(rng.uniform(150, 250)))
    conf['sources'][1]['mu'] = 1.5

    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_single',
        'bb_single_source': 1})
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.prepare()

    study = BinnedToyStudy(lf)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(3), n_toys=64,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0)
    t = np.asarray(t)
    assert np.isfinite(t).all() and (t >= 0).all()
    assert np.isfinite(np.asarray(free.max_ll)).all()
    assert 0.85 < float(np.mean(free['s0_rate_multiplier'])) < 1.15
