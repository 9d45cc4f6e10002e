"""Closed-form oracle tests of the analytic Beeston-Barlow MC-statistics
correction (host path + jnp ops path)."""

import numpy as np
import numpy.testing as npt
from scipy import stats

from blueice_tpu.test_helpers import (conf_for_test, almost_equal, make_data,
                                      FixedSampleSource)
from blueice_tpu.likelihood import BinnedLogLikelihood, beeston_barlow_root2
from blueice_tpu import ops


def test_BeestonBarlowSingleBin():
    instructions_mc = [dict(n_events=32, x=0.5)]
    data, n_mc = make_data(instructions_mc)

    conf = conf_for_test(default_source_class=FixedSampleSource,
                         events_per_day=32 / 5,
                         analysis_space=[['x', [0, 1]]],
                         data=data)

    likelihood_config = {'model_statistical_uncertainty_handling': 'bb_single',
                         'bb_single_source': 0}
    lf = BinnedLogLikelihood(conf, likelihood_config=likelihood_config)
    lf.prepare()
    assert lf.n_model_events is not None

    lf.set_data(np.zeros(2, dtype=[('x', float), ('source', int)]))
    assert lf.n_model_events is not None

    # Pure root check (U > 0 branch)
    assert almost_equal(28.0814209,
                        beeston_barlow_root2(np.array([32]), 0.2,
                                             np.array([1]), np.array([2])))
    # and the jnp twin agrees
    assert almost_equal(
        28.0814209,
        float(ops.beeston_barlow_root2(np.array([32]), 0.2, np.array([1]),
                                       np.array([2]))[0]))

    # Single source, U=0: the special-case solution applies
    A = (2 + 32) / (1 + 0.2)
    assert almost_equal(lf(), stats.poisson(0.2 * A).logpmf(2))


def test_BeestonBarlowMultiBin():
    instructions_mc = [dict(n_events=16, x=0.5),
                       dict(n_events=30, x=1.5),
                       dict(n_events=32, x=2.5),
                       dict(n_events=27, x=3.5)]
    data, n_mc = make_data(instructions_mc)

    conf = conf_for_test(default_source_class=FixedSampleSource,
                         events_per_day=105 / 5,
                         analysis_space=[['x', [0, 1, 2, 3, 4]]],
                         data=data)

    likelihood_config = {'model_statistical_uncertainty_handling': 'bb_single',
                         'bb_single_source': 0}
    lf = BinnedLogLikelihood(conf, likelihood_config=likelihood_config)
    lf.prepare()
    assert lf.n_model_events is not None

    instructions_data = [dict(n_events=3, x=0.5),
                         dict(n_events=5, x=1.5),
                         dict(n_events=2, x=2.5),
                         dict(n_events=7, x=3.5)]
    data, _ = make_data(instructions_data)
    lf.set_data(data)

    # Values from numerically minimizing the per-bin nuisance terms
    A_minimized = np.array([15.833, 29.166, 28.333, 28.333])
    A_BB = beeston_barlow_root2(np.array([16, 30, 32, 27]), 0.2,
                                np.array([0.]), np.array([3, 5, 2, 7]))
    npt.assert_almost_equal(A_minimized, A_BB, decimal=2)

    dbin = np.array([3, 5, 2, 7])
    assert almost_equal(lf(), np.sum(stats.poisson(0.2 * A_BB).logpmf(dbin)))


def test_BeestonBarlow_second_source():
    instructions_mc_calibration = [dict(n_events=16, x=0.5),
                                   dict(n_events=30, x=1.5),
                                   dict(n_events=32, x=2.5),
                                   dict(n_events=27, x=3.5)]
    data_calibration, n_mc = make_data(instructions_mc_calibration)

    instructions_mc_other = [dict(n_events=5, x=0.5),
                             dict(n_events=7, x=1.5),
                             dict(n_events=1, x=2.5),
                             dict(n_events=3, x=3.5)]
    data_other, n_mc = make_data(instructions_mc_other)

    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2, 3, 4]]],
                         dummy=1)
    conf['sources'] = [
        {'name': 's0', 'events_per_day': 105 / 5., 'data': data_calibration},
        {'name': 's1', 'events_per_day': 16., 'data': data_other}]

    likelihood_config = {'model_statistical_uncertainty_handling': 'bb_single',
                         'bb_single_source': 0}
    lf = BinnedLogLikelihood(conf, likelihood_config=likelihood_config)
    lf.add_shape_parameter('dummy', (0, 1))
    lf.prepare()
    assert lf.n_model_events is not None

    instructions_data = [dict(n_events=3, x=0.5),
                         dict(n_events=5, x=1.5),
                         dict(n_events=2, x=2.5),
                         dict(n_events=7, x=3.5)]
    data, _ = make_data(instructions_data)
    lf.set_data(data)
    assert lf.n_model_events is not None

    A_minimized = np.array([14.24, 26.8070, 28.08, 26.21])
    A_BB = beeston_barlow_root2(np.array([16, 30, 32, 27]), 0.2,
                                np.array([5, 7, 1, 3]), np.array([3, 5, 2, 7]))
    npt.assert_almost_equal(A_minimized, A_BB, decimal=2)

    dbin = np.array([3, 5, 2, 7])
    U_bin = np.array([5, 7, 1, 3])
    assert almost_equal(lf(),
                        np.sum(stats.poisson(0.2 * A_BB + U_bin).logpmf(dbin)))


def test_bb_single_adjust_op_matches_host():
    """The fused jnp adjustment reproduces the host path bin by bin."""
    mus = np.array([21.0, 16.0])
    pmfs = np.array([[16, 30, 32, 27], [5, 7, 1, 3.0]])
    pmfs = pmfs / pmfs.sum(axis=1, keepdims=True)
    nme = np.array([[16, 30, 32, 27], [5, 7, 1, 3.0]])
    observed = np.array([3, 5, 2, 7.0])

    mus_j, pmfs_j = ops.bb_single_adjust(mus, pmfs, nme, observed, source_i=0)

    # Host-path equivalent
    u = mus[1] * pmfs[1]
    a = nme[0]
    p = mus[0] / a.sum()
    w = pmfs[0] / a * a.sum()
    A = beeston_barlow_root2(a, w * p, u, observed)
    raw = A * w
    npt.assert_allclose(np.asarray(pmfs_j[0]), raw / raw.sum(), rtol=1e-10)
    npt.assert_allclose(float(mus_j[0]), raw.sum() * p, rtol=1e-10)
    npt.assert_allclose(np.asarray(pmfs_j[1]), pmfs[1], rtol=1e-12)


def test_BeestonBarlow_empty_mc_bin_host():
    """Host adjust_expectations guards empty-MC bins (a == 0 would make
    w_calibration 0/0 = nan and poison the whole adjusted pmf) exactly like
    the device twin: the empty bin carries zero weight."""
    instructions_mc = [dict(n_events=16, x=0.5),
                       dict(n_events=30, x=1.5),
                       dict(n_events=27, x=3.5)]      # bin [2, 3) has NO MC
    data, n_mc = make_data(instructions_mc)
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         events_per_day=73 / 5,
                         analysis_space=[['x', [0, 1, 2, 3, 4]]],
                         data=data)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_single',
        'bb_single_source': 0})
    lf.prepare()
    instructions_data = [dict(n_events=3, x=0.5), dict(n_events=5, x=1.5),
                         dict(n_events=7, x=3.5)]
    d, _ = make_data(instructions_data)
    lf.set_data(d)
    ll = lf()
    assert np.isfinite(ll)

    # bin-by-bin equal to the device twin's guarded adjustment
    pmfs, nme = lf.base_model.pmf_grids()
    mus = np.asarray(lf.base_model.expected_events(), dtype=float)
    observed = np.array([3, 5, 0, 7.0])
    mus_j, pmfs_j = ops.bb_single_adjust(mus, pmfs, nme, observed,
                                         source_i=0)
    expected = np.tensordot(np.asarray(mus_j), np.asarray(pmfs_j),
                            axes=(0, 0))
    assert almost_equal(ll, float(np.sum(stats.poisson(expected)
                                         .logpmf(observed))))


def test_bb_root2_stable_at_vanishing_p():
    """Regression: as p -> 0 with U > 0 the naive (-b + sqrt(disc))/(2*A2)
    root cancels catastrophically (a real XENON-scale toy produced
    A = -0.098 for a true root of +0.001, crashing adjust_expectations'
    nonnegativity assert). The stable form is exact and nonnegative.

    The p -> 0 limit of the quadratic is linear: U*A - U*a = 0 => A = a."""
    a, p, U, d = 0.001, 7.088675171363666e-17, 0.10940715747035475, 0.0
    for root2 in (beeston_barlow_root2,            # host numpy
                  ops.beeston_barlow_root2):       # jnp twin
        r = float(root2(a, p, U, d))
        npt.assert_allclose(r, a, rtol=1e-9)

    # Across a sweep of magnitudes the root stays nonnegative and within
    # the bracket [0, max(a, (a+d)/1)] (larger root of a monic-positive
    # quadratic with f(0) <= 0 and f(a + d + U/p ...) — loose sanity bound)
    rng = np.random.default_rng(42)
    for _ in range(500):
        a = rng.uniform(0, 100)
        p = 10.0 ** rng.uniform(-20, 2)
        U = 10.0 ** rng.uniform(-12, 3)
        d = float(rng.integers(0, 50))
        r = float(beeston_barlow_root2(a, p, U, d))
        assert r >= 0.0
        assert np.isfinite(r)


def test_bb_lambda_and_parts_stable_at_vanishing_pw():
    """The device closed forms (bb_lambda and bb_lam_parts) share the stable
    root: lambda = U + pw*A stays exact (~U + pw*N) at vanishing pw."""
    from blueice_tpu.ops.bb_vgh import bb_lambda, bb_lam_parts
    P, N, U, M, T, d = 1e-20, 0.001, 0.109, 21.0, 86.0, 0.0
    # pw = M*P/N ~ 2.1e-16: lambda must be U + pw*A with A ~ N
    lam = float(bb_lambda(P, N, U, M, T, d))
    npt.assert_allclose(lam, U, rtol=1e-9)
    lam2, _, _ = bb_lam_parts(np.array([P]), np.array([N]), np.array([U]),
                              np.array([M]), np.array([T]), np.array([d]))
    npt.assert_allclose(float(lam2[0]), U, rtol=1e-9)


def test_bb_gradient_at_zero_rate():
    """d lam / dM at M == 0 is the finite limit (P for U > 0 bins,
    (P/N)(d+N) for U == 0 bins), not the inert-branch 0 — otherwise a fit
    whose BB-source rate starts (or underflows) at exactly 0 is pinned there
    forever (regression)."""
    from blueice_tpu.ops.bb_vgh import bb_lam_parts, bb_lambda

    P = np.array([0.3, 0.7])
    N = np.array([30.0, 70.0])
    U = np.array([2.0, 0.0])
    d = np.array([3.0, 1.0])
    T = 100.0

    lam0, gam, _ = bb_lam_parts(P, N, U, np.zeros(2), T, d)
    npt.assert_allclose(np.asarray(lam0), U, rtol=1e-12)   # lam = U at M=0
    expected = np.array([0.3, (0.7 / 70.0) * (1.0 + 70.0)])
    npt.assert_allclose(np.asarray(gam[3]), expected, rtol=1e-10)

    # matches the forward finite difference of the value function
    eps = 1e-7
    fd = (np.asarray(bb_lambda(P, N, U, np.full(2, eps), T, d))
          - np.asarray(lam0)) / eps
    npt.assert_allclose(np.asarray(gam[3]), fd, rtol=1e-4)

    # padded bins (P = N = 0) stay exactly inert
    lam_p, gam_p, _ = bb_lam_parts(np.zeros(2), np.zeros(2), U, np.zeros(2),
                                   T, d)
    npt.assert_allclose(np.asarray(gam_p[3]), 0.0)
