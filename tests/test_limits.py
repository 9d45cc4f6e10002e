"""Per-toy upper limits and sensitivity bands (parallel/limits.py +
profile_ts_grid): the batched equivalent of running the reference's
one_parameter_interval over every toy of an ensemble."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  NeymanConstruction, toy_upper_limits,
                                  toy_lower_limits, toy_central_intervals,
                                  sensitivity_band)

TARGET = 's0_rate_multiplier'


def _conf():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    # s0: small signal at x=0; s1: large background centered at x=3, so a
    # background-only 90% limit on the s0 multiplier lands around ~0.5
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['mu'] = 3.0
    return conf


def _binned_lf():
    lf = BinnedLogLikelihood(_conf())
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf


def _unbinned_lf():
    lf = UnbinnedLogLikelihood(_conf())
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf


def test_grid_matches_profile_ts():
    """A profile_ts_grid column equals profile_ts at that hypothesis on the
    same key/truth (same toys, same statistic), for both study types."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(3)
    truth = {TARGET: 0.0}
    hyps = np.array([0.4, 0.8])
    ts, hgrid, free, conds = study.profile_ts_grid(
        key, TARGET, hyps, n_toys=16, truth=truth)
    assert ts.shape == (2, 16) and np.all(hgrid == hyps)
    assert len(conds) == 2 and np.isfinite(free.max_ll).all()
    for j, h in enumerate(hyps):
        t_ref, _, _ = study.profile_ts(key, 16, TARGET, float(h), truth=truth)
        assert np.allclose(ts[j], t_ref, rtol=1e-6, atol=1e-9)


def test_grid_matches_profile_ts_unbinned():
    lf = _unbinned_lf()
    study = UnbinnedToyStudy(lf)
    key = jax.random.PRNGKey(4)
    truth = {TARGET: 0.0}
    ts, hgrid, free, _ = study.profile_ts_grid(
        key, TARGET, [0.6], n_toys=8, truth=truth)
    t_ref, free_ref, _ = study.profile_ts(key, 8, TARGET, 0.6, truth=truth)
    assert np.allclose(ts[0], t_ref, rtol=1e-6, atol=1e-9)
    assert np.allclose(free[TARGET], free_ref[TARGET], rtol=1e-6, atol=1e-9)


def test_limits_match_host_interval():
    """Per-toy grid limits reproduce one_parameter_interval run on each toy's
    dataset (the reference's per-dataset path, blueice/inference.py:332-389)."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(0)
    hyps = np.linspace(0.0, 3.0, 61)
    uls, ts, hgrid, free = toy_upper_limits(
        study, key, TARGET, hyps, n_toys=4, return_grid=True)
    assert np.isfinite(uls).all()
    # Upper limits sit above the (one-sided) best fit
    assert np.all(uls >= np.minimum(np.asarray(free[TARGET]), hyps[0]) - 1e-9)

    counts = np.asarray(study.simulate(key, 4, {TARGET: 0.0}))
    centers = [-5.5, 0.0, 5.5]
    for i in range(4):
        c = counts[i]
        xs = np.concatenate([np.full(int(c[j]), centers[j])
                             for j in range(3)])
        d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
        d['x'] = xs
        lf.set_data(d)
        ul_host = lf.one_parameter_interval(
            TARGET, bound=5.0, kind='upper', confidence_level=0.9,
            bestfit_routine='jax')
        # Grid spacing 0.05; the piecewise-linear crossing is well inside it
        assert abs(ul_host - uls[i]) < 0.05, (i, ul_host, uls[i])


def test_limits_monotone_in_cl():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(1)
    hyps = np.linspace(0.0, 4.0, 41)
    ul90 = toy_upper_limits(study, key, TARGET, hyps, n_toys=16, cl=0.9)
    ul95 = toy_upper_limits(study, key, TARGET, hyps, n_toys=16, cl=0.95)
    assert np.isfinite(ul90).all() and np.isfinite(ul95).all()
    assert np.all(ul95 >= ul90 - 1e-9)


def test_sensitivity_band():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    out = sensitivity_band(study, jax.random.PRNGKey(2), TARGET,
                           np.linspace(0.0, 4.0, 41), n_toys=48)
    band = out['band']
    qs = list(band)
    assert qs == sorted(qs)
    vals = [band[q] for q in qs]
    assert np.isfinite(vals).all()
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    assert len(out['limits']) == 48
    assert out['n_beyond_grid'] == 0
    # Wilks-regime scale check: the median expected limit of a ~23-event
    # background under a 20-events/unit signal is O(0.5), not 0 or >2
    assert 0.1 < band[0.5] < 2.0


def test_sensitivity_band_beyond_grid_warns():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    with pytest.warns(UserWarning, match="beyond the hypothesis grid"):
        out = sensitivity_band(study, jax.random.PRNGKey(2), TARGET,
                               np.linspace(0.0, 0.05, 6), n_toys=16)
    assert out['n_beyond_grid'] > 0
    assert np.isinf(out['band'][0.975])


def test_limits_with_neyman_ppf():
    """A toy-calibrated critical curve plugs in through the same t_ppf hook
    as one_parameter_interval; in this Wilks-friendly scenario the calibrated
    limits agree with the asymptotic ones to ~25%."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    nc = NeymanConstruction(study, TARGET, statistic='upper')
    nc.scan(jax.random.PRNGKey(5), hypotheses=[0.3, 0.8, 1.5], n_toys=300)
    key = jax.random.PRNGKey(6)
    hyps = np.linspace(0.0, 4.0, 41)
    ul_wilks = toy_upper_limits(study, key, TARGET, hyps, n_toys=24)
    ul_neyman = toy_upper_limits(study, key, TARGET, hyps, n_toys=24,
                                 t_ppf=nc.t_ppf)
    assert np.isfinite(ul_neyman).all()
    ratio = np.median(ul_neyman) / np.median(ul_wilks)
    assert 0.75 < ratio < 1.35, ratio


def test_auto_grid_matches_dense_explicit_grid():
    """hypotheses='auto' sizes the grid from a free-fit pass; the resulting
    limits agree with a dense explicit grid to interpolation resolution."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(8)
    ul_auto = toy_upper_limits(study, key, TARGET, 'auto', n_toys=16)
    ul_dense = toy_upper_limits(study, key, TARGET,
                                np.linspace(0.0, 4.0, 161), n_toys=16)
    assert np.isfinite(ul_auto).all()
    assert np.allclose(ul_auto, ul_dense, atol=0.06, rtol=0.05)
    with pytest.raises(ValueError, match="'auto'"):
        toy_upper_limits(study, key, TARGET, 'carefully', n_toys=4)


def test_limits_on_mesh_match_single_device():
    """Per-toy limits are layout-invariant: the mesh-sharded ensemble gives
    the same limits as the unsharded one for the same key."""
    from blueice_tpu.parallel import make_mesh
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(7)
    hyps = np.linspace(0.0, 4.0, 21)
    ul_plain = toy_upper_limits(study, key, TARGET, hyps, n_toys=16)
    ul_mesh = toy_upper_limits(study, key, TARGET, hyps, n_toys=16,
                               mesh=make_mesh())
    assert np.allclose(ul_mesh, ul_plain, rtol=1e-6, atol=1e-8)


def test_grid_and_limits_on_sum_composition():
    """profile_ts_grid and per-toy limits also drive compiled
    LogLikelihoodSum studies (tuple count trees: per-child datasets, one
    joint fit)."""
    from blueice_tpu.likelihood import LogLikelihoodSum
    lf1 = _binned_lf()
    conf2 = conf_for_test(mc=True, analysis_space=[['x', [-10, 0, 10]]],
                          n_events_for_pdf=int(2e5), events_per_day=500.)
    lf2 = BinnedLogLikelihood(conf2)
    lf2.add_rate_parameter('s0')
    lf2.prepare()
    study = BinnedToyStudy(LogLikelihoodSum([lf1, lf2]))
    key = jax.random.PRNGKey(13)
    truth = {TARGET: 0.0}
    ts, hgrid, free, _ = study.profile_ts_grid(key, TARGET, [0.3, 0.9],
                                               n_toys=8, truth=truth)
    for j, h in enumerate(hgrid):
        t_ref, _, _ = study.profile_ts(key, 8, TARGET, float(h), truth=truth)
        assert np.allclose(ts[j], t_ref, rtol=1e-6, atol=1e-9)
    uls = toy_upper_limits(study, key, TARGET, 'auto', n_toys=8)
    assert np.isfinite(uls).all()
    assert np.all(uls >= np.asarray(free[TARGET]) - 1e-9)


def test_central_intervals_match_host():
    """Per-toy central intervals reproduce one_parameter_interval(
    kind='central') on each toy's dataset, including the degenerate case
    where the interval's lower edge hits the parameter's 0 bound (host
    brentq cannot bracket; grid edge is NaN)."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(11)
    truth = {TARGET: 1.0}
    hyps = np.linspace(0.0, 3.0, 121)
    lo, hi = toy_central_intervals(study, key, TARGET, hyps, n_toys=3,
                                   truth=truth)
    free = study.run(key, 3, truth=truth)
    x_hat = np.asarray(free[TARGET])
    assert np.all(~np.isfinite(lo) | (lo <= x_hat + 1e-9))
    assert np.all(~np.isfinite(hi) | (hi >= x_hat - 1e-9))

    counts = np.asarray(study.simulate(key, 3, truth))
    centers = [-5.5, 0.0, 5.5]
    for i in range(3):
        c = counts[i]
        xs = np.concatenate([np.full(int(c[j]), centers[j])
                             for j in range(3)])
        d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
        d['x'] = xs
        lf.set_data(d)
        try:
            lo_h, hi_h = lf.one_parameter_interval(
                TARGET, bound=(0.0, 5.0), kind='central',
                confidence_level=0.9, bestfit_routine='jax')
        except ValueError:
            # host brentq can't bracket: the lower edge sits at/below 0 —
            # the grid agrees by reporting NaN there
            assert np.isnan(lo[i])
            continue
        assert abs(lo_h - lo[i]) < 0.05, (i, lo_h, lo[i])
        assert abs(hi_h - hi[i]) < 0.05, (i, hi_h, hi[i])


def test_lower_limits_mirror():
    """Lower limits sit below the best fits and respond to cl like the
    host convention (higher cl pushes the lower edge down)."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(12)
    truth = {TARGET: 1.5}
    hyps = np.linspace(0.0, 4.0, 81)
    ll90 = toy_lower_limits(study, key, TARGET, hyps, n_toys=16, truth=truth)
    ll95 = toy_lower_limits(study, key, TARGET, hyps, n_toys=16, truth=truth,
                            cl=0.95)
    free = study.run(key, 16, truth=truth)
    x_hat = np.asarray(free[TARGET])
    fin = np.isfinite(ll90)
    assert fin.sum() >= 12
    assert np.all(ll90[fin] <= x_hat[fin] + 1e-9)
    both = fin & np.isfinite(ll95)
    assert np.all(ll95[both] <= ll90[both] + 1e-9)


def test_auto_grid_lower_and_central():
    """hypotheses='auto' also drives lower limits and central intervals:
    the adaptive retry widens the grid on whichever side an edge escapes,
    and the results match an explicit wide grid to interpolation
    resolution."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(21)
    truth = {TARGET: 1.5}
    wide = np.linspace(0.0, 6.0, 241)
    ll_auto = toy_lower_limits(study, key, TARGET, 'auto', n_toys=16,
                               truth=truth)
    ll_ref = toy_lower_limits(study, key, TARGET, wide, n_toys=16,
                              truth=truth)
    fin = np.isfinite(ll_auto) & np.isfinite(ll_ref)
    assert fin.sum() >= 12
    assert np.allclose(ll_auto[fin], ll_ref[fin], atol=0.08)

    lo_a, hi_a = toy_central_intervals(study, key, TARGET, 'auto', n_toys=16,
                                       truth=truth)
    lo_r, hi_r = toy_central_intervals(study, key, TARGET, wide, n_toys=16,
                                       truth=truth)
    free = study.run(key, 16, truth=truth)
    x_hat = np.asarray(free[TARGET])
    # every auto upper edge resolved and bracketing the best fit
    assert np.isfinite(hi_a).all()
    assert np.all(hi_a >= x_hat - 1e-9)
    assert np.allclose(hi_a, hi_r, atol=0.08)
    both = np.isfinite(lo_a) & np.isfinite(lo_r)
    assert np.allclose(lo_a[both], lo_r[both], atol=0.08)
    assert np.all(lo_a[both] <= x_hat[both] + 1e-9)


def test_critical_value_edge_cases():
    """Negative critical values raise; a calibrated critical value of exactly
    0 (legitimate for one-sided Neyman statistics when calibration toys pile
    at t=0) degenerates the limit to ~the best fit instead of crashing."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    key = jax.random.PRNGKey(9)
    with pytest.raises(ValueError, match="critical values must be "
                                         "nonnegative"):
        toy_upper_limits(study, key, TARGET, np.linspace(0, 2, 5), n_toys=4,
                         t_ppf=lambda h, q: -1.0)
    hyps = np.linspace(0.0, 4.0, 81)
    ul_zero = toy_upper_limits(study, key, TARGET, hyps, n_toys=8,
                               t_ppf=lambda h, q: 0.0)
    ul_wilks = toy_upper_limits(study, key, TARGET, hyps, n_toys=8)
    free = study.run(key, 8, truth={TARGET: 0.0})
    x_hat = np.asarray(free[TARGET])
    assert np.isfinite(ul_zero).all()
    assert np.all(ul_zero <= ul_wilks + 1e-9)
    # crit=0 rejects any t > 0: the limit collapses onto the best fit
    # (to grid resolution)
    assert np.all(np.abs(ul_zero - x_hat) <= (hyps[1] - hyps[0]) + 1e-9)


def test_auto_grid_respects_target_bounds():
    """hypotheses='auto' clamps the grid to the target's bounds instead of
    proposing out-of-range hypotheses (which every engine rejects)."""
    lf = BinnedLogLikelihood(_conf())
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    study = BinnedToyStudy(lf)
    uls = toy_upper_limits(study, jax.random.PRNGKey(10), 'mu', 'auto',
                           n_toys=8, truth={'mu': 0.0})
    finite = uls[np.isfinite(uls)]
    assert len(finite) >= 6          # an occasional beyond-bound NaN is fine
    assert np.all(finite <= 1.0 + 1e-9)
