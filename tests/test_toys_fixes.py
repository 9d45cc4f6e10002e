"""Regression tests for review findings in the toy-study engine room:

- UnbinnedToyStudy must score each source with ITS OWN
  pdf_interpolation_method (models can mix 'linear' and 'piecewise'; the
  likelihood's set_data scores per source — toy calibration must match);
- a profile target in fixed= is rejected loudly (the 'free' fit would be
  constrained, so t would not be a profile-LR statistic);
- unified intervals map an upper edge unresolved at the target's finite
  upper bound to the bound (the boundary transition, both sides);
- bestfit_emcee_device accepts seed=None (host-twin parity) and caches its
  compiled chain program across calls;
- profile_ts_grid(return_cond=False) skips the conditional transfers while
  leaving the statistics bit-identical.
"""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy,
                                  toy_unified_intervals, observed_interval)
from blueice_tpu.parallel.mcmc import bestfit_emcee_device

TARGET = 's0_rate_multiplier'
SHAPE = 'some_multiplier'


def _mixed_method_lf():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', np.linspace(-8, 8, 17)]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = 500.0
    conf['sources'][1]['events_per_day'] = 800.0
    conf['sources'][1]['pdf_interpolation_method'] = 'piecewise'
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return lf


def test_mixed_interpolation_methods_score_per_source():
    lf = _mixed_method_lf()
    study = UnbinnedToyStudy(lf)
    assert study._methods == ['linear', 'piecewise']
    assert study._method is None

    xs = np.array([-3.3, -0.2, 0.7, 2.9, 6.1])
    coords = jax.numpy.asarray(xs[:, None])
    scored = np.asarray(study._score_events(coords))
    # Each row must match THAT source's own host pdf (linear interpolation
    # over bin centers for s0, direct bin lookup for s1)
    for i, s in enumerate(lf.base_model.sources):
        np.testing.assert_allclose(scored[i], s.pdf(xs), rtol=1e-5,
                                   err_msg='source %d (%s)'
                                   % (i, study._methods[i]))
    # The two host methods genuinely differ on these off-center points —
    # otherwise this test would pass with the bug present
    s1 = lf.base_model.sources[1]
    linear_s1 = np.asarray(
        study._score_one_tensor(study._pdf_tensor, coords, 'linear'))[1]
    assert not np.allclose(linear_s1, s1.pdf(xs), rtol=1e-5)

    # The sampled-event fast path agrees with the generic scorer on the
    # same coordinates, per method
    key = jax.random.PRNGKey(3)
    w = study.expected_weights()
    coords_s, mask, bins = jax.jit(study._sample_one)(key, w)
    a = np.asarray(study._score_sampled(coords_s, bins))
    b = np.asarray(study._score_events(coords_s))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-12)

    # End to end: the mixed-method study simulates and fits
    res = UnbinnedToyStudy(lf).run(jax.random.PRNGKey(0), 4)
    assert np.isfinite(np.asarray(res.max_ll)).all()


def _counting_study():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['events_per_day'] = 30.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    return BinnedToyStudy(lf)


def test_profile_target_in_fixed_rejected():
    study = _counting_study()
    with pytest.raises(ValueError, match="profile target"):
        study.profile_ts(jax.random.PRNGKey(0), 4, TARGET, 1.0,
                         fixed={TARGET: 0.5})
    with pytest.raises(ValueError, match="profile target"):
        study.profile_ts_grid(jax.random.PRNGKey(0), TARGET, [0.5, 1.0], 4,
                              fixed={TARGET: 0.5})
    lf = _mixed_method_lf()
    ustudy = UnbinnedToyStudy(lf)
    with pytest.raises(ValueError, match="profile target"):
        ustudy.profile_ts(jax.random.PRNGKey(0), 4, TARGET, 1.0,
                          fixed={TARGET: 0.5})


def _shape_study():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = 60.0
    conf['sources'][1]['events_per_day'] = 40.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter(SHAPE, (0.5, 1.0, 2.0))
    lf.prepare()
    return BinnedToyStudy(lf)


def test_unified_upper_edge_pins_at_finite_bound():
    """A shape-parameter target is bounded above by its anchor range; an
    acceptance region reaching that bound must report the bound, exactly as
    the lower side already did."""
    study = _shape_study()
    counts = study.expected_counts(**{SHAPE: 2.0})
    lo, hi = observed_interval(study, SHAPE, kind='unified', cl=0.9,
                               counts=counts)
    assert hi == 2.0 and not np.isnan(lo)
    assert lo < 2.0

    lo_t, hi_t = toy_unified_intervals(
        study, jax.random.PRNGKey(5), SHAPE, 'auto', 32,
        truth={SHAPE: 1.9})
    assert not np.isnan(hi_t).any()
    assert np.all(hi_t <= 2.0) and np.max(hi_t) == 2.0


def test_emcee_device_seed_none_and_runner_cache():
    study = _counting_study()
    lf = study.lf
    lf.set_data(lf.base_model.simulate())
    fit1, ll1 = bestfit_emcee_device(lf, n_walkers=8, n_steps=12,
                                     n_burn_in=4, seed=0)
    fit2, ll2 = bestfit_emcee_device(lf, n_walkers=8, n_steps=12,
                                     n_burn_in=4, seed=0)
    assert fit1 == fit2 and ll1 == ll2
    compiled = lf._compiled_for_fit[1]
    assert len(compiled._mcmc_runners) == 1   # one program, two calls
    # seed=None (the host twin's default) must run, with fresh entropy
    fit3, _ = bestfit_emcee_device(lf, n_walkers=8, n_steps=12,
                                   n_burn_in=4, seed=None)
    assert set(fit3) == set(fit1)
    assert len(compiled._mcmc_runners) == 1   # same cached program


def test_profile_ts_grid_return_cond_false_same_stats():
    study = _counting_study()
    key = jax.random.PRNGKey(9)
    hyps = [0.5, 1.0, 1.5]
    ts1, h1, free1, conds1 = study.profile_ts_grid(key, TARGET, hyps, 16)
    ts2, h2, free2, conds2 = study.profile_ts_grid(key, TARGET, hyps, 16,
                                                   return_cond=False)
    np.testing.assert_array_equal(ts1, ts2)
    np.testing.assert_array_equal(np.asarray(free1[TARGET]),
                                  np.asarray(free2[TARGET]))
    assert all(c is not None for c in conds1)
    # Unrefined hypotheses skip the conditional transfer entirely
    assert any(c is None for c in conds2)


def test_polish_knob_trades_quality_for_speed():
    """polish=0 must run (fewer iterations) and stay within the documented
    quality envelope of the default polish=4 on an easy model; the knob is
    the ensemble-throughput lever (BinnedToyStudy/UnbinnedToyStudy
    constructor arg, threaded to minimize_newton)."""
    import jax
    from blueice_tpu.parallel.toys import BinnedToyStudy
    from blueice_tpu.test_helpers import conf_for_test
    import tempfile
    tmp = tempfile.mkdtemp()
    conf = conf_for_test(n_sources=2, mc=True, n_events_for_pdf=int(2e4),
                         cache_dir=tmp, task_dir=tmp)
    from blueice_tpu.likelihood import BinnedLogLikelihood
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    s4 = BinnedToyStudy(lf, max_iter=60)
    s0 = BinnedToyStudy(lf, max_iter=60, polish=0)
    counts = s4.simulate(jax.random.PRNGKey(0), 16)
    r4 = s4.fit_toys(counts)
    r0 = s0.fit_toys(counts)
    assert r0.n_iter.mean() <= r4.n_iter.mean()
    # On this well-conditioned model the optima must agree closely even
    # without polish sweeps
    np.testing.assert_allclose(r0.max_ll, r4.max_ll, rtol=0, atol=5e-3)
