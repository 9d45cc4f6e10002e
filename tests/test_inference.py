import numpy as np
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.inference import (bestfit_scipy, bestfit_emcee,
                                   one_parameter_interval, best_anchor)
from blueice_tpu.likelihood import UnbinnedLogLikelihood as LogLikelihood


def test_fit_scipy():
    # Single rate parameter
    lf = LogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate())
    fit_result, ll = bestfit_scipy(lf)
    assert isinstance(fit_result, dict)
    assert 's0_rate_multiplier' in fit_result

    # Nothing to fit
    res, ll = bestfit_scipy(lf, s0_rate_multiplier=1)
    assert len(res) == 0
    assert ll == lf(s0_rate_multiplier=1)

    # Single shape parameter
    lf = LogLikelihood(conf_for_test())
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 1.5, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    fit_result, ll = bestfit_scipy(lf)
    assert 'some_multiplier' in fit_result

    # Shape and rate parameter
    lf = LogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 1.5, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    fit_result, ll = bestfit_scipy(lf)
    assert 'some_multiplier' in fit_result
    assert 's0_rate_multiplier' in fit_result

    # Non-numeric shape parameter
    lf = LogLikelihood(conf_for_test())
    lf.add_shape_parameter('strlen_multiplier', {1: 'x', 2: 'hi', 3: 'wha'},
                           base_value=1)
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    fit_result, ll = bestfit_scipy(lf)
    assert 'strlen_multiplier' in fit_result


def test_fit_recovers_truth():
    """The fitted rate multiplier lands near its Poisson-statistics truth."""
    lf = LogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    rng = np.random.default_rng(0)
    d = lf.base_model.simulate(rate_multipliers={'s0': 2.0}, rng=rng)
    lf.set_data(d)
    fit_result, ll = bestfit_scipy(lf)
    fitted = fit_result['s0_rate_multiplier']
    # ~2000 events: relative Poisson error ~2.2%; allow 5 sigma
    assert abs(fitted - len(d) / 1000) < 1e-3
    assert abs(fitted - 2.0) < 0.25


def test_best_anchor():
    lf = LogLikelihood(conf_for_test())
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    guess = best_anchor(lf)
    assert set(guess.keys()) == {'some_multiplier'}
    assert guess['some_multiplier'] in (0.5, 1, 2)


def test_limit():
    lf = LogLikelihood(conf_for_test(n_sources=2))
    lf.add_rate_parameter('s0')
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(11)))

    ul = one_parameter_interval(lf, target='s0_rate_multiplier', kind='upper',
                                bound=40)
    ll_ = one_parameter_interval(lf, target='s0_rate_multiplier', kind='lower',
                                 bound=0.1)
    lo, hi = one_parameter_interval(lf, target='s0_rate_multiplier',
                                    kind='central', bound=(0.1, 20))
    # The central 90% interval uses the 5%/95% quantiles (critical 2.71) so it
    # is wider than the one-sided 90% limits (critical 1.64)
    assert lo <= ll_ <= ul <= hi
    assert lo < 1.0 < hi   # truth (multiplier 1) inside the interval


def test_bestfit_jax_cache_invalidation():
    """bestfit_jax's compiled-program cache must refresh when new data is
    bound: a binned likelihood's compiled object closes over the observed
    counts, so a stale hit silently fits the OLD dataset."""
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.inference import bestfit_jax
    from blueice_tpu.test_helpers import make_data

    for cls in (BinnedLogLikelihood, LogLikelihood):
        lf = cls(conf_for_test(n_sources=1, mc=(cls is BinnedLogLikelihood)))
        lf.add_rate_parameter('s0')
        lf.prepare()
        lf.set_data(make_data([dict(n_events=100, x=0.0)])[0])
        fit1, _ = bestfit_jax(lf)
        lf.set_data(make_data([dict(n_events=2000, x=0.0)])[0])
        fit2, _ = bestfit_jax(lf)
        # 20x more events -> the fitted multiplier must move accordingly
        assert fit2['s0_rate_multiplier'] > 5 * fit1['s0_rate_multiplier'], cls
        # And repeated fits on the same data reuse the cache consistently
        fit3, _ = bestfit_jax(lf)
        assert np.isclose(fit3['s0_rate_multiplier'],
                          fit2['s0_rate_multiplier'])


def test_mcmc_builtin():
    """Ensemble MCMC runs on the built-in stretch-move sampler."""
    lf = LogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate())
    fit, ll, errs = bestfit_emcee(lf, n_walkers=10, n_steps=60, n_burn_in=30,
                                  return_errors=True, seed=42)
    assert 's0_rate_multiplier' in fit
    assert 0.5 < fit['s0_rate_multiplier'] < 2.0
    assert errs['s0_rate_multiplier'] > 0


def test_emcee_best_ll_includes_fixed_values():
    """Regression: bestfit_emcee evaluated the returned max-LL WITHOUT the
    fixed kwargs, reporting the likelihood at the wrong point (garbage
    ll_cond in profile-LR intervals)."""
    from blueice_tpu.composition import LogAncillaryLikelihood

    anc = LogAncillaryLikelihood(
        lambda p: -((p['a'] - 3.0) ** 2 + (p['b'] - 5.0) ** 2),
        ['a', 'b'], config={'a': 1.0, 'b': 1.0})
    fit, ll = bestfit_emcee(anc, b=4.0, seed=0, n_steps=300, n_burn_in=150)
    assert set(fit) == {'a'}
    assert abs(fit['a'] - 3.0) < 0.5
    # LL must be evaluated at (a_median, b=4.0): approx -(a-3)^2 - 1
    assert np.isclose(ll, anc(a=fit['a'], b=4.0), atol=1e-9)
    assert ll < -0.5   # the wrong point (b at default 1.0) would give ~-16


def test_missing_guess_raises():
    """A parameter with no numeric default anywhere must raise, not produce
    a silent NaN starting point."""
    from blueice_tpu.composition import LogAncillaryLikelihood
    from blueice_tpu.exceptions import InvalidParameterSpecification

    anc = LogAncillaryLikelihood(lambda p: -p['a'] ** 2, ['a'])  # no config
    with pytest.raises(InvalidParameterSpecification, match="guess"):
        anc.make_objective()


def test_free_rate_bounds_respect_allow_negative():
    """The optimizer bounds of an allow_negative source's rate multiplier
    must come from the likelihood (-inf, inf), not a hardcoded (0, None)."""
    conf = conf_for_test()
    conf['sources'][0]['allow_negative'] = True
    lf = LogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate())
    _, names, _, bounds = lf.make_objective()
    i = names.index('s0_rate_multiplier')
    assert bounds[i] == (-float('inf'), float('inf'))
