"""LogLikelihoodSum and LogAncillaryLikelihood composition tests."""

from collections import OrderedDict

import numpy as np
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test, almost_equal
from blueice_tpu.likelihood import (UnbinnedLogLikelihood, LogLikelihoodSum,
                                    LogAncillaryLikelihood)
from blueice_tpu.exceptions import InvalidParameter
from blueice_tpu.inference import bestfit_scipy


def _lf(seed, **kw):
    lf = UnbinnedLogLikelihood(conf_for_test(**kw))
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(seed)))
    return lf


def test_sum_is_sum():
    lf1 = _lf(1)
    lf2 = _lf(2, events_per_day=500.)
    s = LogLikelihoodSum([lf1, lf2])
    assert s() == lf1() + lf2()
    assert s(s0_rate_multiplier=2) == lf1(s0_rate_multiplier=2) \
        + lf2(s0_rate_multiplier=2)


def test_sum_weights():
    lf1 = _lf(1)
    lf2 = _lf(2)
    s = LogLikelihoodSum([lf1, lf2], likelihood_weights=[1.0, 0.5])
    assert s() == lf1() + 0.5 * lf2()


def test_sum_parameter_routing():
    """Parameters only reach the children that declare them."""
    lf1 = _lf(1)
    lf2 = UnbinnedLogLikelihood(conf_for_test())
    lf2.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf2.prepare()
    lf2.set_data(lf2.base_model.simulate(rng=np.random.default_rng(3)))

    s = LogLikelihoodSum([lf1, lf2])
    assert s(some_multiplier=2) == lf1() + lf2(some_multiplier=2)
    assert s(s0_rate_multiplier=2, some_multiplier=2) == \
        lf1(s0_rate_multiplier=2) + lf2(some_multiplier=2)

    # livetime list routes per child
    conf = conf_for_test()
    conf['livetime_days'] = 1
    lf3 = UnbinnedLogLikelihood(conf)
    lf3.add_rate_parameter('s0')
    lf3.prepare()
    lf3.set_data(lf3.base_model.simulate(rng=np.random.default_rng(4)))
    s2 = LogLikelihoodSum([lf3, lf3])
    assert s2(livetime_days=[2, 3]) == lf3(livetime_days=2) \
        + lf3(livetime_days=3)


def test_sum_bounds_and_split():
    lf1 = UnbinnedLogLikelihood(conf_for_test())
    lf1.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf1.prepare()
    lf1.set_data(lf1.base_model.simulate())
    lf2 = _lf(5)

    s = LogLikelihoodSum([lf1, lf2])
    assert s.get_bounds('some_multiplier') == (0.5, 2)
    assert s.get_bounds('s0_rate_multiplier') == (0, float('inf'))
    with pytest.raises(InvalidParameter):
        s.get_bounds('nope')

    split = s.split_results({'some_multiplier': 1.5,
                             's0_rate_multiplier': 2.0})
    assert split[0] == {'some_multiplier': 1.5}
    assert split[1] == {'s0_rate_multiplier': 2.0}


def test_sum_fit():
    lf1 = _lf(1)
    s = LogLikelihoodSum([lf1])
    fit, ll = bestfit_scipy(s)
    assert 's0_rate_multiplier' in fit


def test_compiled_sum():
    """A LogLikelihoodSum compiles to one joint XLA program and fits with the
    gradient engine."""
    from blueice_tpu.compile import build_logl
    from blueice_tpu.test_helpers import almost_equal

    lf1 = _lf(1)
    lf2 = UnbinnedLogLikelihood(conf_for_test(events_per_day=500.))
    lf2.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf2.prepare()
    lf2.set_data(lf2.base_model.simulate(rng=np.random.default_rng(9)))
    s = LogLikelihoodSum([lf1, lf2], likelihood_weights=[1.0, 0.7])

    c = build_logl(s)
    for kwargs in [dict(), dict(s0_rate_multiplier=2.0),
                   dict(some_multiplier=1.4, s0_rate_multiplier=0.5)]:
        assert almost_equal(float(c(**kwargs)), s(**kwargs), 1e-9)

    fit, ll = s.bestfit_jax(return_errors=False)
    fit_ref, ll_ref = bestfit_scipy(s)
    assert almost_equal(ll, ll_ref, 1e-6)


def test_ancillary_likelihood():
    def constraint(params):
        return stats.norm(1, 0.1).logpdf(params['efficiency'])

    anc = LogAncillaryLikelihood(constraint, ['efficiency'],
                                 config={'efficiency': 1.0})
    assert anc() == stats.norm(1, 0.1).logpdf(1.0)
    assert anc(efficiency=1.2) == stats.norm(1, 0.1).logpdf(1.2)
    assert anc.get_bounds('efficiency') == (-np.inf, np.inf)

    # Composes with a real likelihood through LogLikelihoodSum: the constraint
    # pulls the shared parameter
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(7)))
    s = LogLikelihoodSum([lf, anc])
    assert s(efficiency=1.1) == lf() + anc(efficiency=1.1)
    fit, ll = bestfit_scipy(s)
    assert 'efficiency' in fit
    assert abs(fit['efficiency'] - 1.0) < 0.05


def test_compiled_ancillary_and_sum_with_constraint():
    """An ancillary term with a traceable func compiles, alone and inside a
    compiled Sum with a real likelihood."""
    import jax.numpy as jnp
    from blueice_tpu.compile import build_logl

    def constraint(params):
        # Gaussian(1, 0.1) log pdf, written traceably
        return (-0.5 * ((params['s0_rate_multiplier'] - 1.0) / 0.1) ** 2
                - jnp.log(0.1 * jnp.sqrt(2 * jnp.pi)))

    anc = LogAncillaryLikelihood(constraint, ['s0_rate_multiplier'],
                                 config={'s0_rate_multiplier': 1.0})
    c_anc = build_logl(anc)
    assert np.isclose(float(c_anc(s0_rate_multiplier=1.2)),
                      float(anc(s0_rate_multiplier=1.2)))

    lf = _lf(7)
    s = LogLikelihoodSum([lf, anc])
    c = build_logl(s)
    for v in (0.8, 1.0, 1.3):
        assert almost_equal(float(c(s0_rate_multiplier=v)),
                            s(s0_rate_multiplier=v), 1e-9)

    # Non-traceable funcs are rejected with a clear error
    from scipy import stats as sps
    bad = LogAncillaryLikelihood(
        lambda p: sps.norm(1, 0.1).logpdf(p['x']), ['x'], config={'x': 1.0})
    with pytest.raises(TypeError, match='traceable'):
        build_logl(bad)


def test_ancillary_func_kwargs_and_order():
    seen = {}

    def f(params, scale=1.0):
        seen['order'] = list(params.keys())
        return -scale * sum((v - 1) ** 2 for v in params.values())

    anc = LogAncillaryLikelihood(f, ['a', 'b'], config={'a': 1.0, 'b': 2.0},
                                 func_kwargs={'scale': 3.0})
    assert anc() == -3.0 * ((1 - 1) ** 2 + (2 - 1) ** 2)
    assert seen['order'] == ['a', 'b']   # declared parameter order preserved


def test_sum_bounds_typo_raises():
    """A misspelled source's rate multiplier must not silently get (0, inf)."""
    s = LogLikelihoodSum([_lf(1)])
    assert s.get_bounds('s0_rate_multiplier') == (0, float('inf'))
    with pytest.raises(InvalidParameter):
        s.get_bounds('typo_source_rate_multiplier')


def test_compiled_sum_bounds_intersection():
    """The compiled Sum intersects shared-parameter bounds like the host Sum
    (first-child-wins would let the fitter probe regions where another child
    is out of bounds)."""
    from blueice_tpu.compile import build_logl

    lf1 = UnbinnedLogLikelihood(conf_for_test())
    lf1.add_shape_parameter('some_multiplier', (0.25, 1, 2))
    lf1.prepare()
    lf1.set_data(lf1.base_model.simulate(rng=np.random.default_rng(3)))
    lf2 = UnbinnedLogLikelihood(conf_for_test(events_per_day=500.))
    lf2.add_shape_parameter('some_multiplier', (0.5, 1, 1.5))
    lf2.prepare()
    lf2.set_data(lf2.base_model.simulate(rng=np.random.default_rng(4)))

    s = LogLikelihoodSum([lf1, lf2])
    c = build_logl(s)
    assert tuple(c.bounds['some_multiplier']) == s.get_bounds(
        'some_multiplier') == (0.5, 1.5)


def test_compiled_sum_livetime():
    """include_livetime=True exposes one joint livetime on the compiled Sum."""
    from blueice_tpu.compile import build_logl

    lf1 = _lf(1, livetime_days=1.0)
    lf2 = _lf(2, events_per_day=500., livetime_days=1.0)
    s = LogLikelihoodSum([lf1, lf2])
    c = build_logl(s, include_livetime=True)
    assert 'livetime_days' in c.param_names
    assert almost_equal(float(c(livetime_days=2.0)),
                        lf1(livetime_days=2.0) + lf2(livetime_days=2.0),
                        1e-9)
    assert almost_equal(float(c()), s(), 1e-9)


def test_sum_delegates_rate_bounds_and_sources():
    """Rate-multiplier bounds pass through to the child (allow_negative opens
    to (-inf, inf)), and the sum aggregates the children's source names."""
    conf = conf_for_test(n_sources=2)
    conf['sources'][0]['allow_negative'] = True
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_rate_parameter('s1')
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))

    s = LogLikelihoodSum([lf])
    assert s.get_bounds('s0_rate_multiplier') == (-float('inf'), float('inf'))
    assert s.get_bounds('s1_rate_multiplier') == (0, float('inf'))
    assert s.source_name_list == ['s0', 's1']


def _binned_child(seed, interp='linear', epd=20. / 5., rate_param=True):
    from blueice_tpu.test_helpers import make_data, FixedSampleSource
    from blueice_tpu.likelihood import BinnedLogLikelihood
    d0, _ = make_data([dict(n_events=9, x=0.5), dict(n_events=1, x=1.5)])
    d1, _ = make_data([dict(n_events=4, x=0.5), dict(n_events=6, x=1.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         events_per_day=epd, data=d0)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'template_interpolation': interp})
    if rate_param:
        lf.add_rate_parameter('s0')
    lf.add_shape_parameter('data', anchors={0: d0, 1: d1}, base_value=0)
    lf.prepare()
    rng = np.random.default_rng(seed)
    lf.set_data(lf.base_model.simulate(rng=rng))
    return lf


def _sum_counts(c):
    """One observed data tuple for a compiled Sum, aligned with children."""
    import jax.numpy as jnp
    out = []
    for child in c.children:
        if not getattr(child, 'has_data', True):
            out.append(jnp.zeros((0,)))
        else:
            out.append(jnp.asarray(
                child.lf.data_events_per_bin.values.reshape(-1),
                dtype=float))
    return tuple(out)


def test_sum_analytic_engine_matches_ad():
    """The joint closed-form engine (per-child binned_vgh chained to the
    joint u space) fits a compiled Sum — linear child + log-morphed child +
    correlated constraint — to the AD engine's optimum."""
    from blueice_tpu.compile import build_logl
    from blueice_tpu.composition import correlated_gaussian_constraint
    from blueice_tpu.parallel.fitter import (make_toy_fitter,
                                             _sum_analytic_supported)

    lf1 = _binned_child(5, 'linear')
    lf2 = _binned_child(6, 'log', epd=30. / 5.)
    con = correlated_gaussian_constraint(
        ['s0_rate_multiplier'], [1.0], [[0.05]])
    s = LogLikelihoodSum([lf1, lf2, con], likelihood_weights=[1.0, 0.7, 1.0])
    c = build_logl(s)
    assert _sum_analytic_supported(c)
    data = _sum_counts(c)
    res = {}
    for eng in ('analytic', 'ad'):
        fit_one, names = make_toy_fitter(c, engine=eng)
        x, ll, _ = fit_one(data)
        res[eng] = (np.asarray(x), float(ll), names)
    assert res['analytic'][2] == res['ad'][2]
    np.testing.assert_allclose(res['analytic'][0], res['ad'][0], atol=5e-5)
    assert abs(res['analytic'][1] - res['ad'][1]) < 1e-7


def test_sum_analytic_engine_routing_and_runtime_fixed():
    """Joint fixed= and runtime-fixed values route like the host Sum: a
    parameter NOT declared on a child stays at that child's default there."""
    from blueice_tpu.compile import build_logl
    from blueice_tpu.parallel.fitter import make_toy_fitter

    lf1 = _binned_child(7, rate_param=True)
    lf2 = _binned_child(8, rate_param=False, epd=30. / 5.)  # s0 rate undeclared
    s = LogLikelihoodSum([lf1, lf2])
    c = build_logl(s)
    data = _sum_counts(c)
    for eng in ('analytic', 'ad'):
        fit_one, names = make_toy_fitter(
            c, fixed={'s0_rate_multiplier': 1.4}, runtime_fixed=('data',),
            engine=eng)
        x, ll, _ = fit_one(data, None, (0.35,))
        if eng == 'analytic':
            ref = (np.asarray(x), float(ll))
        else:
            np.testing.assert_allclose(np.asarray(x), ref[0], atol=5e-5)
            assert abs(float(ll) - ref[1]) < 1e-7
    # Oracle: the host Sum at the same point (everything fixed)
    host = s(s0_rate_multiplier=1.4, data=0.35)
    fit_all, _ = make_toy_fitter(
        c, fixed={'s0_rate_multiplier': 1.4, 'data': 0.35}, engine='analytic')
    _, ll_fixed, _ = fit_all(data)
    assert almost_equal(float(ll_fixed), host, 1e-9)


@pytest.mark.slow
def test_sum_toy_study_analytic_engine():
    """BinnedToyStudy on a compiled Sum auto-selects the joint closed-form
    engine and reproduces the AD engine's ensemble."""
    import jax
    from blueice_tpu.parallel.toys import BinnedToyStudy

    lf1 = _binned_child(9)
    lf2 = _binned_child(10, 'log', epd=30. / 5.)
    s = LogLikelihoodSum([lf1, lf2])
    outs = {}
    for eng in ('auto', 'ad'):
        study = BinnedToyStudy(s, max_iter=50, engine=eng)
        outs[eng] = study.run(jax.random.PRNGKey(21), n_toys=16)
    np.testing.assert_allclose(np.asarray(outs['auto'].max_ll),
                               np.asarray(outs['ad'].max_ll), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs['auto'].x),
                               np.asarray(outs['ad'].x), atol=5e-4)
