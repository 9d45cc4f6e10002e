"""Compiled-path coverage beyond the dense-grid default: radial morpher,
source-wise interpolation, livetime parameter, minuit soft-dep."""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test, almost_equal
from blueice_tpu.likelihood import UnbinnedLogLikelihood
from blueice_tpu.compile import build_logl


def test_compiled_radial_morpher():
    lf = UnbinnedLogLikelihood(
        conf_for_test(),
        likelihood_config={'morpher': 'RadialInterpolator',
                           'morpher_config': {'hypercube_shuffle_steps': 5}})
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))

    c = build_logl(lf)
    for kwargs in [dict(), dict(some_multiplier=1.2)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9)
    g = jax.grad(c.logl)(c.params_from_kwargs())
    assert np.isfinite(g['some_multiplier'])


def test_compiled_source_wise():
    config = conf_for_test(n_sources=2, events_per_day=10.)
    config['source_wise_interpolation'] = True
    lf = UnbinnedLogLikelihood(config)
    lf.add_shape_parameter('mu', anchors={-1: -1, 0: 0, 1: 1})
    lf.add_rate_parameter('s0')
    lf.prepare()
    data = np.zeros(5, dtype=[('x', float), ('source', int)])
    data['x'] = np.linspace(-1, 1, 5)
    lf.set_data(data)

    c = build_logl(lf)
    for kwargs in [dict(), dict(mu=0.4), dict(s0_rate_multiplier=2, mu=-0.7)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9)


def test_compiled_livetime():
    conf = conf_for_test()
    conf['livetime_days'] = 2.0
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(1)))

    c = build_logl(lf, include_livetime=True)
    assert 'livetime_days' in c.param_names
    assert almost_equal(float(c(livetime_days=3.0)), lf(livetime_days=3.0),
                        1e-9)
    assert almost_equal(float(c()), lf(), 1e-9)


def test_compiled_sum_warns_on_shared_default_disagreement():
    """Two children declaring the same shape parameter with different base
    values: the compiled joint likelihood can only carry ONE default, so the
    divergence from the host sum's per-child base values is flagged."""
    from blueice_tpu.likelihood import LogLikelihoodSum

    def _child(mult):
        conf = conf_for_test()
        conf['some_multiplier'] = mult
        lf = UnbinnedLogLikelihood(conf)
        lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
        lf.prepare()
        lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(3)))
        return lf

    s = LogLikelihoodSum([_child(1.0), _child(2.0)])
    with pytest.warns(UserWarning, match="disagree"):
        c = build_logl(s)
    assert float(c.defaults['some_multiplier']) == 1.0

    # agreeing children build silently
    import warnings
    s2 = LogLikelihoodSum([_child(1.0), _child(1.0)])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_logl(s2)


def test_stale_ps_dropped_on_reprepare():
    """prepare() invalidates the per-event density build of a previous
    set_data: compiling afterwards must NOT morph stale event scores (it
    takes the data-free path instead)."""
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(5)))
    assert 'ps' in lf._builds
    lf.prepare()
    assert 'ps' not in lf._builds
    c = build_logl(lf)                # data-free compile, no stale densities
    assert c.ps_tensor is None
    with pytest.raises(RuntimeError, match="data-free"):
        c.densities(c.params_from_kwargs())


def test_dict_of_arrays_dataset():
    """set_data accepts the documented dict-of-arrays form: the event count
    must come from the arrays, not len(dict) == number of keys."""
    rng = np.random.default_rng(0)
    xs = rng.normal(0, 1, 50)

    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    lf.set_data({'x': xs})
    ll_dict = lf()

    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    assert np.isclose(ll_dict, lf())


def test_minuit_soft_dep():
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(2)))
    try:
        import iminuit   # noqa: F401
        has_minuit = True
    except ImportError:
        has_minuit = False
    if has_minuit:
        fit, ll = lf.bestfit_minuit()
        assert 's0_rate_multiplier' in fit
        assert 's0_rate_multiplier_error' in fit
    else:
        with pytest.raises(ImportError, match="bestfit_jax"):
            lf.bestfit_minuit()


def test_data_free_logl_with_data_none_raises_clearly():
    """logl_with_data(params, None) on a data-free unbinned compile raises
    the explanatory RuntimeError, not \"'NoneType' object is not callable\"."""
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    c = build_logl(lf)        # no set_data: data-free toy-ensemble compile
    with pytest.raises(RuntimeError, match="density payload"):
        c.logl_with_data(c.params_from_kwargs(), None)
