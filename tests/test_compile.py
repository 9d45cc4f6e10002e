"""The compiled (pure-jax) likelihood must agree with the host path and support
jit / grad / vmap; the gradient fitter must agree with scipy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test, almost_equal, make_data, \
    FixedSampleSource
from blueice_tpu.likelihood import UnbinnedLogLikelihood, BinnedLogLikelihood
from blueice_tpu.compile import build_logl
from blueice_tpu.parallel.fitter import fit_single
from blueice_tpu import NormalPrior


def _unbinned_lf(n_sources=2):
    lf = UnbinnedLogLikelihood(conf_for_test(n_sources=n_sources))
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2, 4))
    lf.add_rate_parameter('s0', log_prior=NormalPrior(1, 0.3))
    if n_sources > 1:
        lf.add_rate_parameter('s1')
    lf.prepare()
    d = lf.base_model.simulate(rng=np.random.default_rng(5))
    lf.set_data(d)
    return lf


def test_compiled_matches_host_unbinned():
    lf = _unbinned_lf()
    c = build_logl(lf)
    for kwargs in [dict(),
                   dict(some_multiplier=1.3),
                   dict(s0_rate_multiplier=2.0, some_multiplier=0.7),
                   dict(s0_rate_multiplier=0.5, s1_rate_multiplier=3.0)]:
        host = lf(**kwargs)
        dev = float(c(**kwargs))
        assert almost_equal(dev, host, 1e-9), (kwargs, host, dev)

    # Out-of-bounds -> -inf on both paths
    assert float(c(some_multiplier=100)) == -np.inf
    assert lf(some_multiplier=100) == -np.inf
    # Unphysical -> -inf
    assert float(c(s0_rate_multiplier=-1)) == -np.inf


def test_compiled_matches_host_binned_bb():
    instructions_mc = [dict(n_events=16, x=0.5), dict(n_events=30, x=1.5),
                       dict(n_events=32, x=2.5), dict(n_events=27, x=3.5)]
    data_mc, _ = make_data(instructions_mc)
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         events_per_day=105 / 5,
                         analysis_space=[['x', [0, 1, 2, 3, 4]]],
                         data=data_mc, dummy=1)
    lf = BinnedLogLikelihood(
        conf, likelihood_config={'model_statistical_uncertainty_handling':
                                 'bb_single', 'bb_single_source': 0})
    lf.add_shape_parameter('dummy', (0, 1))
    lf.prepare()
    data, _ = make_data([dict(n_events=3, x=0.5), dict(n_events=5, x=1.5),
                         dict(n_events=2, x=2.5), dict(n_events=7, x=3.5)])
    lf.set_data(data)

    c = build_logl(lf)
    for kwargs in [dict(), dict(s0_rate_multiplier=1.7),
                   dict(dummy=0.3, s0_rate_multiplier=0.2)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9)


def test_compiled_jit_grad_vmap():
    lf = _unbinned_lf()
    c = build_logl(lf)
    params = c.params_from_kwargs(some_multiplier=1.2)
    f = jax.jit(c.logl)
    v1 = float(f(params))
    assert almost_equal(v1, lf(some_multiplier=1.2), 1e-9)

    g = jax.grad(c.logl)(params)
    assert np.isfinite(g['some_multiplier'])
    assert np.isfinite(g['s0_rate_multiplier'])

    # vmap over a parameter scan
    zs = jnp.linspace(0.6, 3.5, 16)
    def at_z(z):
        p = dict(params)
        p['some_multiplier'] = z
        return c.logl(p)
    lls = np.asarray(jax.vmap(at_z)(zs))
    host = np.array([lf(some_multiplier=float(z)) for z in zs])
    np.testing.assert_allclose(lls, host, rtol=1e-9)


def test_compiled_rejects_untraceable_prior():
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0', log_prior=stats.norm(1, 0.5).logpdf)
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    with pytest.raises(TypeError, match="not jax-traceable"):
        build_logl(lf)
    # but the host path still works with it
    lf()


def test_fit_single_matches_scipy():
    lf = _unbinned_lf()
    c = build_logl(lf)
    res_jax, ll_jax = fit_single(c)
    res_scipy, ll_scipy = lf.bestfit_scipy()
    # The maximum itself must agree tightly; individual parameters may trade off
    # along the (nearly degenerate) total-rate ridge of this toy model.
    assert almost_equal(ll_jax, ll_scipy, 1e-6)
    assert ll_jax >= ll_scipy - 1e-6 * abs(ll_scipy)
    for k, v in res_scipy.items():
        assert abs(res_jax[k] - v) < 0.15, (k, res_jax[k], v)
    # Parabolic errors present and finite (this toy model's sources are
    # identical, so the Hessian is near-singular and some errors collapse)
    for k in res_scipy:
        assert np.isfinite(res_jax[k + '_error'])
        assert res_jax[k + '_error'] >= 0

    # Conditional (profile) fit: fix the signal rate
    res_c, ll_c = fit_single(c, fixed={'s0_rate_multiplier': 2.0})
    assert 's0_rate_multiplier' not in res_c
    assert ll_c <= ll_jax + 1e-9


def test_fit_single_nothing_to_fit():
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    c = build_logl(lf)
    res, ll = fit_single(c)
    assert res == {}
    assert almost_equal(ll, lf(), 1e-9)


def test_bestfit_jax_method():
    lf = _unbinned_lf()
    res, ll = lf.bestfit_jax()
    res_s, ll_s = lf.bestfit_scipy()
    assert almost_equal(ll, ll_s, 1e-6)
