"""The closed-form (analytic) derivative engine must agree with autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.compile import build_logl
from blueice_tpu.ops.binned_vgh import (binned_vgh, binned_ll,
                                        corner_weight_tables, gather_corners)
from blueice_tpu.parallel.fitter import make_toy_fitter
from blueice_tpu.parallel.toys import BinnedToyStudy
from blueice_tpu import NormalPrior


def test_binned_vgh_penalty_matches_autodiff():
    """binned_vgh's derivatives include the negative-expectation penalty that
    binned_ll and binned_poisson_logl apply (regression: without it the
    analytic Newton direction REWARDED negative bins for allow_negative
    models while the line search rejected every step — stalled lanes)."""
    import jax.numpy as jnp
    from blueice_tpu.ops.binned_vgh import binned_vgh, binned_ll
    from blueice_tpu.ops.poisson import binned_poisson_logl

    # One 'anchor corner' (K=0), two sources, second with a NEGATIVE template
    # column driving a net-negative bin at m1 > 0.4
    corners = jnp.asarray([[[1.0, 0.5, 2.0],
                            [0.0, -1.0, 0.5]]])
    observed = jnp.asarray([0.0, 0.0, 3.0])
    m = jnp.asarray([1.0, 0.8])       # lam = [1.0, -0.3, 2.4]
    t = jnp.zeros((0,))

    ll, g, H = binned_vgh(corners, m, t, observed)
    assert float(ll) == pytest.approx(float(binned_ll(corners, m, t,
                                                      observed)), rel=1e-12)

    def f(mm):
        return binned_poisson_logl(mm, corners[0], observed,
                                   include_constant=False)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(jax.grad(f)(m)), rtol=1e-9)
    # The autodiff Hessian NaNs through the floor in negative bins; the
    # closed form is the penalty-aware finite curvature (the penalty is
    # linear in lambda, so only the Poisson bins contribute):
    q2 = 3.0 / 2.4 ** 2                    # only bin 2 has observed > 0
    P2 = np.array([2.0, 0.5])
    np.testing.assert_allclose(np.asarray(H), -q2 * np.outer(P2, P2),
                               rtol=1e-9)

    # On an all-positive configuration the full (ll, g, H) triple matches
    # autodiff exactly
    m_pos = jnp.asarray([1.0, 0.2])
    ll_p, g_p, H_p = binned_vgh(corners, m_pos, t, observed)
    np.testing.assert_allclose(np.asarray(g_p),
                               np.asarray(jax.grad(f)(m_pos)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(H_p),
                               np.asarray(jax.hessian(f)(m_pos)), rtol=1e-9)





def test_corner_weight_tables():
    t = jnp.asarray([0.3, 0.7])
    w, wd, wx = corner_weight_tables(t)
    # Weights sum to one; derivative tables match finite structure
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w),
                               [0.7 * 0.3, 0.7 * 0.7, 0.3 * 0.3, 0.3 * 0.7],
                               rtol=1e-12)
    # d/dt autodiff check
    J = jax.jacfwd(lambda t: corner_weight_tables(t)[0])(t)   # (4, 2)
    np.testing.assert_allclose(np.asarray(J.T), np.asarray(wd), rtol=1e-12)
    H = jax.jacfwd(jax.jacfwd(lambda t: corner_weight_tables(t)[0]))(t)
    np.testing.assert_allclose(np.asarray(np.moveaxis(H, 0, -1)),
                               np.asarray(wx), rtol=1e-12)


def test_binned_vgh_matches_autodiff():
    rng = np.random.default_rng(0)
    K, S, N = 2, 3, 40
    corners = jnp.asarray(rng.random((2 ** K, S, N)) + 0.01)
    m = jnp.asarray([10.0, 5.0, 2.0])
    t = jnp.asarray([0.3, 0.6])
    observed = jnp.asarray(rng.poisson(5.0, N).astype(float))

    ll, g, H = binned_vgh(corners, m, t, observed)

    def f(mt):
        return binned_ll(corners, mt[:S], mt[S:], observed)

    mt = jnp.concatenate([m, t])
    np.testing.assert_allclose(float(ll), float(f(mt)), rtol=1e-12)
    g_ad = jax.grad(f)(mt)
    H_ad = jax.hessian(f)(mt)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), rtol=1e-8,
                               atol=1e-10)


def test_gather_corners():
    tensor = jnp.arange(3 * 4 * 2 * 5.0).reshape(3, 4, 2, 5)
    block = gather_corners(tensor, [jnp.asarray(1), jnp.asarray(2)], 2)
    assert block.shape == (4, 2, 5)
    np.testing.assert_array_equal(np.asarray(block[0]),
                                  np.asarray(tensor[1, 2]))
    np.testing.assert_array_equal(np.asarray(block[3]),
                                  np.asarray(tensor[2, 3]))


def _binned_lf():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -2, 0, 2, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0', log_prior=NormalPrior(1, 0.2))
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.add_shape_parameter('sigma', (0.8, 1.0, 1.2))
    lf.prepare()
    return lf


@pytest.mark.slow
def test_analytic_engine_matches_ad_fits():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    counts = study.simulate(jax.random.PRNGKey(0), 16)

    fit_ad, names = make_toy_fitter(study.compiled, engine='ad')
    fit_an, names2 = make_toy_fitter(study.compiled, engine='analytic')
    assert names == names2

    x_ad, ll_ad, it_ad = jax.jit(jax.vmap(lambda d: fit_ad(d)))(counts)
    x_an, ll_an, it_an = jax.jit(jax.vmap(lambda d: fit_an(d)))(counts)

    np.testing.assert_allclose(np.asarray(ll_an), np.asarray(ll_ad),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(x_an), np.asarray(x_ad),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_pallas_engine_matches_analytic_fits():
    """The Pallas-kernel engine (interpret mode on CPU) reproduces the jnp
    analytic engine's fits."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    counts = study.simulate(jax.random.PRNGKey(1), 4)

    fit_an, names = make_toy_fitter(study.compiled, engine='analytic')
    fit_pl, names2 = make_toy_fitter(study.compiled, engine='pallas')
    assert names == names2

    x_an, ll_an, _ = jax.jit(jax.vmap(lambda d: fit_an(d)))(counts)
    x_pl, ll_pl, _ = jax.jit(jax.vmap(lambda d: fit_pl(d)))(counts)

    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_an),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_an),
                               rtol=1e-6, atol=1e-8)


def _bb_lf():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -2, 0, 2, 10]]],
                         n_events_for_pdf=int(5e4))
    lf = BinnedLogLikelihood(
        conf, likelihood_config={
            'model_statistical_uncertainty_handling': 'bb_single',
            'bb_single_source': 0})
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    return lf


def test_bb_vgh_matches_autodiff():
    """The one-pass Beeston-Barlow (value, grad, Hessian) op equals autodiff
    through morphing + the profiled per-bin root."""
    from blueice_tpu.ops.bb_vgh import binned_bb_vgh, binned_bb_ll
    from blueice_tpu.ops.beeston_barlow import bb_single_adjust

    rng = np.random.default_rng(3)
    K, S, N, bb_i = 2, 3, 23, 1
    cps = rng.random((2 ** K, S, N)) + 0.05
    cps /= cps.sum(-1, keepdims=True)
    cps[:, 0, :4] = 0.0
    cps[:, 2, :4] = 0.0          # exercise the U == 0 branch in 4 bins
    cnme = rng.integers(1, 50, (2 ** K, S, N)).astype(float)
    m = jnp.asarray([25.0, 18.0, 9.0])
    t = jnp.asarray([0.25, 0.65])
    obs = jnp.asarray(rng.poisson(6.0, N).astype(float))

    def ref(mt):
        w, _, _ = corner_weight_tables(mt[S:])
        P = jnp.tensordot(w, jnp.asarray(cps), axes=(0, 0))
        NM = jnp.tensordot(w, jnp.asarray(cnme), axes=(0, 0))
        mus_adj, pmf_adj = bb_single_adjust(mt[:S], P, NM, obs, bb_i)
        lam = jnp.maximum(jnp.tensordot(mus_adj, pmf_adj, axes=(0, 0)),
                          jnp.finfo(P.dtype).tiny)
        k_safe = jnp.where(obs > 0, obs, 1.0)
        return jnp.sum(obs * jnp.log(lam / k_safe) - (lam - obs))

    mt = jnp.concatenate([m, t])
    ll, g, H = binned_bb_vgh(cps, cnme, m, t, obs, bb_i)
    np.testing.assert_allclose(float(ll), float(ref(mt)), rtol=1e-12)
    np.testing.assert_allclose(float(binned_bb_ll(cps, cnme, m, t, obs, bb_i)),
                               float(ref(mt)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(jax.grad(ref)(mt)),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(H), np.asarray(jax.hessian(ref)(mt)),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.slow
def test_bb_through_analytic_engine():
    """A Beeston-Barlow model fits on the fast engine: same optima as the AD
    engine, and 'auto' now routes BB to the analytic path."""
    lf = _bb_lf()
    study = BinnedToyStudy(lf)
    assert study.compiled.has_bb
    assert study.compiled.nme_tensor is not None
    counts = study.simulate(jax.random.PRNGKey(7), 12)

    fit_ad, names = make_toy_fitter(study.compiled, engine='ad')
    fit_an, names2 = make_toy_fitter(study.compiled, engine='analytic')
    assert names == names2

    x_ad, ll_ad, _ = jax.jit(jax.vmap(lambda d: fit_ad(d)))(counts)
    x_an, ll_an, _ = jax.jit(jax.vmap(lambda d: fit_an(d)))(counts)
    np.testing.assert_allclose(np.asarray(ll_an), np.asarray(ll_ad),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(x_an), np.asarray(x_ad),
                               rtol=2e-3, atol=2e-3)

    # Host-oracle consistency of the batched optimum (value at the optimum)
    c = np.asarray(counts[0])
    centers = [-6.0, -1.0, 1.0, 6.0]
    xs = np.concatenate([np.full(int(c[i]), centers[i]) for i in range(4)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    ll_host = lf(s0_rate_multiplier=float(x_an[0][0]), mu=float(x_an[0][1]))
    assert abs(float(ll_an[0]) - ll_host) < 1e-6 * abs(ll_host)

    # The fused Pallas BB engine (interpret mode here) agrees with both
    fit_pl, names3 = make_toy_fitter(study.compiled, engine='pallas')
    assert names == names3
    x_pl, ll_pl, _ = jax.jit(jax.vmap(lambda d: fit_pl(d)))(counts)
    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_an),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_an),
                               rtol=2e-3, atol=2e-3)


def test_analytic_engine_coverage_boundaries():
    from blueice_tpu.likelihood import UnbinnedLogLikelihood, LogLikelihoodSum

    # Global-grid unbinned is covered (by the closed-form unbinned engine)...
    lf = UnbinnedLogLikelihood(conf_for_test(mc=True,
                                             n_events_for_pdf=int(1e4)))
    lf.add_rate_parameter('s0')
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))
    c = build_logl(lf)
    fit_one, names = make_toy_fitter(c, engine='analytic')
    assert names == ['s0_rate_multiplier']
    # ...including the fused per-toy Pallas kernel (interpret mode on CPU)
    fit_pl, _ = make_toy_fitter(c, engine='pallas')
    x_an, ll_an, _ = jax.jit(fit_one)(None, None)
    x_pl, ll_pl, _ = jax.jit(fit_pl)(None, None)
    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_an),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_an),
                               rtol=1e-6, atol=1e-8)

    # Source-wise grids fall outside the closed-form engines
    conf_sw = conf_for_test(n_sources=2, mc=True, n_events_for_pdf=int(1e4))
    conf_sw['source_wise_interpolation'] = True
    lf_sw = UnbinnedLogLikelihood(conf_sw)
    lf_sw.add_shape_parameter('mu', anchors={-1: -1, 0: 0, 1: 1})
    lf_sw.prepare()
    lf_sw.set_data(lf_sw.base_model.simulate(rng=np.random.default_rng(1)))
    with pytest.raises(ValueError, match="analytic derivative engine"):
        make_toy_fitter(build_logl(lf_sw), engine='analytic')

    # Likelihood sums use the AD engine
    with pytest.raises(ValueError, match="analytic derivative engine"):
        make_toy_fitter(build_logl(LogLikelihoodSum([lf])),
                        engine='analytic')


@pytest.mark.slow
def test_unbinned_analytic_engine_matches_ad():
    """The closed-form unbinned engine reproduces the AD engine's fits on
    batched toys (rate + shape, with padding masks)."""
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel.toys import UnbinnedToyStudy

    conf = conf_for_test(mc=True, events_per_day=150.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    study_an = UnbinnedToyStudy(lf, engine='analytic')
    study_ad = UnbinnedToyStudy(lf, engine='ad')
    key = jax.random.PRNGKey(11)
    res_an = study_an.run(key, n_toys=24)
    res_ad = study_ad.run(key, n_toys=24)

    # The fused per-toy Pallas kernel (interpret mode on CPU) reproduces the
    # jnp engine bit-for-bit-to-tolerance on the same toys
    res_pl = UnbinnedToyStudy(lf, engine='pallas').run(key, n_toys=24)
    np.testing.assert_allclose(res_pl.max_ll, res_an.max_ll,
                               rtol=1e-9, atol=1e-8)
    # atol 1e-7: the analytic engine centers its objective (a constant
    # shift), which reorders float rounding relative to the uncentered
    # kernel at the ~1e-8 level in the fitted parameters
    np.testing.assert_allclose(res_pl.x, res_an.x, rtol=1e-6, atol=1e-7)

    agree = np.all(np.abs(res_an.x - res_ad.x) < 1e-5, axis=1)
    assert agree.mean() >= 0.9, agree.mean()
    np.testing.assert_allclose(res_an.max_ll[agree], res_ad.max_ll[agree],
                               rtol=1e-9, atol=1e-7)
    assert np.abs(res_an.max_ll - res_ad.max_ll).max() < 0.2

    # fit_single on the data-bound compiled object also uses the fast path
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(5)))
    from blueice_tpu.inference import bestfit_jax, bestfit_scipy
    fit, ll = bestfit_jax(lf, return_errors=False)
    fit_ref, ll_ref = bestfit_scipy(lf)
    assert abs(ll - ll_ref) < 1e-6 * abs(ll_ref)
