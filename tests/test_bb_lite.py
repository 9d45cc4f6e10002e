"""Barlow-Beeston-lite MC-statistics handling (ops/bb_lite.py +
model_statistical_uncertainty_handling='bb_lite').

Oracles: the profiled per-bin scale has the closed form
gamma = (k + M)/(lam + M), pinned here against an explicit scipy
maximization over gamma; M -> inf and M = 0 must reduce exactly to the
plain binned Poisson likelihood; the analytic engine's (ll, g, H) must
match autodiff of the value form."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import optimize
from scipy.special import gammaln, xlogy

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.compile import build_logl
from blueice_tpu.parallel import BinnedToyStudy
from blueice_tpu.ops.bb_lite import (bb_lite_logl, bb_lite_logl_host,
                                     binned_bblite_vgh, binned_bblite_ll)
from blueice_tpu.ops.poisson import binned_poisson_logl

MUS = np.array([20.0, 400.0])
PMFS = np.array([[0.3, 0.7], [0.6, 0.4]])
NME = np.array([[50.0, 120.0], [200.0, 0.0]])   # one bin with partial MC
OBS = np.array([260.0, 180.0])


def _explicit_profile_ll(mus, pmfs, nme, obs):
    """Numerically profile gamma per bin (independent scipy implementation
    of the lite construction)."""
    lam = np.tensordot(mus, pmfs, axes=(0, 0))
    M = nme.sum(axis=0)
    tot = 0.0
    for l, m_, k in zip(lam.ravel(), M.ravel(),
                        np.asarray(obs, float).ravel()):
        if m_ > 0:
            def f(g):
                return -(xlogy(k, g * l) - g * l
                         + xlogy(m_, g) - m_ * (g - 1.0))
            r = optimize.minimize_scalar(f, bounds=(1e-9, 1e4),
                                         method='bounded',
                                         options={'xatol': 1e-14})
            tot += -r.fun - gammaln(k + 1.0)
        else:
            tot += xlogy(k, l) - l - gammaln(k + 1.0)
    return tot


def test_closed_form_root_matches_explicit_profile():
    host = bb_lite_logl_host(MUS, PMFS, NME, OBS)
    assert host == pytest.approx(_explicit_profile_ll(MUS, PMFS, NME, OBS),
                                 abs=1e-9)
    assert float(bb_lite_logl(MUS, PMFS, NME, OBS)) == pytest.approx(
        host, abs=1e-9)


def test_limits_reduce_to_plain_poisson():
    plain = float(binned_poisson_logl(MUS, PMFS, OBS))
    # M -> inf: perfect MC knowledge, gamma -> 1
    huge = np.full_like(NME, 1e14)
    assert float(bb_lite_logl(MUS, PMFS, huge, OBS)) == pytest.approx(
        plain, rel=1e-9)
    # M = 0 everywhere: no MC information, no nuisance
    assert float(bb_lite_logl(MUS, PMFS, np.zeros_like(NME), OBS)) == \
        pytest.approx(plain, rel=1e-12)
    # Lite LL <= plain at gamma = 1... and >= plain's value since gamma is
    # profiled to MAXIMIZE: the lite value always dominates the gamma=1 value
    assert float(bb_lite_logl(MUS, PMFS, NME, OBS)) >= plain - 1e-12


def test_analytic_vgh_matches_autodiff():
    from blueice_tpu.ops.binned_vgh import corner_weight_tables
    rng = np.random.default_rng(0)
    K, S, N = 2, 3, 17
    corners = jnp.asarray(rng.gamma(2.0, 1.0, (2 ** K, S, N)))
    nme_c = jnp.asarray(rng.poisson(30.0, (2 ** K, S, N)).astype(float))
    nme_c = nme_c.at[:, :, 5].set(0.0)       # a zero-MC bin
    m = jnp.asarray([3.0, 7.0, 2.0])
    t = jnp.asarray([0.3, 0.6])
    obs = jnp.asarray(rng.poisson(12.0, N).astype(float))

    def f(mt):
        w, _, _ = corner_weight_tables(mt[S:])
        P = jnp.tensordot(w, corners, axes=(0, 0))
        Mn = jnp.tensordot(w, nme_c, axes=(0, 0))
        return bb_lite_logl(mt[:S], P, Mn, obs, include_constant=False)

    mt = jnp.concatenate([m, t])
    ll, g, H = binned_bblite_vgh(corners, nme_c, m, t, obs)
    assert float(ll) == pytest.approx(float(f(mt)), abs=1e-9)
    assert np.allclose(np.asarray(g), np.asarray(jax.grad(f)(mt)), atol=1e-8)
    assert np.allclose(np.asarray(H), np.asarray(jax.hessian(f)(mt)),
                       atol=1e-7)
    assert np.allclose(np.asarray(H), np.asarray(H).T, atol=1e-9)
    assert float(binned_bblite_ll(corners, nme_c, m, t, obs)) == \
        pytest.approx(float(ll), abs=1e-9)


def _lite_lf():
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e4))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['mu'] = 3.0
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_lite'})
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    return lf


def test_host_compiled_parity():
    lf = _lite_lf()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(3)))
    comp = build_logl(lf)
    for kw in ({}, {'s0_rate_multiplier': 1.7, 'some_multiplier': 1.3},
               {'s0_rate_multiplier': 0.2, 'some_multiplier': 0.7}):
        h = lf(**kw)
        assert float(comp(**kw)) == pytest.approx(h, rel=1e-10)
    # On the SAME templates and data, the lite LL differs from the plain
    # Poisson value and can only exceed it (gamma is profiled to maximize,
    # and the constraint is normalized to 0 at gamma = 1)
    ll_lite, mus, ps = lf(full_output=True)
    observed = lf.data_events_per_bin.values
    lam = np.tensordot(np.asarray(mus, float), np.asarray(ps, float),
                       axes=(0, 0))
    ll_plain = float(np.sum(xlogy(observed, lam) - lam
                            - gammaln(observed + 1.0)))
    assert ll_lite >= ll_plain - 1e-12
    assert ll_lite != pytest.approx(ll_plain, abs=1e-6)


@pytest.mark.slow
def test_fit_engines_agree_and_toys_run():
    lf = _lite_lf()
    study = BinnedToyStudy(lf)
    from blueice_tpu.parallel.fitter import _analytic_supported
    assert _analytic_supported(study.compiled)
    key = jax.random.PRNGKey(0)
    counts = study.simulate(key, 32)
    res = study.fit_toys(counts)
    res_ad = BinnedToyStudy(lf, engine='ad').fit_toys(counts)
    assert np.allclose(np.asarray(res.max_ll), np.asarray(res_ad.max_ll),
                       atol=1e-6)
    assert np.allclose(np.asarray(res['s0_rate_multiplier']),
                       np.asarray(res_ad['s0_rate_multiplier']), atol=1e-5)
    t, free, cond = study.profile_ts(key, 256, 's0_rate_multiplier', 1.0,
                                     truth={'s0_rate_multiplier': 1.0})
    assert 0.2 < float(np.median(t)) < 0.9      # Wilks-ball-park
    assert abs(float(np.mean(free['s0_rate_multiplier'])) - 1.0) < 0.15


def test_validation_errors():
    conf = conf_for_test(n_sources=1, mc=True)
    with pytest.raises(ValueError, match="bb_lite"):
        BinnedLogLikelihood(conf, likelihood_config={
            'model_statistical_uncertainty_handling': 'bogus'})
