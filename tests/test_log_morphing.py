"""Positive-definite (log/geometric) template morphing:
likelihood_config={'template_interpolation': 'log'}.

Oracle: closed-form geometric means with the linear-mass rescale, plus
anchor-exactness against the linear morpher. Beyond the reference (blueice
morphs templates linearly only, blueice/pdf_morphers.py:57-70).
"""

import pickle

import numpy as np
import numpy.testing as npt
import pytest
from scipy.special import gammaln, xlogy

from blueice_tpu.test_helpers import (conf_for_test, almost_equal, make_data,
                                      FixedSampleSource)
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.morphers import GridInterpolator, LogMorpher
from blueice_tpu.compile import build_logl


def _two_anchor_lf(interpolation):
    """Binned lf whose single source's template flips from [0.9, 0.1] to
    [0.4, 0.6] along a non-numeric 'data' shape parameter."""
    d0, _ = make_data([dict(n_events=9, x=0.5), dict(n_events=1, x=1.5)])
    d1, _ = make_data([dict(n_events=4, x=0.5), dict(n_events=6, x=1.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         events_per_day=20. / 5., data=d0)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'template_interpolation': interpolation})
    lf.add_shape_parameter('data', anchors={0: d0, 1: d1}, base_value=0)
    lf.prepare()
    obs, _ = make_data([dict(n_events=3, x=0.5), dict(n_events=2, x=1.5)])
    lf.set_data(obs)
    return lf


def _log_morphed_pmf(p0, p1, w):
    """The LogMorpher closed form: geometric per-bin mean, total mass
    interpolated linearly."""
    raw = np.exp((1 - w) * np.log(p0) + w * np.log(p1))
    mass = (1 - w) * np.sum(p0) + w * np.sum(p1)
    return raw * mass / raw.sum()


def test_logmorpher_closed_form():
    m = GridInterpolator({}, {'z': ({0.: 0., 1.: 1.}, None, None)})
    tensor = np.array([[[0.9, 0.1]], [[0.4, 0.6]]])   # (anchors, 1 source, 2 bins)
    lm = LogMorpher(m, n_template_axes=1)
    log_t = np.log(tensor)
    for w in (0.0, 0.25, 0.5, 1.0):
        expected = _log_morphed_pmf(tensor[0, 0], tensor[1, 0], w)
        npt.assert_allclose(lm.host_eval(log_t, np.array([w]))[0], expected,
                            rtol=1e-12)
        npt.assert_allclose(np.asarray(lm.jax_eval(log_t, np.array([w]))[0]),
                            expected, rtol=1e-6)


def test_anchor_exactness_and_positivity():
    lf_log = _two_anchor_lf('log')
    lf_lin = _two_anchor_lf('linear')

    # At the anchors the two strategies are identical
    for z in (0.0, 1.0):
        assert almost_equal(lf_log(data=z), lf_lin(data=z), 1e-12)

    # Between anchors: morphed pmf is the geometric closed form
    pmf = lf_log.ps_interpolator(np.array([0.5]))[0]
    npt.assert_allclose(pmf, _log_morphed_pmf(np.array([0.9, 0.1]),
                                              np.array([0.4, 0.6]), 0.5),
                        rtol=1e-12)
    assert np.all(pmf > 0)
    # and the full likelihood value matches the Poisson closed form
    mu = lf_log.base_model.expected_events()[0]
    k = np.array([3.0, 2.0])
    expected = float(np.sum(xlogy(k, mu * pmf) - mu * pmf - gammaln(k + 1)))
    assert almost_equal(lf_log(data=0.5), expected, 1e-12)

    # log morphing differs from linear between anchors (that's the point)
    assert abs(lf_log(data=0.5) - lf_lin(data=0.5)) > 1e-6


def test_zero_bins_stay_zero():
    """A bin empty at one anchor morphs to (effectively) zero everywhere,
    instead of linear's half-height ramp."""
    d0, _ = make_data([dict(n_events=10, x=0.5)])                    # [1, 0]
    d1, _ = make_data([dict(n_events=5, x=0.5), dict(n_events=5, x=1.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         events_per_day=4., data=d0)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'template_interpolation': 'log'})
    lf.add_shape_parameter('data', anchors={0: d0, 1: d1}, base_value=0)
    lf.prepare()
    pmf = lf.ps_interpolator(np.array([0.5]))[0]
    assert pmf[1] < 1e-10          # geometric: sqrt(0.5 * floor) ~ 0
    assert abs(pmf.sum() - 1.0) < 1e-9   # mass rescale keeps the total


def test_compiled_matches_host_log_morphing():
    lf = _two_anchor_lf('log')
    c = build_logl(lf)
    # The INNER morpher's anchor grid is published with the log flag: the
    # closed-form engine carries the exp/mass-rescale chain itself
    assert c.log_morph
    assert c.anchor_arrays is not None and len(c.anchor_arrays) == 1
    for kwargs in [dict(), dict(data=0.3), dict(data=0.75),
                   dict(data=0.5, s0_rate_multiplier=1.7)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9), kwargs


@pytest.mark.parametrize('mode', ['bb_lite', 'bb_single'])
def test_log_morphing_with_bb_modes(mode):
    """Log-morphed pmfs compose with the MC-statistics modes: the morphed
    nme stays linear, the pmfs geometric, and host == compiled."""
    d0, _ = make_data([dict(n_events=9, x=0.5), dict(n_events=1, x=1.5)])
    d1, _ = make_data([dict(n_events=4, x=0.5), dict(n_events=6, x=1.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         events_per_day=20. / 5., data=d0)
    lc = {'template_interpolation': 'log',
          'model_statistical_uncertainty_handling': mode}
    if mode == 'bb_single':
        lc['bb_single_source'] = 0
    lf = BinnedLogLikelihood(conf, likelihood_config=lc)
    lf.add_shape_parameter('data', anchors={0: d0, 1: d1}, base_value=0)
    lf.prepare()
    obs, _ = make_data([dict(n_events=3, x=0.5), dict(n_events=2, x=1.5)])
    lf.set_data(obs)
    c = build_logl(lf)
    for z in (0.0, 0.4, 0.8):
        assert almost_equal(float(c(data=z)), lf(data=z), 1e-12), (mode, z)


def test_analytic_engine_matches_ad_engine():
    """The closed-form engine (ops.binned_vgh_log) fits log-morphed models
    to the same optimum as autodiff of the compiled likelihood."""
    import jax.numpy as jnp
    from blueice_tpu.parallel.fitter import make_toy_fitter
    lf = _two_anchor_lf('log')
    c = build_logl(lf)
    data = jnp.asarray(
        lf.data_events_per_bin.values.reshape(-1), dtype=float)
    results = {}
    for engine in ('analytic', 'ad'):
        fit_one, names = make_toy_fitter(c, engine=engine)
        x, ll, _ = fit_one(data)
        results[engine] = (np.asarray(x), float(ll), names)
    assert results['analytic'][2] == results['ad'][2]
    npt.assert_allclose(results['analytic'][0], results['ad'][0], atol=2e-6)
    npt.assert_allclose(results['analytic'][1], results['ad'][1], atol=1e-8)


def test_binned_vgh_log_matches_autodiff():
    """ops.binned_vgh_log against jax value/grad/Hessian of the same closed
    form, on a K=2 grid with 2 sources — exercises the off-diagonal AND the
    (nonzero, unlike multilinear) diagonal t-curvature."""
    import jax
    import jax.numpy as jnp
    from blueice_tpu.ops.binned_vgh import (binned_vgh_log, binned_ll_log,
                                            corner_weight_tables,
                                            _log_morph_P)
    rng = np.random.RandomState(42)
    S, N = 2, 7
    corners = rng.uniform(0.05, 1.0, size=(4, S, N))
    corners /= corners.sum(axis=-1, keepdims=True)
    log_corners = jnp.asarray(np.log(corners))
    mass_corners = jnp.asarray(corners.sum(axis=-1))   # == 1 by construction
    observed = jnp.asarray(rng.poisson(8.0, size=N).astype(float))
    m0 = jnp.asarray([5.0, 9.0])
    t0 = jnp.asarray([0.3, 0.7])

    def ll_of(mt):
        w, _, _ = corner_weight_tables(mt[S:])
        P, _, _, _ = _log_morph_P(log_corners, mass_corners, w)
        lam = mt[:S] @ P
        k_safe = jnp.where(observed > 0, observed, 1.0)
        return jnp.sum(observed * jnp.log(lam / k_safe) - (lam - observed))

    mt0 = jnp.concatenate([m0, t0])
    ll, g, H = binned_vgh_log(log_corners, mass_corners, m0, t0, observed)
    npt.assert_allclose(float(ll), float(ll_of(mt0)), rtol=1e-10)
    npt.assert_allclose(float(ll),
                        float(binned_ll_log(log_corners, mass_corners,
                                            m0, t0, observed)), rtol=1e-12)
    npt.assert_allclose(np.asarray(g), np.asarray(jax.grad(ll_of)(mt0)),
                        rtol=1e-8, atol=1e-10)
    npt.assert_allclose(np.asarray(H), np.asarray(jax.hessian(ll_of)(mt0)),
                        rtol=1e-7, atol=1e-9)


@pytest.mark.slow
def test_toy_study_on_log_morphed_model():
    from blueice_tpu.parallel.toys import BinnedToyStudy
    lf = _two_anchor_lf('log')
    study = BinnedToyStudy(lf, max_iter=40)
    import jax
    res = study.run(jax.random.PRNGKey(11), n_toys=8)
    assert np.all(np.isfinite(res.max_ll))


@pytest.mark.slow
def test_log_morph_bb_still_falls_back():
    """With a Beeston-Barlow mode the engines' linear pmf lerp does not
    apply: the AD engine runs it, engine='analytic' refuses."""
    from blueice_tpu.parallel.toys import BinnedToyStudy
    import jax
    d0, _ = make_data([dict(n_events=9, x=0.5), dict(n_events=1, x=1.5)])
    d1, _ = make_data([dict(n_events=4, x=0.5), dict(n_events=6, x=1.5)])
    conf = conf_for_test(default_source_class=FixedSampleSource,
                         analysis_space=[['x', [0, 1, 2]]],
                         events_per_day=20. / 5., data=d0)
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'template_interpolation': 'log',
        'model_statistical_uncertainty_handling': 'bb_lite'})
    lf.add_shape_parameter('data', anchors={0: d0, 1: d1}, base_value=0)
    lf.prepare()
    obs, _ = make_data([dict(n_events=3, x=0.5), dict(n_events=2, x=1.5)])
    lf.set_data(obs)
    res = BinnedToyStudy(lf, max_iter=40).run(jax.random.PRNGKey(2), n_toys=4)
    assert np.all(np.isfinite(res.max_ll))
    with pytest.raises(ValueError, match="analytic derivative engine"):
        BinnedToyStudy(lf, engine='analytic').run(
            jax.random.PRNGKey(1), n_toys=4)


def test_log_morphing_pickles():
    lf = _two_anchor_lf('log')
    before = lf(data=0.4)
    lf2 = pickle.loads(pickle.dumps(lf))
    assert almost_equal(lf2(data=0.4), before, 1e-12)


def test_log_morphing_rejections():
    with pytest.raises(ValueError, match='template_interpolation'):
        BinnedLogLikelihood(conf_for_test(), likelihood_config={
            'template_interpolation': 'exp'})
    with pytest.raises(NotImplementedError, match='binned'):
        UnbinnedLogLikelihood(conf_for_test(), likelihood_config={
            'template_interpolation': 'log'})
    # Negative templates cannot morph geometrically
    m = GridInterpolator({}, {'z': ({0.: 0., 1.: 1.}, None, None)})
    lm = LogMorpher(m, n_template_axes=1)
    with pytest.raises(ValueError, match='nonnegative'):
        lm.build_tensor(lambda model: np.array([-1.0, 1.0]) * model,
                        [2], {(0.,): 1.0, (1.,): 1.0})
