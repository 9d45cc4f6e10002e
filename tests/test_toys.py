"""Batched toy studies: statistical sanity, mesh sharding, Wilks behavior."""

import numpy as np
import jax
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.parallel import (BinnedToyStudy, UnbinnedToyStudy, make_mesh,
                                  shard_toys)


def _binned_lf():
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    return lf


def test_binned_toys_recover_truth():
    lf = _binned_lf()
    study = BinnedToyStudy(lf)

    res = study.run(jax.random.PRNGKey(0), n_toys=200,
                    truth={'s0_rate_multiplier': 1.0})
    fitted = res['s0_rate_multiplier']
    # ~1000 events/toy: per-toy sigma ~3.2%, so the ensemble mean of 200 toys
    # pins the truth to ~0.3%
    assert abs(fitted.mean() - 1.0) < 0.015
    assert 0.01 < fitted.std() < 0.08
    # mu nuisance also recovered on average
    assert abs(res['mu'].mean()) < 0.05
    assert np.isfinite(res.max_ll).all()


def test_binned_toys_match_host_fit():
    """A single toy fit through the batched path is a true maximum of the host
    likelihood, with a consistent LL value."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    counts = study.simulate(jax.random.PRNGKey(2), 1)
    res = study.fit_toys(counts)

    # Host: bind the same counts as a dataset (events at bin centers)
    c = np.asarray(counts[0])
    centers = [-5.0, 0.0, 5.0]
    xs = np.concatenate([np.full(int(c[i]), centers[i]) for i in range(3)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)

    r_hat = float(res['s0_rate_multiplier'][0])
    mu_hat = float(res['mu'][0])
    ll_host_at_opt = lf(s0_rate_multiplier=r_hat, mu=mu_hat)

    # Value consistency between batched-device and host evaluations
    assert abs(res.max_ll[0] - ll_host_at_opt) < 1e-6 * abs(ll_host_at_opt)

    # Optimality on the host surface: perturbations only decrease the LL
    for dr, dm in [(0.02, 0), (-0.02, 0), (0, 0.02), (0, -0.02),
                   (0.01, 0.01), (-0.01, -0.01)]:
        assert lf(s0_rate_multiplier=r_hat + dr, mu=mu_hat + dm) \
            <= ll_host_at_opt + 1e-9


def test_binned_profile_ts_wilks():
    """Under the null, the profile LR statistic is ~chi2(1): its median should
    be near chi2(1).ppf(0.5) = 0.455."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(1), n_toys=300,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0,
                                     truth={'s0_rate_multiplier': 1.0})
    assert (t >= 0).all()
    med = np.median(t)
    assert 0.2 < med < 0.8, med
    # ~90% of toys below the Wilks 90% critical value (2.71)
    frac = (t < stats.chi2(1).ppf(0.9)).mean()
    assert 0.83 < frac < 0.96, frac


def test_out_of_bounds_hypothesis_and_fixed_rejected():
    """The closed-form engines only evaluate inside the anchor range, so an
    out-of-range hypothesis or fixed value must raise on host instead of
    being silently clamped onto the grid edge (regression: the analytic and
    pallas engines clamped, diverging from the AD engine's -inf)."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    with pytest.raises(ValueError, match="outside"):
        study.profile_ts(jax.random.PRNGKey(0), n_toys=8, target='mu',
                         hypothesis=5.0)       # anchors are (-1, 0, 1)
    with pytest.raises(ValueError, match="outside"):
        study.profile_ts(jax.random.PRNGKey(0), n_toys=8,
                         target='s0_rate_multiplier', hypothesis=-1.0)
    counts = study.simulate(jax.random.PRNGKey(1), 4)
    with pytest.raises(ValueError, match="outside"):
        study.fit_toys(counts, fixed={'mu': 5.0})


def test_profile_split_mode_matches_fused():
    """profile_mode='split' (two smaller XLA programs, free half shared with
    run()) produces the same statistics as the fused double-fit program."""
    lf = _binned_lf()
    fused = BinnedToyStudy(lf)
    split = BinnedToyStudy(lf, profile_mode='split')
    kw = dict(n_toys=64, target='s0_rate_multiplier', hypothesis=1.0,
              truth={'s0_rate_multiplier': 1.0})
    t_f, free_f, cond_f = fused.profile_ts(jax.random.PRNGKey(5), **kw)
    t_s, free_s, cond_s = split.profile_ts(jax.random.PRNGKey(5), **kw)
    np.testing.assert_allclose(t_s, t_f, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(free_s.x, free_f.x, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(cond_s.max_ll, cond_f.max_ll, rtol=1e-9)

    # the split free program IS the run()/fit_toys() program: the profile
    # entry went through _fit_entry's cache, so running a plain ensemble
    # afterwards adds no new fit program
    n_programs = len(split._fit_cache)
    split.fit_toys(split.simulate(jax.random.PRNGKey(6), 4))
    assert len(split._fit_cache) == n_programs


def test_binned_toys_on_mesh():
    """The same study partitioned over the 8-device CPU mesh."""
    lf = _binned_lf()
    study = BinnedToyStudy(lf)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    res = study.run(jax.random.PRNGKey(3), n_toys=64, mesh=mesh)
    assert len(res.max_ll) == 64
    assert abs(res['s0_rate_multiplier'].mean() - 1.0) < 0.05

    # Sharded and unsharded ensembles agree (up to partitioned-reduction
    # reassociation at the 1e-10 level)
    res2 = study.run(jax.random.PRNGKey(3), n_toys=64, mesh=None)
    np.testing.assert_allclose(res.x, res2.x, rtol=1e-7, atol=1e-7)


def test_binned_sum_toys():
    """A compiled LogLikelihoodSum drives the batched toy machinery: per-child
    Poisson simulation, one joint fit per toy, profile statistic on a mesh."""
    from blueice_tpu.likelihood import LogLikelihoodSum

    lf1 = _binned_lf()
    conf2 = conf_for_test(mc=True, analysis_space=[['x', [-10, 0, 10]]],
                          n_events_for_pdf=int(2e5), events_per_day=500.)
    lf2 = BinnedLogLikelihood(conf2)
    lf2.add_rate_parameter('s0')
    lf2.prepare()
    s = LogLikelihoodSum([lf1, lf2])

    study = BinnedToyStudy(s)
    counts = study.simulate(jax.random.PRNGKey(0), 3)
    assert isinstance(counts, tuple) and len(counts) == 2
    assert counts[0].shape == (3, 3) and counts[1].shape == (3, 2)

    res = study.run(jax.random.PRNGKey(1), n_toys=150)
    # Both runs constrain the shared rate: combined spread beats lf2 alone
    assert abs(res['s0_rate_multiplier'].mean() - 1.0) < 0.02
    assert 0.01 < res['s0_rate_multiplier'].std() < 0.06

    # Single-toy consistency with the host Sum: bind the simulated counts as
    # events at bin centers and check the LL value at the batched optimum
    one = study.fit_toys(jax.tree_util.tree_map(lambda c: c[:1], counts))
    for lf, c, centers in [(lf1, counts[0][0], [-5.0, 0.0, 5.0]),
                           (lf2, counts[1][0], [-5.0, 5.0])]:
        c = np.asarray(c)
        xs = np.concatenate([np.full(int(c[i]), centers[i])
                             for i in range(len(centers))])
        d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
        d['x'] = xs
        lf.set_data(d)
    ll_host = s(s0_rate_multiplier=float(one['s0_rate_multiplier'][0]),
                mu=float(one['mu'][0]))
    assert abs(one.max_ll[0] - ll_host) < 1e-6 * abs(ll_host)

    # Profile statistic over the mesh behaves like chi2(1) under the null
    t, free, cond = study.profile_ts(jax.random.PRNGKey(2), n_toys=160,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0, mesh=make_mesh())
    assert (t >= 0).all()
    assert 0.15 < np.median(t) < 0.9


def test_binned_sum_with_constraint_toys():
    """An ancillary (traceable) constraint inside the Sum tightens the toy
    fits."""
    import jax.numpy as jnp
    from blueice_tpu.likelihood import LogLikelihoodSum, LogAncillaryLikelihood

    lf = _binned_lf()
    free_std = BinnedToyStudy(lf).run(
        jax.random.PRNGKey(4), n_toys=150)['s0_rate_multiplier'].std()

    sigma = 0.01
    anc = LogAncillaryLikelihood(
        lambda p: -0.5 * ((p['s0_rate_multiplier'] - 1.0) / sigma) ** 2,
        ['s0_rate_multiplier'], config={'s0_rate_multiplier': 1.0})
    s = LogLikelihoodSum([lf, anc])
    study = BinnedToyStudy(s)
    res = study.run(jax.random.PRNGKey(4), n_toys=150)
    assert res['s0_rate_multiplier'].std() < 0.7 * free_std


def test_unbinned_toys_recover_truth():
    conf = conf_for_test(mc=True, events_per_day=200.,
                         n_events_for_pdf=int(2e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    study = UnbinnedToyStudy(lf)
    res = study.run(jax.random.PRNGKey(0), n_toys=100)
    fitted = res['s0_rate_multiplier']
    assert abs(fitted.mean() - 1.0) < 0.03
    assert 0.02 < fitted.std() < 0.2
    assert abs(res['mu'].mean()) < 0.05


def test_unbinned_sampler_skips_negative_net_bins():
    """Bins whose NET expectation is negative (allow_negative sources) must
    never be drawn: the inverse-CDF draw needs a monotone CDF, so negative
    per-bin weights are clamped to zero width before the cumsum (regression:
    the rewrite of the categorical path dropped the old clamp)."""
    conf = conf_for_test(mc=True, events_per_day=200.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)

    weights = np.asarray(study.expected_weights())
    n_bins = weights.shape[1]
    # Fake a second source that drives the upper-tail third of the bins net
    # negative (as a profile_ts_scan truth with a negative rate multiplier
    # on an allow_negative source would) while the total stays positive
    bad = slice(2 * n_bins // 3, n_bins)
    neg = np.zeros_like(weights)
    neg[:, bad] = -2.0 * weights[:, bad] - 0.5
    weights_sb = np.concatenate([weights, neg], axis=0)

    coords, mask, bins = study._sample_one(jax.random.PRNGKey(7), weights_sb)
    drawn = np.asarray(bins[0])[np.asarray(mask)]
    assert drawn.size > 0
    assert not np.isin(drawn, np.arange(n_bins)[bad]).any()


def test_unbinned_toys_on_mesh():
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    mesh = make_mesh()
    # 30 toys rounds up to 32 (next multiple of the 8-device mesh)
    res = study.run(jax.random.PRNGKey(2), n_toys=30, mesh=mesh)
    assert len(res.max_ll) == 32
    assert np.isfinite(res.max_ll).all()


def test_unbinned_piecewise_scoring():
    """Unbinned toys with piecewise pdf interpolation score via bin lookup."""
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5),
                         pdf_interpolation_method='piecewise')
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    assert study._method == 'piecewise'
    res = study.run(jax.random.PRNGKey(3), n_toys=32)
    assert np.isfinite(res.max_ll).all()
    assert abs(res['s0_rate_multiplier'].mean() - 1.0) < 0.1


def test_unbinned_source_wise_toys():
    """Source-wise morphing through the toy pipeline: identical optima to the
    global-grid study on the same toys (the anchor grids coincide)."""
    conf = conf_for_test(n_sources=2, mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5))
    key = jax.random.PRNGKey(6)

    def build(source_wise):
        c = dict(conf)
        c['source_wise_interpolation'] = source_wise
        lf = UnbinnedLogLikelihood(c)
        lf.add_rate_parameter('s0')
        lf.add_shape_parameter('mu', anchors={-1: -1, 0: 0, 1: 1})
        lf.prepare()
        return UnbinnedToyStudy(lf)

    study_sw = build(True)
    assert study_sw._source_wise
    res_sw = study_sw.run(key, n_toys=40)
    res_gl = build(False).run(key, n_toys=40)
    # The two XLA programs differ in reduction order, so a rare toy can settle
    # on the other side of an anchor-grid kink; all others must agree tightly,
    # and the maxima themselves must match everywhere.
    agree = np.all(np.abs(res_sw.x - res_gl.x) < 1e-5, axis=1)
    assert agree.mean() >= 0.95, agree.mean()
    np.testing.assert_allclose(res_sw.max_ll[agree], res_gl.max_ll[agree],
                               rtol=1e-7, atol=1e-5)
    # Even the kink-flipped stragglers sit at near-identical LL maxima
    assert np.abs(res_sw.max_ll - res_gl.max_ll).max() < 0.2

    # And the profile statistic runs end-to-end on the mesh
    study = build(True)
    t, _, _ = study.profile_ts(key, n_toys=16, target='s0_rate_multiplier',
                               hypothesis=1.0, mesh=make_mesh())
    assert (t >= 0).all() and np.isfinite(t).all()


def test_unbinned_profile_ts():
    conf = conf_for_test(mc=True, events_per_day=100.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()

    study = UnbinnedToyStudy(lf)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(5), n_toys=100,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0)
    assert (t >= 0).all()
    frac = (t < stats.chi2(1).ppf(0.9)).mean()
    assert 0.75 < frac < 1.0, frac


def test_unbinned_n_max_truncation_warns():
    """Simulating at a truth far above the default-parameter expectation must
    warn (the fixed-shape sampler would silently drop events)."""
    import warnings
    conf = conf_for_test(mc=True, events_per_day=200.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf, max_iter=5)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        study.expected_weights(s0_rate_multiplier=10.0)
    assert any('truncated' in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        study.expected_weights()
    assert not any('truncated' in str(x.message) for x in w)


def test_refine_stragglers_typed_prng_keys():
    """The straggler pass gathers its data tree on-device: new-style typed
    PRNG keys (jax.random.key) cannot round-trip through numpy."""
    from blueice_tpu.parallel.toys import _refine_stragglers

    n, k = 8, 2
    keys = jax.random.split(jax.random.key(0), n)   # typed key array
    x = np.zeros((n, k))
    ll = np.full(n, -5.0)
    it = np.array([1, 1, 9, 1, 9, 1, 1, 1])        # two lanes at the cap

    def fit_long(key_batch, x0_batch):
        b = x0_batch.shape[0]
        return (jax.numpy.ones((b, k)), jax.numpy.full((b,), -1.0),
                jax.numpy.full((b,), 3, dtype='int32'))

    x2, ll2, it2, n_ref = _refine_stragglers(fit_long, keys, x, ll, it,
                                             cap=9, bucket=4)
    assert n_ref == 2
    assert (ll2[[2, 4]] == -1.0).all()          # refined lanes improved
    assert (ll2[[0, 1, 3, 5, 6, 7]] == -5.0).all()
