"""Device profiled-likelihood maps on one observed dataset
(BinnedToyStudy.profile_map) — the batched twin of scanning
plot_likelihood_ratio's per-point host fits (reference:
blueice/inference.py:392-443)."""

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.inference import bestfit_scipy
from blueice_tpu.parallel import BinnedToyStudy


def _lf_and_data(seed=5):
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    study = BinnedToyStudy(lf)
    counts = np.asarray(study.simulate(jax.random.PRNGKey(seed), 1))[0]
    # Bind the identical dataset host-side: events at bin centers
    centers = [-5.0, 0.0, 5.0]
    xs = np.concatenate([np.full(int(counts[i]), centers[i])
                         for i in range(3)])
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    return lf, study, counts


def test_profile_map_2d_is_exact_against_host_ll():
    """With every parameter on the grid, nothing is profiled: the map must
    equal direct host likelihood evaluations."""
    lf, study, counts = _lf_and_data()
    g_r = np.linspace(0.8, 1.2, 3)
    g_mu = np.linspace(-0.5, 0.5, 4)
    t, free, cond = study.profile_map(
        [('s0_rate_multiplier', g_r), ('mu', g_mu)], counts=counts)
    assert t.shape == (3, 4)
    assert free.max_ll.shape == (1,)
    llf = float(free.max_ll[0])
    for i, r in enumerate(g_r):
        for j, m in enumerate(g_mu):
            ll = lf(s0_rate_multiplier=float(r), mu=float(m))
            assert np.isclose(t[i, j], max(2.0 * (llf - ll), 0.0),
                              rtol=1e-6, atol=1e-5)


def test_profile_map_1d_matches_host_profiled_fits():
    lf, study, counts = _lf_and_data()
    grid = np.linspace(0.7, 1.3, 5)
    t, free, cond = study.profile_map([('s0_rate_multiplier', grid)],
                                      counts=counts)
    assert t.shape == (5,)
    assert (t >= 0).all()
    # Host: profile mu at each grid point with scipy, reference-style
    _, llf_host = bestfit_scipy(lf)
    for i, r in enumerate(grid):
        _, llc_host = bestfit_scipy(lf, s0_rate_multiplier=float(r))
        t_host = max(2.0 * (llf_host - llc_host), 0.0)
        assert abs(t[i] - t_host) < 5e-3
    # The conditional results carry the profiled nuisance per grid point
    assert cond.max_ll.shape == (5,)
    assert 'mu' in cond.names


def test_profile_map_default_counts_from_set_data():
    lf, study, counts = _lf_and_data()
    grid = np.linspace(0.8, 1.2, 4)
    t_explicit, _, _ = study.profile_map([('s0_rate_multiplier', grid)],
                                         counts=counts)
    t_default, _, _ = study.profile_map([('s0_rate_multiplier', grid)])
    np.testing.assert_allclose(t_default, t_explicit, rtol=0, atol=0)


def test_profile_map_validation():
    lf, study, counts = _lf_and_data()
    with pytest.raises(ValueError, match="1 or 2"):
        study.profile_map([('s0_rate_multiplier', [1.0]), ('mu', [0.0]),
                           ('mu', [0.0])], counts=counts)
    with pytest.raises(ValueError, match="empty grid"):
        study.profile_map([('s0_rate_multiplier', [])], counts=counts)
    with pytest.raises(ValueError, match="shape"):
        study.profile_map([('s0_rate_multiplier', [1.0])],
                          counts=counts[:-1])
    with pytest.raises(ValueError):   # out-of-anchor-range grid point
        study.profile_map([('mu', [0.0, 7.0])], counts=counts)
    lf2 = BinnedLogLikelihood(conf_for_test(
        mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
        n_events_for_pdf=int(1e5)))
    lf2.add_rate_parameter('s0')
    lf2.prepare()
    study2 = BinnedToyStudy(lf2)
    with pytest.raises(ValueError, match="no data bound"):
        study2.profile_map([('s0_rate_multiplier', [1.0])])


def _unbinned_lf_and_data(seed=11):
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    rng = np.random.default_rng(seed)
    xs = np.concatenate([rng.normal(0, 1, 500), rng.uniform(-10, 10, 100)])
    xs = xs[(xs > -10) & (xs < 10)]
    d = np.zeros(len(xs), dtype=[('x', float), ('source', int)])
    d['x'] = xs
    lf.set_data(d)
    return lf


def test_unbinned_profile_map_2d_is_exact_against_host_ll():
    from blueice_tpu.parallel import UnbinnedToyStudy
    lf = _unbinned_lf_and_data()
    study = UnbinnedToyStudy(lf)
    g_r = np.linspace(0.8, 1.2, 3)
    g_mu = np.linspace(-0.5, 0.5, 3)
    t, free, cond = study.profile_map(
        [('s0_rate_multiplier', g_r), ('mu', g_mu)])
    assert t.shape == (3, 3)
    llf = float(free.max_ll[0])
    for i, r in enumerate(g_r):
        for j, m in enumerate(g_mu):
            ll = lf(s0_rate_multiplier=float(r), mu=float(m))
            assert np.isclose(t[i, j], max(2.0 * (llf - ll), 0.0),
                              rtol=1e-6, atol=1e-4)


def test_unbinned_profile_map_1d_matches_host_profiled_fits():
    from blueice_tpu.parallel import UnbinnedToyStudy
    lf = _unbinned_lf_and_data()
    study = UnbinnedToyStudy(lf)
    grid = np.linspace(0.8, 1.2, 4)
    t, free, cond = study.profile_map([('s0_rate_multiplier', grid)])
    assert (t >= 0).all() and cond.max_ll.shape == (4,)
    _, llf_host = bestfit_scipy(lf)
    for i, r in enumerate(grid):
        _, llc_host = bestfit_scipy(lf, s0_rate_multiplier=float(r))
        t_host = max(2.0 * (llf_host - llc_host), 0.0)
        assert abs(t[i] - t_host) < 5e-3


def test_unbinned_profile_map_requires_data():
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel import UnbinnedToyStudy
    conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = UnbinnedToyStudy(lf)
    with pytest.raises(ValueError, match="set_data"):
        study.profile_map([('s0_rate_multiplier', [1.0])])


def test_profile_map_retrace_after_set_data_x64_off():
    """Regression: without x64, the anchor-array float64->float32 cast inside
    the lazily-entered unbinned parts builder was traced, and the engine's
    parts memo leaked that tracer into the retrace a new event count
    triggers (UnexpectedTracerError on the first set_data rebind). Needs a
    subprocess: conftest enables x64 in-process, which masks the cast."""
    import os
    import subprocess
    import sys
    code = """
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax; jax.config.update('jax_platforms', 'cpu')
assert not jax.config.jax_enable_x64
import numpy as np
from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import UnbinnedLogLikelihood
from blueice_tpu.parallel import UnbinnedToyStudy
conf = conf_for_test(mc=True, analysis_space=[['x', [-10, -1, 1, 10]]],
                     n_events_for_pdf=int(5e4))
lf = UnbinnedLogLikelihood(conf)
lf.add_rate_parameter('s0')
lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
lf.prepare()
rng = np.random.default_rng(0)
study = UnbinnedToyStudy(lf)
for n in (200, 230):   # different event counts force a retrace
    d = np.zeros(n, dtype=[('x', float), ('source', int)])
    d['x'] = rng.normal(0, 1, n)
    lf.set_data(d)
    t, free, cond = study.profile_map([('s0_rate_multiplier', [0.9, 1.1])])
    assert np.isfinite(t).all()
print('RETRACE_OK')
"""
    env = dict(os.environ)
    env.pop('JAX_ENABLE_X64', None)
    for trigger in ('PALLAS_AXON_POOL_IPS', 'TPU_LIBRARY_PATH',
                    'PJRT_LIBRARY_PATH'):
        env.pop(trigger, None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, '-c', code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'RETRACE_OK' in proc.stdout


def test_observed_interval_matches_host_one_parameter_interval():
    """observed_interval reproduces one_parameter_interval on the same
    dataset (the reference's observed-data workflow) for all three kinds."""
    from blueice_tpu.parallel import observed_interval
    lf, study, counts = _lf_and_data(seed=9)
    ul = observed_interval(study, 's0_rate_multiplier', kind='upper', cl=0.9)
    ul_host = lf.one_parameter_interval(
        's0_rate_multiplier', bound=5.0, kind='upper', confidence_level=0.9,
        bestfit_routine='jax')
    assert abs(ul - ul_host) < 0.05, (ul, ul_host)

    lo, hi = observed_interval(study, 's0_rate_multiplier', kind='central',
                               cl=0.9)
    lo_host, hi_host = lf.one_parameter_interval(
        's0_rate_multiplier', bound=(0.0, 5.0), kind='central',
        confidence_level=0.9, bestfit_routine='jax')
    assert lo < hi
    assert abs(lo - lo_host) < 0.05 and abs(hi - hi_host) < 0.05

    ll = observed_interval(study, 's0_rate_multiplier', kind='lower', cl=0.9)
    assert ll < ul


def test_observed_interval_unbinned_and_validation():
    from blueice_tpu.parallel import UnbinnedToyStudy, observed_interval
    import pytest as _pytest
    lf = _unbinned_lf_and_data(seed=21)
    study = UnbinnedToyStudy(lf)
    ul, ts, hyps, free = observed_interval(
        study, 's0_rate_multiplier', kind='upper', cl=0.9, return_grid=True)
    ul_host = lf.one_parameter_interval(
        's0_rate_multiplier', bound=5.0, kind='upper', confidence_level=0.9,
        bestfit_routine='jax')
    grid_step = float(hyps[1] - hyps[0])
    assert abs(ul - ul_host) < max(2 * grid_step, 0.05), (ul, ul_host)
    assert ts.shape == (len(hyps),)
    with _pytest.raises(ValueError, match="kind"):
        observed_interval(study, 's0_rate_multiplier', kind='both')
    with _pytest.raises(ValueError, match="binned"):
        observed_interval(study, 's0_rate_multiplier',
                          counts=np.zeros(3))


def test_profile_map_rejects_duplicate_and_fixed_targets():
    """Review regression: a duplicated space name silently produced a fake
    2-D map (last grid value wins), and a target also in fixed= constrained
    the free fit so t was not a profile-LR curve."""
    lf, study, counts = _lf_and_data()
    with pytest.raises(ValueError, match="twice"):
        study.profile_map([('mu', [0.0, 0.5]), ('mu', [0.0, 0.5])],
                          counts=counts)
    with pytest.raises(ValueError, match="fixed"):
        study.profile_map([('mu', [0.0, 0.5])], counts=counts,
                          fixed={'mu': 0.3})


def test_observed_interval_warns_on_unresolvable_edge():
    """An empty dataset leaves the shape parameter unconstrained: t stays ~0
    across its whole anchor range, so no 90% edge exists — the result is NaN
    with a warning, not a silent NaN."""
    from blueice_tpu.parallel import observed_interval
    lf, study, counts = _lf_and_data()
    with pytest.warns(UserWarning, match="did not resolve"):
        ul = observed_interval(study, 'mu', kind='upper', cl=0.9,
                               counts=np.zeros_like(counts))
    assert np.isnan(ul)


def test_observed_interval_seed_reuses_one_map_program():
    """The 'auto' seed scan uses the same grid length as the adaptive
    attempts, so one compiled map program serves seed, retries and zoom."""
    from blueice_tpu.parallel import observed_interval
    lf, study, counts = _lf_and_data()
    observed_interval(study, 's0_rate_multiplier', kind='upper', cl=0.9,
                      counts=counts)
    keys = [k for k in study._profile_cache if k[-1] == 'map']
    assert len(keys) == 1
    map_fn = study._profile_cache[keys[0]][0]
    # One jitted callable; its cache should hold exactly one points shape
    sizes = getattr(map_fn, '_cache_size', None)
    if callable(sizes):
        assert map_fn._cache_size() == 1
