"""End-to-end test of the XENON1T-style example (scaled down): 4D morphing
grid, efficiency application, Gaussian-constrained rates, compiled-vs-host
agreement and a profile study."""

import numpy as np
import jax
import pytest

from blueice_tpu.examples.xenon_like import build_likelihood
from blueice_tpu.test_helpers import almost_equal
from blueice_tpu.compile import build_logl
from blueice_tpu.parallel import BinnedToyStudy


@pytest.fixture(scope='module')
def lf():
    return build_likelihood('binned', n_cs1_bins=12, n_cs2_bins=10,
                            livetime_days=30.0)


def test_host_likelihood(lf):
    assert len(lf.anchor_models) == 3 ** 4
    d = lf.base_model.simulate(rng=np.random.default_rng(0))
    lf.set_data(d)
    base = lf()
    assert np.isfinite(base)
    # efficiency scales the wimp rate only: the LL must move
    assert lf(efficiency=0.8) != base
    # out of anchor range -> -inf
    assert lf(band_shift=5.0) == -float('inf')


def test_compiled_matches_host(lf):
    d = lf.base_model.simulate(rng=np.random.default_rng(1))
    lf.set_data(d)
    c = build_logl(lf)
    for kwargs in [dict(),
                   dict(wimp_rate_multiplier=2.0, band_shift=0.3),
                   dict(efficiency=0.85, cs1_tilt=-0.5,
                        band_width_scale=1.1),
                   dict(er_rate_multiplier=0.95, nr_rate_multiplier=1.2)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9), kwargs


def test_efficiency_is_pure_rate_scale(lf):
    """apply_efficiency multiplies only the wimp expectation."""
    d = lf.base_model.simulate(rng=np.random.default_rng(2))
    lf.set_data(d)
    _, mus1, _ = lf(full_output=True)
    # (0.8 is inside the efficiency anchor range [0.7, 1.3]; outside -> -inf)
    _, mus2, _ = lf(full_output=True, efficiency=0.8)
    assert lf(efficiency=0.5) == -float('inf')
    wimp_i = lf.source_name_list.index('wimp')
    for i in range(len(mus1)):
        if i == wimp_i:
            assert almost_equal(mus2[i], 0.8 * mus1[i], 1e-12)
        else:
            # efficiency is also a morph axis (templates constant along it):
            # different corner cells -> last-ulp lerp differences only
            assert almost_equal(mus2[i], mus1[i], 1e-12)


def test_profile_study_small(lf):
    study = BinnedToyStudy(lf, max_iter=40)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(0), n_toys=8,
                                     target='wimp_rate_multiplier',
                                     hypothesis=1.0)
    assert (t >= 0).all()
    assert np.isfinite(free.max_ll).all()
    assert 0.5 < free['wimp_rate_multiplier'].mean() < 1.5


def test_host_simulation_matches_expectation(lf):
    """Host toy datasets are NOT overpopulated: sources with
    fraction_in_range < 1 thin their (template-drawn, in-range-only) events
    back to Poisson(expected) — regression for the 1/fraction_in_range
    double-count that biased every host toy ensemble ~+2.7%."""
    expected = float(np.sum(lf.base_model.expected_events()))
    rng = np.random.default_rng(11)
    counts = np.array([len(lf.base_model.simulate(rng=rng))
                       for _ in range(12)])
    z = (counts.mean() - expected) / (np.sqrt(expected) / np.sqrt(12))
    assert abs(z) < 4.0, (counts.mean(), expected, z)


def test_unbinned_variant_matches_host_and_fits():
    """The reference's science mode (blueice/likelihood.py:528-573) at XENON
    structure: 6 sources, 3^4 anchors, UNBINNED extended LL. Host/compiled
    parity on real simulated events plus a small batched profile study
    (the bench.py unbinned_xenon scenario at test scale)."""
    from blueice_tpu.parallel import UnbinnedToyStudy
    lf = build_likelihood('unbinned', n_cs1_bins=12, n_cs2_bins=10,
                          livetime_days=0.5)
    d = lf.base_model.simulate(rng=np.random.default_rng(3))
    assert 100 < len(d) < 700     # ~311 expected at half a live day
    lf.set_data(d)
    c = build_logl(lf)
    for kwargs in [dict(),
                   dict(wimp_rate_multiplier=2.0, band_shift=0.3),
                   dict(efficiency=0.85, cs1_tilt=-0.5,
                        band_width_scale=1.1)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-6), kwargs

    study = UnbinnedToyStudy(lf, max_iter=40)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(0), n_toys=8,
                                     target='wimp_rate_multiplier',
                                     hypothesis=1.0)
    assert (t >= 0).all()
    assert np.isfinite(free.max_ll).all()
    # wimp is ~1 event at this livetime: fits scatter wide but stay in range
    assert np.all(np.asarray(free['wimp_rate_multiplier']) >= 0)


def test_bb_lite_variant_compiles_and_fits():
    """bb='bb_lite' wires the all-source Barlow-Beeston-lite handling
    through the example: host/compiled parity and a small profile study on
    the closed-form lite engine."""
    lf = build_likelihood('binned', bb='bb_lite', n_cs1_bins=10,
                          n_cs2_bins=8, livetime_days=30.0)
    d = lf.base_model.simulate(rng=np.random.default_rng(5))
    lf.set_data(d)
    c = build_logl(lf)
    for kwargs in [dict(), dict(wimp_rate_multiplier=2.0, band_shift=0.3)]:
        assert almost_equal(float(c(**kwargs)), lf(**kwargs), 1e-9), kwargs
    study = BinnedToyStudy(lf, max_iter=40)
    from blueice_tpu.parallel.fitter import _analytic_supported
    assert _analytic_supported(study.compiled)
    t, free, cond = study.profile_ts(jax.random.PRNGKey(0), n_toys=8,
                                     target='wimp_rate_multiplier',
                                     hypothesis=1.0)
    assert (t >= -1e-6).all()
    assert np.isfinite(free.max_ll).all()


def test_limits_host_parity_relative(lf):
    """XENON-scale per-toy host parity of the device observed_interval with
    a RELATIVE tolerance (VERDICT r4 #3c: the gauss-scale test's absolute
    0.05 is vacuous where limits are ~0.02-0.08). Both sides run float64 on
    CPU; the host fit uses the jax optimizer so the comparison measures the
    limit machinery (profile scan + crossing interpolation), not scipy's
    convergence shortfall."""
    from blueice_tpu.parallel import observed_interval

    study = BinnedToyStudy(lf, max_iter=60)
    rng = np.random.default_rng(42)
    rel = []
    for i in range(2):
        d = lf.base_model.simulate({'wimp': 0.0}, rng=rng)
        lf.set_data(d)
        ul_host = float(lf.one_parameter_interval(
            'wimp_rate_multiplier', bound=6.0, kind='upper',
            confidence_level=0.9, bestfit_routine='jax'))
        ul_dev = float(observed_interval(study, 'wimp_rate_multiplier',
                                         kind='upper', cl=0.9))
        rel.append(abs(ul_dev / ul_host - 1.0))
        assert rel[-1] < 0.05, (i, ul_dev, ul_host)
