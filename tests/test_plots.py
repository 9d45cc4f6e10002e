"""Smoke tests for the plotting diagnostics (matplotlib Agg backend)."""

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.likelihood import UnbinnedLogLikelihood
from blueice_tpu.inference import plot_likelihood_ratio


def _fitted_lf():
    lf = UnbinnedLogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))
    return lf


def test_plot_likelihood_ratio_1d():
    lf = _fitted_lf()
    plot_likelihood_ratio(lf, ('s0_rate_multiplier', np.linspace(0.5, 2, 3)))
    plt.close('all')


def test_plot_likelihood_ratio_2d():
    lf = _fitted_lf()
    plot_likelihood_ratio(lf,
                          ('s0_rate_multiplier', np.linspace(0.5, 2, 3)),
                          ('some_multiplier', np.linspace(0.5, 2, 3)))
    plt.close('all')


# --- statistics-toolkit plots (blueice_tpu/plots.py): these consume the
# result dicts of the parallel constructions, so structurally-faithful fake
# results exercise all drawing paths without device work

from collections import OrderedDict

from blueice_tpu.plots import (plot_ranking, plot_coverage, plot_limit_band,
                               plot_cls)


def _fake_ranking():
    row = OrderedDict(
        name='er_slope', theta_hat=0.1, sigma_lo=0.9, sigma_hi=1.1,
        pull=0.1, constraint=1.0, prior_mu=0.0, prior_sigma=1.0,
        impact_lo=0.3, impact_hi=-0.25,
        prefit_impact_lo=0.35, prefit_impact_hi=-0.3)
    row2 = OrderedDict(
        name='free_bg_rate', theta_hat=1.05, sigma_lo=0.2, sigma_hi=0.2,
        pull=None, constraint=None, prior_mu=None, prior_sigma=None,
        impact_lo=0.1, impact_hi=-0.1,
        prefit_impact_lo=None, prefit_impact_hi=None)
    return {'target': 'wimp_rate_multiplier', 'target_hat': 1.0,
            'target_interval': (0.5, 1.5), 'nuisances': [row, row2]}


def test_plot_ranking():
    ax = plot_ranking(_fake_ranking())
    assert len(ax.get_yticklabels()) == 2
    plt.close('all')
    import pytest
    with pytest.raises(ValueError, match="no nuisance rows"):
        plot_ranking({'target': 'x', 'nuisances': []})


def test_plot_coverage():
    res = {'true_values': np.array([0.0, 1.0, 2.0]),
           'coverage': np.array([0.95, 0.91, 0.89]),
           'ci': np.array([[0.93, 0.97], [0.89, 0.93], [0.87, 0.91]]),
           'n_covered': np.array([950, 910, 890]), 'n_toys': 1000,
           'nominal': 0.9, 'kind': 'upper', 'edges': []}
    plot_coverage(res)
    plt.close('all')


def test_plot_limit_band():
    rng = np.random.default_rng(0)
    lims = rng.gamma(3.0, 0.3, size=400)
    lims[:3] = np.inf
    band = OrderedDict((q, float(np.quantile(lims[np.isfinite(lims)], q)))
                       for q in (0.025, 0.16, 0.5, 0.84, 0.975))
    res = {'limits': lims, 'band': band, 'n_beyond_grid': 3}
    plot_limit_band(res, observed=1.1)
    plt.close('all')
    import pytest
    with pytest.raises(ValueError, match="beyond the grid"):
        plot_limit_band({'limits': np.array([np.inf]),
                         'band': OrderedDict([(0.5, np.inf)])})


def test_plot_cls():
    h = np.linspace(0.1, 3.0, 8)
    curve = {'hypotheses': h, 'cls': np.exp(-h), 'clsb': 0.8 * np.exp(-h),
             'clb': np.full(8, 0.8), 'q_obs': h, 'x_hat': 0.0}
    plot_cls(curve, cl=0.9, limit=2.3)
    plt.close('all')


def test_plot_profile_map():
    from blueice_tpu.plots import plot_profile_map
    g1 = np.linspace(0, 2, 21)
    plot_profile_map((g1 - 1.0) ** 2 * 8, [('mu', g1)])
    plt.close('all')
    g2 = np.linspace(-1, 1, 11)
    t2 = (g1[:, None] - 1.0) ** 2 * 8 + (g2[None, :]) ** 2 * 5
    ax = plot_profile_map(t2, [('mu', g1), ('slope', g2)])
    assert ax.get_xlabel() == 'slope' and ax.get_ylabel() == 'mu'
    plt.close('all')
    import pytest
    with pytest.raises(ValueError, match="1 or 2"):
        plot_profile_map(t2, [('a', g1), ('b', g2), ('c', g2)])
