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
