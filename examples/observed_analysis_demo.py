#!/usr/bin/env python
"""Observed-data analysis demo: maps and intervals on ONE dataset.

The reference's single-dataset workflow — ``plot_likelihood_ratio`` grids
and ``one_parameter_interval`` brentq scans, each point a fresh scipy fit
(blueice/inference.py:332-443) — re-done with the compiled engines:

  1. build a small 2-source model and bind an 'observed' dataset,
  2. 1D profiled likelihood-ratio curve (``profile_map``): every grid point
     a lane of one vmapped conditional-fit program,
  3. 2D map over (rate, shape) — the contour-plot payload,
  4. observed 90% upper limit and 68% central interval
     (``observed_interval``, adaptive auto grid),
  5. the host ``one_parameter_interval`` on the same dataset as the
     cross-check.

Run:  PYTHONPATH=. python examples/observed_analysis_demo.py [n_grid]
"""

import sys
import time

import numpy as np

from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.parallel import BinnedToyStudy, observed_interval


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 41

    import jax
    try:
        jax.devices()
    except RuntimeError as e:
        print("accelerator backend unavailable (%s); using CPU" %
              str(e).splitlines()[0])
        jax.config.update('jax_platforms', 'cpu')

    print("1) building a 2-source model and binding an observed dataset...")
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', np.linspace(-10, 10, 41)]],
                         n_events_for_pdf=int(2e5))
    conf['sources'][1]['mu'] = 3.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    observed = lf.base_model.simulate(rng=np.random.default_rng(7))
    lf.set_data(observed)
    print("   %d events; LL at nominal: %.2f" % (len(observed), lf()))

    study = BinnedToyStudy(lf)

    print("2) 1D profiled-LR curve over the rate (one compiled program)...")
    grid = np.linspace(0.6, 1.4, n_grid)
    t0 = time.time()
    t1d, free, cond = study.profile_map([('s0_rate_multiplier', grid)])
    rhat = float(free['s0_rate_multiplier'][0])
    print("   %d points in %.2fs; best fit %.3f, curve min t = %.3g"
          % (n_grid, time.time() - t0, rhat, float(t1d.min())))

    print("3) 2D map over (rate, shape) — the contour-plot payload...")
    t0 = time.time()
    t2d, _, _ = study.profile_map(
        [('s0_rate_multiplier', grid),
         ('mu', np.linspace(-0.8, 0.8, max(n_grid // 2, 5)))])
    print("   %s grid in %.2fs (Wilks 68%%/95%% contours: t = 2.30 / 5.99)"
          % (t2d.shape, time.time() - t0))

    print("4) observed intervals (adaptive auto grid)...")
    t0 = time.time()
    ul = observed_interval(study, 's0_rate_multiplier', kind='upper', cl=0.9)
    lo, hi = observed_interval(study, 's0_rate_multiplier', kind='central',
                               cl=0.68)
    print("   90%% UL = %.4f; 68%% central = [%.4f, %.4f]  (%.2fs both)"
          % (ul, lo, hi, time.time() - t0))

    print("5) host one_parameter_interval cross-check on the same data...")
    t0 = time.time()
    ul_host = lf.one_parameter_interval('s0_rate_multiplier', bound=3.0,
                                        kind='upper', confidence_level=0.9)
    print("   host 90%% UL = %.4f in %.1fs (device/host ratio %.3f)"
          % (ul_host, time.time() - t0, ul / ul_host))
    assert abs(ul - ul_host) < 0.05
    assert lo < rhat < hi < ul
    print("done.")


if __name__ == '__main__':
    main()
