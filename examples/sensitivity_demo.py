#!/usr/bin/env python
"""End-to-end sensitivity analysis demo (the framework's 'demo notebook').

Covers the full workflow on the XENON1T-style model:
  1. build the likelihood (templates + 81-anchor morphing grid),
  2. fit an observed dataset (host scipy and gradient/Newton engines),
  3. set a Wilks upper limit,
  4. run a batched toy sensitivity ensemble on the accelerator,
  5. calibrate the limit with a Neyman construction,
  6. compute the expected-sensitivity (Brazil) band from per-toy limits.

Run:  PYTHONPATH=. python examples/sensitivity_demo.py [n_toys]
(On a CPU-only machine, takes a few minutes; on a TPU the toy ensemble is
thousands of fits per second.)
"""

import sys
import time

import numpy as np
import jax

from blueice_tpu.examples.xenon_like import build_likelihood
from blueice_tpu.parallel import (BinnedToyStudy, NeymanConstruction,
                                  make_mesh, sensitivity_band)


def main():
    n_toys = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    # A broken/unavailable accelerator plugin should not kill the demo:
    # fall back to the CPU backend before the first computation.
    try:
        jax.devices()
    except RuntimeError as e:
        print("accelerator backend unavailable (%s); using CPU" %
              str(e).splitlines()[0])
        jax.config.update('jax_platforms', 'cpu')

    print("1) building likelihood (6 sources, 3^4 anchor models)...")
    t0 = time.time()
    lf = build_likelihood('binned', n_cs1_bins=25, n_cs2_bins=31)
    print("   prepared in %.1fs" % (time.time() - t0))

    print("2) simulating an 'observed' dataset and fitting...")
    observed = lf.base_model.simulate(rng=np.random.default_rng(42))
    lf.set_data(observed)
    print("   %d events; LL at nominal: %.2f" % (len(observed), lf()))

    fit, max_ll = lf.bestfit_jax()
    print("   gradient fit: wimp rate = %.3f +- %.3f  (LL %.2f)"
          % (fit['wimp_rate_multiplier'],
             fit['wimp_rate_multiplier_error'], max_ll))

    print("3) 90%% CL Wilks upper limit on the WIMP rate...")
    # bestfit_routine='jax': the gradient/Newton engine — one compile serves
    # every conditional fit of the brentq scan (scipy works too, but is
    # fragile on this 8-parameter model)
    ul = lf.one_parameter_interval('wimp_rate_multiplier', bound=8,
                                   kind='upper', confidence_level=0.9,
                                   bestfit_routine='jax')
    print("   UL(Wilks) = %.3f" % ul)

    print("4) batched toy ensemble (%d toys)..." % n_toys)
    study = BinnedToyStudy(lf, dtype=jax.numpy.float32)
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    t0 = time.time()
    t_stats, free, cond = study.profile_ts(
        jax.random.PRNGKey(0), n_toys=n_toys,
        target='wimp_rate_multiplier', hypothesis=1.0, mesh=mesh)
    dt = time.time() - t0
    # len(t_stats), not n_toys: on a mesh the toy count rounds UP to a
    # multiple of the device count
    print("   %d profile fits in %.1fs (%.1f fits/s, incl. compile); "
          "median t = %.3f" % (len(t_stats), dt, len(t_stats) / dt,
                               float(np.median(t_stats))))

    print("5) Neyman-calibrated upper limit...")
    nc = NeymanConstruction(study, 'wimp_rate_multiplier', mesh=mesh)
    nc.scan(jax.random.PRNGKey(1),
            hypotheses=np.linspace(0.25, max(2.5, 1.5 * ul), 3),
            n_toys=n_toys)
    ul_neyman = lf.one_parameter_interval('wimp_rate_multiplier', bound=8,
                                          kind='upper', confidence_level=0.9,
                                          t_ppf=nc.t_ppf,
                                          bestfit_routine='jax')
    print("   UL(Neyman) = %.3f   (coverage check: %s)"
          % (ul_neyman, np.round(nc.coverage_check(0.9), 3)))

    print("6) expected-sensitivity (Brazil) band: per-toy 90%% upper limits "
          "over a\n   background-only ensemble...")
    t0 = time.time()
    out = sensitivity_band(
        study, jax.random.PRNGKey(2), 'wimp_rate_multiplier',
        hypotheses='auto', n_toys=n_toys, mesh=mesh)
    band = out['band']
    print("   %d toy limits in %.1fs: median %.3f, 68%% [%.3f, %.3f], "
          "95%% [%.3f, %.3f]"
          % (n_toys, time.time() - t0, band[0.5], band[0.16], band[0.84],
             band[0.025], band[0.975]))


if __name__ == '__main__':
    main()
