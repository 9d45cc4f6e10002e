#!/usr/bin/env python
"""Combined multi-dataset inference demo: two 'science runs' sharing physics.

The reference framework's flagship composition workflow (multi-run XENON
analyses: one likelihood per run, summed): here two binned runs with
different exposures and detector conditions share the signal and an
efficiency nuisance, an analytic calibration constraint pulls the
efficiency, and the whole sum compiles to ONE XLA program that drives
joint fits and mesh-sharded toy ensembles.

Run:  PYTHONPATH=. python examples/combined_runs_demo.py [n_toys]
"""

import sys
import time

import numpy as np
import jax

import blueice_tpu as bi
from blueice_tpu.likelihood import (BinnedLogLikelihood, LogLikelihoodSum,
                                    LogAncillaryLikelihood)
from blueice_tpu.parallel import BinnedToyStudy, make_mesh


class GaussianSignal(bi.MonteCarloSource):
    def simulate(self, n_events, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        d = np.zeros(n_events, dtype=[('x', float), ('source', int)])
        d['x'] = rng.normal(self.config.get('mu', 0.0),
                            self.config.get('sigma', 1.0), n_events)
        return d


def build_run(name, livetime_days, bg_rate, efficiency=1.0, seed=0):
    """One science run: flat-ish background + shared signal peak."""
    np.random.seed(seed)           # deterministic MC templates
    conf = dict(
        analysis_space=[['x', np.linspace(-8, 8, 33)]],
        sources=[
            dict(name='bg', class_=GaussianSignal, mu=0.0, sigma=6.0,
                 events_per_day=bg_rate),
            dict(name='signal', class_=GaussianSignal, mu=2.0, sigma=1.0,
                 events_per_day=1.5, apply_efficiency=True,
                 efficiency_name='efficiency'),
        ],
        efficiency=efficiency,
        livetime_days=livetime_days,
        n_events_for_pdf=int(2e5),
        default_source_class=GaussianSignal,
    )
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('bg', log_prior=bi.NormalPrior(1.0, 0.1))
    lf.add_rate_parameter('signal')
    lf.add_shape_parameter('efficiency', (0.85, 1.0, 1.15))
    lf.prepare()
    return lf


def main():
    n_toys = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    try:
        jax.devices()
    except RuntimeError as e:
        print("accelerator backend unavailable (%s); using CPU" %
              str(e).splitlines()[0])
        jax.config.update('jax_platforms', 'cpu')

    print("1) building two runs (different exposures/conditions)...")
    run1 = build_run('run1', livetime_days=100.0, bg_rate=3.0, seed=11)
    run2 = build_run('run2', livetime_days=220.0, bg_rate=2.2, seed=22)

    # Calibration measured the efficiency at 1.00 +- 0.04. NormalPrior is
    # jax-traceable, so the constraint term compiles into the joint XLA
    # program (a scipy.stats frozen logpdf would work on the host path only)
    constraint = LogAncillaryLikelihood(
        lambda p: bi.NormalPrior(1.0, 0.04)(p['efficiency']),
        ['efficiency'], config={'efficiency': 1.0})

    joint = LogLikelihoodSum([run1, run2, constraint])

    print("2) joint fit of an observed dataset pair...")
    rng = np.random.default_rng(5)
    run1.set_data(run1.base_model.simulate(rng=rng))
    run2.set_data(run2.base_model.simulate(rng=rng))
    fit, ll = joint.bestfit_jax(return_errors=False)
    print("   joint bestfit:",
          {k: round(float(v), 3) for k, v in fit.items()})

    print("3) joint Wilks upper limit on the shared signal...")
    ul = joint.one_parameter_interval('signal_rate_multiplier', bound=6.0,
                                      kind='upper', confidence_level=0.9,
                                      bestfit_routine='jax')
    print("   90%% UL on signal_rate_multiplier: %.3f" % ul)

    print("4) joint toy ensemble (%d toys, one compiled program, "
          "mesh-sharded)..." % n_toys)
    study = BinnedToyStudy(joint)
    t0 = time.time()
    t, free, cond = study.profile_ts(
        jax.random.PRNGKey(0), n_toys=n_toys,
        target='signal_rate_multiplier', hypothesis=1.0,
        truth={'signal_rate_multiplier': 1.0}, mesh=make_mesh())
    dt = time.time() - t0
    print("   %d joint profile fits in %.1fs (%.1f fits/s incl. compile); "
          "median t = %.3f (chi2(1): 0.455)"
          % (len(t), dt, len(t) / dt, float(np.median(t))))
    assert (t >= 0).all() and np.isfinite(free.max_ll).all()
    print("done.")


if __name__ == '__main__':
    main()
