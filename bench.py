#!/usr/bin/env python
"""Headline benchmark: batched profile-likelihood toy-MC fits.

Model: BASELINE.json config #1 — 2-source Gaussian toy model, 1D binned LL,
one rate multiplier + one mu shape nuisance on a 3-anchor morphing grid.

Measured: full profile-likelihood toy fits/second on one chip. One "fit" =
simulate a toy dataset + unconditional Newton fit + conditional fit (target
fixed) + profile-LR statistic — the unit of work of a Neyman/sensitivity
ensemble (north star: 10k of these under a minute on a v5e-8).

vs_baseline: speedup over the reference-equivalent host path on this machine —
sequential scipy minimization of the numpy/float64 likelihood, algorithmically
identical to blueice's inference.py/bestfit_scipy loop (the reference publishes
no numbers and its exact package cannot run here: multihist/dill are not
installed — see BASELINE.md).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_lf(n_events_for_pdf=int(2e5)):
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.test_helpers import conf_for_test

    tmp = tempfile.mkdtemp(prefix='bench_pdf_cache_')
    conf = conf_for_test(
        n_sources=2, mc=True,
        analysis_space=[['x', np.linspace(-10, 10, 101)]],
        n_events_for_pdf=n_events_for_pdf,
        cache_dir=tmp, task_dir=tmp)
    conf['sources'][1]['mu'] = 3.0

    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    return lf


def bench_device(lf, n_toys, repeats=3):
    import jax
    import jax.numpy as jnp
    from blueice_tpu.parallel.toys import BinnedToyStudy

    # Persistent compilation cache: repeated bench runs skip the (slow,
    # tunnel-remote) XLA compile of the fused toy-fit program
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/blueice_tpu_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception as e:
        log("compilation cache unavailable:", e)

    on_tpu = jax.devices()[0].platform != 'cpu'
    dtype = jnp.float32 if on_tpu else None
    tol = 3e-4 if on_tpu else 1e-8
    study = BinnedToyStudy(lf, dtype=dtype, max_iter=40, tol=tol)

    log("device:", jax.devices()[0], "dtype:", dtype or "default")

    # Warm up (compile)
    t0 = time.time()
    t, free, cond = study.profile_ts(jax.random.PRNGKey(0), n_toys=n_toys,
                                     target='s0_rate_multiplier',
                                     hypothesis=1.0)
    log("compile+first run: %.1fs; median t = %.3f; mean iters %.1f"
        % (time.time() - t0, float(np.median(t)), free.n_iter.mean()))

    times = []
    for r in range(repeats):
        t0 = time.time()
        t, free, cond = study.profile_ts(jax.random.PRNGKey(r + 1),
                                         n_toys=n_toys,
                                         target='s0_rate_multiplier',
                                         hypothesis=1.0)
        times.append(time.time() - t0)
    best = min(times)
    fits_per_sec = n_toys / best
    log("device: %d toys in %.3fs -> %.1f profile fits/s" %
        (n_toys, best, fits_per_sec))

    # Sanity: truth recovered, statistic healthy
    assert np.isfinite(free.max_ll).all()
    assert 0.7 < float(np.mean(free['s0_rate_multiplier'])) < 1.3
    return fits_per_sec


def bench_host_baseline(lf, n_toys=4):
    """Reference-equivalent path: per toy, simulate + scipy free fit +
    scipy conditional fit on the host numpy likelihood."""
    rng = np.random.default_rng(0)
    t0 = time.time()
    done = 0
    for i in range(n_toys):
        d = lf.base_model.simulate(rng=rng)
        lf.set_data(d)
        _, ll_free = lf.bestfit_scipy()
        _, ll_cond = lf.bestfit_scipy(s0_rate_multiplier=1.0)
        done += 1
        if time.time() - t0 > 60:
            break
    dt = time.time() - t0
    per_sec = done / dt
    log("host baseline: %d profile fits in %.2fs -> %.2f fits/s" %
        (done, dt, per_sec))
    return per_sec


def main():
    n_toys = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    t0 = time.time()
    lf = build_lf()
    log("template build: %.1fs" % (time.time() - t0))

    host_rate = bench_host_baseline(lf)
    device_rate = bench_device(lf, n_toys)

    print(json.dumps({
        "metric": "batched profile-likelihood toy fits "
                  "(binned 2-source Gaussian, rate+shape nuisance, "
                  "free+conditional Newton fit per toy)",
        "value": round(device_rate, 2),
        "unit": "fits/s/chip",
        "vs_baseline": round(device_rate / host_rate, 2),
    }))


if __name__ == '__main__':
    main()
