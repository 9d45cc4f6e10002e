#!/usr/bin/env python
"""Headline benchmark: batched profile-likelihood toy-MC fits.

One "fit" = simulate a toy dataset + unconditional Newton fit + conditional
fit (target fixed) + profile-LR statistic — the unit of work of a
Neyman/sensitivity ensemble (north star: 10k of these under a minute on a
v5e-8).

Default run covers ALL four scenarios (the driver's one JSON line carries the
Gaussian-binned headline plus a "scenarios" record for xenon / unbinned /
beeston-barlow, each with its own host baseline):

  gauss    — BASELINE.json config #1: 2-source Gaussian, 1D binned,
             rate + mu shape nuisance on a 3-anchor grid, 4096 toys
  unbinned — same model, per-event extended LL (~2k events/toy), 1024 toys
  xenon    — BASELINE.json config #4: 6 sources, 3^4=81-anchor grid,
             8 nuisances, 2D 50x62 bins, 512 toys
  bb       — xenon with bb_single Beeston-Barlow MC-statistics handling on
             the dominant ER background (the reference's signature feature,
             blueice/likelihood.py:618-660), full 50x62 binning, 256 toys

vs_baseline: speedup over the reference-equivalent host path on this machine —
sequential scipy minimization of the numpy/float64 likelihood, algorithmically
identical to blueice's inference.py/bestfit_scipy loop (the reference
publishes no numbers and its exact package cannot run here: multihist/dill
are not installed — see BASELINE.md). Baselines are pinned: >= 48 seeded toys
where the host rate allows (median + IQR reported on stderr), 120 s cap on
the slow XENON-scale loops.

Also: `python bench.py mfu` prints the kernel roofline/MFU table (see
blueice_tpu/utils/roofline.py) — achieved FLOP/s and HBM bytes/s of each
fused Pallas kernel against the v5e VPU/HBM roofs, and which bound binds.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/blueice_tpu_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception as e:
        log("compilation cache unavailable:", e)


def build_lf(n_events_for_pdf=int(2e5), binned=True):
    from blueice_tpu.likelihood import (BinnedLogLikelihood,
                                        UnbinnedLogLikelihood)
    from blueice_tpu.test_helpers import conf_for_test

    tmp = tempfile.mkdtemp(prefix='bench_pdf_cache_')
    conf = conf_for_test(
        n_sources=2, mc=True,
        analysis_space=[['x', np.linspace(-10, 10, 101)]],
        n_events_for_pdf=n_events_for_pdf,
        cache_dir=tmp, task_dir=tmp)
    conf['sources'][1]['mu'] = 3.0

    lf = (BinnedLogLikelihood if binned else UnbinnedLogLikelihood)(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    return lf


def build_lf_unbinned(n_events_for_pdf=int(2e5)):
    return build_lf(n_events_for_pdf, binned=False)


def build_lf_xenon(bb=False):
    """BASELINE.json config #4: 6 sources, 4 shape nuisances, 81-anchor grid,
    Gaussian-constrained rates, 2D 50x62-bin analysis space; with bb, the
    Beeston-Barlow adjustment profiles the ER background's finite-MC bins."""
    from blueice_tpu.examples.xenon_like import build_likelihood
    return build_likelihood('binned', bb=bb)


def _study_for(lf, scenario, **opts):
    import jax
    import jax.numpy as jnp
    from blueice_tpu.parallel.toys import BinnedToyStudy, UnbinnedToyStudy

    on_tpu = jax.devices()[0].platform != 'cpu'
    dtype = jnp.float32 if on_tpu else None
    tol = 3e-4 if on_tpu else 1e-8
    # Generous stage-1 cap: the integrated while_loop exits as soon as every
    # lane is done, so a high cap costs nothing when lanes converge
    cls = UnbinnedToyStudy if scenario == 'unbinned' else BinnedToyStudy
    return cls(lf, dtype=dtype, max_iter=96, tol=tol, **opts)


def bench_device(lf, n_toys, scenario, repeats=3,
                 target='s0_rate_multiplier'):
    import jax
    _enable_compile_cache()
    study = _study_for(lf, scenario)
    log("device:", jax.devices()[0])

    t0 = time.time()
    t, free, cond = study.profile_ts(jax.random.PRNGKey(0), n_toys=n_toys,
                                     target=target, hypothesis=1.0)
    compile_s = time.time() - t0
    log("compile+first run: %.1fs; median t = %.3f; mean iters %.1f"
        % (compile_s, float(np.median(t)), free.n_iter.mean()))

    times = []
    for r in range(repeats):
        t0 = time.time()
        t, free, cond = study.profile_ts(jax.random.PRNGKey(r + 1),
                                         n_toys=n_toys,
                                         target=target, hypothesis=1.0)
        times.append(time.time() - t0)
    best = min(times)
    fits_per_sec = n_toys / best
    log("device: %d toys in %.3fs -> %.1f profile fits/s" %
        (n_toys, best, fits_per_sec))

    assert np.isfinite(free.max_ll).all()
    assert 0.7 < float(np.mean(free[target])) < 1.3
    return dict(fits_per_sec=round(fits_per_sec, 2),
                compile_first_run_s=round(compile_s, 1),
                median_t=round(float(np.median(t)), 4),
                n_toys=n_toys)


def bench_host_baseline(lf, n_toys=48, target='s0_rate_multiplier',
                        time_cap=120.0):
    """Reference-equivalent path: per toy, simulate + scipy free fit +
    scipy conditional fit on the host numpy likelihood.

    Pinned measurement: fixed seed, a fixed toy set timed per-toy, rate =
    1 / median(per-toy time); median + IQR reported so run-to-run swing is
    visible. Scipy's numerical differentiation probing the -inf boundary
    emits (harmless, reference-identical) invalid-value warnings; silenced.
    """
    import warnings
    from blueice_tpu.exceptions import OptimizationFailed
    rng = np.random.default_rng(0)
    times = []
    start = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', RuntimeWarning)
        for i in range(n_toys):
            d = lf.base_model.simulate(rng=rng)
            t0 = time.time()
            lf.set_data(d)
            try:
                _, ll_free = lf.bestfit_scipy()
                _, ll_cond = lf.bestfit_scipy(**{target: 1.0})
            except OptimizationFailed:
                pass    # reference behavior: a failed toy costs the same time
            times.append(time.time() - t0)
            # Always finish at least one toy (the BB host path can exceed the
            # cap on its own), then respect the cap
            if time.time() - start > time_cap:
                break
    med = float(np.median(times))
    q1, q3 = np.percentile(times, [25, 75])
    per_sec = 1.0 / med
    log("host baseline: %d profile fits, median %.4fs/fit (IQR %.4f-%.4f) "
        "-> %.2f fits/s (mean %.2f)"
        % (len(times), med, q1, q3, per_sec, len(times) / sum(times)))
    return per_sec


SCENARIOS = {
    # name: (build, target, default n_toys, host-baseline toys)
    'gauss': (build_lf, 's0_rate_multiplier', 4096, 64),
    'unbinned': (build_lf_unbinned, 's0_rate_multiplier', 1024, 48),
    'xenon': (lambda: build_lf_xenon(bb=False), 'wimp_rate_multiplier',
              512, 48),
    'bb': (lambda: build_lf_xenon(bb=True), 'wimp_rate_multiplier', 256, 48),
}

METRICS = {
    'gauss': ("batched profile-likelihood toy fits (binned 2-source "
              "Gaussian, rate+shape nuisance, free+conditional Newton fit "
              "per toy)"),
    'unbinned': ("batched profile-likelihood toy fits (unbinned 2-source "
                 "Gaussian, ~2k events/toy, rate+shape nuisance)"),
    'xenon': ("batched profile-likelihood toy fits (XENON1T-style 2D: 6 "
              "sources, 81-anchor morphing grid, 8 nuisances, 50x62 bins)"),
    'bb': ("batched profile-likelihood toy fits (XENON1T-style 2D with "
           "Beeston-Barlow bb_single MC-statistics profiling, 50x62 bins)"),
}


def run_scenario(name, n_toys=None):
    build, target, default_toys, host_toys = SCENARIOS[name]
    # MC-sampled pdf templates draw from the global numpy RNG
    # (reference-parity behavior). Seed it per scenario so the templates —
    # which are baked into the compiled fit programs as constants — are
    # bit-identical run to run: otherwise every bench run has a fresh XLA
    # cache key (persistent-compilation-cache miss, ~4 minutes of remote
    # compile at Gaussian scale) and a different-difficulty host baseline.
    np.random.seed(20260817)
    t0 = time.time()
    lf = build()
    log("[%s] template build: %.1fs" % (name, time.time() - t0))
    host_rate = bench_host_baseline(lf, n_toys=host_toys, target=target)
    dev = bench_device(lf, n_toys or default_toys, name, target=target)
    dev['host_fits_per_sec'] = round(host_rate, 2)
    dev['vs_baseline'] = round(dev['fits_per_sec'] / host_rate, 2)
    log("[%s] %s" % (name, dev))
    return dev


def bench_mfu():
    """Kernel-level roofline: achieved FLOP/s / HBM GB/s of each fused Pallas
    kernel vs the chip's compute and bandwidth roofs."""
    import jax
    from blueice_tpu.utils.roofline import (
        measure_binned_kernel, measure_bb_kernel, measure_unbinned_kernel,
        format_report)
    _enable_compile_cache()
    chip = 'tpu-v5e' if jax.default_backend() == 'tpu' else 'cpu-1core'
    verdicts = [
        measure_binned_kernel(chip=chip),       # XENON-scale shapes
        measure_bb_kernel(chip=chip),
        measure_unbinned_kernel(chip=chip),     # Gaussian-unbinned shapes
    ]
    log(format_report(verdicts))
    v = verdicts[0]
    print(json.dumps({
        "metric": "fused binned vgh kernel fraction of binding roofline "
                  "(%s; %s-bound)" % (v['kernel'], v['binding']),
        "value": round(100 * v['frac_of_binding_roof'], 1),
        "unit": "% of roofline",
        "vs_baseline": round(v['gflops_achieved'], 1),
        "kernels": [{k: (round(x, 4) if isinstance(x, float) else x)
                     for k, x in vv.items()} for vv in verdicts],
    }))


def bench_splitcompile(n_toys=None, scenario='xenon'):
    """Cold-compile A/B of the profile double fit: ONE fused XLA program vs
    TWO split programs (BinnedToyStudy(profile_mode=...)). Redirects the
    persistent compilation cache to a throwaway dir so both modes genuinely
    compile from scratch; statistics are pinned equal between modes."""
    import jax

    build, target, default_toys, _ = SCENARIOS[scenario]
    n_toys = n_toys or min(default_toys, 256)
    np.random.seed(20260817)
    lf = build()
    results = {}
    t_seen = {}
    for mode in ('fused', 'split'):
        # Fresh cache dir PER MODE: the stage-2 straggler-refit programs have
        # identical HLO in both modes, so a shared dir would let the
        # second-run mode cache-hit compiles the first mode paid for
        try:
            jax.config.update('jax_compilation_cache_dir',
                              tempfile.mkdtemp(prefix='bench_cold_cache_'))
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              2.0)
        except Exception as e:
            log("cache redirect failed:", e)
        study = _study_for(lf, scenario, profile_mode=mode)
        # Warm the (mode-independent) simulation program so the A/B only
        # times the fit programs' compilation
        study.simulate(jax.random.PRNGKey(9), n_toys)
        t0 = time.time()
        t, free, cond = study.profile_ts(jax.random.PRNGKey(0),
                                         n_toys=n_toys, target=target,
                                         hypothesis=1.0)
        cold = time.time() - t0
        t0 = time.time()
        study.profile_ts(jax.random.PRNGKey(1), n_toys=n_toys,
                         target=target, hypothesis=1.0)
        warm = time.time() - t0
        t_seen[mode] = np.asarray(t)
        results[mode] = dict(compile_first_run_s=round(cold, 1),
                             warm_run_s=round(warm, 3),
                             fits_per_sec=round(n_toys / warm, 1),
                             median_t=round(float(np.median(t)), 4))
        log("[%s/%s] cold %.1fs, warm %.3fs" % (scenario, mode, cold, warm))
    agree = bool(np.allclose(t_seen['fused'], t_seen['split'],
                             rtol=1e-4, atol=1e-5))
    log("statistics agree between modes:", agree)
    print(json.dumps({
        "metric": "cold compile+first-run of the %s profile program, "
                  "split mode (two XLA programs)" % scenario,
        "value": results['split']['compile_first_run_s'],
        "unit": "s",
        "vs_baseline": round(results['fused']['compile_first_run_s']
                             / max(results['split']['compile_first_run_s'],
                                   1e-9), 2),
        "detail": {"modes": results, "stats_agree": agree},
    }))


def main():
    args = list(sys.argv[1:])
    if 'mfu' in args:
        bench_mfu()
        return
    if 'splitcompile' in args:
        nums = [int(a) for a in args if a.isdigit()]
        bench_splitcompile(nums[0] if nums else None)
        return
    nums = [int(a) for a in args if a.isdigit()]
    n_toys = nums[0] if nums else None
    named = [a for a in args if a in SCENARIOS]

    if named:
        # Single-scenario mode: bench.py <scenario> [n_toys]
        name = named[0]
        dev = run_scenario(name, n_toys)
        print(json.dumps({
            "metric": METRICS[name], "value": dev['fits_per_sec'],
            "unit": "fits/s/chip", "vs_baseline": dev['vs_baseline'],
            "detail": dev,
        }))
        return

    # Default: full story. Headline = Gaussian binned; every other scenario
    # rides along in the same JSON record.
    results = {}
    for name in ('gauss', 'unbinned', 'xenon', 'bb'):
        try:
            results[name] = run_scenario(name, n_toys if name == 'gauss'
                                         else None)
        except Exception as e:   # a broken scenario must not hide the rest
            log("[%s] FAILED: %r" % (name, e))
            results[name] = dict(error=repr(e))
    head = results['gauss']
    print(json.dumps({
        "metric": METRICS['gauss'],
        "value": head.get('fits_per_sec'),
        "unit": "fits/s/chip",
        "vs_baseline": head.get('vs_baseline'),
        "scenarios": results,
    }))


if __name__ == '__main__':
    main()
