"""Batched toy-MC studies: simulate -> fit, vmapped over toys, sharded over a
TPU mesh.

This is the TPU-native re-imagination of the reference's parallelism layer
(reference: blueice/parallel.py + the user-side "simulate, set_data, fit, repeat
10k times" loop described in SURVEY.md §3.5): instead of farming independent
host fits to worker processes through the filesystem, the *entire* toy pipeline
— Poisson sampling of datasets, anchor morphing, likelihood evaluation, the full
Newton fit, the profile-likelihood test statistic — is one XLA program, vmapped
over the toy axis and partitioned across devices with ``jax.sharding`` (data
parallelism over toys rides ICI; no host round-trips).

Binned studies are the fast path: the sufficient statistic of a binned
likelihood is the per-bin count, so toys are Poisson draws over the expected
count tensor — no event-level simulation at all. Unbinned studies sample padded
fixed-size event sets from the (source, bin) expectation tensor and score them
against the anchor templates on device.
"""

import itertools
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import build_logl
from ..ops.interp import interp_at_points, piecewise_lookup
from .fitter import make_toy_fitter, check_fixed_in_bounds

__all__ = ['make_mesh', 'shard_toys', 'BinnedToyStudy', 'UnbinnedToyStudy',
           'ToyResults']


def _round_up_toys(n_toys, mesh):
    size = int(mesh.devices.size)
    return -(-int(n_toys) // size) * size


def _refine_stragglers(fit_long, data_tree, x, ll, it, cap, extra_args=(),
                       bucket=None):
    """Host-side straggler pass for lockstep vmapped fits.

    A vmapped ``lax.while_loop`` runs until the SLOWEST toy finishes, so a few
    hard toys gate the whole batch. Stage 1 therefore runs with a short
    iteration cap; this pass gathers the toys that hit it into a small
    fixed-size bucket (one extra compile, reused forever), re-fits them with a
    4x cap warm-started from their stage-1 points, and scatters the results
    back. Typical cost: a few percent of stage 1.

    :param fit_long: jitted vmapped fitter (data_tree_batch, x0_batch[,
      *extra]) -> (x, ll, it).
    :param data_tree: the stage-1 input batch (pytree, leading toys axis).
    :return: (x, ll, it) with stragglers refined, plus the straggler count.
    """
    it = np.array(it)
    idx = np.flatnonzero(it >= cap)
    x = np.array(x)
    ll = np.array(ll)
    if idx.size == 0:
        return x, ll, it, 0
    n_toys = it.shape[0]
    if bucket is None:
        bucket = min(n_toys, max(8, n_toys // 16))
    for start in range(0, idx.size, bucket):
        sel = idx[start:start + bucket]
        pad = np.resize(sel, bucket)        # repeat-fill to the fixed shape
        # Gather on-device (typed PRNG-key leaves cannot round-trip numpy)
        d_sel = jax.tree_util.tree_map(lambda c: c[pad], data_tree)
        xs, lls, its = fit_long(d_sel, jnp.asarray(x[pad]), *extra_args)
        keep = slice(0, sel.size)
        better = np.asarray(lls)[keep] >= ll[sel]
        x[sel[better]] = np.asarray(xs)[keep][better]
        ll[sel[better]] = np.asarray(lls)[keep][better]
        it[sel] = cap + np.asarray(its)[keep]
    return x, ll, it, idx.size


def _wrap_cond_long(cond_long):
    """Jitted vmapped long-cap conditional refit with a broadcast hypothesis
    — the calling shape ``_refine_stragglers`` uses with a trailing-h
    extra_args. Shared by the refiner pairing and the grid entries."""
    return jax.jit(jax.vmap(lambda d, x0, h: cond_long(d, None, (h,), x0),
                            in_axes=(0, 0, None)))


def _freeze_opts(d):
    """Hashable cache key of an options dict."""
    return tuple(sorted((d or {}).items()))


def _best_of_two(a, b):
    """Select, per lane, the better of two (x, max_ll, n_iter) fit results
    (NaN/-inf lls lose); iteration counts add (both fits were paid for)."""
    xa, lla, ita = a
    xb, llb, itb = b
    lla_safe = jnp.where(jnp.isnan(lla), -jnp.inf, lla)
    llb_safe = jnp.where(jnp.isnan(llb), -jnp.inf, llb)
    take_a = lla_safe >= llb_safe
    return (jnp.where(take_a, xa, xb),
            jnp.maximum(lla_safe, llb_safe), ita + itb)


def _warm_cols(names_free, names_cond):
    """Free-fit columns that warm-start the conditional fit, or None when
    the conditional names are not a subset of the free ones. ONE
    implementation — the binned/unbinned twins must not drift."""
    if set(names_cond) <= set(names_free):
        return [names_free.index(n) for n in names_cond]
    return None


def _check_target_not_fixed(target, fixed):
    """A fixed profile target would constrain the 'free' fit too, so t
    would not be a profile-likelihood-ratio statistic — reject loudly
    (same contract as profile_map's _check_map_space)."""
    if target in (fixed or {}):
        raise ValueError(
            "the profile target %r cannot also be in fixed= — a fixed "
            "target would constrain the free fit, so t would not be a "
            "profile-likelihood-ratio statistic" % (target,))


def _cond_scan(hypotheses, call_cond, refine_cond, llf, names_cond, cap,
               need_cond=True):
    """Per-hypothesis conditional-fit loop shared by the ``profile_ts_grid``
    twins: run the compiled conditional program at each hypothesis, refine
    its stragglers, recompute the statistic from the refined optima.

    :param call_cond: hj -> (t, (xc, llc, itc)) device values.
    :param refine_cond: (xc, llc, itc, hj) -> refined (xc, llc, itc), or
      None when no refiner exists (then the free fit was not refined either —
    one-sided refinement would bias t).
    :param need_cond: when False, the per-hypothesis conditional parameter
      matrices are NOT transferred to host (limit/coverage callers only use
      t) — on a remote device link the (n_toys, k) pull per hypothesis per
      adaptive retry is the dominant wire cost. Stragglers still fetch what
      the refit needs; unrefined hypotheses report None in the conds list.
    :return: (ts (n_hypotheses, n_toys), list of conditional ToyResults —
      entries None where need_cond=False skipped the transfer).
    """
    ts, conds = [], []
    for h in hypotheses:
        hj = jnp.asarray(float(h))
        t_dev, (xc_dev, llc_dev, itc_dev) = call_cond(hj)
        if need_cond:
            t, xc, llc, itc = jax.device_get((t_dev, xc_dev, llc_dev,
                                              itc_dev))
        else:
            t, itc = jax.device_get((t_dev, itc_dev))
            xc = llc = None
        if refine_cond is not None and (np.asarray(itc) >= cap).any():
            if xc is None:
                xc, llc = jax.device_get((xc_dev, llc_dev))
            xc, llc, itc = refine_cond(xc, llc, itc, hj)
            t = np.maximum(2.0 * (llf - llc), 0.0)
        ts.append(np.asarray(t))
        conds.append(ToyResults(names_cond, xc, llc, itc)
                     if xc is not None else None)
    return np.stack(ts), conds


def _check_map_space(compiled, space, fixed=None):
    """Validate a profile_map ``space`` spec: 1 or 2 DISTINCT (name, grid)
    pairs, none also in ``fixed`` (a duplicated target would silently let the
    last grid value win — a fake 2-D map; a fixed target would constrain the
    free fit, so t would not be a profile-LR curve), nonempty grids, every
    grid point inside the parameter's range."""
    space = list(space)
    if len(space) not in (1, 2):
        raise ValueError(
            "space must be 1 or 2 (name, grid) pairs, got %d" % len(space))
    targets = [name for name, _ in space]
    if len(set(targets)) != len(targets):
        raise ValueError("space names a parameter twice: %s" % targets)
    clash = sorted(set(targets) & set(fixed or {}))
    if clash:
        raise ValueError(
            "space parameters %s are also in fixed= — a fixed target would "
            "constrain the free fit too, so the map would not be a "
            "profile-LR surface" % clash)
    grids = [np.asarray(g, dtype=float).ravel() for _, g in space]
    for name, g in zip(targets, grids):
        if g.size == 0:
            raise ValueError("empty grid for %r" % name)
        for v in g:
            check_fixed_in_bounds(compiled, {name: float(v)})
    return targets, grids


def make_mesh(devices=None, axis_name='toys'):
    """A 1-d device mesh for toy-level data parallelism."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


def shard_toys(mesh, tree, axis_name='toys'):
    """Place each array in ``tree`` with its leading (toys) axis sharded over
    the mesh. XLA then partitions every vmapped fit across devices."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


class ToyResults:
    """Results of a batched toy study: parameter arrays keyed by name, the
    maximum log likelihoods, and Newton iteration counts."""

    def __init__(self, names, x, max_ll, n_iter):
        self.names = list(names)
        self.x = np.asarray(x)
        self.max_ll = np.asarray(max_ll)
        self.n_iter = np.asarray(n_iter)

    def __getitem__(self, name):
        return self.x[:, self.names.index(name)]

    def as_dict(self):
        d = OrderedDict((n, self[n]) for n in self.names)
        d['max_ll'] = self.max_ll
        return d

    def __repr__(self):
        return "ToyResults(n_toys=%d, params=%s)" % (len(self.max_ll),
                                                     self.names)


class BinnedToyStudy:
    """Batched binned-likelihood toy fits.

    :param lf: a prepared (data not required) BinnedLogLikelihood.
    :param dtype: device dtype for the anchor tensors (float32 on TPU).
    """

    def __init__(self, lf, dtype=None, max_iter=60, tol=1e-8, engine='auto',
                 two_stage=True, profile_mode='fused', polish=4):
        """:param polish: post-convergence coordinate-sweep rounds per fit
        (parallel/fitter.py minimize_newton). The default 4 is what buys the
        "0 optima short" quality on near-degenerate models; it also
        dominates the wall time (XENON-scale A/B, 512 free fits on one
        v5e chip: polish=4 477 fits/s / all optima exact; 3: 539, 7 toys
        <= 6e-3 LL short; 2: 668, 46 toys <= 0.015 short; 1: 877, 261 toys
        <= 0.12 short). Lower it when ensemble throughput matters more than
        the last 1e-2 LL of each optimum.
        :param two_stage: re-fit the toys that hit the stage-1 iteration
        cap in a small warm-started second pass with a 4x cap (see
        :func:`_refine_stragglers`) — lets ``max_iter`` be sized for the bulk
        of the ensemble instead of the slowest straggler.
        :param profile_mode: 'fused' traces the free+conditional double fit
          of profile_ts into ONE XLA program (fewest launches); 'split'
          compiles them as two separate programs — each is smaller (remote/
          cold compilation time is superlinear in program size) and the free
          half is the SAME program ``run()``/``fit_toys()`` use, so a
          session doing both compiles the free fit once."""
        self.lf = lf
        self.compiled = build_logl(lf, dtype=dtype)
        if not self.compiled.is_binned:
            raise TypeError("BinnedToyStudy needs a BinnedLogLikelihood")
        self.max_iter = max_iter
        self.tol = tol
        self.engine = engine
        self.two_stage = two_stage
        self.polish = polish
        if profile_mode not in ('fused', 'split'):
            raise ValueError("profile_mode must be 'fused' or 'split'")
        self.profile_mode = profile_mode
        # jit caches (keyed by frozen fixed/target specs): the fit programs
        # compile once and are reused across run()/profile_ts() invocations
        self._fit_cache = {}
        self._profile_cache = {}
        self._sim_cache = {}

    def _make_fitter(self, **opts):
        """(stage-1 fit_one, long-cap fit_one or None, names)."""
        opts.setdefault('polish', getattr(self, 'polish', 4))
        fit_one, names = make_toy_fitter(
            self.compiled, max_iter=self.max_iter, tol=self.tol,
            engine=self.engine, **opts)
        fit_long = None
        if self.two_stage and names:
            fit_long, _ = make_toy_fitter(
                self.compiled, max_iter=4 * self.max_iter, tol=self.tol,
                engine=self.engine, **opts)
        return fit_one, fit_long, names

    _freeze = staticmethod(_freeze_opts)

    def expected_counts(self, **truth):
        """Expected counts per analysis-space bin at the truth parameters.
        For a compiled LogLikelihoodSum this is a tuple with one count tensor
        per child (empty for dataset-free constraint terms)."""
        p = self.compiled.params_from_kwargs(**truth)
        # jit the payload chain: eagerly it is dozens of small dispatches,
        # which a degraded remote-TPU link turns into minutes of setup
        if not hasattr(self, '_expected_jit'):
            self._expected_jit = jax.jit(self.compiled.expected_counts)
        return self._expected_jit(p)

    def simulate(self, key, n_toys, truth=None, mesh=None):
        """(n_toys, *bins) Poisson count tensors at the truth parameters (a
        tuple of them, one per child, for a compiled Sum). With a mesh, n_toys
        is rounded UP to a multiple of the device count (sharding requires it;
        the extra toys are ordinary toys).

        With a mesh the draw itself runs sharded over the toy axis
        (``out_shardings``): each device materializes only its own rows —
        never the full ensemble on one chip — and on a multi-process mesh
        every process computes only its addressable shards. Threefry is
        counter-based and partitionable, so the values are bit-identical to
        the unsharded draw at any device/process count."""
        if mesh is not None:
            n_toys = _round_up_toys(n_toys, mesh)
        expected = self.expected_counts(**(truth or {}))
        leaves, treedef = jax.tree_util.tree_flatten(expected)

        # One jitted program for the whole Poisson draw (vs one eager
        # split + one eager poisson dispatch per leaf — round-trips on a
        # remote device link); cached per (toy count, mesh)
        def _draw(key, leaves):
            ks = jax.random.split(key, len(leaves))
            return [jax.random.poisson(k, e, shape=(n_toys,) + e.shape)
                    .astype(e.dtype) for k, e in zip(ks, leaves)]
        sim_jit = self._sim_cache.get((n_toys, mesh))
        if sim_jit is None:
            if mesh is None:
                sim_jit = jax.jit(_draw)
            else:
                axis = mesh.axis_names[0]
                shardings = [
                    NamedSharding(mesh, P(axis, *([None] * e.ndim)))
                    for e in leaves]
                sim_jit = jax.jit(_draw, out_shardings=shardings)
            self._sim_cache[(n_toys, mesh)] = sim_jit
        return jax.tree_util.tree_unflatten(treedef, sim_jit(key, leaves))

    def _fit_entry(self, fixed=None, guess=None):
        """(jitted vmapped fit, jitted long-cap refit or None, names) —
        constructed and cached without tracing or compiling anything (jit is
        lazy), so callers like run_distributed can obtain the entry cheaply."""
        key = (self._freeze(fixed), self._freeze(guess))
        if key not in self._fit_cache:
            fit_one, fit_long, names = self._make_fitter(fixed=fixed,
                                                         guess=guess)
            long_j = (jax.jit(jax.vmap(
                lambda d, x0: fit_long(d, None, (), x0)))
                if fit_long is not None else None)
            self._fit_cache[key] = (jax.jit(jax.vmap(fit_one)), long_j, names)
        return self._fit_cache[key]

    def fit_toys(self, counts, fixed=None, guess=None):
        """Fit every toy dataset; returns ToyResults."""
        fit, long_j, names = self._fit_entry(fixed, guess)
        # One batched device->host transfer: through a remote-TPU link each
        # separate np.asarray() is a full round-trip, which dominated the
        # post-program time at ensemble scale
        x, ll, it = jax.device_get(fit(counts))
        if long_j is not None:
            x, ll, it, _ = _refine_stragglers(long_j, counts, x, ll, it,
                                              self.max_iter)
        return ToyResults(names, x, ll, it)

    def run(self, key, n_toys, truth=None, fixed=None, mesh=None):
        """Simulate and fit n_toys datasets in one go."""
        counts = self.simulate(key, n_toys, truth, mesh)
        return self.fit_toys(counts, fixed=fixed)

    def profile_ts(self, key, n_toys, target, hypothesis, truth=None,
                   mesh=None, fixed=None):
        """Profile-likelihood-ratio test statistic t = 2(LL_free - LL_cond) for
        each toy, with the conditional fit fixing ``target=hypothesis``.
        This is the batched engine behind toy-based (Neyman) interval
        construction.
        :return: (t array (n_toys,), free ToyResults, conditional ToyResults)
        """
        counts = self.simulate(key, n_toys, truth, mesh)
        return self._run_profile(counts, target, hypothesis, fixed)

    def _run_profile(self, counts, target, hypothesis, fixed):
        # The compiled engines only evaluate inside the anchor/bounds range;
        # reject out-of-range hypotheses here instead of silently clamping
        _check_target_not_fixed(target, fixed)
        check_fixed_in_bounds(self.compiled, {target: hypothesis})
        entry = self._profile_fn(target, fixed)
        both, free_long, cond_long, names_free, names_cond = entry
        h = jnp.asarray(float(hypothesis))
        t, free, cond = jax.device_get(both(counts, h))
        if free_long is not None:
            xf, llf, itf = _refine_stragglers(
                free_long, counts, *free, cap=self.max_iter)[:3]
            xc, llc, itc = _refine_stragglers(
                cond_long, counts, *cond, cap=self.max_iter,
                extra_args=(h,))[:3]
            free, cond = (xf, llf, itf), (xc, llc, itc)
            t = np.maximum(2.0 * (llf - llc), 0.0)
        return (np.asarray(t), ToyResults(names_free, *free),
                ToyResults(names_cond, *cond))

    def _profile_fn(self, target, fixed):
        """The free+conditional double fit with the hypothesis as a *runtime*
        argument: hypothesis scans (Neyman constructions) reuse the compiled
        program(s). Straggler refinement programs ride along.

        ``profile_mode='fused'`` lowers both fits into one XLA program;
        ``'split'`` into two smaller ones (see __init__). Both return the
        same entry signature: (run_fn(counts, h), free_long_j, cond_long_j,
        names_free, names_cond)."""
        if self.profile_mode == 'split':
            return self._profile_fn_split(target, fixed)
        fixed = dict(fixed or {})
        cache_key = (target, self._freeze(fixed), 'fused')
        if cache_key not in self._profile_cache:
            fit_free, free_long, names_free = self._make_fitter(fixed=fixed)
            fit_cond, cond_long, names_cond = self._make_fitter(
                fixed=fixed, runtime_fixed=[target])

            warm_cols = _warm_cols(names_free, names_cond)

            @jax.jit
            def both(counts, hypothesis):
                xf, llf, itf = jax.vmap(fit_free)(counts)
                if warm_cols is not None and len(warm_cols):
                    # Warm-start the conditional fit from the free optimum
                    # (with the target dropped): typically halves its
                    # iteration count
                    x0c = xf[:, jnp.asarray(warm_cols)]
                    xc, llc, itc = jax.vmap(
                        lambda d, x0: fit_cond(d, None, (hypothesis,), x0))(
                            counts, x0c)
                else:
                    xc, llc, itc = jax.vmap(
                        lambda d: fit_cond(d, None, (hypothesis,)))(counts)
                t = jnp.maximum(2.0 * (llf - llc), 0.0)
                return t, (xf, llf, itf), (xc, llc, itc)

            free_long_j = None
            if free_long is not None:
                free_long_j = jax.jit(jax.vmap(
                    lambda d, x0: free_long(d, None, (), x0)))
            free_long_j, cond_long_j = self._pair_refiners(
                free_long_j, cond_long, names_cond)
            self._profile_cache[cache_key] = (both, free_long_j, cond_long_j,
                                              names_free, names_cond)
        return self._profile_cache[cache_key]

    @staticmethod
    def _pair_refiners(free_long_j, cond_long, names_cond):
        """Jitted long-cap conditional refit paired with the free one —
        stragglers are refined in both fits or neither (a one-sided
        refinement would bias the t statistic)."""
        cond_long_j = (_wrap_cond_long(cond_long)
                       if cond_long is not None and names_cond else None)
        if cond_long_j is None:
            free_long_j = None
        return free_long_j, cond_long_j

    def _cond_entry(self, target, fixed, names_free):
        """The conditional half of the profile double fit as its own jitted
        program, hypothesis as a runtime argument, warm-started from the free
        optimum — shared by ``profile_mode='split'`` and
        :meth:`profile_ts_grid`.

        :return: (cond_fn(counts, xf, llf, h) -> (t, (xc, llc, itc)),
          jitted long-cap conditional refit or None, names_cond), cached per
          (target, fixed)."""
        fixed = dict(fixed or {})
        cache_key = (target, self._freeze(fixed), 'cond')
        if cache_key not in self._profile_cache:
            fit_cond, cond_long, names_cond = self._make_fitter(
                fixed=fixed, runtime_fixed=[target])

            warm_cols = _warm_cols(names_free, names_cond)
            if warm_cols is not None and len(warm_cols):
                wc = np.asarray(warm_cols)

                @jax.jit
                def cond_fn(counts, xf, llf, hypothesis):
                    x0c = xf[:, jnp.asarray(wc)]
                    xc, llc, itc = jax.vmap(
                        lambda d, x0: fit_cond(d, None, (hypothesis,), x0))(
                            counts, x0c)
                    t = jnp.maximum(2.0 * (llf - llc), 0.0)
                    return t, (xc, llc, itc)
            else:
                @jax.jit
                def cond_fn(counts, xf, llf, hypothesis):
                    xc, llc, itc = jax.vmap(
                        lambda d: fit_cond(d, None, (hypothesis,)))(counts)
                    t = jnp.maximum(2.0 * (llf - llc), 0.0)
                    return t, (xc, llc, itc)

            cond_long_j = (_wrap_cond_long(cond_long)
                           if cond_long is not None and names_cond else None)
            self._profile_cache[cache_key] = (cond_fn, cond_long_j,
                                              names_cond)
        return self._profile_cache[cache_key]

    def _profile_fn_split(self, target, fixed):
        """profile_mode='split': the free fit program is exactly
        ``_fit_entry``'s (shared with run()/fit_toys()), and the conditional
        fit + statistic compile as a second, separate program."""
        fixed = dict(fixed or {})
        cache_key = (target, self._freeze(fixed), 'split')
        if cache_key not in self._profile_cache:
            fit_free_j, free_long_j, names_free = self._fit_entry(fixed)
            cond_fn, cond_long_j, names_cond = self._cond_entry(
                target, fixed, names_free)

            def run_fn(counts, hypothesis):
                xf, llf, itf = fit_free_j(counts)
                t, cond = cond_fn(counts, xf, llf, hypothesis)
                return t, (xf, llf, itf), cond

            if cond_long_j is None:
                # Same pairing rule as _pair_refiners: refine both fits of a
                # straggler or neither (one-sided refinement biases t)
                free_long_j = None
            self._profile_cache[cache_key] = (run_fn, free_long_j,
                                              cond_long_j, names_free,
                                              names_cond)
        return self._profile_cache[cache_key]

    def profile_ts_grid(self, key, target, hypotheses, n_toys, truth=None,
                        fixed=None, mesh=None, return_cond=True):
        """Profile-LR statistics of ONE toy ensemble across a hypothesis
        grid: the free fit runs once, then each hypothesis adds only a
        warm-started conditional fit (one compiled program reused for every
        h). This is the engine of per-toy limit setting
        (:mod:`blueice_tpu.parallel.limits`) — it complements
        :meth:`profile_ts_scan`, which draws a FRESH ensemble per hypothesis
        (the Neyman calibration shape).

        :param return_cond: pass False to skip transferring the
          per-hypothesis conditional parameter matrices to host (the limit
          callers only use t; the conds list then holds None entries).
        :return: (ts (n_hypotheses, n_toys), sorted hypotheses (ascending),
          free ToyResults, list of per-hypothesis conditional ToyResults).
        """
        _check_target_not_fixed(target, fixed)
        hypotheses = np.sort(np.asarray(hypotheses, dtype=float))
        for h in hypotheses:
            check_fixed_in_bounds(self.compiled, {target: float(h)})
        counts = self.simulate(key, n_toys, truth, mesh)
        return self._run_profile_grid(counts, target, hypotheses, fixed,
                                      return_cond)

    def _run_profile_grid(self, counts, target, hypotheses, fixed,
                          return_cond=True):
        fit_free_j, free_long_j, names_free = self._fit_entry(fixed)
        cond_fn, cond_long_j, names_cond = self._cond_entry(
            target, fixed, names_free)
        xf, llf, itf = jax.device_get(fit_free_j(counts))
        if free_long_j is not None and cond_long_j is not None:
            xf, llf, itf = _refine_stragglers(
                free_long_j, counts, xf, llf, itf, self.max_iter)[:3]
        xf_dev, llf_dev = jnp.asarray(xf), jnp.asarray(llf)
        refine = None
        if cond_long_j is not None:
            refine = lambda xc, llc, itc, hj: _refine_stragglers(
                cond_long_j, counts, xc, llc, itc, self.max_iter,
                extra_args=(hj,))[:3]
        ts, conds = _cond_scan(
            hypotheses, lambda hj: cond_fn(counts, xf_dev, llf_dev, hj),
            refine, llf, names_cond, self.max_iter, need_cond=return_cond)
        return ts, hypotheses, ToyResults(names_free, xf, llf, itf), conds

    def profile_ts_scan(self, key, target, hypotheses, n_toys, fixed=None,
                        mesh=None, truth=None, truth_at_hypothesis=True,
                        return_free=False):
        """Profile-LR toy distributions across a hypothesis grid (the engine of
        a Neyman construction). One compiled program serves every hypothesis.

        :param truth_at_hypothesis: simulate each ensemble with the target set
          to the hypothesis (the standard construction); otherwise use ``truth``
          for all ensembles.
        :param return_free: also return the per-hypothesis free-fit
          ToyResults (one-sided Neyman statistics need the best-fit sign).
        :return: array (n_hypotheses, n_toys) of t values; with
          ``return_free``, (t array, list of free ToyResults).
        """
        out, frees = [], []
        for i, h in enumerate(np.asarray(hypotheses, dtype=float)):
            sim_truth = dict(truth or {})
            if truth_at_hypothesis:
                sim_truth[target] = float(h)
            counts = self.simulate(jax.random.fold_in(key, i), n_toys,
                                   sim_truth, mesh)
            t, free, _ = self._run_profile(counts, target, h, fixed)
            out.append(np.asarray(t))
            frees.append(free)
        ts = np.stack(out)
        return (ts, frees) if return_free else ts

    def observed_counts(self, counts=None):
        """Observed count tensor(s) for ONE dataset, cast and shape-checked
        against :meth:`expected_counts`' structure. ``counts=None`` takes the
        histogram of the likelihood's own ``set_data`` events."""
        if counts is None:
            h = getattr(self.lf, 'data_events_per_bin', None)
            if h is None:
                raise ValueError(
                    "No counts given and the likelihood has no data bound — "
                    "call lf.set_data(...) first or pass counts= explicitly "
                    "(for a compiled Sum: one count tensor per child)")
            counts = h.values
        expected = self.expected_counts()

        def _cast(e, c):
            c = jnp.asarray(c, e.dtype)
            if c.shape != e.shape:
                raise ValueError(
                    "counts shape %s does not match the analysis space %s"
                    % (c.shape, e.shape))
            return c
        return jax.tree_util.tree_map(_cast, expected, counts)

    def profile_map(self, space, counts=None, fixed=None, _free=None):
        """Profiled likelihood-ratio map on one OBSERVED dataset:
        t(theta) = 2(LL_free - LL(theta fixed, rest profiled)) over a 1- or
        2-dimensional parameter grid, every grid point a lane of ONE vmapped
        conditional-fit program warm-started from the single free fit — the
        device twin of ``plot_likelihood_ratio``'s per-point host fits
        (reference: blueice/inference.py:392-443), at toy-ensemble throughput.

        :param space: 1 or 2 ``(param_name, grid values)`` pairs.
        :param counts: observed count tensor(s) shaped like
          :meth:`expected_counts`; default: the likelihood's ``set_data``
          histogram (:meth:`observed_counts`).
        :param fixed: extra parameters held fixed everywhere.
        :return: (t array shaped ``(len(grid1)[, len(grid2)])``, free
          ToyResults (1 row), conditional ToyResults (one row per grid
          point, C order)). ``plt.pcolormesh(g2, g1, t)`` or
          ``plt.plot(g1, t)`` plots it directly; t/2 is the
          -log-likelihood-ratio surface ``plot_likelihood_ratio`` shows.
        """
        targets, grids = _check_map_space(self.compiled, space, fixed)
        counts = self.observed_counts(counts)
        counts1 = jax.tree_util.tree_map(lambda c: c[None], counts)

        # The free fit reuses run()/fit_toys()' compiled program (batch 1);
        # _free short-circuits it with a previous call's free ToyResults on
        # the SAME dataset (observed_interval's adaptive retries)
        fit_free_j, free_long_j, names_free = self._fit_entry(fixed)
        if _free is not None:
            xf, llf, itf = _free.x, _free.max_ll, _free.n_iter
        else:
            xf, llf, itf = jax.device_get(fit_free_j(counts1))
            if free_long_j is not None:
                xf, llf, itf = _refine_stragglers(
                    free_long_j, counts1, xf, llf, itf, self.max_iter)[:3]

        cache_key = (tuple(targets), self._freeze(fixed), 'map')
        entry = self._profile_cache.get(cache_key)
        if entry is None:
            # One single-stage program with the long iteration cap: a map is
            # one dataset lockstep across a few hundred lanes, so the
            # two-stage straggler machinery would buy nothing
            fit_cond, names_cond = make_toy_fitter(
                self.compiled, fixed=dict(fixed or {}),
                runtime_fixed=list(targets),
                max_iter=(4 * self.max_iter if self.two_stage
                          else self.max_iter),
                tol=self.tol, engine=self.engine, polish=self.polish)
            warm = (np.asarray(_warm_cols(names_free, names_cond))
                    if names_cond and _warm_cols(names_free, names_cond)
                    is not None else None)
            k = len(targets)

            @jax.jit
            def map_fn(data, x0, points):
                def one(pt):
                    fv = tuple(pt[i] for i in range(k))
                    if x0 is None:
                        return fit_cond(data, None, fv)
                    # TWO starts per lane — the free-fit warm start plus
                    # the cold default start — keeping the better optimum.
                    # A map scans hypotheses far from the best fit, where
                    # the warm start can sit across an anchor kink from
                    # the conditional optimum and stall 0.1-0.3 LL short
                    # (caught by bench.py's f64 referee on a band toy:
                    # adv_cond -0.26 -> a 50% inflated limit).
                    return _best_of_two(fit_cond(data, None, fv, x0),
                                        fit_cond(data, None, fv))
                return jax.vmap(one)(points)
            entry = (map_fn, names_cond, warm)
            self._profile_cache[cache_key] = entry
        map_fn, names_cond, warm = entry

        pts = jnp.asarray([tup for tup in itertools.product(*grids)])
        x0 = (jnp.asarray(xf[0])[jnp.asarray(warm)]
              if warm is not None and len(warm) else None)
        xc, llc, itc = jax.device_get(map_fn(counts, x0, pts))
        t = np.maximum(2.0 * (np.asarray(llf)[0] - np.asarray(llc)), 0.0)
        return (t.reshape(tuple(len(g) for g in grids)),
                ToyResults(names_free, xf, llf, itf),
                ToyResults(names_cond, xc, llc, itc))


class UnbinnedToyStudy:
    """Batched unbinned-likelihood toy fits.

    Toy events are drawn from the (source, bin) expectation tensor at the truth
    point (uniform within a bin) and scored on-device against the anchor pdf
    templates — the same interpolation the host sources use
    (HistogramPdfSource.pdf, reference blueice/source.py:219-246). Analytic
    sources are represented by their pdf evaluated on the bin-center grid.

    Event sets are padded to ``n_max`` with a validity mask so shapes stay
    static across the vmapped ensemble.
    """

    def __init__(self, lf, n_max=None, dtype=None, max_iter=60, tol=1e-8,
                 engine='auto', two_stage=True, polish=4):
        self.lf = lf
        self.compiled = build_logl(lf, dtype=dtype)
        if self.compiled.is_binned:
            raise TypeError("UnbinnedToyStudy needs an UnbinnedLogLikelihood")
        self.max_iter = max_iter
        self.tol = tol
        self.engine = engine
        self.two_stage = two_stage
        # Post-convergence polish rounds per fit — the optimum-quality /
        # throughput knob; see BinnedToyStudy.__init__
        self.polish = polish

        space = lf.base_model.config['analysis_space']
        self.edges = [np.asarray(e, dtype=float) for _, e in space]
        self.centers = [0.5 * (e[1:] + e[:-1]) for e in self.edges]
        from functools import reduce
        self.bin_volumes = reduce(np.multiply,
                                  np.ix_(*[np.diff(e) for e in self.edges]))
        self.ndim = len(self.edges)

        # Anchor pdf-value templates: one (*grid, n_sources, *bins) tensor
        # (global morphing), or a tuple of per-source (*sub_grid, *bins)
        # tensors over each source's own anchor grid (source-wise morphing)
        self._source_wise = bool(lf.source_wise_interpolation
                                 and len(lf.shape_parameters))
        if self._source_wise:
            self._pdf_tensors = tuple(
                jnp.asarray(t, dtype=dtype)
                for t in self._build_pdf_tensors_source_wise())
        else:
            self._pdf_tensor = jnp.asarray(self._build_pdf_tensor(),
                                           dtype=dtype)
        # Per-source interpolation method, matching how set_data scores the
        # observed events (each source's own pdf(), likelihood.py) — a model
        # can mix 'linear' and 'piecewise' sources. self._method holds the
        # shared method when uniform (the fast vmap-over-all-templates path),
        # None when mixed (score per source with its own method).
        self._methods = [s.config.get('pdf_interpolation_method', 'linear')
                         for s in lf.base_model.sources]
        self._method = (self._methods[0]
                        if len(set(self._methods)) == 1 else None)

        if n_max is None:
            # Default: mean + 6 sqrt(mean) of the base-model total
            mu_tot = float(np.sum(lf.base_model.expected_events()))
            n_max = int(mu_tot + 6 * np.sqrt(mu_tot + 1) + 10)
        self.n_max = n_max
        self._fit_cache = {}
        self._profile_cache = {}

    _freeze = staticmethod(_freeze_opts)

    # -- host-side template construction ------------------------------------------

    def _source_pdf_grid(self, source):
        """pdf values of one source on the bin-center grid."""
        h = getattr(source, '_pdf_histogram', None)
        if h is not None:
            return np.asarray(h.values, dtype=float)
        mesh = np.meshgrid(*self.centers, indexing='ij')
        vals = source.pdf(*[m.ravel() for m in mesh])
        return np.asarray(vals, dtype=float).reshape(mesh[0].shape)

    def _build_pdf_tensor(self):
        lf = self.lf
        if len(lf.shape_parameters):
            anchor_models = lf.anchor_models
            grid_shape = tuple(len(a) for a in lf.morpher.anchor_z_arrays)
            first = next(iter(anchor_models.values()))
            bins_shape = self._source_pdf_grid(first.sources[0]).shape
            tensor = np.zeros(grid_shape + (len(lf.source_name_list),)
                              + bins_shape)
            for idx, zs in zip(np.ndindex(*grid_shape),
                               lf.morpher.get_anchor_points()):
                m = anchor_models[tuple(zs)]
                for si, s in enumerate(m.sources):
                    tensor[idx + (si,)] = self._source_pdf_grid(s)
            return tensor
        return np.stack([self._source_pdf_grid(s)
                         for s in lf.base_model.sources])

    def _build_pdf_tensors_source_wise(self):
        """Per-source anchor pdf tensors: (*sub_grid, *bins) over each
        morphed source's own anchor grid, (*bins,) for unmorphed sources."""
        lf = self.lf
        bins_shape = tuple(len(c) for c in self.centers)
        tensors = []
        for sn, base_source in zip(lf.source_name_list,
                                   lf.base_model.sources):
            if sn not in lf.source_morphers:
                tensors.append(self._source_pdf_grid(base_source))
                continue
            morpher = lf.source_morphers[sn]
            grid_shape = tuple(len(a) for a in morpher.anchor_z_arrays)
            tensor = np.zeros(grid_shape + bins_shape)
            for idx, anchor in zip(np.ndindex(*grid_shape),
                                   morpher.get_anchor_points()):
                tensor[idx] = self._source_pdf_grid(
                    lf.anchor_sources[sn][tuple(anchor)])
            tensors.append(tensor)
        return tensors

    # -- device-side pipeline ------------------------------------------------------

    def _sample_one(self, key, weights_sb):
        """Sample up to n_max events from per-(source, bin) weights.
        :return: (coords (n_max, ndim), mask (n_max,), bins: tuple of
          per-dim sampled bin indices (n_max,) each)"""
        k_n, k_bin, k_uni = jax.random.split(key, 3)

        # Inverse-CDF bin choice as a dense (n_max, n_bins) comparison.
        # random.categorical materializes an (n_max, n_sources*n_bins) Gumbel
        # matrix — threefry bits + log per cell, by far the most expensive
        # stage of the pipeline. searchsorted is worse still on TPU (serial
        # binary-search gathers starve the VPU — measured 3x slower than
        # Gumbel). Counting cdf < target is the TPU shape of the draw: n_max
        # random numbers total and one dense compare+sum, and the source axis
        # is marginalized out first since only the bin index is used.
        # Zero-weight bins have zero-width CDF intervals: selection needs
        # cdf[j-1] < target <= cdf[j], so they are never drawn (the target is
        # in (0, tot] because 1-u is in (0, 1]). Bins whose NET expectation is
        # negative (allow_negative sources can push a bin below zero) are
        # clamped to zero-width too — a monotone CDF is what makes the dense
        # count-compare a valid draw. The TOTAL event count draws from the
        # same clamped distribution (sum of wb, not the raw net total), so
        # the toy's shape and normalization describe one coherent truth.
        wb = jnp.maximum(jnp.sum(weights_sb, axis=0).reshape(-1), 0.0)
        mu_tot = jnp.sum(wb)
        n = jnp.minimum(jax.random.poisson(k_n, mu_tot), self.n_max)
        mask = jnp.arange(self.n_max) < n
        cdf = jnp.cumsum(wb)
        u = jax.random.uniform(k_bin, (self.n_max,), dtype=wb.dtype)
        target = (1.0 - u) * cdf[-1]
        bin_flat = jnp.sum(target[:, None] > cdf[None, :],
                           axis=1, dtype=jnp.int32)
        bin_flat = jnp.minimum(bin_flat, wb.shape[0] - 1)
        multi = jnp.unravel_index(bin_flat, weights_sb.shape[1:])
        u = jax.random.uniform(k_uni, (self.n_max, self.ndim),
                               dtype=wb.dtype)
        cols = []
        for d, e in enumerate(self.edges):
            e = jnp.asarray(e)
            lo, hi = e[multi[d]], e[multi[d] + 1]
            cols.append(lo + u[:, d] * (hi - lo))
        return jnp.stack(cols, axis=-1), mask, multi

    def _per_source_scores(self, score_tensor):
        """Score the global (*grid, n_sources, *bins) tensor when sources MIX
        interpolation methods: each source's sub-tensor is scored with its
        own method, then the source axis is restacked in place."""
        axis = self._pdf_tensor.ndim - self.ndim - 1
        cols = [score_tensor(jnp.take(self._pdf_tensor, si, axis=axis), m)
                for si, m in enumerate(self._methods)]
        return jnp.stack(cols, axis=axis)

    def _score_sampled(self, coords, bins):
        """Anchor ps payload for freshly SAMPLED events: the sampler already
        knows each event's bin, so the per-template searchsorted of the
        generic path collapses to shared index arithmetic + one gather+lerp
        per template.
        """
        scorers = {}

        def get_scorer(method):
            if method in scorers:
                return scorers[method]
            if method == 'piecewise':
                gather_idx = [bins[d] for d in range(self.ndim)]

                def score_template(v):
                    return v[tuple(gather_idx)]
            else:
                gather_idx, fracs = [], []
                for d in range(self.ndim):
                    c = jnp.asarray(self.centers[d])
                    x = coords[:, d]
                    # The interpolation cell over bin CENTERS is the sampled
                    # bin or its left neighbour, depending on which side of
                    # the center the event landed (clip-to-center-range at
                    # the ends)
                    cell = jnp.clip(bins[d] - (x < c[bins[d]]), 0,
                                    c.shape[0] - 2)
                    t = ((jnp.clip(x, c[0], c[-1]) - c[cell])
                         / (c[cell + 1] - c[cell]))
                    gather_idx.append(cell)
                    fracs.append(jnp.clip(t, 0.0, 1.0))

                def score_template(v):
                    out = None
                    for offs in itertools.product((0, 1), repeat=self.ndim):
                        w = None
                        for d, o in enumerate(offs):
                            wd = fracs[d] if o else (1.0 - fracs[d])
                            w = wd if w is None else w * wd
                        term = w * v[tuple(g + o
                                           for g, o in zip(gather_idx, offs))]
                        out = term if out is None else out + term
                    return out
            scorers[method] = score_template
            return score_template

        def score_tensor(tensor, method):
            lead = tensor.shape[:tensor.ndim - self.ndim]
            flat = tensor.reshape((-1,)
                                  + tensor.shape[tensor.ndim - self.ndim:])
            return jax.vmap(get_scorer(method))(flat).reshape(
                lead + (coords.shape[0],))

        if self._source_wise:
            return tuple(score_tensor(t, self._methods[i])
                         for i, t in enumerate(self._pdf_tensors))
        if self._method is not None:
            return score_tensor(self._pdf_tensor, self._method)
        return self._per_source_scores(score_tensor)

    def _score_one_tensor(self, tensor, coords, method):
        """Evaluate a (*lead, *bins) pdf tensor at the events: (*lead, n)."""
        lead = tensor.shape[:tensor.ndim - self.ndim]
        flat = tensor.reshape((-1,) + tensor.shape[tensor.ndim - self.ndim:])
        if method == 'piecewise':
            score = jax.vmap(lambda v: piecewise_lookup(v, self.edges, coords))
        else:
            score = jax.vmap(
                lambda v: interp_at_points(v, self.centers, coords))
        return score(flat).reshape(lead + (coords.shape[0],))

    def _score_events(self, coords):
        """Anchor ps payload for given events: (*grid, n_sources, n_max), or a
        tuple of per-source (*sub_grid, n_max) for source-wise morphing."""
        if self._source_wise:
            return tuple(self._score_one_tensor(t, coords, self._methods[i])
                         for i, t in enumerate(self._pdf_tensors))
        if self._method is not None:
            return self._score_one_tensor(self._pdf_tensor, coords,
                                          self._method)
        return self._per_source_scores(
            lambda t, m: self._score_one_tensor(t, coords, m))

    def expected_weights(self, **truth):
        """(n_sources, *bins) expected counts per source and bin at truth.
        Warns when the simulation truth outgrows the study's padded event
        capacity ``n_max`` (sized at construction from the DEFAULT-parameter
        expectation): events beyond n_max are silently dropped by the
        fixed-shape sampler, which would bias high-rate ensembles — pass an
        explicit ``n_max`` to the study instead."""
        p = self.compiled.params_from_kwargs(**truth)
        # jit the payload chain (cf. BinnedToyStudy.expected_counts): eagerly
        # it is dozens of small dispatches + a blocking sum, which a remote
        # device link turns into ~100 ms of per-call latency
        if not hasattr(self, '_weights_jit'):
            def _w(p):
                mus = self.compiled.rates(p)
                pdfs = self._morph_pdf(p)
                pmf = pdfs * jnp.asarray(self.bin_volumes, dtype=pdfs.dtype)
                weights = mus[(...,) + (None,) * self.ndim] * pmf
                return weights, jnp.sum(weights)
            self._weights_jit = jax.jit(_w)
        weights, mu_tot = self._weights_jit(p)
        mu_tot = float(mu_tot)
        if self.n_max < mu_tot + 4 * np.sqrt(mu_tot + 1):
            import warnings
            warnings.warn(
                "UnbinnedToyStudy.n_max=%d is within 4 sigma of the "
                "simulated expectation (%.0f events at this truth): toys "
                "will be truncated. Construct the study with n_max >= %d."
                % (self.n_max, mu_tot,
                   int(mu_tot + 6 * np.sqrt(mu_tot + 1) + 10)),
                stacklevel=2)
        return weights

    def _morph_pdf(self, params):
        lf = self.lf
        if not len(lf.shape_parameters):
            return self._pdf_tensor
        zs = jnp.stack([jnp.asarray(params[sp])
                        for sp in lf.shape_parameters])
        if not self._source_wise:
            return lf.morpher.jax_eval(self._pdf_tensor, zs)
        pdfs = []
        for sn, tensor in zip(lf.source_name_list, self._pdf_tensors):
            if sn in lf.source_morphers:
                idx = lf._get_shape_indices(sn)
                pdfs.append(lf.source_morphers[sn].jax_eval(
                    tensor, jnp.stack([zs[i] for i in idx])))
            else:
                pdfs.append(tensor)
        return jnp.stack(pdfs)

    def _sample_score_fit(self, fit_one, with_hypothesis=False):
        """Wrap a per-toy fitter with the sample -> score pipeline, in the
        argument order _refine_stragglers calls: (key, x0, weights[, h])."""
        def one(key, x0, weights, *h):
            coords, mask, bins = self._sample_one(key, weights)
            ps_anchor = self._score_sampled(coords, bins)
            return fit_one(ps_anchor, mask, tuple(h), x0)
        in_axes = (0, 0, None) + ((None,) if with_hypothesis else ())
        return jax.jit(jax.vmap(one, in_axes=in_axes))

    def _fit_entry(self, fixed=None):
        """(jitted vmapped sample->score->fit over (keys, weights), jitted
        long-cap refit or None, names) — lazily cached like
        BinnedToyStudy._fit_entry, so run_distributed can share the entry."""
        cache_key = self._freeze(fixed)
        if cache_key not in self._fit_cache:
            fit_one, names = make_toy_fitter(
                self.compiled, fixed=fixed, max_iter=self.max_iter,
                tol=self.tol, engine=self.engine, polish=self.polish)

            def one(key, weights):
                coords, mask, bins = self._sample_one(key, weights)
                ps_anchor = self._score_sampled(coords, bins)
                return fit_one(ps_anchor, mask)
            long_j = None
            if self.two_stage and names:
                fit_long, _ = make_toy_fitter(
                    self.compiled, fixed=fixed, max_iter=4 * self.max_iter,
                    tol=self.tol, engine=self.engine, polish=self.polish)
                long_j = self._sample_score_fit(fit_long)
            self._fit_cache[cache_key] = (
                jax.jit(jax.vmap(one, in_axes=(0, None))), long_j, names)
        return self._fit_cache[cache_key]

    def run(self, key, n_toys, truth=None, fixed=None, mesh=None):
        """Simulate and fit n_toys unbinned datasets in one jit program."""
        weights = self.expected_weights(**(truth or {}))
        run_fn, long_j, names = self._fit_entry(fixed)
        if mesh is not None:
            n_toys = _round_up_toys(n_toys, mesh)
        keys = jax.random.split(key, n_toys)
        if mesh is not None:
            keys = shard_toys(mesh, keys)
        x, ll, it = jax.device_get(run_fn(keys, weights))
        if long_j is not None:
            x, ll, it, _ = _refine_stragglers(long_j, keys, x, ll, it,
                                              self.max_iter,
                                              extra_args=(weights,))
        return ToyResults(names, x, ll, it)

    def profile_ts(self, key, n_toys, target, hypothesis, truth=None,
                   fixed=None, mesh=None):
        """Batched profile-likelihood test statistic (see
        BinnedToyStudy.profile_ts)."""
        weights = self.expected_weights(**(truth or {}))
        if mesh is not None:
            n_toys = _round_up_toys(n_toys, mesh)
        keys = jax.random.split(key, n_toys)
        if mesh is not None:
            keys = shard_toys(mesh, keys)
        return self._run_profile(keys, weights, target, hypothesis, fixed)

    def _run_profile(self, keys, weights, target, hypothesis, fixed):
        _check_target_not_fixed(target, fixed)
        check_fixed_in_bounds(self.compiled, {target: hypothesis})
        entry = self._profile_fn(target, fixed)
        run_fn, free_long, cond_long, names_free, names_cond = entry
        h = jnp.asarray(float(hypothesis))
        t, free, cond = jax.device_get(run_fn(keys, weights, h))
        if free_long is not None:
            xf, llf, itf = _refine_stragglers(
                free_long, keys, *free, cap=self.max_iter,
                extra_args=(weights,))[:3]
            xc, llc, itc = _refine_stragglers(
                cond_long, keys, *cond, cap=self.max_iter,
                extra_args=(weights, h))[:3]
            free, cond = (xf, llf, itf), (xc, llc, itc)
            t = np.maximum(2.0 * (llf - llc), 0.0)
        return (np.asarray(t), ToyResults(names_free, *free),
                ToyResults(names_cond, *cond))

    def _profile_fn(self, target, fixed):
        """Compiled sample->score->double-fit pipeline with the hypothesis as a
        runtime argument (see BinnedToyStudy._profile_fn), plus straggler
        refinement programs."""
        fixed = dict(fixed or {})
        cache_key = (target, self._freeze(fixed))
        if cache_key not in self._profile_cache:
            fit_free, names_free = make_toy_fitter(
                self.compiled, fixed=fixed, max_iter=self.max_iter,
                tol=self.tol, engine=self.engine, polish=self.polish)
            fit_cond, names_cond = make_toy_fitter(
                self.compiled, fixed=fixed, runtime_fixed=[target],
                max_iter=self.max_iter, tol=self.tol,
                engine=self.engine, polish=self.polish)

            warm_cols = _warm_cols(names_free, names_cond)

            def one(key, weights, hypothesis):
                coords, mask, bins = self._sample_one(key, weights)
                ps_anchor = self._score_sampled(coords, bins)
                xf, llf, itf = fit_free(ps_anchor, mask)
                if warm_cols is not None and len(warm_cols):
                    x0c = xf[jnp.asarray(warm_cols)]
                    xc, llc, itc = fit_cond(ps_anchor, mask, (hypothesis,),
                                            x0c)
                else:
                    xc, llc, itc = fit_cond(ps_anchor, mask, (hypothesis,))
                t = jnp.maximum(2.0 * (llf - llc), 0.0)
                return t, (xf, llf, itf), (xc, llc, itc)

            free_long_j = cond_long_j = None
            if self.two_stage and names_cond:
                free_long, _ = make_toy_fitter(
                    self.compiled, fixed=fixed, max_iter=4 * self.max_iter,
                    tol=self.tol, engine=self.engine, polish=self.polish)
                cond_long, _ = make_toy_fitter(
                    self.compiled, fixed=fixed, runtime_fixed=[target],
                    max_iter=4 * self.max_iter, tol=self.tol,
                    engine=self.engine, polish=self.polish)
                free_long_j = self._sample_score_fit(free_long)
                cond_long_j = self._sample_score_fit(cond_long,
                                                     with_hypothesis=True)
            self._profile_cache[cache_key] = (
                jax.jit(jax.vmap(one, in_axes=(0, None, None))),
                free_long_j, cond_long_j, names_free, names_cond)
        return self._profile_cache[cache_key]

    def _cond_entry(self, target, fixed, names_free):
        """Unbinned twin of :meth:`BinnedToyStudy._cond_entry`: the
        conditional fit as its own program over (keys, weights) — the
        sample->score pipeline re-runs inside (threefry is counter-based, so
        the same keys regenerate bit-identical events), warm-started from the
        free optimum."""
        fixed = dict(fixed or {})
        cache_key = (target, self._freeze(fixed), 'cond')
        if cache_key not in self._profile_cache:
            fit_cond, names_cond = make_toy_fitter(
                self.compiled, fixed=fixed, runtime_fixed=[target],
                max_iter=self.max_iter, tol=self.tol,
                engine=self.engine, polish=self.polish)
            warm_cols = _warm_cols(names_free, names_cond)
            wc = (np.asarray(warm_cols)
                  if warm_cols is not None and len(warm_cols) else None)

            def one(key, weights, x0, hypothesis):
                coords, mask, bins = self._sample_one(key, weights)
                ps_anchor = self._score_sampled(coords, bins)
                if wc is not None:
                    return fit_cond(ps_anchor, mask, (hypothesis,),
                                    x0[jnp.asarray(wc)])
                return fit_cond(ps_anchor, mask, (hypothesis,))

            cond_v = jax.vmap(one, in_axes=(0, None, 0, None))

            @jax.jit
            def cond_fn(keys, weights, xf, llf, hypothesis):
                xc, llc, itc = cond_v(keys, weights, xf, hypothesis)
                t = jnp.maximum(2.0 * (llf - llc), 0.0)
                return t, (xc, llc, itc)

            cond_long_j = None
            if self.two_stage and names_cond:
                cond_long, _ = make_toy_fitter(
                    self.compiled, fixed=fixed, runtime_fixed=[target],
                    max_iter=4 * self.max_iter, tol=self.tol,
                    engine=self.engine, polish=self.polish)
                cond_long_j = self._sample_score_fit(cond_long,
                                                     with_hypothesis=True)
            self._profile_cache[cache_key] = (cond_fn, cond_long_j,
                                              names_cond)
        return self._profile_cache[cache_key]

    def profile_ts_grid(self, key, target, hypotheses, n_toys, truth=None,
                        fixed=None, mesh=None, return_cond=True):
        """Profile-LR statistics of ONE unbinned toy ensemble across a
        hypothesis grid (see :meth:`BinnedToyStudy.profile_ts_grid`): the
        free fit runs once, each hypothesis re-runs sample->score (same keys
        => identical events) plus a warm-started conditional fit.

        :param return_cond: as in the binned twin — False skips the
          per-hypothesis conditional-parameter transfers.
        :return: (ts (n_hypotheses, n_toys), sorted hypotheses, free
          ToyResults, list of conditional ToyResults)."""
        _check_target_not_fixed(target, fixed)
        hypotheses = np.sort(np.asarray(hypotheses, dtype=float))
        for h in hypotheses:
            check_fixed_in_bounds(self.compiled, {target: float(h)})
        weights = self.expected_weights(**(truth or {}))
        if mesh is not None:
            n_toys = _round_up_toys(n_toys, mesh)
        keys = jax.random.split(key, n_toys)
        if mesh is not None:
            keys = shard_toys(mesh, keys)
        fit_free_j, free_long_j, names_free = self._fit_entry(fixed)
        cond_fn, cond_long_j, names_cond = self._cond_entry(
            target, fixed, names_free)
        xf, llf, itf = jax.device_get(fit_free_j(keys, weights))
        if free_long_j is not None and cond_long_j is not None:
            xf, llf, itf = _refine_stragglers(
                free_long_j, keys, xf, llf, itf, self.max_iter,
                extra_args=(weights,))[:3]
        xf_dev, llf_dev = jnp.asarray(xf), jnp.asarray(llf)
        refine = None
        if cond_long_j is not None:
            refine = lambda xc, llc, itc, hj: _refine_stragglers(
                cond_long_j, keys, xc, llc, itc, self.max_iter,
                extra_args=(weights, hj))[:3]
        ts, conds = _cond_scan(
            hypotheses,
            lambda hj: cond_fn(keys, weights, xf_dev, llf_dev, hj),
            refine, llf, names_cond, self.max_iter, need_cond=return_cond)
        return ts, hypotheses, ToyResults(names_free, xf, llf, itf), conds

    def profile_ts_scan(self, key, target, hypotheses, n_toys, fixed=None,
                        mesh=None, truth=None, truth_at_hypothesis=True,
                        return_free=False):
        """Profile-LR toy distributions across a hypothesis grid (see
        BinnedToyStudy.profile_ts_scan)."""
        if mesh is not None:
            n_toys = _round_up_toys(n_toys, mesh)
        out, frees = [], []
        for i, h in enumerate(np.asarray(hypotheses, dtype=float)):
            sim_truth = dict(truth or {})
            if truth_at_hypothesis:
                sim_truth[target] = float(h)
            weights = self.expected_weights(**sim_truth)
            keys = jax.random.split(jax.random.fold_in(key, i), n_toys)
            if mesh is not None:
                keys = shard_toys(mesh, keys)
            t, free, _ = self._run_profile(keys, weights, target, h, fixed)
            out.append(np.asarray(t))
            frees.append(free)
        ts = np.stack(out)
        return (ts, frees) if return_free else ts

    def profile_map(self, space, fixed=None):
        """Profiled likelihood-ratio map on the OBSERVED dataset (the events
        bound by ``lf.set_data``): t(theta) = 2(LL_free - LL(theta fixed,
        rest profiled)) over a 1- or 2-dimensional parameter grid, all grid
        points lanes of ONE vmapped conditional-fit program warm-started
        from the single free fit — the unbinned twin of
        :meth:`BinnedToyStudy.profile_map` (device twin of
        ``plot_likelihood_ratio``, reference blueice/inference.py:392-443).

        The per-event anchor densities are read from the likelihood's
        current ``set_data`` build at call time, so re-binding data never
        leaves a stale map (new data with the same event count reuses the
        compiled programs).

        :return: (t array shaped ``(len(grid1)[, len(grid2)])``, free
          ToyResults (1 row), conditional ToyResults (one row per grid
          point, C order)).
        """
        targets, grids = _check_map_space(self.compiled, space, fixed)
        build = getattr(self.lf, '_builds', {}).get('ps')
        if build is None:
            raise ValueError(
                "No observed dataset bound — call lf.set_data(...) first")
        if build[0] == 'source_wise':
            raise NotImplementedError(
                "profile_map needs a dense global anchor grid (or no shape "
                "parameters); source-wise morphing maps run via the host "
                "path (plot_likelihood_ratio)")
        tensor = jnp.asarray(build[2] if build[0] == 'global' else build[1],
                             dtype=self.compiled.dtype)
        mask = jnp.ones(tensor.shape[-1], dtype=bool)

        cache_key = (tuple(targets), self._freeze(fixed), 'map')
        entry = self._profile_cache.get(cache_key)
        if entry is None:
            # One dataset, lockstep lanes: a single program with the long
            # iteration cap instead of the two-stage straggler machinery
            cap = 4 * self.max_iter if self.two_stage else self.max_iter
            fit_free, names_free = make_toy_fitter(
                self.compiled, fixed=dict(fixed or {}), max_iter=cap,
                tol=self.tol, engine=self.engine, polish=self.polish)
            fit_cond, names_cond = make_toy_fitter(
                self.compiled, fixed=dict(fixed or {}),
                runtime_fixed=list(targets), max_iter=cap, tol=self.tol,
                engine=self.engine, polish=self.polish)
            warm = (np.asarray(_warm_cols(names_free, names_cond))
                    if names_cond and _warm_cols(names_free, names_cond)
                    is not None else None)
            k = len(targets)

            @jax.jit
            def map_fn(tensor, mask, points):
                free = fit_free(tensor, mask)
                x0 = (free[0][jnp.asarray(warm)]
                      if warm is not None and len(warm) else None)

                def one(pt):
                    fv = tuple(pt[i] for i in range(k))
                    if x0 is None:
                        return fit_cond(tensor, mask, fv)
                    # Two starts per lane (see BinnedToyStudy.profile_map)
                    return _best_of_two(fit_cond(tensor, mask, fv, x0),
                                        fit_cond(tensor, mask, fv))
                return free, jax.vmap(one)(points)
            entry = (map_fn, names_free, names_cond)
            self._profile_cache[cache_key] = entry
        map_fn, names_free, names_cond = entry

        pts = jnp.asarray([tup for tup in itertools.product(*grids)])
        (xf, llf, itf), (xc, llc, itc) = jax.device_get(
            map_fn(tensor, mask, pts))
        t = np.maximum(2.0 * (float(llf) - np.asarray(llc)), 0.0)
        return (t.reshape(tuple(len(g) for g in grids)),
                ToyResults(names_free, np.asarray(xf)[None],
                           np.asarray(llf)[None], np.asarray(itf)[None]),
                ToyResults(names_cond, xc, llc, itc))
