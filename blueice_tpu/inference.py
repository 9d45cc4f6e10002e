"""Inference helpers on top of likelihood functions: objectives, best fits,
profile-likelihood confidence intervals, MCMC, likelihood-ratio plots.

Role parity with the reference (reference: blueice/inference.py): the same free
functions, also grafted as methods onto the likelihood classes. TPU-native
additions:

* :func:`bestfit_jax` — gradient-based fit of the *compiled* likelihood
  (jax.grad / damped-Newton, see :mod:`blueice_tpu.parallel.fitter`), returning
  minuit-style parabolic errors from the exact Hessian. This is the fit the
  batched toy pipeline vmaps by the thousands.
* :func:`bestfit_emcee` runs on a built-in affine-invariant ensemble sampler when
  the optional ``emcee`` package is absent, so MCMC works out of the box.
"""

import warnings
from collections import OrderedDict
from copy import deepcopy

import numpy as np
from scipy import stats
from scipy.optimize import brentq, minimize

from .exceptions import NoOpimizationNecessary, OptimizationFailed

DEFAULT_BESTFIT_ROUTINE = 'scipy'

__all__ = ['best_anchor', 'make_objective', 'bestfit_scipy', 'bestfit_minuit',
           'bestfit_jax', 'plot_likelihood_ratio', 'one_parameter_interval',
           'bestfit_emcee']


def best_anchor(lf):
    """Shape-parameter dict of the anchor model with the highest likelihood —
    a cheap global-fit guess."""
    if not len(lf.shape_parameters):
        return dict()
    shape_par_names = list(lf.shape_parameters.keys())
    anchors = list(lf.anchor_models.keys())

    def dictzip_shapes(anchor_vals):
        return {shape_par_names[j]: anchor_vals[j]
                for j in range(len(shape_par_names))}

    results = np.array([lf(**dictzip_shapes(a)) for a in anchors])
    return dictzip_shapes(anchors[int(np.argmax(results))])


def make_objective(lf, guess=None, minus=True, rates_in_log_space=False,
                   **kwargs):
    """Wrap the likelihood lf for an optimizer.
    :param kwargs: fixed values for certain parameters (not fitted).
    :param guess: guesses for the floating parameters (default: base settings).
    :param minus: multiply by -1 (minimizers like that; samplers don't).
    :param rates_in_log_space: optimizer sees log10 of the rate multipliers.
    :return: (f, names, guesses, bounds): f takes an array of the floating
      parameters; names/guesses/bounds are in f's argument order.
    """
    if guess is None:
        guess = {}
    names, bounds, guesses = [], [], []

    for p in lf.rate_parameters.keys():
        if p + '_rate_multiplier' not in kwargs:
            g = guess.get('%s_rate_multiplier' % p, 1)
            names.append('%s_rate_multiplier' % p)
            if rates_in_log_space:
                guesses.append(np.log10(g))
                bounds.append((None, None))
            else:
                guesses.append(g)
                bounds.append((0, None))

    for p, (_, __, base_value) in lf.shape_parameters.items():
        if p not in kwargs:
            names.append(p)
            bounds.append(lf.get_bounds(p))
            g = guess.get(p)
            if g is None:
                g = lf.pdf_base_config.get(p)
                if not isinstance(g, (int, float)):
                    g = base_value
            guesses.append(g)

    if not len(names):
        raise NoOpimizationNecessary(
            "There are no parameters to fit, no optimization is necessary")

    sign = -1 if minus else 1

    def objective(args):
        call_kwargs = {}
        for i, k in enumerate(names):
            if rates_in_log_space and k.endswith('_rate_multiplier'):
                call_kwargs[k] = 10 ** args[i]
            else:
                call_kwargs[k] = args[i]
        call_kwargs.update(kwargs)
        return lf(**call_kwargs) * sign

    return objective, names, np.array(guesses, dtype=float), bounds


def bestfit_scipy(lf, minimize_kwargs=None, rates_in_log_space=False,
                  pass_bounds_to_minimizer=False, **kwargs):
    """Minimize -lf over the parameters not fixed in kwargs with scipy.
    Returns ({param: best fit}, max loglikelihood). On failure, retries with the
    slower-but-robust Nelder-Mead before raising OptimizationFailed.
    :param pass_bounds_to_minimizer: pass bounds explicitly (usually unnecessary:
      the likelihood returns -inf outside its bounds anyway).
    """
    if minimize_kwargs is None:
        minimize_kwargs = {}

    try:
        f, names, guess, bounds = lf.make_objective(
            minus=True, rates_in_log_space=rates_in_log_space, **kwargs)
    except NoOpimizationNecessary:
        return {}, lf(**kwargs)

    optresult = minimize(f, guess,
                         bounds=bounds if pass_bounds_to_minimizer else None,
                         **minimize_kwargs)
    if not optresult.success:
        minimize_kwargs_temp = deepcopy(minimize_kwargs)
        minimize_kwargs_temp.pop('method', None)
        optresult = minimize(f, guess,
                             bounds=bounds if pass_bounds_to_minimizer else None,
                             method='Nelder-Mead', **minimize_kwargs_temp)
        if not optresult.success:
            raise OptimizationFailed("Optimization failure: ", optresult)

    optimum = optresult.x if len(names) != 1 else [optresult.x.item()]
    results = OrderedDict()
    for i, name in enumerate(names):
        if rates_in_log_space and name.endswith('_rate_multiplier'):
            results[name] = 10 ** optimum[i]
        else:
            results[name] = optimum[i]
    return results, -optresult.fun


def bestfit_minuit(lf, minimize_kwargs=None, rates_in_log_space=False, **kwargs):
    """Minimize -lf with iminuit's Migrad (iminuit 2.x API). Returns
    ({param: value, param_error: parabolic error}, max loglikelihood).
    Requires the optional iminuit package."""
    try:
        from iminuit import Minuit
    except ImportError as e:
        raise ImportError(
            "bestfit_minuit requires the optional iminuit package; use "
            "bestfit_scipy or bestfit_jax (which also gives parabolic errors "
            "from the exact jax Hessian) instead") from e
    if minimize_kwargs is None:
        minimize_kwargs = {}

    try:
        f, names, guess, bounds = lf.make_objective(
            minus=True, rates_in_log_space=rates_in_log_space, **kwargs)
    except NoOpimizationNecessary:
        return {}, lf(**kwargs)

    m = Minuit(f, guess, name=names)
    m.errordef = 0.5   # correct 1-sigma definition for a log likelihood
    for i, name in enumerate(names):
        m.limits[name] = bounds[i]
    for k, v in minimize_kwargs.items():
        setattr(m, k, v)
    m.migrad()

    fit_result = {name: m.values[name] for name in names}
    for name in names:
        fit_result[name + '_error'] = m.errors[name]
    return fit_result, -m.fval


def bestfit_jax(lf, return_errors=True, fit_options=None, **kwargs):
    """Gradient-based fit of the *compiled* likelihood: jit + jax.grad +
    bound-respecting damped Newton. Returns ({param: best fit, param_error:
    parabolic error}, max loglikelihood). This is the single-dataset form of the
    fit that the toy ensemble vmaps across a TPU mesh.

    :param kwargs: fixed values for certain parameters (not fitted).
    :param fit_options: dict passed to parallel.fitter.fit (max_iter, tol, ...).
    """
    from .compile import build_logl
    from .parallel.fitter import fit_single

    # Cache the compiled likelihood on lf, invalidated whenever prepare() or
    # set_data() bumps the payload version — so interval scans (many
    # conditional fits) compile exactly once, and a new dataset always gets a
    # fresh program. (id()-based tokens are unsafe: addresses get reused.)
    token = getattr(lf, '_build_version', None)
    if token is None and hasattr(lf, 'likelihood_list'):
        token = tuple(getattr(ll, '_build_version', None)
                      for ll in lf.likelihood_list)
    cached = getattr(lf, '_compiled_for_fit', None)
    if cached is None or cached[0] != token:
        lf._compiled_for_fit = cached = (token, build_logl(lf))
    compiled = cached[1]
    return fit_single(compiled, fixed=kwargs, return_errors=return_errors,
                      **(fit_options or {}))


def _stretch_move_sampler(log_prob, p0, n_steps, rng, a=2.0):
    """Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move) —
    built-in replacement for the optional emcee dependency.
    :param p0: (n_walkers, n_dim) initial ensemble.
    :return: chain (n_walkers, n_steps, n_dim).
    """
    n_walkers, n_dim = p0.shape
    pos = p0.copy()
    logp = np.array([log_prob(p) for p in pos])
    chain = np.empty((n_walkers, n_steps, n_dim))
    half = n_walkers // 2
    groups = [np.arange(half), np.arange(half, n_walkers)]
    for step in range(n_steps):
        for g in (0, 1):
            idx = groups[g]
            other = groups[1 - g]
            z = ((a - 1.0) * rng.random(len(idx)) + 1) ** 2 / a
            partners = other[rng.integers(0, len(other), len(idx))]
            proposal = pos[partners] + z[:, None] * (pos[idx] - pos[partners])
            logp_prop = np.array([log_prob(p) for p in proposal])
            log_accept = (n_dim - 1) * np.log(z) + logp_prop - logp[idx]
            accept = np.log(rng.random(len(idx))) < log_accept
            pos[idx[accept]] = proposal[accept]
            logp[idx[accept]] = logp_prop[accept]
        chain[:, step, :] = pos
    return chain


def bestfit_emcee(ll, quiet=True, return_errors=False, return_samples=False,
                  n_walkers=40, n_steps=200, n_burn_in=100, n_threads=1,
                  seed=None, **kwargs):
    """Optimize the loglikelihood with ensemble MCMC. Walkers start at
    [0.95, 1.05] * the guesses (so supply a custom guess if a default is 0).
    Uses the optional emcee package when importable, otherwise the built-in
    affine-invariant sampler (identical algorithm).

    :param return_errors: also return {param: 1 sigma error} as a third result.
    :param return_samples: also return the flattened post-burn-in samples.
    :return: ({param: median}, loglikelihood at the median point).
    """
    f, names, guess, _ = ll.make_objective(minus=False, **kwargs)
    n_dim = len(guess)
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(0.95, 1.05, size=(n_walkers, n_dim)) * guess

    try:
        import emcee
        sampler = emcee.EnsembleSampler(n_walkers, n_dim, f)
        sampler.run_mcmc(p0, n_steps)
        if hasattr(sampler, 'get_chain'):
            # emcee 3.x: get_chain() is (n_steps, n_walkers, n_dim)
            chain = np.swapaxes(sampler.get_chain(), 0, 1)
        else:
            # emcee 2.x: .chain is already (n_walkers, n_steps, n_dim)
            chain = sampler.chain
    except ImportError:
        chain = _stretch_move_sampler(f, p0, n_steps, rng)

    samples = chain[:, n_burn_in:, :].reshape((-1, n_dim))

    if not quiet:
        try:
            import corner
            import matplotlib.pyplot as plt
            corner.corner(chain.reshape((-1, n_dim)), show_titles=True,
                          labels=names, range=[0.99] * len(names), truths=guess)
            plt.show()
        except ImportError:
            warnings.warn("corner/matplotlib not available for diagnostics plot")

    fit_result = np.median(samples, axis=0)
    fit_result_dict = OrderedDict(
        (names[i], fit_result[i]) for i in range(len(names)))
    best_ll = ll(**fit_result_dict)

    if return_errors:
        l, r = np.percentile(samples, 100 * stats.norm.cdf([-1, 1]), axis=0)
        fit_errors = (r - l) / 2
        fit_errors_dict = OrderedDict(
            (names[i], fit_errors[i]) for i in range(len(names)))
        return fit_result_dict, best_ll, fit_errors_dict
    if return_samples:
        return fit_result_dict, best_ll, samples
    return fit_result_dict, best_ll


def _get_bestfit_routine(key):
    if hasattr(key, '__call__'):
        return key
    if key is None:
        key = DEFAULT_BESTFIT_ROUTINE
    return BESTFIT_ROUTINES[key]


def one_parameter_interval(lf, target, bound, confidence_level=0.9, kind='upper',
                           bestfit_routine=None, t_ppf=None, **kwargs):
    """Confidence interval of the given kind (central/upper/lower) on the
    parameter ``target``, from the profile-likelihood-ratio test statistic.
    :param bound: line-search bound(s): single value for upper/lower,
      2-tuple for central.
    :param t_ppf: function (hypothesis, quantile) -> critical value of the test
      statistic -2 log L(test)/L(bestfit) (e.g. from a Neyman construction).
      Defaults to Wilks' theorem.
    :param kwargs: passed to the bestfit routine (fixing parameters, etc).
    """
    bestfit_routine = _get_bestfit_routine(bestfit_routine)
    if target is None:
        source_names = getattr(lf, 'source_name_list', None) or lf.source_list
        target = source_names[-1] + '_rate_multiplier'

    # Global best fit: the denominator of the likelihood ratio
    result, max_loglikelihood = bestfit_routine(lf, **kwargs)
    global_best = result[target]

    def t(hypothesis, critical_quantile):
        """Profile likelihood ratio test statistic minus its critical value."""
        if t_ppf is None:
            # Wilks: stats.norm.ppf(cl)**2 == stats.chi2(1).ppf(2 cl - 1);
            # the chi2 form is quoted for central CIs, the normal one for bounds
            critical_value = stats.norm.ppf(critical_quantile) ** 2
        else:
            critical_value = t_ppf(hypothesis, critical_quantile)

        if kind == 'upper' and hypothesis <= global_best:
            result = 0
        elif kind == 'lower' and hypothesis >= global_best:
            result = 0
        else:
            # Conditional best fit at the hypothesis (numerator)
            lf_kwargs = {target: hypothesis}
            lf_kwargs.update(kwargs)
            _, ll = bestfit_routine(lf, **lf_kwargs)
            result = 2 * (max_loglikelihood - ll)
        return result - critical_value

    if kind == 'central':
        a = brentq(t, bound[0], global_best, args=[(1 - confidence_level) / 2])
        b = brentq(t, global_best, bound[1],
                   args=[1 - (1 - confidence_level) / 2])
        return a, b
    elif kind == 'lower':
        return brentq(t, bound, global_best, args=[1 - confidence_level])
    elif kind == 'upper':
        return brentq(t, global_best, bound, args=[confidence_level])
    raise ValueError("Unknown interval kind %s" % kind)


def plot_likelihood_ratio(lf, *space, vmax=15, bestfit_routine=None,
                          plot_kwargs=None, **kwargs):
    """Plot the -loglikelihood ratio in a 1D or 2D parameter space, profiling the
    remaining parameters at each point.
    :param space: tuples (dim_name, points); further kwargs are passed to lf and
      parameters not passed are fitted at each point.
    """
    import matplotlib.pyplot as plt
    bestfit_routine = _get_bestfit_routine(bestfit_routine)
    if plot_kwargs is None:
        plot_kwargs = {}

    label = "-Log likelihood ratio"
    if len(space) == 1:
        dim, x = space[0]
        results = np.array([
            bestfit_routine(lf, **{dim: q, **kwargs})[1] for q in x])
        results = results.max() - results
        plt.plot(x, results, **plot_kwargs)
        plt.ylim(0, vmax)
        plt.ylabel(label)
        plt.xlabel(dim)
        plt.xlim(x.min(), x.max())
    elif len(space) == 2:
        dims = (space[0][0], space[1][0])
        x, y = (space[0][1], space[1][1])
        results = np.array([
            [bestfit_routine(lf, **{dims[0]: z1, dims[1]: z2, **kwargs})[1]
             for z2 in y]
            for z1 in x])
        z1, z2 = np.meshgrid(x, y)
        results = np.nanmax(results) - results
        plt.pcolormesh(z1, z2, results.T, vmax=vmax, **plot_kwargs)
        plt.colorbar(label=label)
        plt.xlabel(dims[0])
        plt.ylabel(dims[1])
    else:
        raise ValueError("Can't handle %d dimensions" % len(space))


BESTFIT_ROUTINES = dict(scipy=bestfit_scipy, minuit=bestfit_minuit,
                        emcee=bestfit_emcee, jax=bestfit_jax)
