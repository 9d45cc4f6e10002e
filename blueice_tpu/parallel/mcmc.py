"""Device-side ensemble MCMC: the affine-invariant stretch move
(Goodman & Weare 2010 — the emcee algorithm, reference use:
blueice/inference.py:249-321) run entirely on device.

The half-ensemble update is already lockstep-parallel over walkers, which is
exactly vmap's shape: each step is two vmapped half-updates (propose against
the complementary half, evaluate the compiled likelihood for every walker at
once, accept elementwise), and the whole chain is one `lax.scan` — a single
XLA program for the full run instead of n_steps x n_walkers host likelihood
calls. The host sampler (inference._stretch_move_sampler) remains the
fallback for non-compiled likelihoods.
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['sample_stretch', 'make_device_log_prob', 'bestfit_emcee_device']


def sample_stretch(log_prob, key, p0, n_steps, a=2.0):
    """Run the stretch-move ensemble sampler as one scanned XLA program.

    :param log_prob: pure jax scalar function of an (n_dim,) parameter vector
      (vmapped internally over walkers).
    :param key: jax PRNG key.
    :param p0: (n_walkers, n_dim) initial ensemble; n_walkers must be even.
    :param n_steps: chain length.
    :param a: stretch scale (emcee's default 2.0).
    :return: (chain (n_walkers, n_steps, n_dim), logp (n_walkers, n_steps)).
    """
    p0 = jnp.asarray(p0)
    n_walkers, n_dim = p0.shape
    if n_walkers % 2:
        raise ValueError("stretch move needs an even walker count")
    half = n_walkers // 2
    lp_vec = jax.vmap(log_prob)

    def half_update(pos, logp, key, lo, olo):
        walk = jax.lax.dynamic_slice_in_dim(pos, lo, half)
        wlp = jax.lax.dynamic_slice_in_dim(logp, lo, half)
        other = jax.lax.dynamic_slice_in_dim(pos, olo, half)
        kz, kp, ka = jax.random.split(key, 3)
        z = ((a - 1.0) * jax.random.uniform(kz, (half,), pos.dtype)
             + 1.0) ** 2 / a
        partners = jax.random.randint(kp, (half,), 0, half)
        anchor = other[partners]
        prop = anchor + z[:, None] * (walk - anchor)
        lp_prop = lp_vec(prop)
        log_acc = (n_dim - 1) * jnp.log(z) + lp_prop - wlp
        accept = jnp.log(jax.random.uniform(ka, (half,), pos.dtype)) < log_acc
        new_walk = jnp.where(accept[:, None], prop, walk)
        new_lp = jnp.where(accept, lp_prop, wlp)
        pos = jax.lax.dynamic_update_slice_in_dim(pos, new_walk, lo, 0)
        logp = jax.lax.dynamic_update_slice_in_dim(logp, new_lp, lo, 0)
        return pos, logp

    def step(carry, key):
        pos, logp = carry
        k1, k2 = jax.random.split(key)
        pos, logp = half_update(pos, logp, k1, 0, half)
        pos, logp = half_update(pos, logp, k2, half, 0)
        return (pos, logp), (pos, logp)

    lp0 = lp_vec(p0)
    keys = jax.random.split(key, n_steps)
    _, (chain, logps) = jax.lax.scan(step, (p0, lp0), keys)
    # scan stacks along steps: (n_steps, n_walkers, ...) -> walker-major
    return jnp.swapaxes(chain, 0, 1), jnp.swapaxes(logps, 0, 1)


def make_device_log_prob(compiled, fixed=None):
    """(log_prob(x), names, guess) over the floating parameters of a compiled
    likelihood with bound data — the device twin of the host
    ``make_objective(minus=False)``."""
    fixed = dict(fixed or {})
    rate_names = [sn + '_rate_multiplier'
                  for sn in getattr(compiled.lf, 'rate_parameters', {})]
    shape_names = list(getattr(compiled.lf, 'shape_parameters', {}))
    unknown = set(fixed) - set(rate_names) - set(shape_names)
    if unknown:
        # Same contract as the host path (make_objective -> lf(**point)):
        # a typo'd conditional fit must not silently sample unconstrained
        from ..exceptions import InvalidParameter
        raise InvalidParameter(
            "%s matches neither a rate nor a shape parameter of this "
            "likelihood" % sorted(unknown))
    names = [n for n in rate_names + shape_names if n not in fixed]
    if not names:
        raise ValueError("nothing to sample: every parameter is fixed")
    guess = np.array([float(compiled.defaults[n]) for n in names])
    base = dict(compiled.defaults)
    base.update(fixed)

    def log_prob(x):
        params = dict(base)
        for i, n in enumerate(names):
            params[n] = x[i]
        return compiled.logl(params)

    return log_prob, names, guess


def bestfit_emcee_device(lf, n_walkers=40, n_steps=200, n_burn_in=100,
                         seed=0, return_errors=False, return_samples=False,
                         compiled=None, quiet=True, n_threads=1, **fixed):
    """Drop-in twin of ``bestfit_emcee`` running the whole chain on device
    via the compiled likelihood (requires prepare() + set_data()).
    ``quiet``/``n_threads`` are accepted for host-twin signature parity and
    ignored (the chain is one XLA program); any other unknown keyword raises
    InvalidParameter, like the host path.

    :return: ({param: median}, loglikelihood at the median point), plus
      errors/samples like the host routine when requested.
    """
    from scipy import stats
    from ..compile import cached_logl

    if compiled is None:
        # Version-token cache on lf (shared with bestfit_jax): repeated
        # calls on the same dataset must not rebuild the likelihood
        compiled = cached_logl(lf)

    # The jitted chain program is cached on the compiled likelihood: a fresh
    # jit(lambda ...) closure per call would retrace + recompile the whole
    # n_steps scan every invocation (e.g. every conditional fit of a scan)
    cache = getattr(compiled, '_mcmc_runners', None)
    if cache is None:
        cache = compiled._mcmc_runners = {}
    ck = (int(n_walkers), int(n_steps), tuple(sorted(fixed.items())))
    if ck not in cache:
        log_prob, names, guess = make_device_log_prob(compiled, fixed)
        runner = jax.jit(
            lambda k, p: sample_stretch(log_prob, k, p, n_steps))
        cache[ck] = (runner, names, guess)
    runner, names, guess = cache[ck]
    n_dim = len(names)

    if seed is None:
        # Host-twin parity: seed=None means fresh entropy per call (the
        # device default stays 0 = reproducible chains)
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    key = jax.random.PRNGKey(seed)
    k0, k1, k2 = jax.random.split(key, 3)
    spread = jax.random.uniform(k0, (n_walkers, n_dim), minval=0.95,
                                maxval=1.05)
    p0 = spread * jnp.asarray(guess)[None, :]
    # Guesses of exactly 0 get an additive jitter: affine-invariant
    # proposals are linear combinations of walker positions, so a
    # coordinate where the whole ensemble starts identical can never move
    # (same guard as the host bestfit_emcee)
    degenerate = np.asarray(guess) == 0
    if degenerate.any():
        jit_k = jax.random.uniform(k2, (n_walkers, n_dim), minval=-0.05,
                                   maxval=0.05)
        p0 = jnp.where(jnp.asarray(degenerate)[None, :], p0 + jit_k, p0)

    chain, _ = runner(k1, p0)
    samples = np.asarray(chain[:, n_burn_in:, :]).reshape((-1, n_dim))

    fit = np.median(samples, axis=0)
    fit_dict = OrderedDict((names[i], fit[i]) for i in range(n_dim))
    best_ll = float(compiled.logl(
        {**dict(compiled.defaults), **fixed,
         **{n: jnp.asarray(v) for n, v in fit_dict.items()}}))

    if return_errors:
        lo, hi = np.percentile(samples, 100 * stats.norm.cdf([-1, 1]), axis=0)
        errs = OrderedDict((names[i], (hi[i] - lo[i]) / 2)
                           for i in range(n_dim))
        return fit_dict, best_ll, errs
    if return_samples:
        return fit_dict, best_ll, samples
    return fit_dict, best_ll
