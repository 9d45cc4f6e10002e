"""Likelihood reduction ops: Poisson bin sums and the extended unbinned LL.

Role parity with the reference's ``_compute_likelihood`` implementations and
``extended_loglikelihood`` (reference: blueice/likelihood.py:571-573, 662-690).
Written as pure jnp so jit/grad/vmap compose; the masked variants support the
padded static-shape event batches of the vmapped toy-fit pipeline (where the
reference looped over variable-length numpy arrays).
"""

import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy

__all__ = ['poisson_logpmf', 'binned_poisson_logl',
           'binned_poisson_logl_constant', 'extended_logl']


def poisson_logpmf(k, mu):
    """log PMF of Poisson(mu) at counts k. mu == 0 gives 0 at k == 0, -inf else
    (matching scipy.stats.poisson.logpmf)."""
    k = jnp.asarray(k)
    mu = jnp.asarray(mu)
    return xlogy(k, mu) - mu - gammaln(k + 1.0)


def binned_poisson_logl(mus, pmfs, observed, include_constant=True):
    """Binned Poisson log likelihood.

    :param mus: (n_sources,) expected event counts per source.
    :param pmfs: (n_sources, *bins) per-source PMF over the analysis-space bins.
    :param observed: (*bins,) observed counts.
    :param include_constant: include the parameter-independent -gammaln(k+1)
      term. Optimizers can drop it (it cancels in every likelihood ratio and is
      loop-invariant, so recomputing it inside a fit loop is pure waste) and add
      :func:`binned_poisson_logl_constant` back once.
    :return: scalar log likelihood: sum over bins of Poisson(sum_s mu_s pmf_s).

    Zero-expectation bins are floored at the dtype's smallest normal inside the
    log: an observed count there contributes k*log(tiny) (hugely negative but
    finite) instead of -inf, which keeps gradients finite for the optimizer —
    in float32, template tails underflow to exactly 0 and xlogy's derivative
    0/0 would otherwise poison the whole fit with NaNs.
    """
    mus = jnp.asarray(mus)
    pmfs = jnp.asarray(pmfs)
    observed = jnp.asarray(observed)
    expected = jnp.tensordot(mus, pmfs, axes=(0, 0))
    tiny = jnp.finfo(expected.dtype).tiny

    # Deviance-centered form: per-bin term k*log(lambda/k) - (lambda - k),
    # exactly 0 at lambda == k and O(residual^2/k) near it. The saturated-model
    # part k*log k - k - lgamma(k+1) moves into the constant. This keeps the
    # *parameter-dependent* part of the sum at O(n_dof) magnitude, so float32
    # resolves likelihood differences (profile-LR statistics need ~0.01) even
    # when the raw log likelihood is ~1e6 — essential on TPU.
    k_safe = jnp.where(observed > 0, observed, 1.0)
    ll = jnp.sum(xlogy(observed, jnp.maximum(expected, tiny) / k_safe)
                 - (expected - observed))
    # NEGATIVE per-bin expectations (possible with allow_negative sources
    # even when the total rate is physical) must not be rewarded: with the
    # log floored, the linear -(lambda - k) term would otherwise grow the LL
    # without bound as a bin goes negative. Steep linear penalty instead.
    ll = ll + 1e6 * jnp.sum(jnp.minimum(expected, 0.0))
    if include_constant:
        ll = ll + binned_poisson_logl_constant(observed)
    return ll


def binned_poisson_logl_constant(observed):
    """The parameter-independent (saturated-model) term of the binned Poisson
    log likelihood: sum of k*log(k) - k - gammaln(k+1)."""
    observed = jnp.asarray(observed)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    return jnp.sum(xlogy(observed, k_safe) - observed
                   - gammaln(observed + 1.0))


def extended_logl(mus, ps, outlier_likelihood=0.0, mask=None):
    """Extended unbinned log likelihood.

    :param mus: (n_sources,) expected number of events per source.
    :param ps: (n_sources, n_events) PDF value for each source at each event.
    :param outlier_likelihood: density assigned to events where the summed density
      is not a positive number (0, negative, or nan) — prevents a single
      zero-density event from sinking the whole likelihood.
    :param mask: optional (n_events,) boolean; False entries are padding and
      contribute nothing (for static-shape batched toys).
    :return: scalar: -sum(mus) + sum_events log(sum_s mu_s p_s(event)).
    """
    mus = jnp.asarray(mus)
    ps = jnp.asarray(ps)
    p_events = jnp.nansum(mus[:, None] * ps, axis=0)
    if mask is not None:
        # Double-where: floor the PADDED events' density BEFORE the log.
        # Masking only the log's output leaves log(0) = -inf in the
        # computation, whose VJP (0 * 1/0) poisons every gradient with NaN.
        p_events = jnp.where(mask, p_events, 1.0)
    if outlier_likelihood != 0:
        p_events = jnp.where(p_events > 0, p_events, outlier_likelihood)
    log_terms = jnp.log(p_events)
    if mask is not None:
        log_terms = jnp.where(mask, log_terms, 0.0)
    return -jnp.sum(mus) + jnp.sum(log_terms)
