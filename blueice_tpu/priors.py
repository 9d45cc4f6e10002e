"""Prior log-pdf objects usable on both the host and the jit/grad/vmap path.

The reference attaches arbitrary host callables (usually ``scipy.stats.norm(...)
.logpdf``) as priors (reference: blueice/likelihood.py:488-504). Those work on the
host evaluation path here too, but cannot be traced by XLA. These classes are the
jax-compatible equivalents: plain callables built from jnp ops, so a likelihood
carrying them can be compiled end-to-end.
"""

import math

import numpy as np

__all__ = ['NormalPrior', 'UniformPrior']

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _is_host_value(x):
    """True for plain python/numpy values: compute with numpy (a jnp call here
    would dispatch a tiny kernel to the accelerator on every host-path
    likelihood evaluation — ruinous through a remote-TPU tunnel)."""
    return isinstance(x, (int, float, np.generic, np.ndarray))


class NormalPrior:
    """Gaussian log-prior: callable on host floats (numpy) and on jax tracers
    (jnp), picklable, hashable by value."""

    def __init__(self, mu, sigma):
        self.mu = float(mu)
        self.sigma = float(sigma)

    def __call__(self, x):
        if _is_host_value(x):
            z = (x - self.mu) / self.sigma
            return -0.5 * z * z - math.log(self.sigma) - _LOG_SQRT_2PI
        import jax.numpy as jnp
        z = (jnp.asarray(x) - self.mu) / self.sigma
        return -0.5 * z * z - math.log(self.sigma) - _LOG_SQRT_2PI

    def __repr__(self):
        return "NormalPrior(mu=%r, sigma=%r)" % (self.mu, self.sigma)

    def __eq__(self, other):
        return (isinstance(other, NormalPrior)
                and (self.mu, self.sigma) == (other.mu, other.sigma))

    def __hash__(self):
        return hash(('NormalPrior', self.mu, self.sigma))


class UniformPrior:
    """Flat log-prior inside [lo, hi], -inf outside.
    Hashable by value, like NormalPrior."""

    def __init__(self, lo, hi):
        self.lo = float(lo)
        self.hi = float(hi)

    def __eq__(self, other):
        return (isinstance(other, UniformPrior)
                and (self.lo, self.hi) == (other.lo, other.hi))

    def __hash__(self):
        return hash(('UniformPrior', self.lo, self.hi))

    def __call__(self, x):
        if _is_host_value(x):
            # Elementwise like NormalPrior: chained comparisons would crash
            # on numpy arrays (ambiguous truth value)
            import numpy as np
            inside = (np.asarray(x) >= self.lo) & (np.asarray(x) <= self.hi)
            out = np.where(inside, 0.0, -np.inf)
            return float(out) if np.ndim(x) == 0 else out
        import jax.numpy as jnp
        x = jnp.asarray(x)
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, 0.0, -jnp.inf)

    def __repr__(self):
        return "UniformPrior(lo=%r, hi=%r)" % (self.lo, self.hi)
