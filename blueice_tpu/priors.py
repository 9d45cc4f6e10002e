"""Prior log-pdf objects usable on both the host and the jit/grad/vmap path.

The reference attaches arbitrary host callables (usually ``scipy.stats.norm(...)
.logpdf``) as priors (reference: blueice/likelihood.py:488-504). Those work on the
host evaluation path here too, but cannot be traced by XLA. These classes are the
jax-compatible equivalents: plain callables built from jnp ops, so a likelihood
carrying them can be compiled end-to-end.
"""

import math

import numpy as np

__all__ = ['NormalPrior', 'UniformPrior', 'MultivariateNormalPrior']

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


class MultivariateNormalPrior:
    """Joint Gaussian log-density over a VECTOR of parameters — the correlated
    generalization of per-parameter :class:`NormalPrior` constraints (the
    reference has no correlated-constraint machinery; compose this with
    :func:`blueice_tpu.composition.correlated_gaussian_constraint`).

    Callable on a plain vector (host numpy or jax tracers) or on the
    OrderedDict a :class:`~blueice_tpu.composition.LogAncillaryLikelihood`
    passes its func. The Cholesky factor is precomputed once; evaluation is
    one triangular solve. Picklable and hashable by value.
    """

    def __init__(self, mean, cov):
        mean = np.asarray(mean, dtype=float).ravel()
        cov = np.asarray(cov, dtype=float)
        if cov.shape != (len(mean), len(mean)):
            raise ValueError("cov must be (%d, %d); got %s"
                             % (len(mean), len(mean), cov.shape))
        if not np.allclose(cov, cov.T, rtol=1e-10, atol=0):
            raise ValueError("cov must be symmetric")
        try:
            chol = np.linalg.cholesky(cov)
        except np.linalg.LinAlgError:
            raise ValueError("cov must be positive definite (Cholesky failed)")
        self.mean = mean
        self.cov = cov
        self._chol = chol
        self._log_norm = (-0.5 * len(mean) * math.log(2.0 * math.pi)
                          - float(np.sum(np.log(np.diag(chol)))))

    def __call__(self, x, **_ancillary_kwargs):
        # OrderedDict from LogAncillaryLikelihood: stack in parameter order
        if isinstance(x, dict):
            x = list(x.values())
        if isinstance(x, (list, tuple)) and all(_is_host_value(v)
                                                for v in x):
            x = np.asarray(x, dtype=float)
        if _is_host_value(x):
            from scipy.linalg import solve_triangular
            z = solve_triangular(self._chol,
                                 np.asarray(x, dtype=float) - self.mean,
                                 lower=True)
            return float(-0.5 * np.dot(z, z) + self._log_norm)
        import jax.numpy as jnp
        from jax.scipy.linalg import solve_triangular
        diff = jnp.stack([jnp.asarray(v) for v in x]) \
            if isinstance(x, (list, tuple)) else jnp.asarray(x)
        z = solve_triangular(jnp.asarray(self._chol), diff - self.mean,
                             lower=True)
        return -0.5 * jnp.dot(z, z) + self._log_norm

    def __getstate__(self):
        return {'mean': self.mean, 'cov': self.cov}

    def __setstate__(self, state):
        self.__init__(state['mean'], state['cov'])

    def __repr__(self):
        return "MultivariateNormalPrior(mean=%s, cov=%s)" % (
            self.mean.tolist(), self.cov.tolist())

    def __eq__(self, other):
        return (isinstance(other, MultivariateNormalPrior)
                and np.array_equal(self.mean, other.mean)
                and np.array_equal(self.cov, other.cov))

    def __hash__(self):
        return hash(('MultivariateNormalPrior',
                     self.mean.tobytes(), self.cov.tobytes()))
