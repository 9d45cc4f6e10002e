"""Device-side sampling from histogram templates (jax PRNG).

TPU-native replacement for the host-side ``Histdd.get_random`` sampling the
reference uses for toy-MC generation (reference: blueice/source.py:248-264):
a categorical draw over bins followed by a uniform draw within the bin, with
static shapes (fixed n) so the whole simulate→fit toy pipeline stays inside jit
and vmaps over thousands of toys.
"""

import jax
import jax.numpy as jnp

__all__ = ['sample_from_template', 'poisson_counts']


def sample_from_template(key, weights, edges, n):
    """Sample ``n`` points from a histogram payload.

    :param key: jax PRNG key.
    :param weights: (*bins,) nonnegative per-bin weights (need not be normalized).
    :param edges: list of k 1-d bin-edge arrays.
    :param n: static int, number of points to draw.
    :return: (n, k) array of coordinates, uniform within their bin.
    """
    weights = jnp.asarray(weights)
    shape = weights.shape
    # A bare edge array for a 1-d template is a natural mistake; the failure
    # it causes otherwise (scalar iteration deep in the loop below) is cryptic
    if len(edges) != len(shape) or any(
            jnp.ndim(e) != 1 or jnp.shape(e)[0] != shape[d] + 1
            for d, e in enumerate(edges)):
        raise ValueError(
            "edges must be a list of %d 1-d arrays, one per weights axis, "
            "each one longer than its axis %s — got %s"
            % (len(shape), shape,
               [jnp.shape(jnp.asarray(e)) for e in edges]))
    flat = weights.reshape(-1)
    k_bin, k_uni = jax.random.split(key)
    logits = jnp.log(jnp.where(flat > 0, flat, 0.0))
    bin_i = jax.random.categorical(k_bin, logits, shape=(n,))
    multi = jnp.unravel_index(bin_i, shape)
    # weights may arrive as integer MC-count templates; uniform needs a float
    u_dtype = jnp.promote_types(flat.dtype, jnp.float32)
    u = jax.random.uniform(k_uni, (n, len(shape)), dtype=u_dtype)
    cols = []
    for d, e in enumerate(edges):
        e = jnp.asarray(e)
        lo = e[multi[d]]
        hi = e[multi[d] + 1]
        cols.append(lo + u[:, d] * (hi - lo))
    return jnp.stack(cols, axis=-1)


def poisson_counts(key, expected):
    """Poisson counts with mean ``expected`` (elementwise). Thin wrapper kept for
    a single import point in the toy pipeline."""
    return jax.random.poisson(key, expected)
