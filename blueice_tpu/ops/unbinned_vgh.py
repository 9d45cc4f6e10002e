"""Analytic value+gradient+Hessian of the extended unbinned log likelihood in
the (rate, morph-weight) parameterization.

The extended LL shares the multilinear structure of the binned case
(:mod:`blueice_tpu.ops.binned_vgh`): the per-event density of source s is
``P_{s,e}(t)``, multilinear in the lerp weights over the anchor corner
templates, and

    ll(m, t) = -sum_s m_s + sum_e mask_e * log(lam_e),
    lam_e    = sum_s m_s * P_{s,e}(t).

So every derivative is closed-form in the corner templates via the same
D / X difference tables — one pass over the events instead of the (S+K+1)
autodiff passes a black-box Hessian needs. This is what lifts unbinned toy
fits to the binned engine's throughput (reference semantics:
blueice/likelihood.py:678-690).

Events whose summed density is not positive take the ``outlier_likelihood``
floor in the value (matching :func:`blueice_tpu.ops.poisson.extended_logl`)
and contribute zero gradient/curvature — the floor is a constant.
"""

import jax.numpy as jnp

from .binned_vgh import corner_weight_tables

__all__ = ['unbinned_vgh', 'unbinned_ll', 'reference_center']


def _morph_tables(corners, m, t):
    K = t.shape[0]
    if K > 0:
        w, wd, wx = corner_weight_tables(t)
        P = jnp.tensordot(w, corners, axes=(0, 0))            # (S, E)
        D = jnp.tensordot(wd, corners, axes=(1, 0))           # (K, S, E)
        X = jnp.tensordot(wx, corners, axes=(2, 0))           # (K, K, S, E)
    else:
        P = corners[0]
        D = jnp.zeros((0,) + P.shape, dtype=corners.dtype)
        X = jnp.zeros((0, 0) + P.shape, dtype=corners.dtype)
    return P, D, X


def unbinned_vgh(corners, m, t, mask, outlier_likelihood=0.0,
                 inv_ref=None, ref_msum=0.0):
    """Extended-LL value, gradient and Hessian w.r.t. (m, t) for one event set.

    :param corners: (2^K, S, E) per-event density corner templates around the
      query point (K inferred from t).
    :param m: (S,) per-source expected counts.
    :param t: (K,) per-axis lerp weights.
    :param mask: (E,) validity mask (False = padding).
    :param outlier_likelihood: density floor for non-positive summed densities.
    :param inv_ref: optional (E,) inverse per-event reference densities: the
      value becomes the CENTERED log likelihood
      ``-(sum m - ref_msum) + sum_e log(lam_e * inv_ref_e)`` — every term
      O(1), so float32 keeps full precision at 1e5+ events where the raw sum
      of ~|log lam| would round at the 1e-2 level. Gradient/Hessian are
      unchanged (the center is parameter-independent); add the reference LL
      back outside if an absolute value is needed.
    :param ref_msum: sum of the reference expected counts (with inv_ref).
    :return: (ll, g (S+K,), H (S+K, S+K)), parameter order [m_1..S, t_1..K].
    """
    corners = jnp.asarray(corners)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    K = t.shape[0]

    P, D, X = _morph_tables(corners, m, t)
    lam = jnp.tensordot(m, P, axes=(0, 0))                    # (E,)

    pos = lam > 0
    lam_eff = jnp.where(pos, lam, outlier_likelihood) \
        if outlier_likelihood != 0 else lam
    if inv_ref is None:
        log_terms = jnp.where(mask, jnp.log(lam_eff), 0.0)
        ll = -jnp.sum(m) + jnp.sum(log_terms)
    else:
        log_terms = jnp.where(mask, jnp.log(lam_eff * inv_ref), 0.0)
        ll = -(jnp.sum(m) - ref_msum) + jnp.sum(log_terms)

    # Outlier-floored events are constant in the parameters: no grad/curvature
    lam_safe = jnp.where(pos, lam, 1.0)
    active = (mask & pos).astype(corners.dtype)
    inv_lam = active / lam_safe                               # (E,)
    q = inv_lam / lam_safe                                    # (E,)

    g_m = P @ inv_lam - 1.0                                   # (S,)
    Dbar = jnp.einsum('s,kse->ke', m, D)                      # (K, E)
    g_t = Dbar @ inv_lam                                      # (K,)

    H_mm = -jnp.einsum('se,e,ze->sz', P, q, P)                # (S, S)
    H_mt = (-jnp.einsum('se,e,ke->sk', P, q, Dbar)
            + jnp.einsum('kse,e->sk', D, inv_lam))            # (S, K)
    Xbar = jnp.einsum('s,kzse->kze', m, X)                    # (K, K, E)
    H_tt = (-jnp.einsum('ke,e,ze->kz', Dbar, q, Dbar)
            + jnp.einsum('kze,e->kz', Xbar, inv_lam))         # (K, K)

    if K == 0:
        return ll, g_m, H_mm
    g = jnp.concatenate([g_m, g_t])
    top = jnp.concatenate([H_mm, H_mt], axis=1)
    bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
    return ll, g, jnp.concatenate([top, bottom], axis=0)


def reference_center(corners, m, t, mask, outlier_likelihood=0.0):
    """Per-toy centering data at a fixed reference parameter point:
    ``(inv_ref (E,), ref_msum, ref_ll)`` — feed the first two into
    :func:`unbinned_ll` / :func:`unbinned_vgh` (making their values exact
    small-number differences in float32) and add ``ref_ll`` back to the
    optimum for an absolute log likelihood."""
    corners = jnp.asarray(corners)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    P, _, _ = _morph_tables(corners, m, t)
    lam = jnp.tensordot(m, P, axes=(0, 0))
    lam_eff = jnp.where(lam > 0, lam, outlier_likelihood) \
        if outlier_likelihood != 0 else lam
    safe = jnp.where(lam_eff > 0, lam_eff, 1.0)
    inv_ref = jnp.where(mask & (lam_eff > 0), 1.0 / safe, 1.0)
    ref_msum = jnp.sum(m)
    ref_ll = -ref_msum + jnp.sum(jnp.where(mask, jnp.log(safe), 0.0))
    return inv_ref, ref_msum, ref_ll


def unbinned_ll(corners, m, t, mask, outlier_likelihood=0.0,
                inv_ref=None, ref_msum=0.0):
    """Value-only extended LL on the corner block (cheap accept-step
    evaluation inside the Newton loop). With ``inv_ref``, returns the
    CENTERED value (see :func:`unbinned_vgh`)."""
    corners = jnp.asarray(corners)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    P, _, _ = _morph_tables(corners, m, t)
    lam = jnp.tensordot(m, P, axes=(0, 0))
    lam_eff = jnp.where(lam > 0, lam, outlier_likelihood) \
        if outlier_likelihood != 0 else lam
    if inv_ref is None:
        return -jnp.sum(m) + jnp.sum(jnp.where(mask, jnp.log(lam_eff), 0.0))
    return (-(jnp.sum(m) - ref_msum)
            + jnp.sum(jnp.where(mask, jnp.log(lam_eff * inv_ref), 0.0)))
