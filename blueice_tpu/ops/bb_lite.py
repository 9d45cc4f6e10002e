"""Barlow-Beeston "lite" MC-statistics handling: one profiled scale per bin
on the TOTAL template, with its closed-form root.

The reference's finite-MC treatment is ``bb_single`` — the full Beeston-
Barlow construction for exactly ONE source (reference:
blueice/likelihood.py:618-660; our twin in ops/beeston_barlow.py). The
"lite" variant is the HistFactory/pyhf ``staterror`` convention: every bin
gets one nuisance scale gamma_b applied to the bin's total expectation,
constrained by the bin's total MC count M_b via a Poisson term, and gamma_b
is profiled out analytically:

    LL_b(lam) = max_gamma [ k ln(gamma lam) - gamma lam
                            + M ln(gamma) - M (gamma - 1) ]
    gamma*    = (k + M) / (lam + M)                      (M > 0)

The constraint is normalized to zero at gamma = 1, so M -> inf (perfect MC)
reduces EXACTLY to the plain binned Poisson likelihood, and M = 0 bins
(no MC information anywhere) carry no nuisance at all (gamma = 1). Unlike
``bb_single`` this covers finite statistics of ALL sources at once — at the
usual lite-model cost of correlating their per-bin uncertainties into one
scale.

Everything is elementwise closed form, so three paths share it: the compiled
likelihood value (:func:`bb_lite_logl`), the host float64 oracle
(:func:`bb_lite_logl_host`), and the analytic fit engine's fused
value/gradient/Hessian (:func:`binned_bblite_vgh`), whose (lam, M) chain
rule uses the envelope theorem at the profiled root:

    dLL/dlam = k/lam - gamma            dLL/dM = ln(gamma) - (gamma - 1)
    plus the gamma'(lam, M) curvature terms assembled below.
"""

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import xlogy

from .binned_vgh import corner_weight_tables

__all__ = ['bb_lite_logl', 'bb_lite_logl_host', 'binned_bblite_vgh',
           'binned_bblite_ll']

_PEN = 1e6     # negative-expectation penalty slope (matches ops.poisson)


def _gamma(lam_pos, M, k):
    """The profiled per-bin scale (elementwise, guarded): (k+M)/(lam+M) for
    bins with MC information, exactly 1 elsewhere."""
    has_mc = M > 0
    den = jnp.maximum(lam_pos + M, jnp.finfo(lam_pos.dtype).tiny)
    return jnp.where(has_mc, (k + M) / den, 1.0)


def bb_lite_logl(mus, pmfs, nme, observed, include_constant=True):
    """Binned Poisson log likelihood with the profiled Barlow-Beeston-lite
    per-bin scale; same conventions as
    :func:`blueice_tpu.ops.poisson.binned_poisson_logl` (deviance-centered
    parameter-dependent part, saturated constant split off, steep linear
    penalty on negative expectations).

    :param mus: (n_sources,) expected counts per source.
    :param pmfs: (n_sources, *bins) per-source PMFs.
    :param nme: (n_sources, *bins) MC counts behind each template (summed
      over sources per bin inside).
    :param observed: (*bins,) observed counts.
    """
    from .poisson import binned_poisson_logl_constant
    mus = jnp.asarray(mus)
    pmfs = jnp.asarray(pmfs)
    observed = jnp.asarray(observed)
    lam = jnp.tensordot(mus, pmfs, axes=(0, 0))
    M = jnp.sum(jnp.asarray(nme, dtype=lam.dtype), axis=0)
    tiny = jnp.finfo(lam.dtype).tiny
    lam_pos = jnp.maximum(lam, tiny)
    k = observed.astype(lam.dtype)
    g = _gamma(lam_pos, M, k)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    ll = jnp.sum(xlogy(k, jnp.maximum(g * lam_pos, tiny) / k_safe)
                 - (g * lam - k) + xlogy(M, g) - M * (g - 1.0))
    ll = ll + _PEN * jnp.sum(jnp.minimum(lam, 0.0))
    if include_constant:
        ll = ll + binned_poisson_logl_constant(observed)
    return ll


def bb_lite_logl_host(mus, pmfs, nme, observed):
    """Float64 numpy twin of :func:`bb_lite_logl` (constant included) — the
    host reference-parity path."""
    from scipy.special import gammaln, xlogy as np_xlogy
    lam = np.tensordot(np.asarray(mus, dtype=float),
                       np.asarray(pmfs, dtype=float), axes=(0, 0))
    M = np.sum(np.asarray(nme, dtype=float), axis=0)
    observed = np.asarray(observed, dtype=float)
    lam_pos = np.maximum(lam, np.finfo(float).tiny)
    with np.errstate(divide='ignore', invalid='ignore'):
        g = np.where(M > 0, (observed + M) / (lam_pos + M), 1.0)
    ll = float(np.sum(np_xlogy(observed, g * lam_pos) - g * lam
                      - gammaln(observed + 1.0)
                      + np_xlogy(M, g) - M * (g - 1.0)))
    return ll + _PEN * float(np.sum(np.minimum(lam, 0.0)))


def _per_bin_parts(lam, M, k, dtype):
    """Per-bin (value, f_lam, f_M, H_ll, H_lM, H_MM) of the profiled lite
    likelihood as a function of (lam, M), deviance-centered, with the
    negative-lam penalty folded into value and f_lam (its own curvature is 0
    a.e., as in ops.binned_vgh)."""
    tiny = jnp.finfo(dtype).tiny
    lam_pos = jnp.maximum(lam, tiny)
    has_mc = M > 0
    den = jnp.maximum(lam_pos + M, tiny)
    g = jnp.where(has_mc, (k + M) / den, 1.0)
    k_safe = jnp.where(k > 0, k, 1.0)

    value = (xlogy(k, jnp.maximum(g * lam_pos, tiny) / k_safe)
             - (g * lam - k) + xlogy(M, g) - M * (g - 1.0)
             + _PEN * jnp.minimum(lam, 0.0))

    inv_lam = 1.0 / lam_pos
    pen_grad = _PEN * (lam < 0).astype(dtype)
    f_lam = k * inv_lam - g + pen_grad
    # ln(gamma) guarded: gamma == 1 exactly where M == 0, so the where keeps
    # the unselected log's cotangent off zero-MC bins
    g_safe = jnp.where(has_mc, g, 1.0)
    f_M = jnp.where(has_mc, jnp.log(g_safe) - (g - 1.0), 0.0)

    # gamma partials (zero where no MC: gamma is pinned at 1, not profiled)
    inv_den = jnp.where(has_mc, 1.0 / den, 0.0)
    g_lam = -g * inv_den                        # dgamma/dlam
    g_M = (lam_pos - k) * inv_den * inv_den     # dgamma/dM
    g_M = jnp.where(has_mc, g_M, 0.0)
    g_lam = jnp.where(has_mc, g_lam, 0.0)

    # Envelope second derivatives: d/d. of f_lam = k/lam - gamma(lam, M) and
    # f_M = ln(gamma) - gamma + 1 along the profiled root
    H_ll = -k * inv_lam * inv_lam - g_lam
    H_lM = -g_M
    H_MM = jnp.where(has_mc, (1.0 / g_safe - 1.0) * g_M, 0.0)
    return value, f_lam, f_M, H_ll, H_lM, H_MM


def binned_bblite_ll(corners, nme_corners, m, t, observed):
    """Value-only deviance-form lite LL on the corner blocks (cheap
    line-search evaluation; excludes the saturated constant)."""
    corners = jnp.asarray(corners)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    observed = jnp.asarray(observed, dtype=corners.dtype)
    K = t.shape[0]
    if K > 0:
        w, _, _ = corner_weight_tables(t)
        P = jnp.tensordot(w, corners, axes=(0, 0))
        M = jnp.tensordot(w, jnp.asarray(nme_corners, corners.dtype)
                          .sum(axis=1), axes=(0, 0))
    else:
        P = corners[0]
        M = jnp.asarray(nme_corners, corners.dtype)[0].sum(axis=0)
    lam = jnp.tensordot(m, P, axes=(0, 0))
    value, _, _, _, _, _ = _per_bin_parts(lam, M, observed, corners.dtype)
    return jnp.sum(value)


def binned_bblite_vgh(corners, nme_corners, m, t, observed):
    """Deviance-form lite LL, gradient and Hessian w.r.t. (m, t) — the
    Barlow-Beeston-lite analog of :func:`blueice_tpu.ops.binned_vgh.binned_vgh`
    with the extra M(t) (morphed total-MC-count) dependence chained through:

        lam_n = sum_s m_s P_{s,n}(t),   M_n = sum_s N_{s,n}(t)

    :param corners: (2^K, S, N) pmf corner templates.
    :param nme_corners: (2^K, S, N) MC-count corner templates.
    :param m: (S,), t: (K,), observed: (N,).
    :return: (ll, g (S+K,), H (S+K, S+K)); saturated constant excluded.
    """
    corners = jnp.asarray(corners)
    nme_c = jnp.asarray(nme_corners, dtype=corners.dtype).sum(axis=1)  # (2^K, N)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    observed = jnp.asarray(observed, dtype=corners.dtype)
    K = t.shape[0]
    S = m.shape[0]

    if K > 0:
        w, wd, wx = corner_weight_tables(t)
        P = jnp.tensordot(w, corners, axes=(0, 0))            # (S, N)
        D = jnp.tensordot(wd, corners, axes=(1, 0))           # (K, S, N)
        X = jnp.tensordot(wx, corners, axes=(2, 0))           # (K, K, S, N)
        Mn = jnp.tensordot(w, nme_c, axes=(0, 0))             # (N,)
        DM = jnp.tensordot(wd, nme_c, axes=(1, 0))            # (K, N)
        XM = jnp.tensordot(wx, nme_c, axes=(2, 0))            # (K, K, N)
    else:
        P = corners[0]
        Mn = nme_c[0]
        D = jnp.zeros((0,) + P.shape, dtype=corners.dtype)
        X = jnp.zeros((0, 0) + P.shape, dtype=corners.dtype)
        DM = jnp.zeros((0,) + Mn.shape, dtype=corners.dtype)
        XM = jnp.zeros((0, 0) + Mn.shape, dtype=corners.dtype)

    lam = jnp.tensordot(m, P, axes=(0, 0))                    # (N,)
    value, f_lam, f_M, H_ll, H_lM, H_MM = _per_bin_parts(
        lam, Mn, observed, corners.dtype)
    ll = jnp.sum(value)

    # Chain to (m, t): dlam/dm_s = P_s, dlam/dt_k = (m.D)_k = Dbar_k,
    # dM/dt_k = DM_k, dM/dm = 0.
    Dbar = jnp.einsum('s,ksn->kn', m, D)                      # (K, N)
    g_m = P @ f_lam                                           # (S,)
    g_t = Dbar @ f_lam + DM @ f_M                             # (K,)

    H_mm = jnp.einsum('sn,n,zn->sz', P, H_ll, P)
    H_mt = (jnp.einsum('sn,n,kn->sk', P, H_ll, Dbar)
            + jnp.einsum('sn,n,kn->sk', P, H_lM, DM)
            + jnp.einsum('ksn,n->sk', D, f_lam))
    Xbar = jnp.einsum('s,kesn->ken', m, X)                    # (K, K, N)
    H_tt = (jnp.einsum('kn,n,en->ke', Dbar, H_ll, Dbar)
            + jnp.einsum('kn,n,en->ke', Dbar, H_lM, DM)
            + jnp.einsum('kn,n,en->ke', DM, H_lM, Dbar)
            + jnp.einsum('kn,n,en->ke', DM, H_MM, DM)
            + jnp.einsum('ken,n->ke', Xbar, f_lam)
            + jnp.einsum('ken,n->ke', XM, f_M))

    if K == 0:
        return ll, g_m, H_mm
    g = jnp.concatenate([g_m, g_t])
    top = jnp.concatenate([H_mm, H_mt], axis=1)
    bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
    H = jnp.concatenate([top, bottom], axis=0)
    return ll, g, H
