"""Analytic value+gradient+Hessian of the Beeston-Barlow-adjusted binned
Poisson likelihood in the (rate, morph-weight) parameterization.

Extends :mod:`blueice_tpu.ops.binned_vgh` to models where one source's
template comes from finite MC statistics and its per-bin expectation is
profiled with the closed-form Beeston-Barlow root
(:func:`blueice_tpu.ops.beeston_barlow.bb_single_adjust`, reference:
blueice/likelihood.py:618-660).

The key structural fact: after the adjustment, the expected count in bin n is

    lam_n = U_n + pw_n * A_n,      pw_n = m_i * P_n / N_n,

where P_n / N_n are the morphed pmf / MC-count of the finite source, U_n the
morphed expectation of all other sources, and A_n the profiled root — so
``lam_n = LAM(P_n, N_n, U_n, m_i, T)`` is a *scalar function of five per-bin
inputs* (T = sum_n N_n enters only through the U == 0 special case). Its
per-bin gradient and 5x5 Hessian come from (vectorized, elementwise) autodiff;
the chain to the fit parameters (m, t) is closed-form because the inputs are
multilinear in the corner templates — the same D / X difference tables the
plain engine uses. One pass over the bins yields (ll, g, H), versus the
(S+K+1) reverse passes a black-box autodiff Hessian needs.
"""

import jax
import jax.numpy as jnp

from .binned_vgh import corner_weight_tables

__all__ = ['bb_lambda', 'bb_lam_parts', 'bb_lam_vgh', 'binned_bb_vgh',
           'binned_bb_ll']


def bb_lambda(P, N, U, M, T, d):
    """Beeston-Barlow-adjusted expected count for one bin (elementwise-safe,
    differentiable in all five inputs).

    :param P: morphed pmf of the finite-MC source in this bin.
    :param N: morphed MC counts of the finite-MC source in this bin.
    :param U: expected counts from all other sources in this bin.
    :param M: expected total counts of the finite-MC source (rate-multiplied).
    :param T: total MC counts of the finite source over all bins.
    :param d: observed counts in this bin.
    """
    tiny = jnp.finfo(jnp.result_type(P)).tiny
    has_mc = N > 0
    N_safe = jnp.where(has_mc, N, 1.0)
    pw = jnp.where(has_mc, M * P / N_safe, 0.0)
    pw_safe = jnp.where(pw > 0, pw, 1.0)

    # General root of the per-bin quadratic (beeston_barlow_root2), written
    # with guarded intermediates so autodiff stays finite on excluded
    # branches. Discriminant in the cancellation-free b^2 + 4*a*U*N form
    # (every term nonnegative), not the expanded mixed-sign polynomial.
    b_lin = U * (pw_safe + 1.0) - pw_safe * (N + d)
    disc = (b_lin * b_lin
            + 4.0 * pw_safe * (pw_safe + 1.0) * (U * N))
    root = jnp.sqrt(jnp.maximum(disc, tiny))
    # Stable larger root (Citardauq for b >= 0): the naive (-b + root)/(2a)
    # cancels catastrophically as pw -> 0 with U > 0 (see
    # likelihood.beeston_barlow_root2). The constant coefficient -U*N is
    # <= 0, so root >= |b| and both branches are nonnegative in fp.
    sel_hi = b_lin >= 0
    # Double-where: each branch's denominator is where-guarded to 1 on the
    # rows it does not serve BEFORE the division — otherwise reverse-mode AD
    # of the unselected branch (cotangent 0) meets an inf partial and
    # produces 0 * inf = NaN
    den_hi = jnp.maximum(jnp.where(sel_hi, b_lin + root, 1.0), tiny)
    den_lo = jnp.where(sel_hi, 1.0, 2.0 * pw_safe * (pw_safe + 1.0))
    A_general = jnp.where(sel_hi, 2.0 * U * N / den_hi,
                          (root - b_lin) / den_lo)
    # U == 0 bins use the dedicated closed form, which couples in the global
    # MC total through p_calibration = M / T
    A_special = (d + N) / (1.0 + M / T)
    A = jnp.where(U == 0, A_special, A_general)
    return U + jnp.where(pw > 0, pw * A, 0.0)


# Per-bin gradient and Hessian of LAM w.r.t. its five inputs, vectorized over
# bins. d is a non-differentiated auxiliary. These autodiff twins are kept as
# the test oracle for the closed forms below (tests/test_BeestonBarlow.py);
# production paths use bb_lam_parts / bb_lam_vgh, whose graph is a flat
# elementwise expression (the vmapped per-bin autodiff Hessian used through
# round 2 produced programs the remote TPU compiler could not handle at the
# full 50x62-bin XENON scale).
def _lam_of_v(v, d):
    return bb_lambda(v[0], v[1], v[2], v[3], v[4], d)


_lam_grad = jax.vmap(jax.grad(_lam_of_v), in_axes=(0, 0))
_lam_hess = jax.vmap(jax.hessian(_lam_of_v), in_axes=(0, 0))
_lam_val = jax.vmap(_lam_of_v, in_axes=(0, 0))


def bb_lam_parts(P, N, U, M, T, d):
    """Closed-form value, gradient and Hessian of :func:`bb_lambda` w.r.t. its
    five inputs, elementwise (no autodiff — safe inside Pallas kernels and
    cheap for XLA at any bin count).

    The general-branch root A solves the quadratic

        F(A) = a A^2 + b A + c = 0,
        a = pw (pw + 1),  b = U (pw + 1) - pw (N + d),  c = -U N

    (the reference's discriminant, blueice/likelihood.py:704-706, is exactly
    b^2 - 4ac under this identification), so all derivatives follow from
    implicit differentiation with dF/dA = sqrt(disc):

        A_th   = -F_th / R
        A_thph = -(F_thph + F_thA A_ph + F_phA A_th + 2 a A_th A_ph) / R

    chained through pw = M P / N.  Branch selection (pw <= 0 inert bin,
    U == 0 special case, general root) mirrors the jnp.where structure of
    bb_lambda, so gradients agree with its autodiff to rounding.

    :return: (lam, gam, om): lam elementwise; gam a 5-tuple of elementwise
      d lam / d(P, N, U, M, T); om a dict {(i, j): elementwise d2 lam} over
      upper-triangle input pairs i <= j (absent keys are identically zero).
    """
    dtype = jnp.result_type(P, N, U, M, T)
    one = jnp.ones((), dtype)
    P, N, U, M, T, d = (jnp.asarray(x, dtype) * one
                        for x in (P, N, U, M, T, d))
    tiny = jnp.finfo(dtype).tiny

    has_mc = N > 0
    N_s = jnp.where(has_mc, N, 1.0)
    p = jnp.where(has_mc, M * P / N_s, 0.0)
    active = p > 0
    p_s = jnp.where(active, p, 1.0)

    # ---- general branch (active, U != 0) ----
    a = p_s * (p_s + 1.0)
    b = U * (p_s + 1.0) - p_s * (N + d)
    disc = b * b + 4.0 * U * N * a
    R = jnp.sqrt(jnp.maximum(disc, tiny))
    # Stable larger root (Citardauq for b >= 0; see bb_lambda above,
    # including the double-where denominator guards). The implicit-
    # differentiation derivatives below depend only on (A, R, a, b), not on
    # which algebraic form produced A.
    sel_hi = b >= 0
    den_hi = jnp.maximum(jnp.where(sel_hi, b + R, 1.0), tiny)
    den_lo = jnp.where(sel_hi, 1.0, 2.0 * a)
    A = jnp.where(sel_hi, 2.0 * U * N / den_hi, (R - b) / den_lo)

    F_p = (2.0 * p_s + 1.0) * A * A + (U - N - d) * A
    F_U = (p_s + 1.0) * A - N
    F_N = -p_s * A - U
    inv_R = 1.0 / R
    A_p = -F_p * inv_R
    A_U = -F_U * inv_R
    A_N = -F_N * inv_R

    F_pA = 2.0 * (2.0 * p_s + 1.0) * A + (U - N - d)
    F_UA = p_s + 1.0
    F_NA = -p_s
    two_a = 2.0 * a
    A_pp = -(2.0 * A * A + 2.0 * F_pA * A_p + two_a * A_p * A_p) * inv_R
    A_pU = -(A + F_pA * A_U + F_UA * A_p + two_a * A_p * A_U) * inv_R
    A_pN = -(-A + F_pA * A_N + F_NA * A_p + two_a * A_p * A_N) * inv_R
    A_UU = -(2.0 * F_UA * A_U + two_a * A_U * A_U) * inv_R
    A_UN = -(-1.0 + F_UA * A_N + F_NA * A_U + two_a * A_U * A_N) * inv_R
    A_NN = -(2.0 * F_NA * A_N + two_a * A_N * A_N) * inv_R

    L_p = A + p_s * A_p
    L_U = 1.0 + p_s * A_U
    L_N = p_s * A_N
    L_pp = 2.0 * A_p + p_s * A_pp
    L_pU = A_U + p_s * A_pU
    L_pN = A_N + p_s * A_pN
    L_UU = p_s * A_UU
    L_UN = p_s * A_UN
    L_NN = p_s * A_NN

    # pw = M P / N partials (exact in the active branch where P, M, N > 0)
    inv_N = 1.0 / N_s
    p_P = M * inv_N
    p_M = P * inv_N
    p_N = -p_s * inv_N
    p2_PN = -p_P * inv_N
    p2_PM = inv_N
    p2_NN = 2.0 * p_s * inv_N * inv_N
    p2_NM = -p_M * inv_N

    g_gen = (L_p * p_P,
             L_N + L_p * p_N,
             L_U,
             L_p * p_M,
             jnp.zeros_like(p))
    o_gen = {
        (0, 0): L_pp * p_P * p_P,
        (0, 1): L_pp * p_P * p_N + L_pN * p_P + L_p * p2_PN,
        (0, 2): L_pU * p_P,
        (0, 3): L_pp * p_P * p_M + L_p * p2_PM,
        (1, 1): (L_pp * p_N * p_N + 2.0 * L_pN * p_N + L_NN
                 + L_p * p2_NN),
        (1, 2): L_pU * p_N + L_UN,
        (1, 3): L_pp * p_N * p_M + L_pN * p_M + L_p * p2_NM,
        (2, 2): L_UU,
        (2, 3): L_pU * p_M,
        (3, 3): L_pp * p_M * p_M,
    }

    # ---- special branch (active, U == 0): A = (d + N) / (1 + M / T) ----
    T_s = jnp.where(T > 0, T, 1.0)
    beta = 1.0 + M / T_s
    inv_b = 1.0 / beta
    inv_T = 1.0 / T_s
    As = (d + N) * inv_b
    As_N = inv_b
    As_M = -As * inv_b * inv_T
    As_T = As * M * inv_b * inv_T * inv_T
    As_NM = -inv_b * inv_b * inv_T
    As_NT = M * inv_b * inv_b * inv_T * inv_T
    As_MM = 2.0 * (d + N) * inv_b ** 3 * inv_T * inv_T
    As_MT = (d + N) * (inv_b ** 2 * inv_T ** 2
                       - 2.0 * M * inv_b ** 3 * inv_T ** 3)
    As_TT = (d + N) * M * (2.0 * M * inv_b ** 3 * inv_T ** 4
                           - 2.0 * inv_b ** 2 * inv_T ** 3)

    g_spe = (p_P * As,
             p_N * As + p_s * As_N,
             jnp.ones_like(p),
             p_M * As + p_s * As_M,
             p_s * As_T)
    o_spe = {
        (0, 1): p2_PN * As + p_P * As_N,
        (0, 3): p2_PM * As + p_P * As_M,
        (0, 4): p_P * As_T,
        (1, 1): p2_NN * As + 2.0 * p_N * As_N,
        (1, 3): p2_NM * As + p_N * As_M + p_M * As_N + p_s * As_NM,
        (1, 4): p_N * As_T + p_s * As_NT,
        (3, 3): 2.0 * p_M * As_M + p_s * As_MM,
        (3, 4): p_M * As_T + p_s * As_MT,
        (4, 4): p_s * As_TT,
    }

    # ---- select branches (inert bins: lam = U, d lam / dU = 1) ----
    special = active & (U == 0)
    general = active & (U != 0)
    A_sel = jnp.where(special, As, A)
    lam = U + jnp.where(active, p_s * A_sel, 0.0)

    zero = jnp.zeros_like(p)
    gam = []
    for i in range(5):
        gi = jnp.where(general, g_gen[i], zero)
        gi = jnp.where(special, g_spe[i], gi)
        if i == 2:
            gi = jnp.where(active, gi, 1.0)
        gam.append(gi)
    # d lam / dM at EXACTLY M == 0 on a real template bin (P, N > 0): the
    # inert-branch gate (pw > 0) would report 0, silently pinning a fit that
    # starts (or underflows) at rate 0 — but the limit is finite and nonzero:
    # lam = U + (M P / N) A with A -> N (general) or d + N (U == 0 special at
    # beta = 1), so d lam/dM -> P, resp. (P / N)(d + N). The autodiff twin
    # bb_lambda cannot see this limit (its where-branch zeroes it); the
    # closed form is strictly better here.
    at_zero_M = has_mc & (P > 0) & (M == 0)
    gam3_lim = jnp.where(U == 0, (P * jnp.where(has_mc, 1.0 / N_s, 0.0))
                         * (d + N), P)
    gam[3] = jnp.where(at_zero_M, gam3_lim, gam[3])
    om = {}
    for key in set(o_gen) | set(o_spe):
        v = jnp.where(general, o_gen.get(key, zero), zero)
        v = jnp.where(special, o_spe.get(key, zero), v)
        om[key] = v
    return lam, tuple(gam), om


def bb_lam_vgh(v, d):
    """Stacked-layout wrapper over :func:`bb_lam_parts` matching the autodiff
    twins: v (N, 5) -> (lam (N,), gam (N, 5), om (N, 5, 5))."""
    lam, gam, om_d = bb_lam_parts(v[:, 0], v[:, 1], v[:, 2], v[:, 3],
                                  v[:, 4], d)
    gam = jnp.stack(gam, axis=-1)
    zero = jnp.zeros_like(lam)
    om = jnp.stack([
        jnp.stack([om_d.get((min(i, j), max(i, j)), zero)
                   for j in range(5)], axis=-1)
        for i in range(5)], axis=-2)
    return lam, gam, om


def _morphed(corners_ps, corners_nme, m, t, bb_i):
    """Morphed building blocks shared by the value and vgh paths."""
    K = t.shape[0]
    if K > 0:
        w, wd, wx = corner_weight_tables(t)
        P_all = jnp.tensordot(w, corners_ps, axes=(0, 0))      # (S, N)
        N_all = jnp.tensordot(w, corners_nme, axes=(0, 0))     # (S, N)
        D = jnp.tensordot(wd, corners_ps, axes=(1, 0))         # (K, S, N)
        DN = jnp.tensordot(wd, corners_nme, axes=(1, 0))       # (K, S, N)
        X = jnp.tensordot(wx, corners_ps, axes=(2, 0))         # (K, K, S, N)
        XN = jnp.tensordot(wx, corners_nme, axes=(2, 0))       # (K, K, S, N)
    else:
        P_all, N_all = corners_ps[0], corners_nme[0]
        zero = jnp.zeros((0,) + P_all.shape, dtype=P_all.dtype)
        zero2 = jnp.zeros((0, 0) + P_all.shape, dtype=P_all.dtype)
        D = DN = zero
        X = XN = zero2

    S = m.shape[0]
    other = (jnp.arange(S) != bb_i).astype(m.dtype)
    m_other = m * other
    U = jnp.tensordot(m_other, P_all, axes=(0, 0))             # (N,)
    T = jnp.sum(N_all[bb_i])
    v = jnp.stack([P_all[bb_i], N_all[bb_i], U,
                   jnp.broadcast_to(m[bb_i], U.shape),
                   jnp.broadcast_to(T, U.shape)], axis=-1)     # (N, 5)
    return P_all, N_all, D, DN, X, XN, m_other, other, v


def binned_bb_vgh(corners_ps, corners_nme, m, t, observed, bb_i):
    """Deviance-form LL, gradient and Hessian w.r.t. (m, t) with the
    Beeston-Barlow adjustment of source ``bb_i`` profiled per bin.

    :param corners_ps: (2^K, S, N) pmf corner templates around the query point.
    :param corners_nme: (2^K, S, N) MC-count corner templates (same layout).
    :param m: (S,) per-source expected counts (rate-multiplied).
    :param t: (K,) per-axis lerp weights.
    :param observed: (N,) observed counts.
    :param bb_i: static int index of the finite-MC source.
    :return: (ll, g (S+K,), H (S+K, S+K)), parameter order [m_1..S, t_1..K];
      ll excludes the saturated-model constant.
    """
    corners_ps = jnp.asarray(corners_ps)
    dtype = corners_ps.dtype
    corners_nme = jnp.asarray(corners_nme, dtype=dtype)
    m = jnp.asarray(m, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    observed = jnp.asarray(observed, dtype=dtype)
    K = t.shape[0]
    S = m.shape[0]
    n_par = S + K

    P_all, N_all, D, DN, X, XN, m_other, other, v = _morphed(
        corners_ps, corners_nme, m, t, bb_i)
    N = v.shape[0]

    lam, gam, om = bb_lam_vgh(v, observed)                      # closed form

    # Input Jacobian J (N, 5, n_par) and second-derivative tensor T2
    # (N, 5, n_par, n_par); inputs are multilinear in (m, t), so these are the
    # corner-difference tables arranged per input.
    J = jnp.zeros((N, 5, n_par), dtype=dtype)
    T2 = jnp.zeros((N, 5, n_par, n_par), dtype=dtype)
    if K > 0:
        DU = jnp.einsum('s,ksn->kn', m_other, D)                # (K, N)
        SN = jnp.sum(DN[:, bb_i, :], axis=-1)                   # (K,)
        SXN = jnp.sum(XN[:, :, bb_i, :], axis=-1)               # (K, K)
        J = J.at[:, 0, S:].set(D[:, bb_i, :].T)
        J = J.at[:, 1, S:].set(DN[:, bb_i, :].T)
        J = J.at[:, 2, S:].set(DU.T)
        J = J.at[:, 4, S:].set(jnp.broadcast_to(SN, (N, K)))
        T2 = T2.at[:, 0, S:, S:].set(
            jnp.moveaxis(X[:, :, bb_i, :], -1, 0))
        T2 = T2.at[:, 1, S:, S:].set(
            jnp.moveaxis(XN[:, :, bb_i, :], -1, 0))
        XU = jnp.einsum('s,kesn->ken', m_other, X)               # (K, K, N)
        T2 = T2.at[:, 2, S:, S:].set(jnp.moveaxis(XU, -1, 0))
        # d2U/dm_s dt_k = D[k, s] for s != bb_i
        DmT = jnp.einsum('ksn,s->nsk', D, other)                 # (N, S, K)
        T2 = T2.at[:, 2, :S, S:].set(DmT)
        T2 = T2.at[:, 2, S:, :S].set(jnp.swapaxes(DmT, 1, 2))
        T2 = T2.at[:, 4, S:, S:].set(jnp.broadcast_to(SXN, (N, K, K)))
    # dU/dm_s = P_s for s != bb_i; dM/dm_i = 1
    J = J.at[:, 2, :S].set((P_all * other[:, None]).T)
    J = J.at[:, 3, bb_i].set(1.0)

    dlam = jnp.einsum('nv,nvp->np', gam, J)                      # (N, n_par)
    d2lam = (jnp.einsum('nvp,nvw,nwq->npq', J, om, J)
             + jnp.einsum('nv,nvpq->npq', gam, T2))              # (N, P, P)

    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    ll = jnp.sum(observed * jnp.log(lam_safe / k_safe) - (lam - observed))
    inv_lam = 1.0 / lam_safe
    r = observed * inv_lam - 1.0
    q = (observed * inv_lam) * inv_lam

    g = jnp.einsum('n,np->p', r, dlam)
    H = (-jnp.einsum('np,n,nq->pq', dlam, q, dlam)
         + jnp.einsum('n,npq->pq', r, d2lam))
    return ll, g, H


def binned_bb_ll(corners_ps, corners_nme, m, t, observed, bb_i):
    """Value-only deviance-form LL with the Beeston-Barlow adjustment (cheap
    accept-step evaluation inside the Newton loop)."""
    corners_ps = jnp.asarray(corners_ps)
    dtype = corners_ps.dtype
    corners_nme = jnp.asarray(corners_nme, dtype=dtype)
    m = jnp.asarray(m, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    observed = jnp.asarray(observed, dtype=dtype)

    *_, v = _morphed(corners_ps, corners_nme, m, t, bb_i)
    lam = _lam_val(v, observed)
    lam_safe = jnp.maximum(lam, jnp.finfo(dtype).tiny)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    return jnp.sum(observed * jnp.log(lam_safe / k_safe) - (lam - observed))
