"""Analytic value+gradient+Hessian of the binned Poisson likelihood in the
(morph-weight, rate) parameterization — one fused pass instead of separate
autodiff value/grad/Hessian evaluations.

The morphed template is multilinear in the per-axis lerp weights t and linear
in the per-source rates m, so every derivative of

    ll(m, t) = sum_n [ k_n log(lambda_n / k_n) - (lambda_n - k_n) ],
    lambda_n = sum_s m_s * P_{s,n}(t),
    P(t)     = sum_{c in {0,1}^K} w_c(t) * C_c            (corner templates)

has a closed form in the corner templates: dP/dt_d lerps the corner
*differences* along axis d, d2P/dt_d dt_e lerps double differences, and
d2P/dt_d^2 = 0. The likelihood curvature follows from

    g_p    = sum_n r_n dlam/dp,            r = k/lambda - 1
    H_pq   = sum_n [ -q_n dlam/dp dlam/dq + r_n d2lam/dpdq ],  q = k/lambda^2.

This is the hot inner loop of every Newton fit over the anchor grid; the
jnp implementation here is the reference/XLA engine, and the Pallas TPU kernel
in :mod:`blueice_tpu.ops.fused` computes the same contract with the anchor
tensor resident in VMEM.
"""

import itertools

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['corner_weight_tables', 'binned_vgh',
           'binned_vgh_log', 'binned_ll_log',
           'gather_corners', 'gather_corners_dense']


def corner_weight_tables(t):
    """Weights of the 2^K corners and their first/second t-derivatives.

    :param t: (K,) lerp weights in [0, 1].
    :return: (w (2^K,), wd (K, 2^K), wx (K, K, 2^K)) where
      w_c = prod_d (c_d ? t_d : 1-t_d), wd[d] = dw/dt_d, wx[d,e] = d2w/dt_d dt_e
      (zero on the diagonal — multilinearity).
    """
    K = t.shape[0]
    if K == 0:
        return (jnp.ones(1, dtype=t.dtype),
                jnp.zeros((0, 1), dtype=t.dtype),
                jnp.zeros((0, 0, 1), dtype=t.dtype))
    corners = list(itertools.product((0, 1), repeat=K))
    w_list, wd_list, wx_list = [], [], []
    for c in corners:
        factors = [t[d] if c[d] else 1.0 - t[d] for d in range(K)]
        dfactors = [1.0 if c[d] else -1.0 for d in range(K)]

        def prod_except(skip):
            out = jnp.ones((), dtype=t.dtype)
            for d in range(K):
                if d not in skip:
                    out = out * factors[d]
            return out

        w_list.append(prod_except(()))
        wd_list.append([dfactors[d] * prod_except((d,)) for d in range(K)])
        wx_list.append([[(dfactors[d] * dfactors[e] * prod_except((d, e)))
                         if d != e else jnp.zeros((), dtype=t.dtype)
                         for e in range(K)] for d in range(K)])
    w = jnp.stack(w_list)                                    # (2^K,)
    wd = jnp.stack([jnp.stack(x) for x in wd_list], axis=1)  # (K, 2^K)
    wx = jnp.stack([jnp.stack([jnp.stack(r) for r in x])
                    for x in wx_list], axis=2)               # (K, K, 2^K)
    return w, wd, wx


def binned_vgh(corners, m, t, observed):
    """Deviance-form LL, gradient and Hessian w.r.t. (m, t) for one dataset.

    :param corners: (2^K, S, N) corner templates around the query point
      (flattened over the K anchor axes in C order; K inferred from t).
    :param m: (S,) per-source expected counts.
    :param t: (K,) per-axis lerp weights.
    :param observed: (N,) observed counts.
    :return: (ll, g (S+K,), H (S+K, S+K)), parameter order [m_1..S, t_1..K].
      ll excludes the saturated-model constant (see
      ops.poisson.binned_poisson_logl_constant).
    """
    corners = jnp.asarray(corners)
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
    else:
        P = corners[0]
        D = jnp.zeros((0,) + P.shape, dtype=corners.dtype)
        X = jnp.zeros((0, 0) + P.shape, dtype=corners.dtype)

    return _assemble_vgh(P, D, X, m, observed, K)


def _assemble_vgh(P, D, X, m, observed, K):
    """Likelihood value/gradient/Hessian from the morphed templates and their
    t-derivatives — shared by the linear (multilinear-lerp) and log
    (geometric) morphing paths, which differ only in how (P, D, X) are built.

    :param P: (S, N) morphed per-source pmfs at the query point.
    :param D: (K, S, N) dP/dt_d.
    :param X: (K, K, S, N) d2P/dt_d dt_e.
    """
    dtype = P.dtype
    lam = jnp.tensordot(m, P, axes=(0, 0))                    # (N,)
    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(observed > 0, observed, 1.0)

    # Negative-expectation penalty (allow_negative sources), matching
    # binned_ll and ops.poisson.binned_poisson_logl — without it the
    # derivatives would REWARD pushing empty bins negative (r = -1 there)
    # while the line-search objective rejects every such candidate, stalling
    # the lane at a non-optimum. The penalty is linear in lambda, so its
    # exact contribution rides along in r (d(penalty)/dlam = 1e6 where
    # lam < 0; its own second derivative in lam is 0 a.e.).
    pen_scale = jnp.asarray(1e6, dtype=dtype)
    ll = (jnp.sum(observed * jnp.log(lam_safe / k_safe) - (lam - observed))
          + pen_scale * jnp.sum(jnp.minimum(lam, 0.0)))
    # Reciprocal form: lam_safe**2 would underflow to 0 for empty bins
    # (lam == tiny) and poison q with 0/0
    inv_lam = 1.0 / lam_safe
    r = (observed * inv_lam - 1.0
         + pen_scale * (lam < 0).astype(dtype))               # (N,)
    q = (observed * inv_lam) * inv_lam                        # (N,)

    # Gradient
    g_m = P @ r                                               # (S,)
    Dbar = jnp.einsum('s,ksn->kn', m, D)                      # (K, N)
    g_t = Dbar @ r                                            # (K,)

    # Hessian blocks
    H_mm = -jnp.einsum('sn,n,zn->sz', P, q, P)                # (S, S)
    H_mt = (-jnp.einsum('sn,n,kn->sk', P, q, Dbar)
            + jnp.einsum('ksn,n->sk', D, r))                  # (S, K)
    Xbar = jnp.einsum('s,kesn->ken', m, X)                    # (K, K, N)
    H_tt = (-jnp.einsum('kn,n,en->ke', Dbar, q, Dbar)
            + jnp.einsum('ken,n->ke', Xbar, r))               # (K, K)

    if K == 0:
        return ll, g_m, H_mm
    g = jnp.concatenate([g_m, g_t])
    top = jnp.concatenate([H_mm, H_mt], axis=1)
    bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
    H = jnp.concatenate([top, bottom], axis=0)
    return ll, g, H


def _log_morph_P(log_corners, mass_corners, w):
    """Morphed pmf P of the geometric (log) template morph at corner weights
    w, plus the intermediates its derivatives need.

    Mirrors morphers.LogMorpher.jax_eval exactly: raw = exp(multilinear lerp
    of the LOG templates), rescaled so each source's total mass is the LINEAR
    lerp of the anchor masses (raw-mass denominator clamped at tiny).

    :param log_corners: (2^K, S, N) LOG corner templates.
    :param mass_corners: (2^K, S) per-corner template masses
      (sum over bins of exp(log template), computed on the FULL template —
      not just in-slice bins — to match the morpher).
    :return: (P (S, N), R (S, N) raw exp-lerp, inv_mass_raw (S,),
      M (S,) lerped target mass).
    """
    L = jnp.tensordot(w, log_corners, axes=(0, 0))            # (S, N)
    R = jnp.exp(L)
    tiny = jnp.finfo(log_corners.dtype).tiny
    mass_raw = jnp.sum(R, axis=-1)                            # (S,)
    inv_mass_raw = 1.0 / jnp.maximum(mass_raw, tiny)
    M = jnp.tensordot(w, mass_corners, axes=(0, 0))           # (S,)
    P = R * (M * inv_mass_raw)[:, None]
    return P, R, inv_mass_raw, M


def binned_vgh_log(log_corners, mass_corners, m, t, observed):
    """binned_vgh for geometric (log) template morphing
    (template_interpolation='log', morphers.LogMorpher): the pmf is
    exp(multilinear lerp of log templates), linearly-rescaled to the lerped
    anchor masses. Same contract and parameter order as :func:`binned_vgh`;
    the t-derivatives carry the exp and the mass-rescale quotient chain, so
    unlike the multilinear case d2P/dt_d^2 != 0.

    :param log_corners: (2^K, S, N) LOG corner templates (the anchor tensor a
      LogMorpher builds).
    :param mass_corners: (2^K, S) per-corner full-template masses.
    """
    log_corners = jnp.asarray(log_corners)
    dtype = log_corners.dtype
    mass_corners = jnp.asarray(mass_corners, dtype=dtype)
    m = jnp.asarray(m, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    observed = jnp.asarray(observed, dtype=dtype)
    K = t.shape[0]

    w, wd, wx = corner_weight_tables(t)
    P, R, inv_mass_raw, M = _log_morph_P(log_corners, mass_corners, w)
    if K == 0:
        D = jnp.zeros((0,) + P.shape, dtype=dtype)
        X = jnp.zeros((0, 0) + P.shape, dtype=dtype)
        return _assemble_vgh(P, D, X, m, observed, K)

    tiny = jnp.finfo(dtype).tiny
    Ld = jnp.tensordot(wd, log_corners, axes=(1, 0))          # (K, S, N)
    Lx = jnp.tensordot(wx, log_corners, axes=(2, 0))          # (K, K, S, N)
    Md = jnp.tensordot(wd, mass_corners, axes=(1, 0))         # (K, S)
    Mx = jnp.tensordot(wx, mass_corners, axes=(2, 0))         # (K, K, S)
    inv_M = 1.0 / jnp.maximum(M, tiny)

    # Raw-mass derivatives: A_d = d(sum R)/dt_d, B_de = d2(sum R)/dt_d dt_e
    A = jnp.einsum('sn,ksn->ks', R, Ld)                       # (K, S)
    B = (jnp.einsum('sn,ksn,esn->kes', R, Ld, Ld)
         + jnp.einsum('sn,kesn->kes', R, Lx))                 # (K, K, S)

    # log-scale chain: scale = M / mass_raw, v_d = d log(scale)/dt_d,
    # w_de = d2 log(scale)/dt_d dt_e
    v = Md * inv_M[None] - A * inv_mass_raw[None]             # (K, S)
    w2 = (Mx * inv_M[None, None]
          - jnp.einsum('ks,es->kes', Md * inv_M[None], Md * inv_M[None])
          - B * inv_mass_raw[None, None]
          + jnp.einsum('ks,es->kes', A * inv_mass_raw[None],
                       A * inv_mass_raw[None]))               # (K, K, S)

    # dP/dt_d = P * u_d with u_d = Ld + v_d; d2P = P * (u_d u_e + Lx + w_de)
    u = Ld + v[:, :, None]                                    # (K, S, N)
    D = P[None] * u                                           # (K, S, N)
    X = P[None, None] * (jnp.einsum('ksn,esn->kesn', u, u)
                         + Lx + w2[:, :, :, None])            # (K, K, S, N)
    return _assemble_vgh(P, D, X, m, observed, K)


def binned_ll_log(log_corners, mass_corners, m, t, observed):
    """Value-only twin of :func:`binned_vgh_log` (cheap accept-step
    evaluation inside the Newton loop)."""
    log_corners = jnp.asarray(log_corners)
    dtype = log_corners.dtype
    mass_corners = jnp.asarray(mass_corners, dtype=dtype)
    m = jnp.asarray(m, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    observed = jnp.asarray(observed, dtype=dtype)
    w, _, _ = corner_weight_tables(t)
    P, _, _, _ = _log_morph_P(log_corners, mass_corners, w)
    lam = jnp.tensordot(m, P, axes=(0, 0))
    lam_safe = jnp.maximum(lam, jnp.finfo(dtype).tiny)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    return (jnp.sum(observed * jnp.log(lam_safe / k_safe) - (lam - observed))
            + 1e6 * jnp.sum(jnp.minimum(lam, 0.0)))


def binned_ll(corners, m, t, observed):
    """Value-only deviance-form LL on the corner block (cheap accept-step
    evaluation inside the Newton loop)."""
    corners = jnp.asarray(corners)
    m = jnp.asarray(m, dtype=corners.dtype)
    t = jnp.asarray(t, dtype=corners.dtype)
    observed = jnp.asarray(observed, dtype=corners.dtype)
    K = t.shape[0]
    if K > 0:
        w, _, _ = corner_weight_tables(t)
        P = jnp.tensordot(w, corners, axes=(0, 0))
    else:
        P = corners[0]
    lam = jnp.tensordot(m, P, axes=(0, 0))
    lam_safe = jnp.maximum(lam, jnp.finfo(corners.dtype).tiny)
    k_safe = jnp.where(observed > 0, observed, 1.0)
    # Penalize negative expectations (allow_negative sources) like
    # ops.poisson.binned_poisson_logl — the line search then rejects
    # candidates in the unphysical region
    return (jnp.sum(observed * jnp.log(lam_safe / k_safe) - (lam - observed))
            + 1e6 * jnp.sum(jnp.minimum(lam, 0.0)))


def gather_corners(tensor, idx, K):
    """Corner block (2^K, *extra) around integer lower-corner indices ``idx``
    from a tensor with K leading anchor axes (the extra shape is everything
    after the K anchor axes)."""
    tensor = jnp.asarray(tensor)
    extra_shape = tensor.shape[K:]
    zero = jnp.zeros((), dtype=jnp.int32)
    starts = tuple(jnp.asarray(i, jnp.int32) for i in idx) \
        + (zero,) * len(extra_shape)
    block = lax.dynamic_slice(tensor, starts, (2,) * K + extra_shape)
    return block.reshape((2 ** K,) + extra_shape)


def _norm_start(i, g):
    """dynamic_slice start normalization for a 2-wide slice on an axis of
    size g: negative starts get a single +g wrap, then clamp to [0, g-2]."""
    i = jnp.where(i < 0, i + g, i)
    return jnp.clip(i, 0, max(g - 2, 0))


def gather_corners_dense(tensor, idx, K):
    """:func:`gather_corners` as a one-hot contraction over the FLATTENED
    anchor axis — the TPU shape of the corner selection.

    Under ``vmap`` (one lane per toy, each with its own corner cell),
    ``gather_corners``'s dynamic_slice lowers to an elementwise XLA gather,
    which serializes on TPU and dominated the unbinned Newton loop (measured:
    the whole fit ran ~40x slower than its closed-form vgh kernel at
    XENON-scale shapes). This form is a (2^K, G) x (G, prod(extra)) matmul:
    it rides the MXU and streams the tensor at HBM bandwidth instead of
    gathering. Bit-exact: the one-hot coefficients are 0/1 and HIGHEST
    precision reconstructs each selected float32 value exactly (the bf16
    split passes sum back to the original value; zero terms contribute
    exactly zero). Out-of-range indices are normalized exactly as
    dynamic_slice normalizes starts in :func:`gather_corners` (negatives
    get one +g wrap, then clamp to [0, g-2] per axis) — without this an
    index of g-1 would one-hot-match nothing and silently return zero
    rows."""
    tensor = jnp.asarray(tensor)
    grid_shape = tensor.shape[:K]
    extra_shape = tensor.shape[K:]
    G = int(np.prod(grid_shape))
    strides = tuple(int(np.prod(grid_shape[d + 1:], dtype=int))
                    for d in range(K))
    base = sum(_norm_start(jnp.asarray(i, jnp.int32), g) * s
               for i, s, g in zip(idx, strides, grid_shape))
    offsets = jnp.asarray(
        [sum(o * s for o, s in zip(offs, strides))
         for offs in itertools.product((0, 1), repeat=K)], jnp.int32)
    onehot = (jnp.arange(G, dtype=jnp.int32)[None, :]
              == (base + offsets)[:, None]).astype(tensor.dtype)
    block = jnp.matmul(onehot, tensor.reshape((G, -1)),
                       precision=lax.Precision.HIGHEST)
    return block.reshape((2 ** K,) + extra_shape)


def gather_corners_dense_many(tensor, idxs, K):
    """Corner blocks for MANY query cells sharing ONE streaming read of the
    tensor: (A, 2^K, *extra) from lower-corner index matrix ``idxs`` (A, K).

    The line-search evaluates ~a dozen parameter candidates per Newton
    iteration; extracting their corner blocks one by one re-reads the anchor
    tensor from HBM per candidate. Stacking the one-hot rows makes the whole
    batch a single (A*2^K, G) x (G, prod(extra)) matmul — the tensor
    streams once per iteration regardless of the candidate count. Bit-exact
    like :func:`gather_corners_dense`, including its out-of-range start
    normalization."""
    tensor = jnp.asarray(tensor)
    idxs = jnp.asarray(idxs, jnp.int32)
    A = idxs.shape[0]
    grid_shape = tensor.shape[:K]
    extra_shape = tensor.shape[K:]
    G = int(np.prod(grid_shape))
    strides_py = [int(np.prod(grid_shape[d + 1:], dtype=int))
                  for d in range(K)]
    strides = jnp.asarray(strides_py, jnp.int32)
    gs = jnp.asarray(grid_shape, jnp.int32)
    idxs = jnp.where(idxs < 0, idxs + gs[None, :], idxs)
    hi = jnp.asarray([max(g - 2, 0) for g in grid_shape], jnp.int32)
    idxs = jnp.clip(idxs, 0, hi[None, :])
    base = jnp.sum(idxs * strides[None, :], axis=1)          # (A,)
    offsets = jnp.asarray(
        [sum(o * s for o, s in zip(offs, strides_py))
         for offs in itertools.product((0, 1), repeat=K)], jnp.int32)
    flat_idx = (base[:, None] + offsets[None, :]).reshape(-1)  # (A * 2^K,)
    onehot = (jnp.arange(G, dtype=jnp.int32)[None, :]
              == flat_idx[:, None]).astype(tensor.dtype)
    block = jnp.matmul(onehot, tensor.reshape((G, -1)),
                       precision=lax.Precision.HIGHEST)
    return block.reshape((A, 2 ** K) + extra_shape)
