"""Single-stream dense (matmul) forms of the closed-form unbinned engine.

The XENON-scale unbinned fit (the reference's science mode,
blueice/likelihood.py:528-573: ~6 sources, 3^4-anchor grid, ~2k events/toy)
exceeds the fused Pallas kernel's VMEM budget, so it runs the XLA
closed-form engine (:mod:`blueice_tpu.ops.unbinned_vgh`). Round 4's form of
that engine first MATERIALIZED corner blocks — ``gather_corners_dense_many``
wrote an (A, 2^K, S, E) tensor per toy for the A~28 line-search candidates
(~22 MB/toy/iteration written and re-read at XENON scale) — and that HBM
round trip, not compute, bound the whole scenario to ~9% of roof
(VERDICT r4 #2).

These forms never materialize corners. Every morph target is a row of ONE
stacked matmul against the toy's flattened anchor tensor:

* vgh: the J = 1 + K + K(K-1)/2 (value / d/dt_k / d2/dt_d dt_e) corner
  weight tables are scattered onto the full G-axis (a (J, C) x (C, G)
  one-hot product — J*G floats) and applied as a single (J, G) x (G, S*E)
  matmul: the anchor tensor streams from HBM exactly once per Newton
  iteration and the MXU does the corner combine.
* value-many: for A parameter candidates, the combined coefficients
  ``coeff[a, g, s] = wfull[a, g] * m[a, s]`` make the A extended-LL rate
  densities one (A, G*S) x (G*S, E) matmul — again one stream of the
  tensor, with the per-candidate log/mask reduction fused behind it.

Matmuls run at ``Precision.HIGHEST`` (float32 accumulation): the scattered
rows have exactly C = 2^K nonzero coefficients per axis point, so the sums
agree with the gather-then-tensordot path to normal float32 rounding (and
to ~1e-15 in float64 — pinned by tests/test_unbinned_dense.py).
"""

import jax.numpy as jnp
from jax import lax

from .binned_vgh import corner_weight_tables
from .fused import corner_ids, corner_ids_batched

__all__ = ['unbinned_vgh_dense', 'unbinned_ll_dense_many']


def _onehot_rows(ids, G, dtype):
    """(..., C) int ids -> (..., C, G) 0/1 rows."""
    return (jnp.arange(G, dtype=jnp.int32) == ids[..., None]).astype(dtype)


def unbinned_vgh_dense(ps, strides, idx, t, m, mask, outlier_likelihood=0.0,
                       inv_ref=None, ref_msum=0.0):
    """Extended-LL (value, gradient, Hessian) w.r.t. (m, t) — one stream.

    Same contract and closed forms as
    :func:`blueice_tpu.ops.unbinned_vgh.unbinned_vgh`, but takes the toy's
    FULL flattened-grid tensor and performs the corner combine inside one
    stacked matmul instead of materializing a (2^K, S, E) corner block.

    :param ps: (G, S, E) per-event densities at every (flattened) anchor.
    :param strides: static tuple of K ints — anchor-grid row strides.
    :param idx: (K,) int32 lower-corner index per axis (pre-clipped by the
      caller, as for gather_corners).
    :param t: (K,) lerp weights; m: (S,) rates; mask: (E,) validity.
    :param inv_ref/ref_msum: optional float32 centering (see
      ops.unbinned_vgh.reference_center).
    :return: (ll, g (S+K,), H (S+K, S+K)).
    """
    ps = jnp.asarray(ps)
    G, S, E = ps.shape
    dt = ps.dtype
    m = jnp.asarray(m, dt)
    t = jnp.asarray(t, dt)
    K = t.shape[0]
    pairs = [(d, e) for d in range(K) for e in range(d + 1, K)]

    if K == 0:
        from .unbinned_vgh import unbinned_vgh
        return unbinned_vgh(ps, m, t, mask, outlier_likelihood,
                            inv_ref=inv_ref, ref_msum=ref_msum)

    ids = corner_ids(strides, idx, K)                         # (C,)
    w, wd, wx = corner_weight_tables(t)
    Wc = jnp.concatenate(
        [w[None], wd] + [wx[d, e][None] for d, e in pairs])   # (J, C)
    Wt = jnp.matmul(Wc.astype(dt), _onehot_rows(ids, G, dt),
                    precision=lax.Precision.HIGHEST)          # (J, G)
    morphs = jnp.matmul(Wt, ps.reshape(G, S * E),
                        precision=lax.Precision.HIGHEST
                        ).reshape(-1, S, E)                   # (J, S, E)
    P = morphs[0]
    D = morphs[1:1 + K]                                       # (K, S, E)
    Xp = morphs[1 + K:]                                       # (NP, S, E)

    lam = jnp.tensordot(m, P, axes=(0, 0))                    # (E,)
    pos = lam > 0
    lam_eff = jnp.where(pos, lam, outlier_likelihood) \
        if outlier_likelihood != 0 else lam
    if inv_ref is None:
        ll = -jnp.sum(m) + jnp.sum(jnp.where(mask, jnp.log(lam_eff), 0.0))
    else:
        ll = (-(jnp.sum(m) - ref_msum)
              + jnp.sum(jnp.where(mask, jnp.log(lam_eff * inv_ref), 0.0)))

    lam_safe = jnp.where(pos, lam, 1.0)
    active = (mask & pos).astype(dt)
    inv_lam = active / lam_safe
    q = inv_lam / lam_safe

    g_m = P @ inv_lam - 1.0                                   # (S,)
    Dbar = jnp.einsum('s,kse->ke', m, D)                      # (K, E)
    g_t = Dbar @ inv_lam                                      # (K,)

    H_mm = -jnp.einsum('se,e,ze->sz', P, q, P)
    H_mt = (-jnp.einsum('se,e,ke->sk', P, q, Dbar)
            + jnp.einsum('kse,e->sk', D, inv_lam))
    H_tt = -jnp.einsum('ke,e,ze->kz', Dbar, q, Dbar)
    if pairs:
        xr = jnp.einsum('s,pse,e->p',
                        m, Xp, inv_lam)                       # (NP,)
        upd = jnp.zeros((K, K), dt)
        for pi, (d, e) in enumerate(pairs):
            upd = upd.at[d, e].add(xr[pi]).at[e, d].add(xr[pi])
        H_tt = H_tt + upd

    g = jnp.concatenate([g_m, g_t])
    top = jnp.concatenate([H_mm, H_mt], axis=1)
    bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
    return ll, g, jnp.concatenate([top, bottom], axis=0)


def unbinned_ll_dense_many(ps, strides, idxs, ts, ms, mask,
                           outlier_likelihood=0.0, inv_ref=None,
                           ref_msum=0.0):
    """Extended LL at A parameter candidates sharing one toy's events —
    one (A, G*S) x (G*S, E) matmul, never materializing corner blocks.

    :param ps: (G, S, E) flattened-grid densities.
    :param idxs: (A, K) int32 lower corners; ts: (A, K); ms: (A, S).
    :return: (A,) log likelihoods (centered when inv_ref is given).
    """
    ps = jnp.asarray(ps)
    G, S, E = ps.shape
    dt = ps.dtype
    ms = jnp.asarray(ms, dt)
    ts = jnp.asarray(ts, dt)
    A = ms.shape[0]
    K = ts.shape[1] if ts.ndim == 2 else 0

    if K:
        ids = corner_ids_batched(strides, idxs, K, A)         # (A, C)
        import jax
        w = jax.vmap(lambda tv: corner_weight_tables(tv)[0])(ts)  # (A, C)
        onehot = _onehot_rows(ids, G, dt)                     # (A, C, G)
        wfull = jnp.einsum('ac,acg->ag', w.astype(dt), onehot)
    else:
        wfull = jnp.ones((A, 1), dt)
    coeff = (wfull[:, :, None] * ms[:, None, :]).reshape(A, G * S)
    lam = jnp.matmul(coeff, ps.reshape(G * S, E),
                     precision=lax.Precision.HIGHEST)         # (A, E)
    lam_eff = jnp.where(lam > 0, lam, outlier_likelihood) \
        if outlier_likelihood != 0 else lam
    msum = jnp.sum(ms, axis=1)
    if inv_ref is None:
        return (-msum + jnp.sum(jnp.where(mask[None], jnp.log(lam_eff), 0.0),
                                axis=1))
    return (-(msum - ref_msum)
            + jnp.sum(jnp.where(mask[None], jnp.log(lam_eff * inv_ref[None]),
                                0.0), axis=1))
