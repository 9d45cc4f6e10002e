"""Pallas TPU kernel: fused analytic (LL, gradient, Hessian) of the extended
unbinned likelihood over per-event anchor density tensors.

Pallas port of :func:`blueice_tpu.ops.unbinned_vgh.unbinned_vgh` — the hot
inner op of every Newton iteration of every unbinned toy fit. Unlike the
binned kernel (:mod:`blueice_tpu.ops.fused`), where one anchor tensor is
shared by every toy and lives in persistent VMEM scratch, the unbinned anchor
tensor is **per toy** (each toy scored its own events), so it arrives as an
ordinary blocked VMEM input: (toys, G, S, E) sliced per grid step. Per toy the
whole corner gather, multilinear combination, per-event residual math and
(S+K)^2 curvature reductions run in one kernel — collapsing the ~dozens of
small XLA ops per Newton iteration (which dominate wall-clock at a few
thousand events/toy) into a single launch.

The event axis must be padded to a multiple of 128 (TPU lane width) with
all-zero density rows and mask False — padded events contribute exactly
nothing to the likelihood or its derivatives.
"""

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_vgh import corner_weight_tables
from .fused import LANE, TOY_BLOCK, _round_up

__all__ = ['unbinned_vgh_fused', 'unbinned_ll_fused_multi',
           'fused_unbinned_supported']


def fused_unbinned_supported(per_toy_shape, dtype=jnp.float32,
                             vmem_budget=10 * 2 ** 20, blk=TOY_BLOCK):
    """Whether a toy block's density tensors fit VMEM."""
    g, s, e = per_toy_shape
    e_pad = _round_up(e, LANE)
    return blk * g * s * e_pad * jnp.dtype(dtype).itemsize <= vmem_budget


# Anchor grids up to this size use the block-vectorized kernels: corner
# weights are scattered onto the FULL grid axis and the whole toy block is
# processed as (blk, ...) batched array ops. At a few thousand events and a
# handful of sources, the per-toy-loop kernel's ops are only ~S*E elements —
# far under the VPU's appetite — and per-op issue overhead dominates; the
# block form makes every op blk x bigger. For large grids the dense
# full-grid morph would waste G/2^K x the FLOPs, so the per-toy gather
# kernel takes over.
FULL_GRID_MAX = 16
BLOCK_VMEM = 6 * 2 ** 20

# Mosaic's static allocator's real demand runs ~3-4x the _block_blk
# working-set model (temps of the unrolled candidate loop are not reused) —
# programs right at the default 16 MB boundary compiled or OOM'd depending
# on layout luck; the shared raised limit makes the budget model, with
# margin, the only gate.
from .fused import VMEM_LIMIT, corner_ids, corner_ids_batched


def _block_blk(G, S, E, K, n_pairs, A=1, dtype_bytes=4):
    """Toy-block size for the block-vectorized kernels under the scoped-VMEM
    budget: the ps block + the morphed accumulators + (value kernel) the
    per-candidate event vectors, which Mosaic's static allocator does not
    reliably reuse across the unrolled candidate loop."""
    per_toy = (G * S * E + (1 + K + n_pairs) * S * E
               + (2 * A + 8) * E) * dtype_bytes
    blk = int(max(8, min(64, BLOCK_VMEM // max(per_toy, 1))))
    return (blk // 8) * 8       # sublane-dim blocks must be multiples of 8


def _scatter_full_grid(ids_b, w_b, G):
    """(B, C) corner ids/weights -> dense (B, G) full-grid weights."""
    B = ids_b.shape[0]
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], ids_b.shape)
    return jnp.zeros((B, G), w_b.dtype).at[rows, ids_b].add(w_b)


def _uvgh_block_kernel(wf_ref, wdf_ref, wxf_ref, m_ref, mask_ref, moff_ref,
                       invref_ref, ps_ref, ll_ref, g_ref, h_ref,
                       *, S, K, G, E, pairs, outlier):
    """Block-vectorized vgh: the whole (blk,) toy block in batched array ops.

    All arrays are kept 2-D with the toy block on the sublane axis and S*E on
    the lane axis (per-source values addressed by STATIC lane slices), so
    every broadcast is lanes-only — Mosaic does not implement
    sublane+lane double broadcasts, which the natural (blk, S, E) layout
    would need.

    wf (blk, G), wdf (blk, K|1, G), wxf (blk, NP|1, G) FULL-grid weights;
    m (blk, S), mask/invref (blk, E), moff (blk, 1), ps (blk, G, S*E); out
    ll (blk, 1), g (blk, P), h (blk, P, P), all VMEM."""
    dtype = ps_ref.dtype
    n_pairs = len(pairs)
    mask = mask_ref[...]                                  # (blk, E)

    def morph(wg):                                        # (blk, G) ->
        out = None                                        #   (blk, S*E)
        for g in range(G):
            term = wg[:, g:g + 1] * ps_ref[:, g]
            out = term if out is None else out + term
        return out

    def src(v, s):                                        # (blk, S*E) ->
        return v[:, s * E:(s + 1) * E]                    #   (blk, E)

    def msum(v):                                          # rate-weighted
        out = None                                        #   source sum
        for s in range(S):
            term = m_ref[:, s:s + 1] * src(v, s)
            out = term if out is None else out + term
        return out                                        # (blk, E)

    P = morph(wf_ref[...])
    D = [morph(wdf_ref[:, k]) for k in range(K)]
    X = [morph(wxf_ref[:, pi]) for pi in range(n_pairs)]

    lam = msum(P)                                         # (blk, E)
    pos = lam > 0
    lam_eff = jnp.where(pos, lam, outlier) if outlier else lam
    lam_safe = jnp.where(pos, lam, 1.0)
    log_terms = jnp.where(mask > 0, jnp.log(lam_eff * invref_ref[...]), 0.0)
    ll_ref[...] = (jnp.sum(log_terms, axis=1)
                   - moff_ref[:, 0])[:, None]

    active = jnp.where((mask > 0) & pos, 1.0, 0.0).astype(dtype)
    inv = active / lam_safe
    q = inv / lam_safe

    Dbar = [msum(D[k]) for k in range(K)]
    gs = [jnp.sum(src(P, s) * inv, axis=1) - 1.0 for s in range(S)]
    gs += [jnp.sum(Dbar[k] * inv, axis=1) for k in range(K)]
    g_ref[...] = jnp.stack(gs, axis=1)

    # Hessian: (S+K)^2/2 pairwise (blk, E) reductions + chain corrections —
    # identical math to the per-toy kernel, batched over the block
    P_dim = S + K
    vecs = [src(P, s) for s in range(S)] + Dbar           # each (blk, E)
    H = [[None] * P_dim for _ in range(P_dim)]
    for i in range(P_dim):
        for j in range(i, P_dim):
            H[i][j] = -jnp.sum(vecs[i] * q * vecs[j], axis=1)
    for s in range(S):
        for k in range(K):
            H[s][S + k] = H[s][S + k] + jnp.sum(src(D[k], s) * inv, axis=1)
    for pi, (d, e) in enumerate(pairs):
        H[S + d][S + e] = H[S + d][S + e] + jnp.sum(msum(X[pi]) * inv,
                                                    axis=1)
    h_ref[...] = jnp.stack(
        [jnp.stack([H[min(i, j)][max(i, j)] for j in range(P_dim)], axis=1)
         for i in range(P_dim)], axis=1)


def _ull_block_kernel(wf_ref, m_ref, mask_ref, moff_ref, invref_ref, ps_ref,
                      ll_ref, *, S, G, E, A, outlier):
    """Block-vectorized value-only kernel: A candidates x the toy block.
    Same 2-D (blk, S*E) layout as :func:`_uvgh_block_kernel`.
    wf (blk, A, G), m (blk, A, S), moff (blk, A); out ll (blk, A) VMEM."""
    mask = mask_ref[...]
    invref = invref_ref[...]
    lls = []
    # Static unroll over candidates (dynamic candidate indexing would need
    # Mosaic-unprovable lane/sublane alignment); lam is accumulated directly
    # with combined (w_g * m_s) coefficients — materializing the morphed
    # (blk, S*E) template per candidate blows the scoped-VMEM budget
    for a in range(A):
        lam = None
        for g in range(G):
            for s in range(S):
                coeff = wf_ref[:, a, g:g + 1] * m_ref[:, a, s:s + 1]
                term = coeff * ps_ref[:, g, s * E:(s + 1) * E]
                lam = term if lam is None else lam + term
        lam_eff = jnp.where(lam > 0, lam, outlier) if outlier else lam
        lls.append(jnp.sum(jnp.where(mask > 0,
                                     jnp.log(lam_eff * invref), 0.0),
                           axis=1)
                   - moff_ref[:, a])
    ll_ref[...] = jnp.stack(lls, axis=1)


@functools.lru_cache(maxsize=None)
def _build_uvgh_block_call(dtype_name, G, S, E, K, B, blk, interpret,
                           outlier):
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    n_pairs_in = max(len(pairs), 1)
    wd_dim = max(K, 1)
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_uvgh_block_kernel, S=S, K=K, G=G, E=E,
                             pairs=pairs, outlier=outlier)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=(jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, P_dim), dtype),
                   jax.ShapeDtypeStruct((B, P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec((blk, G), lambda i: (i, 0)),             # wf
            pl.BlockSpec((blk, wd_dim, G), lambda i: (i, 0, 0)),  # wdf
            pl.BlockSpec((blk, n_pairs_in, G),
                         lambda i: (i, 0, 0)),                    # wxf
            pl.BlockSpec((blk, S), lambda i: (i, 0)),             # m
            pl.BlockSpec((blk, E), lambda i: (i, 0)),             # mask
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),             # moff
            pl.BlockSpec((blk, E), lambda i: (i, 0)),             # invref
            pl.BlockSpec((blk, G, S * E), lambda i: (i, 0, 0)),   # ps
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0)),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0)),
                   pl.BlockSpec((blk, P_dim, P_dim),
                                lambda i: (i, 0, 0))),
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


@functools.lru_cache(maxsize=None)
def _build_ull_block_call(dtype_name, G, S, E, A, B, blk, interpret,
                          outlier):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_ull_block_kernel, S=S, G=G, E=E, A=A,
                             outlier=outlier)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=jax.ShapeDtypeStruct((B, A), dtype),
        in_specs=[
            pl.BlockSpec((blk, A, G), lambda i: (i, 0, 0)),       # wf
            pl.BlockSpec((blk, A, S), lambda i: (i, 0, 0)),       # m
            pl.BlockSpec((blk, E), lambda i: (i, 0)),             # mask
            pl.BlockSpec((blk, A), lambda i: (i, 0)),             # moff
            pl.BlockSpec((blk, E), lambda i: (i, 0)),             # invref
            pl.BlockSpec((blk, G, S * E), lambda i: (i, 0, 0)),   # ps
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0)),
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _uvgh_kernel(ids_ref, w_ref, wd_ref, wx_ref, m_ref, mask_ref, moff_ref,
                 invref_ref, ps_ref, ll_ref, g_ref, h_ref,
                 *, S, K, C, pairs, blk, outlier):
    """Per grid step: ``blk`` toys. ps (blk, G, S, E) VMEM (per-toy anchors);
    ids (blk, C) int32 SMEM; w (blk, C), wd (blk, K|1, C), wx (blk, NP|1, C),
    m (blk, S), mask (blk, E) VMEM; moff (blk, 1) SMEM: the rate term of the
    value (sum m uncentered, sum m - sum m_ref centered); invref (blk, E)
    VMEM: per-event inverse reference densities (ones = uncentered — see
    ops.unbinned_vgh.reference_center; centering keeps every float32 value
    term O(1) at any event count). Out: ll (blk, 1) SMEM, g (blk, P),
    h (blk, P, P) VMEM, P = S + K."""
    dtype = ps_ref.dtype
    n_pairs = len(pairs)

    def one_toy(ti, _):
        P = None
        D = [None] * K
        X = [None] * n_pairs
        for c in range(C):
            row = ps_ref[ti, pl.ds(ids_ref[ti, c], 1)][0]        # (S, E)
            wc = w_ref[ti, c]
            P = wc * row if P is None else P + wc * row
            for d in range(K):
                term = wd_ref[ti, d, c] * row
                D[d] = term if D[d] is None else D[d] + term
            for pi in range(n_pairs):
                term = wx_ref[ti, pi, c] * row
                X[pi] = term if X[pi] is None else X[pi] + term

        m = m_ref[ti, :]                                         # (S,)
        mask = mask_ref[ti, :]                                   # (E,)

        lam = jnp.sum(m[:, None] * P, axis=0)                    # (E,)
        pos = lam > 0
        lam_eff = jnp.where(pos, lam, outlier) if outlier else lam
        lam_safe = jnp.where(pos, lam, 1.0)
        log_terms = jnp.where(mask > 0,
                              jnp.log(lam_eff * invref_ref[ti, :]), 0.0)
        ll_ref[ti, 0] = jnp.sum(log_terms) - moff_ref[ti, 0]

        # Outlier-floored / padded events are parameter-constant: zero weight
        active = jnp.where((mask > 0) & pos, 1.0, 0.0).astype(dtype)
        inv = active / lam_safe                                  # (E,)
        q = inv / lam_safe                                       # (E,)

        g_m = jnp.sum(P * inv[None, :], axis=1) - 1.0            # (S,)
        if K:
            Dbar = jnp.stack([jnp.sum(m[:, None] * D[d], axis=0)
                              for d in range(K)])                # (K, E)
            g_t = jnp.sum(Dbar * inv[None, :], axis=1)           # (K,)
            g_ref[pl.ds(ti, 1), :] = jnp.concatenate([g_m, g_t])[None, :]
        else:
            g_ref[pl.ds(ti, 1), :] = g_m[None, :]

        Pq = P * q[None, :]                                      # (S, E)
        H_mm = -jax.lax.dot_general(Pq, P, (((1,), (1,)), ((), ())),
                                    preferred_element_type=dtype)
        if K:
            H_mt = (-jax.lax.dot_general(Pq, Dbar,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=dtype)
                    + jnp.stack([jnp.sum(D[d] * inv[None, :], axis=1)
                                 for d in range(K)], axis=1))    # (S, K)
            Dbq = Dbar * q[None, :]
            H_tt = -jax.lax.dot_general(Dbq, Dbar,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=dtype)
            if pairs:
                xr = {p: jnp.sum(jnp.sum(m[:, None] * X[pi], axis=0) * inv)
                      for pi, p in enumerate(pairs)}
                zero = jnp.zeros((), dtype=dtype)
                upd = jnp.stack([
                    jnp.stack([xr.get((min(d, e), max(d, e)), zero)
                               if d != e else zero for e in range(K)])
                    for d in range(K)])
                H_tt = H_tt + upd
            top = jnp.concatenate([H_mm, H_mt], axis=1)
            bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
            h_ref[pl.ds(ti, 1)] = jnp.concatenate([top, bottom],
                                                  axis=0)[None]
        else:
            h_ref[pl.ds(ti, 1)] = H_mm[None]
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


def _ull_kernel(ids_ref, w_ref, m_ref, mask_ref, moff_ref, invref_ref,
                ps_ref, ll_ref, *, S, C, A, blk, outlier):
    """Value-only: per grid step, ``blk`` toys x ``A`` parameter candidates
    sharing the toy's events. ids (blk, A, C) SMEM; w (blk, A, C),
    m (blk, A, S), mask (blk, E), invref (blk, E) VMEM; moff (blk, A) SMEM
    (rate value terms, per candidate — see _uvgh_kernel); out ll (blk, A)
    SMEM."""
    def one_toy(ti, _):
        mask = mask_ref[ti, :]
        invref = invref_ref[ti, :]
        for a in range(A):
            P = None
            for c in range(C):
                row = ps_ref[ti, pl.ds(ids_ref[ti, a, c], 1)][0]
                wc = w_ref[ti, a, c]
                P = wc * row if P is None else P + wc * row
            m = m_ref[ti, a, :]
            lam = jnp.sum(m[:, None] * P, axis=0)
            lam_eff = jnp.where(lam > 0, lam, outlier) if outlier else lam
            ll_ref[ti, a] = (jnp.sum(jnp.where(mask > 0,
                                               jnp.log(lam_eff * invref),
                                               0.0))
                             - moff_ref[ti, a])
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


@functools.lru_cache(maxsize=None)
def _build_uvgh_call(dtype_name, G, S, E, K, B, blk, interpret, outlier):
    C = 2 ** K
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    n_pairs_in = max(len(pairs), 1)
    wd_dim = max(K, 1)
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_uvgh_kernel, S=S, K=K, C=C, pairs=pairs,
                             blk=blk, outlier=outlier)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=(jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, P_dim), dtype),
                   jax.ShapeDtypeStruct((B, P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec((blk, C), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),             # ids
            pl.BlockSpec((blk, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # w
            pl.BlockSpec((blk, wd_dim, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # wd
            pl.BlockSpec((blk, n_pairs_in, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # wx
            pl.BlockSpec((blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # m
            pl.BlockSpec((blk, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # mask
            pl.BlockSpec((blk, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),             # moff
            pl.BlockSpec((blk, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # invref
            pl.BlockSpec((blk, G, S, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),             # per-toy ps
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim, P_dim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


@functools.lru_cache(maxsize=None)
def _build_ull_call(dtype_name, G, S, E, C, A, B, blk, interpret, outlier):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_ull_kernel, S=S, C=C, A=A, blk=blk,
                             outlier=outlier)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=jax.ShapeDtypeStruct((B, A), dtype),
        in_specs=[
            pl.BlockSpec((blk, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),             # ids
            pl.BlockSpec((blk, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # w
            pl.BlockSpec((blk, A, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # m
            pl.BlockSpec((blk, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # mask
            pl.BlockSpec((blk, A), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),             # moff
            pl.BlockSpec((blk, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # invref
            pl.BlockSpec((blk, G, S, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),             # per-toy ps
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _pad_batch(arrs, B, B_pad):
    if B_pad == B:
        return arrs
    out = []
    for a in arrs:
        pad = jnp.zeros((B_pad - B,) + a.shape[1:], a.dtype)
        out.append(jnp.concatenate([a, pad]))
    return out


def _uvgh_batched_impl(ps_b, ids_b, w_b, wd_b, wx_b, m_b, mask_b, moff_b,
                       invref_b, interpret, outlier):
    B, G, S, E = ps_b.shape
    C = ids_b.shape[-1]
    K = int(round(np.log2(C)))
    n_pairs = K * (K - 1) // 2
    if G <= FULL_GRID_MAX:
        # Block-vectorized path: full-grid weights, whole-block array ops
        wf = _scatter_full_grid(ids_b, w_b, G)                   # (B, G)
        wd_dim = max(K, 1)
        rows = jnp.broadcast_to(jnp.arange(B)[:, None, None],
                                (B, wd_dim, C))
        ks = jnp.broadcast_to(jnp.arange(wd_dim)[None, :, None],
                              (B, wd_dim, C))
        ids3 = jnp.broadcast_to(ids_b[:, None, :], (B, wd_dim, C))
        wdf = jnp.zeros((B, wd_dim, G), w_b.dtype).at[rows, ks, ids3].add(
            wd_b)
        np_dim = max(n_pairs, 1)
        rows = jnp.broadcast_to(jnp.arange(B)[:, None, None],
                                (B, np_dim, C))
        pis = jnp.broadcast_to(jnp.arange(np_dim)[None, :, None],
                               (B, np_dim, C))
        ids3 = jnp.broadcast_to(ids_b[:, None, :], (B, np_dim, C))
        wxf = jnp.zeros((B, np_dim, G), w_b.dtype).at[rows, pis, ids3].add(
            wx_b[:, :np_dim])
        blk = min(_block_blk(G, S, E, K, n_pairs), B)
        B_pad = _round_up(B, blk)
        ps2 = ps_b.reshape(B, G, S * E)       # 2-D (blk, S*E) kernel layout
        ps2, wf, wdf, wxf, m_b, mask_b, moff_b, invref_b = _pad_batch(
            (ps2, wf, wdf, wxf, m_b, mask_b, moff_b, invref_b), B, B_pad)
        call = _build_uvgh_block_call(str(ps2.dtype), G, S, E, K, B_pad,
                                      blk, interpret, float(outlier))
        ll, g, H = call(wf, wdf, wxf, m_b, mask_b, moff_b, invref_b, ps2)
        return ll[:B, 0], g[:B], H[:B]
    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    ps_b, ids_b, w_b, wd_b, wx_b, m_b, mask_b, moff_b, invref_b = _pad_batch(
        (ps_b, ids_b, w_b, wd_b, wx_b, m_b, mask_b, moff_b, invref_b),
        B, B_pad)
    call = _build_uvgh_call(str(ps_b.dtype), G, S, E, K, B_pad, blk,
                            interpret, float(outlier))
    ll, g, H = call(ids_b, w_b, wd_b, wx_b, m_b, mask_b, moff_b, invref_b,
                    ps_b)
    return ll[:B, 0], g[:B], H[:B]


def _ull_batched_impl(ps_b, ids_b, w_b, m_b, mask_b, moff_b, invref_b,
                      interpret, outlier):
    B, G, S, E = ps_b.shape
    _, A, C = ids_b.shape
    if G <= FULL_GRID_MAX:
        rows = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, A, C))
        cands = jnp.broadcast_to(jnp.arange(A)[None, :, None], (B, A, C))
        wf = jnp.zeros((B, A, G), w_b.dtype).at[rows, cands, ids_b].add(w_b)
        blk = min(_block_blk(G, S, E, 0, 0, A=A), B)
        B_pad = _round_up(B, blk)
        ps2 = ps_b.reshape(B, G, S * E)
        ps2, wf, m_b, mask_b, moff_b, invref_b = _pad_batch(
            (ps2, wf, m_b, mask_b, moff_b, invref_b), B, B_pad)
        call = _build_ull_block_call(str(ps2.dtype), G, S, E, A, B_pad,
                                     blk, interpret, float(outlier))
        return call(wf, m_b, mask_b, moff_b, invref_b, ps2)[:B]
    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    ps_b, ids_b, w_b, m_b, mask_b, moff_b, invref_b = _pad_batch(
        (ps_b, ids_b, w_b, m_b, mask_b, moff_b, invref_b), B, B_pad)
    call = _build_ull_call(str(ps_b.dtype), G, S, E, C, A, B_pad, blk,
                           interpret, float(outlier))
    return call(ids_b, w_b, m_b, mask_b, moff_b, invref_b, ps_b)[:B]


_OP_CACHE = {}


def _broadcast_unbatched(args, in_batched, axis_size):
    out = []
    for arg, batched in zip(args, in_batched):
        if not batched:
            arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
        out.append(arg)
    return out


def _make_uvgh_op(interpret, outlier):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(ps, ids, w, wd, wx, m, mask, moff, invref):
        ll, g, H = _uvgh_batched_impl(ps[None], ids[None], w[None], wd[None],
                                      wx[None], m[None], mask[None],
                                      moff[None], invref[None],
                                      interpret, outlier)
        return ll[0], g[0], H[0]

    @op.def_vmap
    def _vmap(axis_size, in_batched, *args):
        args = _broadcast_unbatched(args, in_batched, axis_size)
        return (_uvgh_batched_impl(*args, interpret, outlier),
                (True, True, True))

    return op


def _make_ull_op(interpret, outlier):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(ps, ids, w, m, mask, moff, invref):
        return _ull_batched_impl(ps[None], ids[None], w[None], m[None],
                                 mask[None], moff[None], invref[None],
                                 interpret, outlier)[0]

    @op.def_vmap
    def _vmap(axis_size, in_batched, *args):
        args = _broadcast_unbatched(args, in_batched, axis_size)
        return _ull_batched_impl(*args, interpret, outlier), True

    return op


def _get_op(kind, interpret, outlier):
    key = (kind, bool(interpret), float(outlier))
    if key not in _OP_CACHE:
        make = _make_uvgh_op if kind == 'vgh' else _make_ull_op
        _OP_CACHE[key] = make(bool(interpret), float(outlier))
    return _OP_CACHE[key]


def unbinned_vgh_fused(ps_toy, strides, idx, t, m, mask, outlier=0.0,
                       interpret=False, inv_ref=None, ref_msum=None):
    """Fused (ll, g, H) of the extended unbinned LL via the Pallas kernel.
    Same contract as :func:`blueice_tpu.ops.unbinned_vgh.unbinned_vgh`, but
    gathers the corner templates itself from the toy's flattened-grid tensor.
    (``ps_toy`` batches per toy under vmap; batching the OTHER way — many
    parameter points against one shared toy — should use
    :func:`unbinned_ll_fused_multi`, which shares the tensor instead of
    broadcasting it.)

    :param ps_toy: (G, S, E) per-event densities at every anchor point, grid
      flattened, E a multiple of 128 (pad events with zero densities).
    :param strides: static tuple of K ints — anchor-grid row strides.
    :param idx: (K,) int32 lower-corner index per axis; t: (K,) lerp weights.
    :param m: (S,) rates; mask: (E,) validity (padding False).
    :param inv_ref: optional (E,) inverse reference densities + ``ref_msum``:
      the value becomes the float32-exact CENTERED log likelihood (see
      ops.unbinned_vgh.reference_center); derivatives are unchanged.
    :return: (ll, g (S+K,), H (S+K, S+K)).
    """
    ps_toy = jnp.asarray(ps_toy)
    G, S, E = ps_toy.shape
    if E % LANE:
        raise ValueError("event axis must be padded to a multiple of %d"
                         % LANE)
    K = len(strides)
    C = 2 ** K
    dt = ps_toy.dtype

    ids = corner_ids(strides, idx, K)
    w, wd, wx = corner_weight_tables(jnp.asarray(t, dt))
    pairs = [(d, e) for d in range(K) for e in range(d + 1, K)]
    wd_in = wd.astype(dt) if K else jnp.zeros((1, C), dt)
    wx_in = (jnp.stack([wx[d, e] for d, e in pairs]).astype(dt)
             if pairs else jnp.zeros((1, C), dt))

    m = jnp.asarray(m, dt)
    moff = jnp.sum(m) - (0.0 if ref_msum is None else ref_msum)
    invref = (jnp.ones((E,), dt) if inv_ref is None
              else jnp.asarray(inv_ref, dt))
    op = _get_op('vgh', interpret, outlier)
    return op(ps_toy, ids, w.astype(dt), wd_in, wx_in, m,
              jnp.asarray(mask, dt), moff[None].astype(dt), invref)


def unbinned_ll_fused_multi(ps_toy, strides, idxs, ts, ms, mask, outlier=0.0,
                            interpret=False, inv_ref=None, ref_msum=None):
    """Extended LL at A parameter candidates sharing one toy's events.

    :param idxs: (A, K) int32 lower corners; ts: (A, K); ms: (A, S).
    :param inv_ref: optional (E,) + ``ref_msum``: centered values (see
      :func:`unbinned_vgh_fused`).
    :return: (A,) log likelihoods.
    """
    ps_toy = jnp.asarray(ps_toy)
    G, S, E = ps_toy.shape
    if E % LANE:
        raise ValueError("event axis must be padded to a multiple of %d"
                         % LANE)
    K = len(strides)
    C = 2 ** K
    dt = ps_toy.dtype

    A = jnp.asarray(ms).shape[0]
    ids = corner_ids_batched(strides, idxs, K, A)                # (A, C)
    w = (jax.vmap(lambda tv: corner_weight_tables(tv)[0])(
        jnp.asarray(ts, dt)) if K
        else jnp.ones((A, 1), dtype=dt))                         # (A, C)

    ms = jnp.asarray(ms, dt)
    moffs = jnp.sum(ms, axis=-1) - (0.0 if ref_msum is None else ref_msum)
    invref = (jnp.ones((E,), dt) if inv_ref is None
              else jnp.asarray(inv_ref, dt))
    op = _get_op('ll', interpret, outlier)
    return op(ps_toy, ids, w, ms, jnp.asarray(mask, dt), moffs.astype(dt),
              invref)
