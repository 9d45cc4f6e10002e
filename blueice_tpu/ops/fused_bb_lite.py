"""Pallas TPU kernel: fused (LL, gradient, Hessian) of the Barlow-Beeston-
*lite* binned Poisson likelihood over anchor templates.

Same VMEM-resident design as :mod:`blueice_tpu.ops.fused_bb` (the full
one-source Beeston-Barlow kernel), but for the HistFactory-style lite
construction of :mod:`blueice_tpu.ops.bb_lite`: one profiled scale per bin on
the TOTAL expectation, closed-form root gamma = (k + M)/(lam + M). Two
tensors stay resident in VMEM scratch across the sequential grid steps: the
pmf anchor tensor (G, S, N) and the TOTAL MC-count anchor rows (G, N) —
the lite root only ever sees the per-bin MC counts summed over sources, so
the caller pre-sums them (fitter: ``nme_tensor.sum(source axis)``).

The per-bin math is exactly :func:`blueice_tpu.ops.bb_lite._per_bin_parts`
(shared code — elementwise closed forms, so it traces identically inside the
kernel), which keeps this kernel bit-comparable to the jnp analytic engine
``binned_bblite_vgh``/``binned_bblite_ll`` and keeps the compiled program
small at any bin count. The chain from the two per-bin inputs (lam, M) to
the fit parameters (m, t) uses the same corner-difference tables as the
plain kernel; the (S+K)^2 curvature assembly runs as small MXU contractions.

Bin axes must be padded to a multiple of 128 with all-zero
template/count/data bins — such bins take the inert branch (lam = 0, M = 0,
gamma = 1) and contribute exactly nothing to the likelihood or its
derivatives.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_vgh import corner_weight_tables
from . import fused
from .fused import (VMEM_LIMIT, corner_ids, corner_ids_batched,
                    _dense_combine_rows)
from .bb_lite import _per_bin_parts

__all__ = ['binned_bblite_vgh_fused', 'binned_bblite_ll_fused_multi',
           'fused_bblite_supported']

LANE = 128
TOY_BLOCK = 8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_bblite_supported(anchor_flat_shape, dtype=jnp.float32,
                           vmem_budget=10 * 2 ** 20):
    """Whether the pmf anchor tensor plus the total-MC-count rows fit the
    VMEM-resident kernel."""
    g, s, n = anchor_flat_shape
    n_pad = _round_up(n, LANE)
    itemsize = jnp.dtype(dtype).itemsize
    return g * (s + 1) * n_pad * itemsize <= vmem_budget


def _bblite_toy_terms(scr_ps, scr_nme, id_of, w_of, m, obs, *, S, K, C,
                      pairs, dtype):
    """Morph + closed-form lite math for one toy (or one candidate): returns
    (ll, g, H), the latter two None on the value-only path.

    ``w_of(c)`` returns (w_c, wd_c (K,), wx_c (n_pairs,)) corner weights, the
    latter two None on the value-only path; ``id_of(c)`` returns the scalar
    corner id into the resident tensors (scalar-wise because SMEM supports
    only scalar loads on TPU).
    """
    n_pairs = len(pairs)
    want_d = w_of(0)[1] is not None

    Pm = None                       # (S, N) morphed pmfs
    Mn = None                       # (N,)  morphed total MC counts
    D = [None] * K                  # dP/dt_k     (S, N)
    DM = [None] * K                 # dM/dt_k     (N,)
    X = [None] * n_pairs            # d2P/dt_d dt_e
    XM = [None] * n_pairs           # d2M/dt_d dt_e
    for c in range(C):
        row = scr_ps[pl.ds(id_of(c), 1)][0]                   # (S, N)
        nrow = scr_nme[pl.ds(id_of(c), 1)][0]                 # (N,)
        wc, wdc, wxc = w_of(c)
        Pm = wc * row if Pm is None else Pm + wc * row
        Mn = wc * nrow if Mn is None else Mn + wc * nrow
        if want_d:
            for k in range(K):
                term = wdc[k] * row
                D[k] = term if D[k] is None else D[k] + term
                termn = wdc[k] * nrow
                DM[k] = termn if DM[k] is None else DM[k] + termn
            for pi in range(n_pairs):
                term = wxc[pi] * row
                X[pi] = term if X[pi] is None else X[pi] + term
                termn = wxc[pi] * nrow
                XM[pi] = termn if XM[pi] is None else XM[pi] + termn

    lam = jnp.sum(m[:, None] * Pm, axis=0)                    # (N,)
    value, f_lam, f_M, H_ll, H_lM, H_MM = _per_bin_parts(lam, Mn, obs, dtype)
    ll = jnp.sum(value)
    if not want_d:
        return ll, None, None

    # Parameter rows of dlam and dM, order [m_1..S, t_1..K]:
    #   dlam/dm_s = Pm[s],  dlam/dt_k = sum_s m_s D[k][s]  (Dbar)
    #   dM/dm_s   = 0,      dM/dt_k   = DM[k]
    P_dim = S + K
    zeros = jnp.zeros_like(lam)
    Dbar = [jnp.sum(m[:, None] * D[k], axis=0) for k in range(K)]
    Glam = jnp.stack([Pm[s] for s in range(S)] + Dbar)        # (P, N)
    GM = jnp.stack([zeros] * S + DM) if K else jnp.zeros(
        (P_dim, lam.shape[0]), dtype)                         # (P, N)

    # ONE reduction with a constant (zero) accumulator: Mosaic rejects the
    # matvec-sum form `Glam @ f_lam + GM @ f_M` (it canonicalizes into a
    # multi_reduction accumulating onto the second matvec — "only constant
    # accumulators supported"); combining elementwise first avoids it
    g = jnp.sum(Glam * f_lam[None, :] + GM * f_M[None, :], axis=1)  # (P,)

    # H = sum_n [ H_ll dlam dlam^T + H_lM (dlam dM^T + dM dlam^T)
    #             + H_MM dM dM^T ] + second-derivative terms
    def _outer(A, c, Bm):
        return jax.lax.dot_general(A * c[None, :], Bm,
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=dtype)

    H = _outer(Glam, H_ll, Glam) + _outer(GM, H_MM, GM)
    cross = _outer(Glam, H_lM, GM)
    H = H + cross + cross.T

    if K:
        # d2lam/dm_s dt_k = D[k][s];  d2lam/dt_d dt_e = sum_s m_s X,
        # d2M/dt_d dt_e = XM (diagonals zero — multilinearity)
        extra_mt = jnp.stack(
            [jnp.stack([jnp.sum(D[k][s] * f_lam) for k in range(K)])
             for s in range(S)])                              # (S, K)
        xr = {}
        for pi, p_ in enumerate(pairs):
            Xbar = jnp.sum(m[:, None] * X[pi], axis=0)
            xr[p_] = jnp.sum(Xbar * f_lam) + jnp.sum(XM[pi] * f_M)
        zero = jnp.zeros((), dtype=dtype)
        extra_tt = jnp.stack([
            jnp.stack([xr.get((min(d_, e_), max(d_, e_)), zero)
                       if d_ != e_ else zero for e_ in range(K)])
            for d_ in range(K)])
        top = jnp.concatenate([jnp.zeros((S, S), dtype), extra_mt], axis=1)
        bottom = jnp.concatenate([extra_mt.T, extra_tt], axis=1)
        H = H + jnp.concatenate([top, bottom], axis=0)

    return ll, g, H


def _bblite_vgh_kernel(ids_ref, w_ref, wd_ref, wx_ref, m_ref, obs_ref,
                       anchor_hbm, nme_hbm, ll_ref, g_ref, h_ref,
                       scr_ps, scr_nme, sem_ps, sem_nme,
                       *, S, K, C, pairs, blk):
    """Blocked-batch lite kernel body: per grid step, ``blk`` toys against
    the VMEM-resident (pmf, total-counts) anchor pair."""
    dtype = scr_ps.dtype

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scr_ps, sem_ps)
        dma.start()
        dma2 = pltpu.make_async_copy(nme_hbm, scr_nme, sem_nme)
        dma2.start()
        dma.wait()
        dma2.wait()

    def one_toy(ti, _):
        def w_of(c):
            return (w_ref[ti, c],
                    [wd_ref[ti, k, c] for k in range(K)],
                    [wx_ref[ti, pi, c] for pi in range(len(pairs))])

        ll, g, H = _bblite_toy_terms(
            scr_ps, scr_nme, lambda c: ids_ref[ti, c], w_of,
            m_ref[ti, :], obs_ref[ti, :],
            S=S, K=K, C=C, pairs=pairs, dtype=dtype)
        ll_ref[ti, 0] = ll
        g_ref[pl.ds(ti, 1), :] = g[None, :]
        h_ref[pl.ds(ti, 1)] = H[None]
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


def _bblite_ll_kernel(ids_ref, w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                      ll_ref, scr_ps, scr_nme, sem_ps, sem_nme,
                      *, S, K, C, A, blk):
    """Value-only lite kernel: blk toys x A parameter candidates sharing the
    toy's dataset (ids (blk, A, C) SMEM, w (blk, A, C), m (blk, A, S))."""
    dtype = scr_ps.dtype

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scr_ps, sem_ps)
        dma.start()
        dma2 = pltpu.make_async_copy(nme_hbm, scr_nme, sem_nme)
        dma2.start()
        dma.wait()
        dma2.wait()

    def one_toy(ti, _):
        obs = obs_ref[ti, :]
        for a in range(A):
            def w_of(c, _a=a):
                return w_ref[ti, _a, c], None, None

            ll, _, _ = _bblite_toy_terms(
                scr_ps, scr_nme, lambda c, _a=a: ids_ref[ti, _a, c], w_of,
                m_ref[ti, a, :], obs,
                S=S, K=K, C=C, pairs=(), dtype=dtype)
            ll_ref[ti, a] = ll
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


@functools.lru_cache(maxsize=None)
def _build_bblite_vgh_call(dtype_name, G, S, N, K, B, blk, interpret):
    C = 2 ** K
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    n_pairs_in = max(len(pairs), 1)
    wd_dim = max(K, 1)
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bblite_vgh_kernel, S=S, K=K, C=C, pairs=pairs,
                             blk=blk)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=(jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, P_dim), dtype),
                   jax.ShapeDtypeStruct((B, P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec((blk, C), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),            # ids
            pl.BlockSpec((blk, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # w
            pl.BlockSpec((blk, wd_dim, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # wd
            pl.BlockSpec((blk, n_pairs_in, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # wx
            pl.BlockSpec((blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # m
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # obs
            pl.BlockSpec(memory_space=pl.ANY),             # pmf anchors
            pl.BlockSpec(memory_space=pl.ANY),             # total count rows
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim, P_dim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((G, S, N), dtype),
                        pltpu.VMEM((G, N), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


@functools.lru_cache(maxsize=None)
def _build_bblite_ll_call(dtype_name, G, S, N, K, A, B, blk, interpret):
    C = 2 ** K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bblite_ll_kernel, S=S, K=K, C=C, A=A, blk=blk)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=jax.ShapeDtypeStruct((B, A), dtype),
        in_specs=[
            pl.BlockSpec((blk, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # ids
            pl.BlockSpec((blk, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # w
            pl.BlockSpec((blk, A, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # m
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # obs
            pl.BlockSpec(memory_space=pl.ANY),             # pmf anchors
            pl.BlockSpec(memory_space=pl.ANY),             # total count rows
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((G, S, N), dtype),
                        pltpu.VMEM((G, N), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _bblite_vgh_batched_impl(anchor_flat, nme_flat, ids_b, w_b, wd_b, wx_b,
                             m_b, obs_b, interpret):
    G, S, N = anchor_flat.shape
    B, C = ids_b.shape
    K = int(round(np.log2(C)))
    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)])
        ids_b, w_b, wd_b, wx_b, m_b, obs_b = map(
            pad, (ids_b, w_b, wd_b, wx_b, m_b, obs_b))
    call = _build_bblite_vgh_call(str(anchor_flat.dtype), G, S, N, K, B_pad,
                                  blk, interpret)
    ll, g, H = call(ids_b, w_b, wd_b, wx_b, m_b, obs_b, anchor_flat,
                    nme_flat)
    return ll[:B, 0], g[:B], H[:B]


def _bblite_ll_batched_impl(anchor_flat, nme_flat, ids_b, w_b, m_b, obs_b,
                            interpret):
    G, S, N = anchor_flat.shape
    B, A, C = ids_b.shape
    K = int(round(np.log2(C)))
    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)])
        ids_b, w_b, m_b, obs_b = map(pad, (ids_b, w_b, m_b, obs_b))
    call = _build_bblite_ll_call(str(anchor_flat.dtype), G, S, N, K, A,
                                 B_pad, blk, interpret)
    return call(ids_b, w_b, m_b, obs_b, anchor_flat, nme_flat)[:B]


_OP_CACHE = {}


def _get_bblite_op(interpret):
    from jax.custom_batching import custom_vmap

    key = ('vgh', bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor_flat, nme_flat, ids, w, wd, wx, m, obs):
        ll, g, H = _bblite_vgh_batched_impl(
            anchor_flat, nme_flat, ids[None], w[None], wd[None], wx[None],
            m[None], obs[None], interpret)
        return ll[0], g[0], H[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor_flat, nme_flat, ids, w, wd,
                 wx, m, obs):
        if in_batched[0]:
            anchor_flat = anchor_flat[0]
        if in_batched[1]:
            nme_flat = nme_flat[0]
        per_toy = []
        for arg, batched in zip((ids, w, wd, wx, m, obs), in_batched[2:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        out = _bblite_vgh_batched_impl(anchor_flat, nme_flat, *per_toy,
                                       interpret)
        return out, (True, True, True)

    _OP_CACHE[key] = op
    return op


def _get_bblite_ll_op(interpret):
    from jax.custom_batching import custom_vmap

    key = ('ll', bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor_flat, nme_flat, ids, w, m, obs):
        return _bblite_ll_batched_impl(anchor_flat, nme_flat, ids[None],
                                       w[None], m[None], obs[None],
                                       interpret)[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor_flat, nme_flat, ids, w, m,
                 obs):
        if in_batched[0]:
            anchor_flat = anchor_flat[0]
        if in_batched[1]:
            nme_flat = nme_flat[0]
        per_toy = []
        for arg, batched in zip((ids, w, m, obs), in_batched[2:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        out = _bblite_ll_batched_impl(anchor_flat, nme_flat, *per_toy,
                                      interpret)
        return out, True

    _OP_CACHE[key] = op
    return op


# ---------------------------------------------------------------------------
# Dense (toy-vectorized, MXU-combine) kernel flavor — same design as
# ops/fused.py's dense kernels: per grid step, the corner combines of ALL
# components x toys run as matmuls of dense (J, G) weight rows against the
# two resident tensors, and the per-bin closed forms run on (blk, N) blocks
# instead of per toy. See ops/fused.py DENSE_DEFAULT for the measured A/B.
# ---------------------------------------------------------------------------

def _bblite_vgh_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                             ll_ref, g_ref, h_ref, scr_ps, scr_nme,
                             sem_ps, sem_nme, *, S, K, pairs, blk, N):
    """Toy-vectorized lite kernel: w (J*blk, G) dense combine rows,
    component-major (row j*blk + t); m (blk, S); obs (blk, N);
    anchors (G, S*N) pmf + (G, N) total-count rows resident in VMEM."""
    dtype = scr_ps.dtype
    P_dim = S + K

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scr_ps, sem_ps)
        dma.start()
        dma2 = pltpu.make_async_copy(nme_hbm, scr_nme, sem_nme)
        dma2.start()
        dma.wait()
        dma2.wait()

    W = w_ref[:]
    res_ps = jax.lax.dot_general(W, scr_ps[:], (((1,), (0,)), ((), ())),
                                 precision=fused.DENSE_PRECISION,
                                 preferred_element_type=dtype)  # (J*blk,S*N)
    res_nme = jax.lax.dot_general(W, scr_nme[:], (((1,), (0,)), ((), ())),
                                  precision=fused.DENSE_PRECISION,
                                  preferred_element_type=dtype)  # (J*blk,N)

    def comp(j):
        return res_ps[j * blk:(j + 1) * blk, :]                # (blk, S*N)

    def compn(j):
        return res_nme[j * blk:(j + 1) * blk, :]               # (blk, N)

    def src(block, s):
        return block[:, s * N:(s + 1) * N]                     # (blk, N)

    def msum(block):
        acc = src(block, 0) * m[:, 0:1]
        for s in range(1, S):
            acc = acc + src(block, s) * m[:, s:s + 1]
        return acc

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)               # (blk, 1)

    m = m_ref[:]                                               # (blk, S)
    obs = obs_ref[:]                                           # (blk, N)

    Pm = comp(0)
    Mn = compn(0)                                              # (blk, N)
    lam = msum(Pm)
    value, f_lam, f_M, H_ll, H_lM, H_MM = _per_bin_parts(lam, Mn, obs,
                                                         dtype)
    ll_ref[:] = rsum(value)

    Ps = [src(Pm, s) for s in range(S)]
    g_cols = [rsum(Ps[s] * f_lam) for s in range(S)]
    if K:
        D = [comp(1 + d) for d in range(K)]
        DM = [compn(1 + d) for d in range(K)]
        Dbar = [msum(D[d]) for d in range(K)]
        g_cols += [rsum(Dbar[d] * f_lam + DM[d] * f_M) for d in range(K)]
    g_ref[:] = jnp.concatenate(g_cols, axis=1)                 # (blk, P)

    # Hessian entries (symmetric halves once). GM rows vanish for rates,
    # so the rate-rate block only sees H_ll.
    ent = {}
    PH = [Ps[s] * H_ll for s in range(S)]
    for s in range(S):
        for s2 in range(s, S):
            ent[(s, s2)] = rsum(PH[s] * Ps[s2])
    if K:
        for s in range(S):
            for d in range(K):
                ent[(s, S + d)] = (
                    rsum(Ps[s] * (H_ll * Dbar[d] + H_lM * DM[d]))
                    + rsum(src(D[d], s) * f_lam))
        for d in range(K):
            for e in range(d, K):
                val = rsum(H_ll * Dbar[d] * Dbar[e]
                           + H_lM * (Dbar[d] * DM[e] + DM[d] * Dbar[e])
                           + H_MM * DM[d] * DM[e])
                if d != e:
                    pi = pairs.index((d, e))
                    X = comp(1 + K + pi)
                    XM = compn(1 + K + pi)
                    val = val + rsum(msum(X) * f_lam + XM * f_M)
                ent[(S + d, S + e)] = val
    rows = []
    for i in range(P_dim):
        cols = [ent[(min(i, j), max(i, j))] for j in range(P_dim)]
        rows.append(jnp.concatenate(cols, axis=1)[:, None, :])
    h_ref[:] = jnp.concatenate(rows, axis=1)                   # (blk, P, P)


def _bblite_ll_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                            ll_ref, scr_ps, scr_nme, sem_ps, sem_nme,
                            *, S, A, blk, N):
    """Toy-vectorized lite value kernel: w (A*blk, G) dense value rows,
    candidate-major (row a*blk + t); m (A*blk, S) in the SAME row order;
    obs (blk, N); out ll (blk, A)."""
    dtype = scr_ps.dtype

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scr_ps, sem_ps)
        dma.start()
        dma2 = pltpu.make_async_copy(nme_hbm, scr_nme, sem_nme)
        dma2.start()
        dma.wait()
        dma2.wait()

    W = w_ref[:]
    m = m_ref[:]                                               # (A*blk, S)
    lam = None
    for s in range(S):
        res_s = jax.lax.dot_general(
            W, scr_ps[:, s * N:(s + 1) * N], (((1,), (0,)), ((), ())),
            precision=fused.DENSE_PRECISION,
            preferred_element_type=dtype)                      # (A*blk, N)
        term = res_s * m[:, s:s + 1]
        lam = term if lam is None else lam + term
    Mn = jax.lax.dot_general(W, scr_nme[:], (((1,), (0,)), ((), ())),
                             precision=fused.DENSE_PRECISION,
                             preferred_element_type=dtype)     # (A*blk, N)

    obs = obs_ref[:]                                           # (blk, N)
    for a in range(A):
        value = _per_bin_parts(lam[a * blk:(a + 1) * blk, :],
                               Mn[a * blk:(a + 1) * blk, :], obs, dtype)[0]
        ll_ref[:, a:a + 1] = jnp.sum(value, axis=1, keepdims=True)


@functools.lru_cache(maxsize=None)
def _build_bblite_vgh_call_dense(dtype_name, G, S, N, J, B, blk, K,
                                 interpret):
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bblite_vgh_kernel_dense, S=S, K=K,
                             pairs=pairs, blk=blk, N=N)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=(jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, P_dim), dtype),
                   jax.ShapeDtypeStruct((B, P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec((J * blk, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # dense rows
            pl.BlockSpec((blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # m
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # obs
            pl.BlockSpec(memory_space=pl.ANY),                 # pmf anchors
            pl.BlockSpec(memory_space=pl.ANY),                 # count rows
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim, P_dim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((G, S * N), dtype),
                        pltpu.VMEM((G, N), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


@functools.lru_cache(maxsize=None)
def _build_bblite_ll_call_dense(dtype_name, G, S, N, A, B, blk, interpret):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bblite_ll_kernel_dense, S=S, A=A, blk=blk,
                             N=N)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=jax.ShapeDtypeStruct((B, A), dtype),
        in_specs=[
            pl.BlockSpec((A * blk, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # dense rows
            pl.BlockSpec((A * blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # m (row order)
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # obs
            pl.BlockSpec(memory_space=pl.ANY),                 # pmf anchors
            pl.BlockSpec(memory_space=pl.ANY),                 # count rows
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G, S * N), dtype),
                        pltpu.VMEM((G, N), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _bblite_vgh_batched_impl_dense(anchor2d, nme_flat, W_b, m_b, obs_b, K,
                                   interpret):
    """W_b (B, J, G) dense combine rows -> (ll (B,), g, H)."""
    G, SN = anchor2d.shape
    B, J, _ = W_b.shape
    S = m_b.shape[1]
    N = SN // S
    # Always a full toy block: Mosaic cannot lower the dense kernels'
    # column-concat stores at blk < 8 ("result/input offset mismatch on
    # non-concat dimension" on (1, 1)-piece tpu.concatenate) — single
    # unbatched fits (observed-data intervals) pad up to one block
    blk = TOY_BLOCK
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)])
        W_b, m_b, obs_b = map(pad, (W_b, m_b, obs_b))
    nb = B_pad // blk
    W_rows = W_b.reshape(nb, blk, J, G).transpose(0, 2, 1, 3) \
        .reshape(nb * J * blk, G)
    call = _build_bblite_vgh_call_dense(str(anchor2d.dtype), G, S, N, J,
                                        B_pad, blk, K, interpret)
    ll, g, H = call(W_rows, m_b, obs_b, anchor2d, nme_flat)
    return ll[:B, 0], g[:B], H[:B]


def _bblite_ll_batched_impl_dense(anchor2d, nme_flat, W_b, m_b, obs_b,
                                  interpret):
    """W_b (B, A, G) dense value rows, m_b (B, A, S) -> ll (B, A)."""
    G, SN = anchor2d.shape
    B, A, _ = W_b.shape
    S = m_b.shape[2]
    N = SN // S
    # Always a full toy block: Mosaic cannot lower the dense kernels'
    # column-concat stores at blk < 8 ("result/input offset mismatch on
    # non-concat dimension" on (1, 1)-piece tpu.concatenate) — single
    # unbatched fits (observed-data intervals) pad up to one block
    blk = TOY_BLOCK
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)])
        W_b, m_b, obs_b = map(pad, (W_b, m_b, obs_b))
    nb = B_pad // blk
    W_rows = W_b.reshape(nb, blk, A, G).transpose(0, 2, 1, 3) \
        .reshape(nb * A * blk, G)
    m_rows = m_b.reshape(nb, blk, A, S).transpose(0, 2, 1, 3) \
        .reshape(nb * A * blk, S)
    call = _build_bblite_ll_call_dense(str(anchor2d.dtype), G, S, N, A,
                                       B_pad, blk, interpret)
    return call(W_rows, m_rows, obs_b, anchor2d, nme_flat)[:B]


def _get_bblite_dense_op(interpret):
    from jax.custom_batching import custom_vmap

    key = ('vgh_dense', bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor2d, nme_flat, W, m, obs):
        K = fused._k_of_j(W.shape[0])
        ll, g, H = _bblite_vgh_batched_impl_dense(
            anchor2d, nme_flat, W[None], m[None], obs[None], K, interpret)
        return ll[0], g[0], H[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor2d, nme_flat, W, m, obs):
        if in_batched[0]:
            anchor2d = anchor2d[0]
        if in_batched[1]:
            nme_flat = nme_flat[0]
        per_toy = []
        for arg, batched in zip((W, m, obs), in_batched[2:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        K = fused._k_of_j(per_toy[0].shape[1])
        out = _bblite_vgh_batched_impl_dense(anchor2d, nme_flat, *per_toy,
                                             K=K, interpret=interpret)
        return out, (True, True, True)

    _OP_CACHE[key] = op
    return op


def _get_bblite_ll_dense_op(interpret):
    from jax.custom_batching import custom_vmap

    key = ('ll_dense', bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor2d, nme_flat, W, m, obs):
        return _bblite_ll_batched_impl_dense(
            anchor2d, nme_flat, W[None], m[None], obs[None], interpret)[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor2d, nme_flat, W, m, obs):
        if in_batched[0]:
            anchor2d = anchor2d[0]
        if in_batched[1]:
            nme_flat = nme_flat[0]
        per_toy = []
        for arg, batched in zip((W, m, obs), in_batched[2:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        out = _bblite_ll_batched_impl_dense(anchor2d, nme_flat, *per_toy,
                                            interpret)
        return out, True

    _OP_CACHE[key] = op
    return op


def binned_bblite_vgh_fused(anchor_flat, nme_flat, strides, idx, t, m,
                            observed, interpret=False, dense=None):
    """Fused Barlow-Beeston-lite (ll, g, H) via the Pallas kernel. Same
    contract as :func:`blueice_tpu.ops.bb_lite.binned_bblite_vgh`, but
    gathers the corner templates itself from the flattened-grid anchor
    tensors. ``dense`` selects the toy-vectorized MXU-combine flavor
    (None = ops.fused.DENSE_DEFAULT).

    :param anchor_flat: (G, S, N) pmf anchor templates, N a multiple of 128.
    :param nme_flat: (G, N) TOTAL MC-count anchor rows (pre-summed over
      sources).
    :param strides: static tuple of K ints — anchor-grid row strides.
    :param idx: (K,) int32 lower-corner index per axis; t: (K,) lerp weights;
      m: (S,) rates; observed: (N,) observed counts (padded bins zero).
    :return: (ll, g (S+K,), H (S+K, S+K)); saturated constant excluded.
    """
    anchor_flat = jnp.asarray(anchor_flat)
    G, S, N = anchor_flat.shape
    if N % LANE:
        raise ValueError("bin axis must be padded to a multiple of %d "
                         "(use ops.fused.pad_bins)" % LANE)
    nme_flat = jnp.asarray(nme_flat, anchor_flat.dtype)
    K = len(strides)
    C = 2 ** K
    dt = anchor_flat.dtype

    ids = corner_ids(strides, idx, K)
    w, wd, wx = corner_weight_tables(jnp.asarray(t, dt))
    pairs = [(d, e) for d in range(K) for e in range(d + 1, K)]
    wd_in = wd.astype(dt) if K else jnp.zeros((1, C), dt)
    wx_in = (jnp.stack([wx[d, e] for d, e in pairs]).astype(dt)
             if pairs else jnp.zeros((1, C), dt))

    if fused.resolve_dense(dense):
        W = _dense_combine_rows(ids, w.astype(dt), wd, wx, pairs, K, G, dt)
        op = _get_bblite_dense_op(bool(interpret))
        return op(anchor_flat.reshape(G, S * N), nme_flat, W,
                  jnp.asarray(m, dt), jnp.asarray(observed, dt))

    op = _get_bblite_op(bool(interpret))
    return op(anchor_flat, nme_flat, ids, w.astype(dt), wd_in, wx_in,
              jnp.asarray(m, dt), jnp.asarray(observed, dt))


def binned_bblite_ll_fused_multi(anchor_flat, nme_flat, strides, idx, t, m,
                                 observed, interpret=False, dense=None):
    """Lite deviance-form LL at A parameter candidates sharing one dataset.

    :param idx: (A, K) int32 lower corners; t: (A, K) lerp weights;
      m: (A, S) rates; observed: (N,), N a multiple of 128.
    :return: (A,) log likelihoods (without the saturated-model constant).
    """
    anchor_flat = jnp.asarray(anchor_flat)
    G, S, N = anchor_flat.shape
    if N % LANE:
        raise ValueError("bin axis must be padded to a multiple of %d" % LANE)
    nme_flat = jnp.asarray(nme_flat, anchor_flat.dtype)
    K = len(strides)
    dt = anchor_flat.dtype

    A = jnp.asarray(m).shape[0]
    ids = corner_ids_batched(strides, idx, K, A)               # (A, C)
    w = (jax.vmap(lambda tv: corner_weight_tables(tv)[0])(
        jnp.asarray(t, dt)) if K
        else jnp.ones((A, 1), dtype=dt))                       # (A, C)

    if fused.resolve_dense(dense):
        ids_c = jnp.clip(ids, 0, G - 1)
        onehot = (ids_c[:, :, None]
                  == jnp.arange(G, dtype=jnp.int32)[None, None, :]) \
            .astype(dt)                                        # (A, C, G)
        W = jax.lax.dot_general(w.astype(dt), onehot,
                                (((1,), (1,)), ((0,), (0,))),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=dt)     # (A, G)
        op = _get_bblite_ll_dense_op(bool(interpret))
        return op(anchor_flat.reshape(G, S * N), nme_flat, W,
                  jnp.asarray(m, dt), jnp.asarray(observed, dt))

    op = _get_bblite_ll_op(bool(interpret))
    return op(anchor_flat, nme_flat, ids, w, jnp.asarray(m, dt),
              jnp.asarray(observed, dt))
