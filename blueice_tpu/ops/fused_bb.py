"""Pallas TPU kernel: fused (LL, gradient, Hessian) of the Beeston-Barlow-
adjusted binned Poisson likelihood over anchor templates.

Extends the VMEM-resident design of :mod:`blueice_tpu.ops.fused` to models
where one source's per-bin expectation is profiled with the closed-form
Beeston-Barlow root (reference: blueice/likelihood.py:618-660,693-712). Two
tensors stay resident in VMEM scratch across the sequential grid steps: the
full pmf anchor tensor (G, S, N) and the finite-MC source's count anchor rows
(G, N) — the adjustment never needs the other sources' MC counts.

Everything per bin is closed form (:func:`blueice_tpu.ops.bb_vgh.bb_lam_parts`
— implicit differentiation of the per-bin quadratic), so no autodiff traces
through the kernel and the program stays small at any bin count; this is what
lets Beeston-Barlow run at the full 50x62-bin XENON scale that the per-bin
autodiff graph could not compile. The chain from the five per-bin inputs
(P, N, U, M, T) to the fit parameters (m, t) uses the same corner-difference
tables as the plain kernel; the (S+K)^2 curvature assembly runs as small MXU
contractions against per-input parameter-row matrices.

Bin axes must be padded to a multiple of 128 with all-zero template/count/data
bins — such bins take the inert branch (lam = U = 0) and contribute exactly
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
from . import fused
from .fused import (VMEM_LIMIT, corner_ids, corner_ids_batched,
                    _dense_combine_rows)
from .bb_vgh import bb_lam_parts, bb_lambda

__all__ = ['binned_bb_vgh_fused', 'binned_bb_ll_fused_multi',
           'fused_bb_supported']

LANE = 128
TOY_BLOCK = 8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_bb_supported(anchor_flat_shape, dtype=jnp.float32,
                       vmem_budget=10 * 2 ** 20):
    """Whether the pmf anchor tensor plus the BB source's count rows fit the
    VMEM-resident kernel."""
    g, s, n = anchor_flat_shape
    n_pad = _round_up(n, LANE)
    itemsize = jnp.dtype(dtype).itemsize
    return g * (s + 1) * n_pad * itemsize <= vmem_budget


def _bb_toy_terms(scr_ps, scr_nme, id_of, w_of, m, obs, *, S, K, C, pairs,
                  bb_i, dtype):
    """Morph + closed-form BB math for one toy (or one candidate): returns
    (ll, dlam (P, N), extras) where extras is None on the value-only path.

    ``w_of(c)`` returns (w_c, wd_c (K,), wx_c (n_pairs,)) corner weights, the
    latter two None on the value-only path; ``id_of(c)`` returns the scalar
    corner id into the resident tensors (scalar-wise because SMEM supports
    only scalar loads on TPU).
    """
    n_pairs = len(pairs)
    want_d = w_of(0)[1] is not None

    Pm = None
    Nb = None
    D = [None] * K
    DN = [None] * K
    X = [None] * n_pairs
    XN = [None] * n_pairs
    for c in range(C):
        row = scr_ps[pl.ds(id_of(c), 1)][0]                   # (S, N)
        nrow = scr_nme[pl.ds(id_of(c), 1)][0]                 # (N,)
        wc, wdc, wxc = w_of(c)
        Pm = wc * row if Pm is None else Pm + wc * row
        Nb = wc * nrow if Nb is None else Nb + wc * nrow
        if want_d:
            for k in range(K):
                term = wdc[k] * row
                D[k] = term if D[k] is None else D[k] + term
                termn = wdc[k] * nrow
                DN[k] = termn if DN[k] is None else DN[k] + termn
            for pi in range(n_pairs):
                term = wxc[pi] * row
                X[pi] = term if X[pi] is None else X[pi] + term
                termn = wxc[pi] * nrow
                XN[pi] = termn if XN[pi] is None else XN[pi] + termn

    # (S, 1) other-source mask via iota (constant arrays cannot be captured
    # inside a Pallas kernel body)
    om_mask2 = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                != bb_i).astype(dtype)
    om_mask = om_mask2[:, 0]
    m_other = m * om_mask
    U = jnp.sum(m_other[:, None] * Pm, axis=0)                # (N,)
    Pb = Pm[bb_i]
    T = jnp.sum(Nb)
    M = m[bb_i]

    if not want_d:
        lam = bb_lambda(Pb, Nb, U, M, T, obs)
        tiny = jnp.finfo(dtype).tiny
        lam_safe = jnp.maximum(lam, tiny)
        k_safe = jnp.where(obs > 0, obs, 1.0)
        ll = jnp.sum(obs * jnp.log(lam_safe / k_safe) - (lam - obs))
        return ll, None, None

    DU = [jnp.sum(m_other[:, None] * D[k], axis=0) for k in range(K)]
    Dpb = [D[k][bb_i] for k in range(K)]
    XU = [jnp.sum(m_other[:, None] * X[pi], axis=0) for pi in range(n_pairs)]
    Xpb = [X[pi][bb_i] for pi in range(n_pairs)]
    SN = [jnp.sum(DN[k]) for k in range(K)]
    SXN = [jnp.sum(XN[pi]) for pi in range(n_pairs)]

    lam, gam, om = bb_lam_parts(Pb, Nb, U, M, T, obs)

    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(obs > 0, obs, 1.0)
    ll = jnp.sum(obs * jnp.log(lam_safe / k_safe) - (lam - obs))
    inv_lam = 1.0 / lam_safe
    r = obs * inv_lam - 1.0
    q = (obs * inv_lam) * inv_lam

    ones = jnp.ones_like(r)
    zeros = jnp.zeros_like(r)
    # Per-parameter rows of the input Jacobian, one (P, N) matrix per input v:
    # v=0 bb pmf, v=1 bb MC counts, v=2 other-source expectation,
    # v=3 bb rate, v=4 total MC counts. Parameter order [m_1..S, t_1..K].
    P_dim = S + K
    G_rows = {v: [zeros] * P_dim for v in range(5)}
    for s in range(S):
        if s == bb_i:
            G_rows[3][s] = ones
        else:
            G_rows[2][s] = Pm[s]
    for k in range(K):
        G_rows[0][S + k] = Dpb[k]
        G_rows[1][S + k] = DN[k]
        G_rows[2][S + k] = DU[k]
        G_rows[4][S + k] = SN[k] * ones
    Gv = {v: jnp.stack(G_rows[v]) for v in range(5)}

    dlam = (gam[0] * Gv[0] + gam[1] * Gv[1] + gam[2] * Gv[2]
            + gam[3] * Gv[3] + gam[4] * Gv[4])                # (P, N)

    # H = sum_n [-q dlam dlam^T + r (J^T om J + sum_v gam_v T2_v)]
    H = -jax.lax.dot_general(dlam * q[None, :], dlam,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=dtype)
    for (v, w), o in sorted(om.items()):
        c = r * o
        Mvw = jax.lax.dot_general(Gv[v] * c[None, :], Gv[w],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=dtype)
        H = H + Mvw if v == w else H + Mvw + Mvw.T

    # T2 terms: d2U/dm_s dt_k = D[k][s] (s != bb_i); d2(P,N,U)/dt_k dt_e from
    # the double-difference tables; d2T/dt_k dt_e = sum_n XN.
    if K:
        rg0, rg1, rg2 = r * gam[0], r * gam[1], r * gam[2]
        s_rg4 = jnp.sum(r * gam[4])
        cols = jnp.stack([jnp.sum(D[k] * rg2[None, :], axis=1)
                          for k in range(K)], axis=1)          # (S, K)
        extra_mt = cols * om_mask2
        xr = {}
        for pi, p_ in enumerate(pairs):
            xr[p_] = (jnp.sum(rg0 * Xpb[pi] + rg1 * XN[pi] + rg2 * XU[pi])
                      + s_rg4 * SXN[pi])
        zero = jnp.zeros((), dtype=dtype)
        extra_tt = jnp.stack([
            jnp.stack([xr.get((min(d_, e_), max(d_, e_)), zero)
                       if d_ != e_ else zero for e_ in range(K)])
            for d_ in range(K)])
        top = jnp.concatenate([jnp.zeros((S, S), dtype), extra_mt], axis=1)
        bottom = jnp.concatenate([extra_mt.T, extra_tt], axis=1)
        H = H + jnp.concatenate([top, bottom], axis=0)

    return ll, dlam, (r, H)


def _bb_vgh_kernel(ids_ref, w_ref, wd_ref, wx_ref, m_ref, obs_ref,
                   anchor_hbm, nme_hbm, ll_ref, g_ref, h_ref,
                   scr_ps, scr_nme, sem_ps, sem_nme,
                   *, S, K, C, pairs, blk, bb_i):
    """Blocked-batch BB kernel body: per grid step, ``blk`` toys against the
    VMEM-resident (pmf, bb-counts) anchor pair."""
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

        ll, dlam, (r, H) = _bb_toy_terms(
            scr_ps, scr_nme, lambda c: ids_ref[ti, c], w_of,
            m_ref[ti, :], obs_ref[ti, :],
            S=S, K=K, C=C, pairs=pairs, bb_i=bb_i, dtype=dtype)
        ll_ref[ti, 0] = ll
        g_ref[pl.ds(ti, 1), :] = jnp.sum(dlam * r[None, :],
                                         axis=1)[None, :]
        h_ref[pl.ds(ti, 1)] = H[None]
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


def _bb_ll_kernel(ids_ref, w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                  ll_ref, scr_ps, scr_nme, sem_ps, sem_nme,
                  *, S, K, C, A, blk, bb_i):
    """Value-only BB kernel: blk toys x A parameter candidates sharing the
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

            ll, _, _ = _bb_toy_terms(
                scr_ps, scr_nme, lambda c, _a=a: ids_ref[ti, _a, c], w_of,
                m_ref[ti, a, :], obs,
                S=S, K=K, C=C, pairs=(), bb_i=bb_i, dtype=dtype)
            ll_ref[ti, a] = ll
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


@functools.lru_cache(maxsize=None)
def _build_bb_vgh_call(dtype_name, G, S, N, K, B, blk, bb_i, interpret):
    C = 2 ** K
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    n_pairs_in = max(len(pairs), 1)
    wd_dim = max(K, 1)
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bb_vgh_kernel, S=S, K=K, C=C, pairs=pairs,
                             blk=blk, bb_i=bb_i)
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
            pl.BlockSpec(memory_space=pl.ANY),             # bb count rows
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
def _build_bb_ll_call(dtype_name, G, S, N, K, A, B, blk, bb_i, interpret):
    C = 2 ** K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bb_ll_kernel, S=S, K=K, C=C, A=A, blk=blk,
                             bb_i=bb_i)
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
            pl.BlockSpec(memory_space=pl.ANY),             # bb count rows
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


def _bb_vgh_batched_impl(anchor_flat, nme_flat, ids_b, w_b, wd_b, wx_b, m_b,
                         obs_b, bb_i, interpret):
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
    call = _build_bb_vgh_call(str(anchor_flat.dtype), G, S, N, K, B_pad,
                              blk, int(bb_i), interpret)
    ll, g, H = call(ids_b, w_b, wd_b, wx_b, m_b, obs_b, anchor_flat,
                    nme_flat)
    return ll[:B, 0], g[:B], H[:B]


def _bb_ll_batched_impl(anchor_flat, nme_flat, ids_b, w_b, m_b, obs_b, bb_i,
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
    call = _build_bb_ll_call(str(anchor_flat.dtype), G, S, N, K, A, B_pad,
                             blk, int(bb_i), interpret)
    return call(ids_b, w_b, m_b, obs_b, anchor_flat, nme_flat)[:B]


_OP_CACHE = {}


def _get_bb_op(bb_i, interpret):
    from jax.custom_batching import custom_vmap

    key = ('vgh', int(bb_i), bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor_flat, nme_flat, ids, w, wd, wx, m, obs):
        ll, g, H = _bb_vgh_batched_impl(
            anchor_flat, nme_flat, ids[None], w[None], wd[None], wx[None],
            m[None], obs[None], bb_i, interpret)
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
        out = _bb_vgh_batched_impl(anchor_flat, nme_flat, *per_toy, bb_i,
                                   interpret)
        return out, (True, True, True)

    _OP_CACHE[key] = op
    return op


def _get_bb_ll_op(bb_i, interpret):
    from jax.custom_batching import custom_vmap

    key = ('ll', int(bb_i), bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor_flat, nme_flat, ids, w, m, obs):
        return _bb_ll_batched_impl(anchor_flat, nme_flat, ids[None],
                                   w[None], m[None], obs[None], bb_i,
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
        out = _bb_ll_batched_impl(anchor_flat, nme_flat, *per_toy, bb_i,
                                  interpret)
        return out, True

    _OP_CACHE[key] = op
    return op


# ---------------------------------------------------------------------------
# Dense (toy-vectorized, MXU-combine) kernel flavor — same design as
# ops/fused.py's dense kernels: the corner combines of all components x toys
# of a grid step run as matmuls of dense (J, G) weight rows against the two
# resident tensors, and all per-bin math (including the closed-form BB root
# and its implicit derivatives, which are elementwise and broadcast-safe)
# runs on (blk, N) blocks instead of per toy. The per-toy scalars M (bb
# rate) and T (total MC counts) ride along as (blk, 1) columns.
# ---------------------------------------------------------------------------

def _bb_vgh_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                         ll_ref, g_ref, h_ref, scr_ps, scr_nme,
                         sem_ps, sem_nme, *, S, K, pairs, blk, bb_i, N):
    """Toy-vectorized BB kernel: w (J*blk, G) dense combine rows,
    component-major (row j*blk + t); m (blk, S); obs (blk, N)."""
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

    def osum(block):
        """Other-source (s != bb_i) m-weighted sum: -> (blk, N)."""
        acc = None
        for s in range(S):
            if s == bb_i:
                continue
            term = src(block, s) * m[:, s:s + 1]
            acc = term if acc is None else acc + term
        return acc if acc is not None else jnp.zeros_like(obs)

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)               # (blk, 1)

    m = m_ref[:]                                               # (blk, S)
    obs = obs_ref[:]                                           # (blk, N)

    Pm = comp(0)
    Nb = compn(0)                                              # (blk, N)
    U = osum(Pm)
    Pb = src(Pm, bb_i)
    T = rsum(Nb)                                               # (blk, 1)
    Mcol = m[:, bb_i:bb_i + 1]                                 # (blk, 1)

    lam, gam, om = bb_lam_parts(Pb, Nb, U, Mcol, T, obs)
    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(obs > 0, obs, 1.0)
    ll_ref[:] = rsum(obs * jnp.log(lam_safe / k_safe) - (lam - obs))

    inv_lam = 1.0 / lam_safe
    r = obs * inv_lam - 1.0
    q = (obs * inv_lam) * inv_lam

    # Per-parameter input-space derivative components: comps[p] maps input
    # index v (0 bb pmf, 1 bb counts, 2 other-source U, 3 bb rate M,
    # 4 total MC T) to d(input_v)/d(param p) — (blk, N), (blk, 1), or the
    # literal 1.0. Parameter order [m_1..S, t_1..K].
    # None marks an identically-1 component (the bb rate row)
    comps = [dict() for _ in range(P_dim)]
    for s in range(S):
        if s == bb_i:
            comps[s][3] = None
        else:
            comps[s][2] = src(Pm, s)
    if K:
        D = [comp(1 + k) for k in range(K)]
        DN = [compn(1 + k) for k in range(K)]
        for k in range(K):
            comps[S + k][0] = src(D[k], bb_i)                  # Dpb
            comps[S + k][1] = DN[k]
            comps[S + k][2] = osum(D[k])                       # DU
            comps[S + k][4] = rsum(DN[k])                      # SN (blk, 1)

    def dlam_of(p):
        acc = None
        for v, a in comps[p].items():
            term = gam[v] if a is None else gam[v] * a
            acc = term if acc is None else acc + term
        return acc

    dlam = [dlam_of(p) for p in range(P_dim)]
    g_ref[:] = jnp.concatenate([rsum(dlam[p] * r) for p in range(P_dim)],
                               axis=1)

    # Hessian: H[p,p'] = sum_n [ -q dlam_p dlam_p'
    #   + r * sum_{(v,w)} om_vw (Gv_p Gw_p' + (v != w) Gw_p Gv_p') ]
    #   + second-derivative (T2) terms
    ro = {vw: r * o for vw, o in om.items()}
    dq = [dlam[p] * q for p in range(P_dim)]

    def _mul(a, b):
        """Product of two components, None meaning identically 1."""
        if a is None:
            return b
        if b is None:
            return a
        return a * b

    ent = {}
    for p in range(P_dim):
        for p2 in range(p, P_dim):
            expr = -dq[p] * dlam[p2]
            for (v, w), c in ro.items():
                for vv, ww in (((v, w),) if v == w else ((v, w), (w, v))):
                    if vv in comps[p] and ww in comps[p2]:
                        ab = _mul(comps[p][vv], comps[p2][ww])
                        expr = expr + (c if ab is None else c * ab)
            ent[(p, p2)] = rsum(expr)

    # T2 terms (second derivatives of the inputs w.r.t. parameters)
    if K:
        rg0, rg1, rg2 = r * gam[0], r * gam[1], r * gam[2]
        s_rg4 = rsum(r * gam[4])                               # (blk, 1)
        for s in range(S):
            if s == bb_i:
                continue
            for k in range(K):
                ent[(s, S + k)] = ent[(s, S + k)] \
                    + rsum(src(D[k], s) * rg2)
        for pi, (d_, e_) in enumerate(pairs):
            X = comp(1 + K + pi)
            XN = compn(1 + K + pi)
            xr = (rsum(rg0 * src(X, bb_i) + rg1 * XN + rg2 * osum(X))
                  + s_rg4 * rsum(XN))
            ent[(S + d_, S + e_)] = ent[(S + d_, S + e_)] + xr

    rows = []
    for i in range(P_dim):
        cols = [ent[(min(i, j), max(i, j))] for j in range(P_dim)]
        rows.append(jnp.concatenate(cols, axis=1)[:, None, :])
    h_ref[:] = jnp.concatenate(rows, axis=1)                   # (blk, P, P)


def _bb_ll_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, nme_hbm,
                        ll_ref, scr_ps, scr_nme, sem_ps, sem_nme,
                        *, S, A, blk, bb_i, N):
    """Toy-vectorized BB value kernel: w (A*blk, G) dense value rows,
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
    U = None
    Pb = None
    for s in range(S):
        res_s = jax.lax.dot_general(
            W, scr_ps[:, s * N:(s + 1) * N], (((1,), (0,)), ((), ())),
            precision=fused.DENSE_PRECISION,
            preferred_element_type=dtype)                      # (A*blk, N)
        if s == bb_i:
            Pb = res_s
        else:
            term = res_s * m[:, s:s + 1]
            U = term if U is None else U + term
    if U is None:
        U = jnp.zeros_like(Pb)
    Nb = jax.lax.dot_general(W, scr_nme[:], (((1,), (0,)), ((), ())),
                             precision=fused.DENSE_PRECISION,
                             preferred_element_type=dtype)     # (A*blk, N)
    T = jnp.sum(Nb, axis=1, keepdims=True)                     # (A*blk, 1)
    Mcol = m[:, bb_i:bb_i + 1]                                 # (A*blk, 1)

    obs = obs_ref[:]                                           # (blk, N)
    tiny = jnp.finfo(dtype).tiny
    k_safe = jnp.where(obs > 0, obs, 1.0)
    for a in range(A):
        rows = slice(a * blk, (a + 1) * blk)
        lam = bb_lambda(Pb[rows, :], Nb[rows, :], U[rows, :],
                        Mcol[rows, :], T[rows, :], obs)
        lam_safe = jnp.maximum(lam, tiny)
        ll_ref[:, a:a + 1] = jnp.sum(
            obs * jnp.log(lam_safe / k_safe) - (lam - obs),
            axis=1, keepdims=True)


@functools.lru_cache(maxsize=None)
def _build_bb_vgh_call_dense(dtype_name, G, S, N, J, B, blk, K, bb_i,
                             interpret):
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bb_vgh_kernel_dense, S=S, K=K, pairs=pairs,
                             blk=blk, bb_i=bb_i, N=N)
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
def _build_bb_ll_call_dense(dtype_name, G, S, N, A, B, blk, bb_i,
                            interpret):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_bb_ll_kernel_dense, S=S, A=A, blk=blk,
                             bb_i=bb_i, N=N)
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


def _bb_vgh_batched_impl_dense(anchor2d, nme_flat, W_b, m_b, obs_b, K,
                               bb_i, interpret):
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
    call = _build_bb_vgh_call_dense(str(anchor2d.dtype), G, S, N, J, B_pad,
                                    blk, K, bb_i, interpret)
    ll, g, H = call(W_rows, m_b, obs_b, anchor2d, nme_flat)
    return ll[:B, 0], g[:B], H[:B]


def _bb_ll_batched_impl_dense(anchor2d, nme_flat, W_b, m_b, obs_b, bb_i,
                              interpret):
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
    call = _build_bb_ll_call_dense(str(anchor2d.dtype), G, S, N, A, B_pad,
                                   blk, bb_i, interpret)
    return call(W_rows, m_rows, obs_b, anchor2d, nme_flat)[:B]


def _get_bb_dense_op(bb_i, interpret):
    from jax.custom_batching import custom_vmap

    key = ('vgh_dense', bb_i, bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor2d, nme_flat, W, m, obs):
        K = fused._k_of_j(W.shape[0])
        ll, g, H = _bb_vgh_batched_impl_dense(
            anchor2d, nme_flat, W[None], m[None], obs[None], K, bb_i,
            interpret)
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
        out = _bb_vgh_batched_impl_dense(anchor2d, nme_flat, *per_toy,
                                         K=K, bb_i=bb_i,
                                         interpret=interpret)
        return out, (True, True, True)

    _OP_CACHE[key] = op
    return op


def _get_bb_ll_dense_op(bb_i, interpret):
    from jax.custom_batching import custom_vmap

    key = ('ll_dense', bb_i, bool(interpret))
    if key in _OP_CACHE:
        return _OP_CACHE[key]

    @custom_vmap
    def op(anchor2d, nme_flat, W, m, obs):
        return _bb_ll_batched_impl_dense(
            anchor2d, nme_flat, W[None], m[None], obs[None], bb_i,
            interpret)[0]

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
        out = _bb_ll_batched_impl_dense(anchor2d, nme_flat, *per_toy,
                                        bb_i=bb_i, interpret=interpret)
        return out, True

    _OP_CACHE[key] = op
    return op


def binned_bb_vgh_fused(anchor_flat, nme_flat, strides, idx, t, m, observed,
                        bb_i, interpret=False, dense=None):
    """Fused BB (ll, g, H) via the Pallas kernel. Same contract as
    :func:`blueice_tpu.ops.bb_vgh.binned_bb_vgh`, but gathers the corner
    templates itself from the flattened-grid anchor tensors.

    :param anchor_flat: (G, S, N) pmf anchor templates, N a multiple of 128.
    :param nme_flat: (G, N) MC-count anchor rows of the finite-MC source.
    :param strides: static tuple of K ints — anchor-grid row strides.
    :param idx: (K,) int32 lower-corner index per axis; t: (K,) lerp weights;
      m: (S,) rates; observed: (N,) observed counts (padded bins zero).
    :param bb_i: static int index of the finite-MC source.
    :return: (ll, g (S+K,), H (S+K, S+K)).
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
        op = _get_bb_dense_op(bb_i, bool(interpret))
        return op(anchor_flat.reshape(G, S * N), nme_flat, W,
                  jnp.asarray(m, dt), jnp.asarray(observed, dt))

    op = _get_bb_op(bb_i, bool(interpret))
    return op(anchor_flat, nme_flat, ids, w.astype(dt), wd_in, wx_in,
              jnp.asarray(m, dt), jnp.asarray(observed, dt))


def binned_bb_ll_fused_multi(anchor_flat, nme_flat, strides, idx, t, m,
                             observed, bb_i, interpret=False, dense=None):
    """BB deviance-form LL at A parameter candidates sharing one dataset.

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
        op = _get_bb_ll_dense_op(bb_i, bool(interpret))
        return op(anchor_flat.reshape(G, S * N), nme_flat, W,
                  jnp.asarray(m, dt), jnp.asarray(observed, dt))

    op = _get_bb_ll_op(bb_i, bool(interpret))
    return op(anchor_flat, nme_flat, ids, w, jnp.asarray(m, dt),
              jnp.asarray(observed, dt))
