"""Pallas TPU kernel: fused analytic (LL, gradient, Hessian) of the binned
Poisson likelihood over anchor templates.

This is the Pallas port of :func:`blueice_tpu.ops.binned_vgh.binned_vgh`, the
hot inner op of every Newton iteration of every toy fit. The XLA version
re-gathers the 2^K corner templates from HBM for every toy on every derivative
pass; here the whole anchor tensor (anchors x sources x bins — ~6 MB for a
XENON1T-style model) is DMA'd **once** into VMEM scratch that persists across
the sequential grid steps, and every toy's corner gather, multilinear
combination, per-bin residual math and (S+K)^2 curvature reductions run against
that resident copy. HBM traffic per toy drops from 2^K templates to the tiny
per-toy inputs/outputs.

The kernel computes derivatives *analytically* (the morphed template is
multilinear in the lerp weights and linear in the rates — see
ops/binned_vgh.py for the math), so no autodiff traces through the
pallas_call. Batching is explicit: the op is wrapped in jax.custom_batching so
`vmap` (the fitter's toy axis) dispatches one blocked-grid kernel instead of
naively broadcasting the anchor tensor per toy.

The bin axis must be padded to a multiple of 128 (TPU lane width) with
all-zero template/data bins — zero bins contribute exactly nothing to the
deviance-form likelihood and its derivatives.
"""

import functools
import itertools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_vgh import corner_weight_tables

# Mosaic's scoped-VMEM compile check defaults to 16 MB; its static
# allocator's demand can run several x the block working-set model.
# v5e VMEM is 128 MB — raise the limit so block sizing is the only gate.
# Shared by every fused kernel module (fused_bb, fused_unbinned import it).
VMEM_LIMIT = 64 * 2 ** 20

__all__ = ['binned_vgh_fused', 'binned_ll_fused_multi', 'fused_vgh_supported',
           'pad_bins']

LANE = 128
TOY_BLOCK = 8

# Kernel flavor: the original ('gather') kernel walks the toys of each grid
# step in a sequential fori_loop, gathering 2^K corner rows per toy and
# accumulating the multilinear combine as chains of small (S, N) VPU fmas.
# The 'dense' flavor instead folds the corner weights into a per-toy (J, G)
# dense row (J = 1 + K + n_pairs combine components) and computes ALL
# combines of a toy block as ONE MXU matmul (J*blk, G) x (G, S*N) against
# the VMEM-resident anchor tensor; the residual per-bin math then runs
# vectorized over the whole toy block ((blk, N)-shaped VPU ops) instead of
# per toy. Same HBM traffic (the anchor tensor is resident either way);
# ~G/2^K more combine flops, but on the MXU and free of the per-toy serial
# small-op chains that bound the gather kernel at ~32% of its mix ceiling.
# Measured A/B at XENON scale (G=81, S=6, N=3200, K=4, B=512, v5e,
# dispatch-amortized; examples/ab_dense_kernel.py): vgh 2.26 ms -> 1.00 ms
# per 512-toy call (2.26x), 12-candidate value kernel 3.16 ms -> 1.01 ms
# (3.1x) — so dense is the default. BLUEICE_FUSED_DENSE=0 restores the
# gather flavor.
DENSE_DEFAULT = os.environ.get('BLUEICE_FUSED_DENSE', '1').lower() \
    not in ('0', '', 'false')

# MXU pass count for the dense kernels' combine matmuls. On TPU, DEFAULT
# f32 dot runs one bf16 pass (~1e-3 relative combine error — visibly
# shifts the near-degenerate XENON t statistic); HIGHEST runs 6 bf16
# passes (f32-faithful). Measured on the v5e at XENON scale the HIGHEST
# matmul still beats the gather flavor's serial VPU combine by a wide
# margin, so fidelity is the default.
_PREC = {'default': jax.lax.Precision.DEFAULT,
         'high': jax.lax.Precision.HIGH,
         'highest': jax.lax.Precision.HIGHEST}
DENSE_PRECISION = _PREC[os.environ.get('BLUEICE_FUSED_DENSE_PRECISION',
                                       'highest').lower()]


def resolve_dense(dense):
    """Kernel-flavor default: explicit ``dense=`` wins; otherwise dense on
    the TPU backend (where the MXU combine measured 1.4-1.7x faster), gather
    elsewhere (bit-exact corner combine — what the interpret-mode parity
    oracles pin)."""
    if dense is not None:
        return bool(dense)
    return DENSE_DEFAULT and jax.default_backend() == 'tpu'


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pad_bins(arr, axis=-1):
    """Zero-pad the bin axis to a multiple of the TPU lane width."""
    arr = np.asarray(arr)
    n = arr.shape[axis]
    n_pad = _round_up(n, LANE)
    if n_pad == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis if axis >= 0 else arr.ndim + axis] = (0, n_pad - n)
    return np.pad(arr, pad)


def corner_offsets(strides, K):
    """(2^K,) int32 flattened-grid offsets of a cell's corner templates."""
    return jnp.asarray(
        [sum(int(c[d]) * int(strides[d]) for d in range(K))
         for c in itertools.product((0, 1), repeat=K)], dtype=jnp.int32)


def corner_ids(strides, idx, K):
    """Flattened-grid ids (2^K,) of the corner templates around the lower
    corner ``idx`` ((K,) per-axis scalar indices). Shared by every fused
    kernel module (fused_bb / fused_unbinned import it)."""
    if not K:
        return jnp.zeros((1,), dtype=jnp.int32)
    base = sum(jnp.asarray(idx[d], jnp.int32) * int(strides[d])
               for d in range(K))
    return base + corner_offsets(strides, K)


def corner_ids_batched(strides, idx, K, n_rows):
    """(n_rows, 2^K) corner ids for an (n_rows, K) lower-corner matrix."""
    if not K:
        return jnp.zeros((n_rows, 1), dtype=jnp.int32)
    idx = jnp.asarray(idx)
    base = sum(idx[:, d].astype(jnp.int32) * int(strides[d])
               for d in range(K))
    return base[:, None] + corner_offsets(strides, K)[None, :]


def fused_vgh_supported(anchor_flat_shape, dtype=jnp.float32,
                        vmem_budget=9 * 2 ** 20):
    """Whether the anchor tensor fits the VMEM-resident kernel."""
    g, s, n = anchor_flat_shape
    n_pad = _round_up(n, LANE)
    return g * s * n_pad * jnp.dtype(dtype).itemsize <= vmem_budget


def _vgh_kernel(ids_ref, w_ref, wd_ref, wx_ref, m_ref, obs_ref, anchor_hbm,
                ll_ref, g_ref, h_ref, scratch_ref, sem,
                *, S, K, C, pairs, blk):
    """Blocked-batch kernel body. Per grid step, ``blk`` toys.

    Shapes: ids (blk, C) int32 SMEM; w (blk, C), wd (blk, K|1, C),
    wx (blk, n_pairs|1, C), m (blk, S), obs (blk, N) VMEM;
    anchor (G, S, N) in HBM/ANY, copied once into scratch (VMEM, persists
    across the sequential grid steps); out: ll (blk, 1) SMEM, g (blk, P),
    h (blk, P, P) VMEM, P = S + K.
    """
    dtype = scratch_ref.dtype
    n_pairs = len(pairs)

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scratch_ref, sem)
        dma.start()
        dma.wait()

    def one_toy(ti, _):
        # Gather + multilinearly combine corner templates (C static: unrolled)
        P = None
        D = [None] * K
        X = [None] * n_pairs
        for c in range(C):
            row = scratch_ref[pl.ds(ids_ref[ti, c], 1)][0]       # (S, N)
            wc = w_ref[ti, c]
            P = wc * row if P is None else P + wc * row
            for d in range(K):
                term = wd_ref[ti, d, c] * row
                D[d] = term if D[d] is None else D[d] + term
            for pi in range(n_pairs):
                term = wx_ref[ti, pi, c] * row
                X[pi] = term if X[pi] is None else X[pi] + term

        m = m_ref[ti, :]                                       # (S,)
        obs = obs_ref[ti, :]                                   # (N,)

        lam = jnp.sum(m[:, None] * P, axis=0)                  # (N,)
        tiny = jnp.finfo(dtype).tiny
        lam_safe = jnp.maximum(lam, tiny)
        k_safe = jnp.where(obs > 0, obs, 1.0)

        # Negative-expectation penalty, matching binned_vgh/binned_ll (the
        # 'same contract' promise): inert for the usual nonnegative models,
        # but an allow_negative model forced onto this engine must see the
        # same penalized surface in value AND derivatives. Padded bins have
        # obs == 0 and lam == 0: every term vanishes exactly.
        pen = jnp.asarray(1e6, dtype=dtype)
        ll_ref[ti, 0] = jnp.sum(obs * jnp.log(lam_safe / k_safe)
                                - (lam - obs)
                                + pen * jnp.minimum(lam, 0.0))

        inv_lam = 1.0 / lam_safe
        # Keep r = -1 in empty-model bins (matching ops/binned_vgh.py): a bin
        # with lam == 0 at the evaluation point can still have nonzero corner
        # DIFFERENCES (one empty corner template on a cell edge), and its
        # -Dbar contribution to g_t is real. Padded bins are harmless either
        # way — their P and D rows are identically zero.
        r = obs * inv_lam - 1.0 + pen * (lam < 0).astype(dtype)
        q = obs * inv_lam * inv_lam

        # Gradient
        g_m = jnp.sum(P * r[None, :], axis=1)                  # (S,)
        if K:
            Dbar = jnp.stack([jnp.sum(m[:, None] * D[d], axis=0)
                              for d in range(K)])              # (K, N)
            g_t = jnp.sum(Dbar * r[None, :], axis=1)           # (K,)
            g_ref[pl.ds(ti, 1), :] = jnp.concatenate([g_m, g_t])[None, :]
        else:
            g_ref[pl.ds(ti, 1), :] = g_m[None, :]

        # Hessian blocks (small contractions: MXU)
        Pq = P * q[None, :]                                    # (S, N)
        H_mm = -jax.lax.dot_general(Pq, P, (((1,), (1,)), ((), ())),
                                    preferred_element_type=dtype)
        if K:
            H_mt = (-jax.lax.dot_general(Pq, Dbar,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=dtype)
                    + jnp.stack([jnp.sum(D[d] * r[None, :], axis=1)
                                 for d in range(K)], axis=1))  # (S, K)
            Dbq = Dbar * q[None, :]
            H_tt = -jax.lax.dot_general(Dbq, Dbar,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=dtype)
            if pairs:
                xr = {p: jnp.sum(jnp.sum(m[:, None] * X[pi], axis=0) * r)
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


def _ll_kernel(ids_ref, w_ref, m_ref, obs_ref, anchor_hbm,
               ll_ref, scratch_ref, sem, *, S, C, A, blk):
    """Value-only kernel: per grid step, ``blk`` toys x ``A`` parameter
    candidates each (the optimizer's line-search/polish batch), sharing the
    toy's dataset. ids (blk, A, C) SMEM; w (blk, A, C), m (blk, A, S),
    obs (blk, N) VMEM; out ll (blk, A) SMEM."""
    dtype = scratch_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scratch_ref, sem)
        dma.start()
        dma.wait()

    def one_toy(ti, _):
        obs = obs_ref[ti, :]
        k_safe = jnp.where(obs > 0, obs, 1.0)
        tiny = jnp.finfo(dtype).tiny
        for a in range(A):
            P = None
            for c in range(C):
                row = scratch_ref[pl.ds(ids_ref[ti, a, c], 1)][0]
                wc = w_ref[ti, a, c]
                P = wc * row if P is None else P + wc * row
            m = m_ref[ti, a, :]
            lam = jnp.sum(m[:, None] * P, axis=0)
            lam_safe = jnp.maximum(lam, tiny)
            # Same negative-expectation penalty as the vgh kernel / jnp twins
            ll_ref[ti, a] = jnp.sum(obs * jnp.log(lam_safe / k_safe)
                                    - (lam - obs)
                                    + jnp.asarray(1e6, dtype)
                                    * jnp.minimum(lam, 0.0))
        return 0

    jax.lax.fori_loop(0, blk, one_toy, 0)


@functools.lru_cache(maxsize=None)
def _build_ll_call(dtype_name, G, S, N, C, A, B, blk, interpret):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_ll_kernel, S=S, C=C, A=A, blk=blk)
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
            pl.BlockSpec(memory_space=pl.ANY),             # anchor (HBM)
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((G, S, N), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _ll_batched_impl(anchor_flat, ids_b, w_b, m_b, obs_b, interpret):
    """ids_b (B, A, C) int32, w_b (B, A, C), m_b (B, A, S), obs_b (B, N)
    -> ll (B, A)."""
    G, S, N = anchor_flat.shape
    B, A, C = ids_b.shape
    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        ids_b = jnp.concatenate([ids_b, jnp.zeros((padn, A, C),
                                                  ids_b.dtype)])
        w_b = jnp.concatenate([w_b, jnp.zeros((padn, A, C), w_b.dtype)])
        m_b = jnp.concatenate([m_b, jnp.zeros((padn, A, S), m_b.dtype)])
        obs_b = jnp.concatenate([obs_b, jnp.zeros((padn, N), obs_b.dtype)])
    call = _build_ll_call(str(anchor_flat.dtype), G, S, N, C, A, B_pad, blk,
                          interpret)
    return call(ids_b, w_b, m_b, obs_b, anchor_flat)[:B]


def _make_ll_custom_op(interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(anchor_flat, ids, w, m, obs):
        return _ll_batched_impl(anchor_flat, ids[None], w[None], m[None],
                                obs[None], interpret)[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor_flat, ids, w, m, obs):
        if in_batched[0]:
            anchor_flat = anchor_flat[0]     # cond-batching broadcast
        per_toy = []
        for arg, batched in zip((ids, w, m, obs), in_batched[1:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        return _ll_batched_impl(anchor_flat, *per_toy, interpret), True

    return op


def _get_ll_op(interpret):
    key = ('ll', interpret)
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_ll_custom_op(interpret)
    return _OP_CACHE[key]


def binned_ll_fused_multi(anchor_flat, strides, idx, t, m, observed,
                          interpret=False, dense=None):
    """Deviance-form LL at A parameter candidates sharing one dataset, via the
    VMEM-resident value kernel.

    :param idx: (A, K) int32 lower corners; t: (A, K) lerp weights;
      m: (A, S) rates; observed: (N,), N a multiple of 128.
    :return: (A,) log likelihoods (without the saturated-model constant).
    """
    anchor_flat = jnp.asarray(anchor_flat)
    G, S, N = anchor_flat.shape
    if N % LANE:
        raise ValueError("bin axis must be padded to a multiple of %d" % LANE)
    K = len(strides)
    C = 2 ** K
    dt = anchor_flat.dtype

    A = jnp.asarray(m).shape[0]
    ids = corner_ids_batched(strides, idx, K, A)               # (A, C)
    w = (jax.vmap(lambda tv: corner_weight_tables(tv)[0])(
        jnp.asarray(t, dt)) if K
        else jnp.ones((A, 1), dtype=dt))                       # (A, C)

    if resolve_dense(dense):
        ids_c = jnp.clip(ids, 0, G - 1)
        onehot = (ids_c[:, :, None]
                  == jnp.arange(G, dtype=jnp.int32)[None, None, :]) \
            .astype(dt)                                        # (A, C, G)
        W = jax.lax.dot_general(w, onehot, (((1,), (1,)), ((0,), (0,))),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=dt)     # (A, G)
        op = _get_ll_dense_op(bool(interpret))
        return op(anchor_flat.reshape(G, S * N), W, jnp.asarray(m, dt),
                  jnp.asarray(observed, dt))

    op = _get_ll_op(bool(interpret))
    return op(anchor_flat, ids, w, jnp.asarray(m, dt),
              jnp.asarray(observed, dt))


@functools.lru_cache(maxsize=None)
def _build_batched_call(dtype_name, G, S, N, K, B, blk, interpret):
    C = 2 ** K
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    n_pairs_in = max(len(pairs), 1)
    wd_dim = max(K, 1)
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_vgh_kernel, S=S, K=K, C=C, pairs=pairs,
                             blk=blk)
    grid = (B // blk,)
    return pl.pallas_call(
        kern,
        grid=grid,
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
            pl.BlockSpec(memory_space=pl.ANY),             # anchor (HBM)
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim, P_dim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((G, S, N), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _batched_impl(anchor_flat, ids_b, w_b, wd_b, wx_b, m_b, obs_b,
                  interpret):
    """ids_b (B, C) int32, w_b (B, C), wd_b (B, K|1, C), wx_b (B, NP|1, C),
    m_b (B, S), obs_b (B, N) -> (ll (B,), g (B, P), H (B, P, P))."""
    G, S, N = anchor_flat.shape
    B, C = ids_b.shape
    # C == 2^K; recover K from C
    K = int(round(np.log2(C)))

    blk = min(TOY_BLOCK, B)
    B_pad = _round_up(B, blk)
    if B_pad != B:
        padn = B_pad - B
        ids_b = jnp.concatenate([ids_b, jnp.zeros((padn, C), ids_b.dtype)])
        w_b = jnp.concatenate([w_b, jnp.zeros((padn,) + w_b.shape[1:],
                                              w_b.dtype)])
        wd_b = jnp.concatenate([wd_b, jnp.zeros((padn,) + wd_b.shape[1:],
                                                wd_b.dtype)])
        wx_b = jnp.concatenate([wx_b, jnp.zeros((padn,) + wx_b.shape[1:],
                                                wx_b.dtype)])
        m_b = jnp.concatenate([m_b, jnp.zeros((padn,) + m_b.shape[1:],
                                              m_b.dtype)])
        obs_b = jnp.concatenate([obs_b, jnp.zeros((padn,) + obs_b.shape[1:],
                                                  obs_b.dtype)])

    call = _build_batched_call(str(anchor_flat.dtype), G, S, N, K, B_pad,
                               blk, interpret)
    ll, g, H = call(ids_b, w_b, wd_b, wx_b, m_b, obs_b, anchor_flat)
    return ll[:B, 0], g[:B], H[:B]


def _make_custom_op(interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(anchor_flat, ids, w, wd, wx, m, obs):
        ll, g, H = _batched_impl(anchor_flat, ids[None], w[None], wd[None],
                                 wx[None], m[None], obs[None], interpret)
        return ll[0], g[0], H[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor_flat, ids, w, wd, wx, m, obs):
        # The anchor tensor never genuinely varies over toys in this library,
        # but lax.cond's batching rule broadcasts every operand (including
        # constants) when the predicate is batched — unbroadcast it.
        if in_batched[0]:
            anchor_flat = anchor_flat[0]
        # Broadcast any unbatched per-toy arguments (e.g. the cross-derivative
        # weight table, which is t-independent for K == 2, or all parameters
        # when only the data varies) to the batch
        per_toy = []
        for arg, batched in zip((ids, w, wd, wx, m, obs), in_batched[1:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        out = _batched_impl(anchor_flat, *per_toy, interpret)
        return out, (True, True, True)

    return op


_OP_CACHE = {}


def _get_op(interpret):
    if interpret not in _OP_CACHE:
        _OP_CACHE[interpret] = _make_custom_op(interpret)
    return _OP_CACHE[interpret]


def binned_vgh_fused(anchor_flat, strides, idx, t, m, observed,
                     interpret=False, dense=None):
    """Fused (ll, g, H) via the Pallas kernel. Same contract as
    :func:`blueice_tpu.ops.binned_vgh.binned_vgh`, but gathers the corner
    templates itself from the full flattened-grid anchor tensor.

    Under ``vmap``, the anchor tensor must be SHARED across the mapped axis
    (``in_axes=None`` for it; per-toy inputs batch normally). The custom
    batching rule reduces a batched anchor to its first element — correct
    for the lax.cond broadcasts that produce one, silently wrong for
    genuinely distinct per-toy anchor tensors (which this VMEM-resident
    design cannot serve anyway: one anchor copy is the whole point).

    vmap over the per-toy arguments dispatches one blocked-grid kernel with the
    anchor tensor DMA'd to VMEM exactly once (custom_batching rule).

    :param anchor_flat: (G, S, N) anchor templates, grid flattened, N a
      multiple of 128 (use :func:`pad_bins`).
    :param strides: static tuple of K ints — anchor-grid row strides.
    :param idx: (K,) int32 lower-corner index per axis.
    :param t: (K,) lerp weights.
    :param m: (S,) rates.
    :param observed: (N,) observed counts (padded bins zero).
    :return: (ll, g (S+K,), H (S+K, S+K)).
    """
    anchor_flat = jnp.asarray(anchor_flat)
    G, S, N = anchor_flat.shape
    if N % LANE:
        raise ValueError("bin axis must be padded to a multiple of %d "
                         "(use ops.fused.pad_bins)" % LANE)
    K = len(strides)
    C = 2 ** K

    ids = corner_ids(strides, idx, K)

    dt = anchor_flat.dtype
    w, wd, wx = corner_weight_tables(jnp.asarray(t, dt))
    pairs = [(d, e) for d in range(K) for e in range(d + 1, K)]
    wd_in = wd.astype(dt) if K else jnp.zeros((1, C), dt)
    wx_in = (jnp.stack([wx[d, e] for d, e in pairs]).astype(dt)
             if pairs else jnp.zeros((1, C), dt))

    if resolve_dense(dense):
        W = _dense_combine_rows(ids, w.astype(dt), wd, wx, pairs, K, G, dt)
        op = _get_dense_op(bool(interpret))
        return op(anchor_flat.reshape(G, S * N), W, jnp.asarray(m, dt),
                  jnp.asarray(observed, dt))
    op = _get_op(bool(interpret))
    return op(anchor_flat, ids, w.astype(dt), wd_in, wx_in,
              jnp.asarray(m, dt), jnp.asarray(observed, dt))


# ---------------------------------------------------------------------------
# Dense (toy-vectorized, MXU-combine) kernel flavor
# ---------------------------------------------------------------------------

def _dense_combine_rows(ids, w, wd, wx, pairs, K, G, dt):
    """(J, G) dense combine-weight rows for one toy: row 0 carries the value
    weights, rows 1..K the per-axis derivative weights, the rest the
    cross-pair weights — each scattered from the 2^K corner table onto the
    flattened anchor grid. ids are clamped exactly like the gather kernel's
    dynamic slices clamp out-of-range corners."""
    ids = jnp.clip(jnp.asarray(ids, jnp.int32), 0, G - 1)
    onehot = (ids[:, None] == jnp.arange(G, dtype=jnp.int32)[None, :]) \
        .astype(dt)                                            # (C, G)
    rows = [w[None, :]]
    if K:
        rows.append(wd.astype(dt))
    if pairs:
        rows.append(jnp.stack([wx[d, e] for d, e in pairs]).astype(dt))
    rows = jnp.concatenate(rows, axis=0)                       # (J, C)
    return jax.lax.dot_general(rows, onehot, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=dt)      # (J, G)


def _vgh_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, ll_ref, g_ref,
                      h_ref, scratch_ref, sem, *, S, K, pairs, blk, N):
    """Toy-vectorized kernel body. Per grid step, ``blk`` toys at once.

    Shapes: w (J*blk, G) VMEM — dense combine rows, component-major
    (row j*blk + t is component j of toy t); m (blk, S), obs (blk, N) VMEM;
    anchor (G, S*N) in HBM, copied once into VMEM scratch persisting across
    the sequential grid steps. Out: ll (blk, 1), g (blk, P), h (blk, P, P)
    VMEM, P = S + K. One MXU matmul computes every combine component of the
    block; all per-bin math runs on (blk, N) blocks.
    """
    dtype = scratch_ref.dtype
    P_dim = S + K

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scratch_ref, sem)
        dma.start()
        dma.wait()

    res = jax.lax.dot_general(w_ref[:], scratch_ref[:],
                              (((1,), (0,)), ((), ())),
                              precision=DENSE_PRECISION,
                              preferred_element_type=dtype)  # (J*blk, S*N)

    def comp(j):                                             # (blk, S*N)
        return res[j * blk:(j + 1) * blk, :]

    def src(block, s):                                       # (blk, N)
        return block[:, s * N:(s + 1) * N]

    def msum(block):
        """m-weighted sum over sources: (blk, S*N) -> (blk, N)."""
        acc = src(block, 0) * m[:, 0:1]
        for s in range(1, S):
            acc = acc + src(block, s) * m[:, s:s + 1]
        return acc

    def rsum(x):                                             # (blk, 1)
        return jnp.sum(x, axis=1, keepdims=True)

    m = m_ref[:]                                             # (blk, S)
    obs = obs_ref[:]                                         # (blk, N)

    Pv = comp(0)
    lam = msum(Pv)                                           # (blk, N)
    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(obs > 0, obs, 1.0)
    # Same negative-expectation penalty contract as the gather kernel.
    pen = jnp.asarray(1e6, dtype=dtype)
    ll_ref[:] = rsum(obs * jnp.log(lam_safe / k_safe) - (lam - obs)
                     + pen * jnp.minimum(lam, 0.0))

    inv_lam = 1.0 / lam_safe
    # r = -1 in empty-model bins; see the gather kernel's note.
    r = obs * inv_lam - 1.0 + pen * (lam < 0).astype(dtype)
    q = obs * inv_lam * inv_lam

    Ps = [src(Pv, s) for s in range(S)]
    g_cols = [rsum(Ps[s] * r) for s in range(S)]
    if K:
        D = [comp(1 + d) for d in range(K)]
        Dbar = [msum(D[d]) for d in range(K)]
        g_cols += [rsum(Dbar[d] * r) for d in range(K)]
    g_ref[:] = jnp.concatenate(g_cols, axis=1)               # (blk, P)

    # Hessian entries, symmetric halves computed once
    ent = {}
    Pq = [Ps[s] * q for s in range(S)]
    for s in range(S):
        for s2 in range(s, S):
            ent[(s, s2)] = -rsum(Pq[s] * Ps[s2])
    if K:
        for s in range(S):
            for d in range(K):
                ent[(s, S + d)] = (-rsum(Pq[s] * Dbar[d])
                                   + rsum(src(D[d], s) * r))
        Dq = [Dbar[d] * q for d in range(K)]
        for d in range(K):
            for e in range(d, K):
                val = -rsum(Dq[d] * Dbar[e])
                if d != e:
                    X = comp(1 + K + pairs.index((d, e)))
                    val = val + rsum(msum(X) * r)
                ent[(S + d, S + e)] = val
    rows = []
    for i in range(P_dim):
        cols = [ent[(min(i, j), max(i, j))] for j in range(P_dim)]
        rows.append(jnp.concatenate(cols, axis=1)[:, None, :])
    h_ref[:] = jnp.concatenate(rows, axis=1)                 # (blk, P, P)


def _ll_kernel_dense(w_ref, m_ref, obs_ref, anchor_hbm, ll_ref,
                     scratch_ref, sem, *, S, A, blk, N):
    """Toy-vectorized value-only kernel: ``blk`` toys x ``A`` candidates per
    grid step. w (A*blk, G) dense value rows, candidate-major (row a*blk + t
    is candidate a of toy t); m (A*blk, S) in the SAME row order; obs
    (blk, N); out ll (blk, A) VMEM. The matmul is looped per source so the
    live intermediate stays (A*blk, N) regardless of S."""
    dtype = scratch_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _load_anchor():
        dma = pltpu.make_async_copy(anchor_hbm, scratch_ref, sem)
        dma.start()
        dma.wait()

    m = m_ref[:]                                             # (A*blk, S)
    lam = None
    for s in range(S):
        res_s = jax.lax.dot_general(
            w_ref[:], scratch_ref[:, s * N:(s + 1) * N],
            (((1,), (0,)), ((), ())),
            precision=DENSE_PRECISION,
            preferred_element_type=dtype)                    # (A*blk, N)
        term = res_s * m[:, s:s + 1]
        lam = term if lam is None else lam + term

    obs = obs_ref[:]                                         # (blk, N)
    k_safe = jnp.where(obs > 0, obs, 1.0)
    tiny = jnp.finfo(dtype).tiny
    pen = jnp.asarray(1e6, dtype=dtype)
    for a in range(A):
        lam_a = lam[a * blk:(a + 1) * blk, :]
        lam_safe = jnp.maximum(lam_a, tiny)
        ll_ref[:, a:a + 1] = jnp.sum(
            obs * jnp.log(lam_safe / k_safe) - (lam_a - obs)
            + pen * jnp.minimum(lam_a, 0.0), axis=1, keepdims=True)


@functools.lru_cache(maxsize=None)
def _build_batched_call_dense(dtype_name, G, S, N, J, B, blk, K, interpret):
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_vgh_kernel_dense, S=S, K=K, pairs=pairs,
                             blk=blk, N=N)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=(jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, P_dim), dtype),
                   jax.ShapeDtypeStruct((B, P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec((J * blk, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # dense rows
            pl.BlockSpec((blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # m
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # obs
            pl.BlockSpec(memory_space=pl.ANY),               # anchor (HBM)
        ],
        out_specs=(pl.BlockSpec((blk, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((blk, P_dim, P_dim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((G, S * N), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _batched_impl_dense(anchor2d, W_b, m_b, obs_b, K, interpret):
    """W_b (B, J, G) dense combine rows, m_b (B, S), obs_b (B, N)
    -> (ll (B,), g (B, P), H (B, P, P))."""
    G = anchor2d.shape[0]
    SN = anchor2d.shape[1]
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
        W_b = jnp.concatenate([W_b, jnp.zeros((padn, J, G), W_b.dtype)])
        m_b = jnp.concatenate([m_b, jnp.zeros((padn, S), m_b.dtype)])
        obs_b = jnp.concatenate([obs_b, jnp.zeros((padn, N), obs_b.dtype)])

    # Component-major row order per block: row j*blk + t
    nb = B_pad // blk
    W_rows = W_b.reshape(nb, blk, J, G).transpose(0, 2, 1, 3) \
        .reshape(nb * J * blk, G)

    call = _build_batched_call_dense(str(anchor2d.dtype), G, S, N, J,
                                    B_pad, blk, K, interpret)
    ll, g, H = call(W_rows, m_b, obs_b, anchor2d)
    return ll[:B, 0], g[:B], H[:B]


def _make_dense_custom_op(interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(anchor2d, W, m, obs):
        J = W.shape[0]
        K = _k_of_j(J)
        ll, g, H = _batched_impl_dense(anchor2d, W[None], m[None],
                                       obs[None], K, interpret)
        return ll[0], g[0], H[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor2d, W, m, obs):
        if in_batched[0]:
            anchor2d = anchor2d[0]       # cond-batching broadcast
        per_toy = []
        for arg, batched in zip((W, m, obs), in_batched[1:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        J = per_toy[0].shape[1]
        out = _batched_impl_dense(anchor2d, *per_toy, K=_k_of_j(J),
                                  interpret=interpret)
        return out, (True, True, True)

    return op


def _k_of_j(J):
    """Recover K from the dense row count J = 1 + K + K*(K-1)/2."""
    for K in range(9):
        if 1 + K + K * (K - 1) // 2 == J:
            return K
    raise ValueError("no K matches J=%d" % J)


def _get_dense_op(interpret):
    key = ('dense', interpret)
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_dense_custom_op(interpret)
    return _OP_CACHE[key]


@functools.lru_cache(maxsize=None)
def _build_ll_call_dense(dtype_name, G, S, N, A, B, blk, interpret):
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_ll_kernel_dense, S=S, A=A, blk=blk, N=N)
    return pl.pallas_call(
        kern,
        grid=(B // blk,),
        out_shape=jax.ShapeDtypeStruct((B, A), dtype),
        in_specs=[
            pl.BlockSpec((A * blk, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # dense rows
            pl.BlockSpec((A * blk, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # m (row order)
            pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # obs
            pl.BlockSpec(memory_space=pl.ANY),               # anchor (HBM)
        ],
        out_specs=pl.BlockSpec((blk, A), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
        scratch_shapes=[pltpu.VMEM((G, S * N), dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )


def _ll_batched_impl_dense(anchor2d, W_b, m_b, obs_b, interpret):
    """W_b (B, A, G) dense value rows, m_b (B, A, S), obs_b (B, N)
    -> ll (B, A)."""
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
        W_b = jnp.concatenate([W_b, jnp.zeros((padn, A, G), W_b.dtype)])
        m_b = jnp.concatenate([m_b, jnp.zeros((padn, A, S), m_b.dtype)])
        obs_b = jnp.concatenate([obs_b, jnp.zeros((padn, N), obs_b.dtype)])
    nb = B_pad // blk
    # Candidate-major row order per block: row a*blk + t, for BOTH W and m
    W_rows = W_b.reshape(nb, blk, A, G).transpose(0, 2, 1, 3) \
        .reshape(nb * A * blk, G)
    m_rows = m_b.reshape(nb, blk, A, S).transpose(0, 2, 1, 3) \
        .reshape(nb * A * blk, S)
    call = _build_ll_call_dense(str(anchor2d.dtype), G, S, N, A, B_pad,
                                blk, interpret)
    return call(W_rows, m_rows, obs_b, anchor2d)[:B]


def _make_ll_dense_custom_op(interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(anchor2d, W, m, obs):
        return _ll_batched_impl_dense(anchor2d, W[None], m[None],
                                      obs[None], interpret)[0]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, anchor2d, W, m, obs):
        if in_batched[0]:
            anchor2d = anchor2d[0]
        per_toy = []
        for arg, batched in zip((W, m, obs), in_batched[1:]):
            if not batched:
                arg = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
            per_toy.append(arg)
        return _ll_batched_impl_dense(anchor2d, *per_toy, interpret), True

    return op


def _get_ll_dense_op(interpret):
    key = ('ll_dense', interpret)
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_ll_dense_custom_op(interpret)
    return _OP_CACHE[key]
