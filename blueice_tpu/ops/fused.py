"""Pallas TPU kernel: fused analytic (LL, gradient, Hessian) of the binned
Poisson likelihood over anchor templates.

This is the Pallas port of :func:`blueice_tpu.ops.binned_vgh.binned_vgh`, the
hot inner op of every Newton iteration of every toy fit. The XLA version
re-reads the 2^K corner templates from HBM on each derivative pass of each
iteration of each toy; here the whole anchor tensor is pinned in VMEM (it is
small: anchors x sources x bins, ~6 MB for a XENON1T-style model) and the
corner gather, multilinear combination, per-bin residual math and all (S+K)^2
curvature reductions happen in one kernel — the only HBM traffic is the tiny
per-toy inputs/outputs.

The kernel computes derivatives *analytically* (the morphed template is
multilinear in the lerp weights and linear in the rates — see
ops/binned_vgh.py for the math), so no autodiff traces through the
pallas_call: the fitter consumes (ll, g, H) directly.

The bin axis must be padded to a multiple of 128 (TPU lane width) with
all-zero template/data bins — zero bins contribute exactly nothing to the
deviance-form likelihood and its derivatives.
"""

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_vgh import corner_weight_tables

__all__ = ['binned_vgh_fused', 'fused_vgh_supported', 'pad_bins']

LANE = 128


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


def fused_vgh_supported(anchor_flat_shape, dtype=jnp.float32,
                        vmem_budget=10 * 2 ** 20):
    """Whether the anchor tensor fits the VMEM-resident kernel."""
    g, s, n = anchor_flat_shape
    n_pad = _round_up(n, LANE)
    return g * s * n_pad * jnp.dtype(dtype).itemsize <= vmem_budget


def _vgh_kernel(ids_ref, w_ref, wd_ref, wx_ref, m_ref, obs_ref, anchor_ref,
                ll_ref, g_ref, h_ref, *, S, K, C, pairs):
    """Single-toy kernel body.

    Shapes: ids (C,) int32 SMEM; w (1, C), wd (K|1, C), wx (n_pairs|1, C),
    m (1, S), obs (1, N) VMEM; anchor (G, S, N) VMEM (resident);
    out: ll (1, 1), g (1, P), h (P, P) VMEM, P = S + K.
    """
    dtype = anchor_ref.dtype

    # Gather + multilinearly combine corner templates (C static: unrolled)
    P = None
    D = [None] * K
    X = [None] * len(pairs)
    for c in range(C):
        row = anchor_ref[pl.ds(ids_ref[c], 1)][0]          # (S, N)
        wc = w_ref[0, c]
        P = wc * row if P is None else P + wc * row
        for d in range(K):
            term = wd_ref[d, c] * row
            D[d] = term if D[d] is None else D[d] + term
        for pi in range(len(pairs)):
            term = wx_ref[pi, c] * row
            X[pi] = term if X[pi] is None else X[pi] + term

    m = m_ref[0, :]                                        # (S,)
    obs = obs_ref[0, :]                                    # (N,)

    lam = jnp.sum(m[:, None] * P, axis=0)                  # (N,)
    tiny = jnp.finfo(dtype).tiny
    lam_safe = jnp.maximum(lam, tiny)
    k_safe = jnp.where(obs > 0, obs, 1.0)

    # Padded bins have obs == 0 and lam == 0: both terms vanish exactly
    ll_ref[0, 0] = jnp.sum(obs * jnp.log(lam_safe / k_safe) - (lam - obs))

    inv_lam = 1.0 / lam_safe
    r = obs * inv_lam - 1.0                                # (N,)
    # r must be 0 (not -1) in padded all-zero bins for the derivative sums
    r = jnp.where((obs == 0) & (lam == 0), 0.0, r)
    q = obs * inv_lam * inv_lam                            # (N,)

    # Gradient
    g_m = jnp.sum(P * r[None, :], axis=1)                  # (S,)
    if K:
        Dbar = jnp.stack([jnp.sum(m[:, None] * D[d], axis=0)
                          for d in range(K)])              # (K, N)
        g_t = jnp.sum(Dbar * r[None, :], axis=1)           # (K,)
        g_ref[0, :] = jnp.concatenate([g_m, g_t])
    else:
        g_ref[0, :] = g_m

    # Hessian blocks (small matmuls: MXU)
    Pq = P * q[None, :]                                    # (S, N)
    H_mm = -jax.lax.dot_general(Pq, P, (((1,), (1,)), ((), ())),
                                preferred_element_type=dtype)      # (S, S)
    if K:
        H_mt = (-jax.lax.dot_general(Pq, Dbar, (((1,), (1,)), ((), ())),
                                     preferred_element_type=dtype)
                + jnp.stack([jnp.sum(D[d] * r[None, :], axis=1)
                             for d in range(K)], axis=1))          # (S, K)
        Dbq = Dbar * q[None, :]
        H_tt = -jax.lax.dot_general(Dbq, Dbar, (((1,), (1,)), ((), ())),
                                    preferred_element_type=dtype)  # (K, K)
        if pairs:
            xr = {p: jnp.sum(jnp.sum(m[:, None] * X[pi], axis=0) * r)
                  for pi, p in enumerate(pairs)}
            zero = jnp.zeros((), dtype=dtype)
            # Assemble without scatter (Mosaic-friendly): static K x K stack
            upd = jnp.stack([
                jnp.stack([xr.get((min(d, e), max(d, e)), zero)
                           if d != e else zero for e in range(K)])
                for d in range(K)])
            H_tt = H_tt + upd
        top = jnp.concatenate([H_mm, H_mt], axis=1)
        bottom = jnp.concatenate([H_mt.T, H_tt], axis=1)
        h_ref[:, :] = jnp.concatenate([top, bottom], axis=0)
    else:
        h_ref[:, :] = H_mm


@functools.lru_cache(maxsize=None)
def _build_call(dtype_name, G, S, N, K, interpret):
    C = 2 ** K
    pairs = tuple((d, e) for d in range(K) for e in range(d + 1, K))
    P_dim = S + K
    dtype = jnp.dtype(dtype_name)
    kern = functools.partial(_vgh_kernel, S=S, K=K, C=C, pairs=pairs)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, 1), dtype),
                   jax.ShapeDtypeStruct((1, P_dim), dtype),
                   jax.ShapeDtypeStruct((P_dim, P_dim), dtype)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # ids
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wd
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wx
            pl.BlockSpec(memory_space=pltpu.VMEM),    # m
            pl.BlockSpec(memory_space=pltpu.VMEM),    # obs
            pl.BlockSpec(memory_space=pltpu.VMEM),    # anchor (resident)
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=bool(interpret),
    )


def binned_vgh_fused(anchor_flat, strides, idx, t, m, observed,
                     interpret=False):
    """Fused (ll, g, H) via the Pallas kernel. Same contract as
    :func:`blueice_tpu.ops.binned_vgh.binned_vgh`, but gathers the corner
    templates itself from the full flattened-grid anchor tensor.

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

    corners = list(itertools.product((0, 1), repeat=K))
    if K:
        base = sum(jnp.asarray(idx[d], jnp.int32) * int(strides[d])
                   for d in range(K))
        offs = jnp.asarray(
            [sum(int(c[d]) * int(strides[d]) for d in range(K))
             for c in corners], dtype=jnp.int32)
        ids = base + offs
    else:
        ids = jnp.zeros((1,), dtype=jnp.int32)

    dt = anchor_flat.dtype
    w, wd, wx = corner_weight_tables(jnp.asarray(t, dt))
    pairs = [(d, e) for d in range(K) for e in range(d + 1, K)]
    wd_in = wd.astype(dt) if K else jnp.zeros((1, C), dt)
    wx_in = (jnp.stack([wx[d, e] for d, e in pairs]).astype(dt)
             if pairs else jnp.zeros((1, C), dt))

    call = _build_call(str(dt), G, S, N, K, interpret)
    ll, g, H = call(ids, w.astype(dt)[None, :], wd_in, wx_in,
                    jnp.asarray(m, dt)[None, :],
                    jnp.asarray(observed, dt)[None, :],
                    anchor_flat)
    return ll[0, 0], g[0], H
