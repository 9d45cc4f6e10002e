"""Closed-form Beeston-Barlow derivatives and the fused Pallas BB kernel.

Two layers of validation:
* ``bb_lam_parts`` (implicit differentiation of the reference's per-bin
  quadratic, blueice/likelihood.py:693-712) against the autodiff twins of
  ``bb_lambda`` — per-branch (general, U == 0 special, inert, empty-MC).
* The fused Pallas kernel (interpret mode on CPU) against the jnp analytic
  engine ``binned_bb_vgh`` / ``binned_bb_ll`` on every code path the fitter
  uses (single vgh, vmapped toys, multi-candidate value).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.ops.bb_vgh import (
    bb_lam_vgh, binned_bb_vgh, binned_bb_ll,
    _lam_val, _lam_grad, _lam_hess)
from blueice_tpu.ops.binned_vgh import gather_corners
from blueice_tpu.ops.fused_bb import (
    binned_bb_vgh_fused, binned_bb_ll_fused_multi, fused_bb_supported)


def _branch_inputs(seed=0, n=512):
    """Per-bin (P, N, U, M, T, d) spanning all branches of the BB root."""
    rng = np.random.default_rng(seed)
    P = rng.uniform(0, 2, n)
    N = rng.uniform(0, 50, n)
    U = rng.uniform(0, 5, n)
    M = rng.uniform(0.1, 3, n)
    T = rng.uniform(10, 100, n)
    d = rng.poisson(3.0, n).astype(float)
    U[:100] = 0.0           # special branch
    P[100:150] = 0.0        # inert bins
    N[150:200] = 0.0        # no MC statistics
    d[200:250] = 0.0        # empty data bins
    return np.stack([P, N, U, M, T], axis=1), d


def test_bb_lam_closed_form_matches_autodiff():
    v, d = _branch_inputs()
    lam_cf, gam_cf, om_cf = bb_lam_vgh(jnp.asarray(v), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(lam_cf), _lam_val(v, d),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gam_cf), _lam_grad(v, d),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(om_cf), _lam_hess(v, d),
                               rtol=1e-7, atol=1e-8)


def _setup(K=2, S=3, bb_i=1, n_bins=100, seed=7):
    rng = np.random.default_rng(seed)
    grid_shape = tuple(rng.integers(2, 4) + 1 for _ in range(K))
    G = int(np.prod(grid_shape)) if K else 1
    N_pad = 128
    anchor = np.zeros((G, S, N_pad))
    anchor[:, :, :n_bins] = rng.uniform(0.01, 1.0, (G, S, n_bins))
    anchor[:, :, :n_bins] /= anchor[:, :, :n_bins].sum(-1, keepdims=True)
    nme = np.zeros((G, N_pad))
    nme[:, :n_bins] = rng.uniform(0, 40, (G, n_bins))
    nme[:, 5] = 0.0                      # empty MC bin
    others = [s for s in range(S) if s != bb_i]
    anchor[:, others, 7] = 0.0           # U == 0 bin
    obs = np.zeros(N_pad)
    obs[:n_bins] = rng.poisson(3.0, n_bins).astype(float)
    strides = tuple(int(np.prod(grid_shape[dd + 1:])) for dd in range(K))

    # Grid-shaped twins for the gather_corners-based jnp reference; the jnp
    # engine wants the bb counts in full-(S,) layout (only row bb_i is read)
    anchor_grid = jnp.asarray(anchor).reshape(grid_shape + (S, N_pad))
    nme_full = np.zeros((G, S, N_pad))
    nme_full[:, bb_i] = nme
    nme_grid = jnp.asarray(nme_full).reshape(grid_shape + (S, N_pad))
    return (jnp.asarray(anchor), jnp.asarray(nme), anchor_grid, nme_grid,
            strides, grid_shape, jnp.asarray(obs))


@pytest.mark.parametrize("K", [0, 1, 2, 3])
def test_fused_bb_vgh_matches_jnp(K):
    S, bb_i = 3, 1
    (anchor, nme, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(11)
    idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
           for g in grid_shape]
    t = jnp.asarray(rng.uniform(0, 1, K))
    m = jnp.asarray(rng.uniform(1, 10, S))

    ll_f, g_f, H_f = binned_bb_vgh_fused(
        anchor, nme, strides, idx, t, m, obs, bb_i, interpret=True)

    cps = gather_corners(anchor_grid, idx, K) if K else anchor
    cnme = (gather_corners(nme_grid, idx, K) if K
            else nme_grid.reshape(1, S, -1))
    ll_j, g_j, H_j = binned_bb_vgh(cps, cnme, m, t, obs, bb_i)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-7,
                               atol=1e-9)


def test_fused_bb_vgh_under_vmap():
    K, S, bb_i = 2, 3, 1
    (anchor, nme, anchor_grid, nme_grid, strides, grid_shape,
     obs0) = _setup(K=K)
    rng = np.random.default_rng(3)
    n_toys = 5
    obs_b = np.zeros((n_toys, 128))
    obs_b[:, :100] = rng.poisson(3.0, (n_toys, 100)).astype(float)
    obs_b = jnp.asarray(obs_b)
    t_b = jnp.asarray(rng.uniform(0, 1, (n_toys, K)))
    idx_b = jnp.asarray(
        np.stack([rng.integers(0, g - 1, n_toys) for g in grid_shape],
                 axis=1), jnp.int32)
    m_b = jnp.asarray(rng.uniform(1, 10, (n_toys, S)))

    def one(idx, t, m, obs):
        return binned_bb_vgh_fused(anchor, nme, strides,
                                   [idx[d] for d in range(K)], t, m, obs,
                                   bb_i, interpret=True)

    ll_b, g_b, H_b = jax.vmap(one)(idx_b, t_b, m_b, obs_b)
    assert ll_b.shape == (n_toys,)
    for i in range(n_toys):
        ii = [idx_b[i, d] for d in range(K)]
        cps = gather_corners(anchor_grid, ii, K)
        cnme = gather_corners(nme_grid, ii, K)
        ll_j, g_j, H_j = binned_bb_vgh(cps, cnme, m_b[i], t_b[i], obs_b[i],
                                       bb_i)
        np.testing.assert_allclose(float(ll_b[i]), float(ll_j), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g_j),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(H_b[i]), np.asarray(H_j),
                                   rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("K", [0, 2])
def test_fused_bb_ll_multi_matches_jnp(K):
    S, bb_i = 3, 1
    (anchor, nme, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(5)
    A = 6
    if K:
        idxs = np.stack([rng.integers(0, g - 1, A) for g in grid_shape],
                        axis=1).astype(np.int32)
    else:
        idxs = np.zeros((A, 0), np.int32)
    ts = jnp.asarray(rng.uniform(0, 1, (A, K)))
    ms = jnp.asarray(rng.uniform(1, 10, (A, S)))

    lls = binned_bb_ll_fused_multi(anchor, nme, strides, jnp.asarray(idxs),
                                   ts, ms, obs, bb_i, interpret=True)
    assert lls.shape == (A,)
    for a in range(A):
        ii = [jnp.asarray(idxs[a, d], jnp.int32) for d in range(K)]
        cps = gather_corners(anchor_grid, ii, K) if K else anchor
        cnme = (gather_corners(nme_grid, ii, K) if K
                else nme_grid.reshape(1, S, -1))
        ll_j = binned_bb_ll(cps, cnme, ms[a], ts[a], obs, bb_i)
        np.testing.assert_allclose(float(lls[a]), float(ll_j), rtol=1e-10)


@pytest.mark.parametrize("K", [0, 1, 2, 3])
def test_dense_flavor_bb_vgh_matches_jnp(K):
    """The dense (toy-vectorized, MXU-combine) BB flavor agrees with the
    jnp analytic engine. The combine is a real weighted matmul, so
    tolerances are f32-roundoff-scaled rather than exact (see the binned
    dense tests in test_fused_kernel.py)."""
    S, bb_i = 3, 1
    (anchor, nme, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(11)
    idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
           for g in grid_shape]
    t = jnp.asarray(rng.uniform(0, 1, K))
    m = jnp.asarray(rng.uniform(1, 10, S))

    ll_f, g_f, H_f = binned_bb_vgh_fused(
        anchor, nme, strides, idx, t, m, obs, bb_i, interpret=True,
        dense=True)

    cps = gather_corners(anchor_grid, idx, K) if K else anchor
    cnme = (gather_corners(nme_grid, idx, K) if K
            else nme_grid.reshape(1, S, -1))
    ll_j, g_j, H_j = binned_bb_vgh(cps, cnme, m, t, obs, bb_i)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-3,
                               atol=1e-3 * float(np.abs(g_j).max()))
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-3,
                               atol=1e-3 * float(np.abs(H_j).max()))
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_f).T,
                               atol=1e-5 * float(np.abs(H_j).max()))


def test_dense_flavor_bb_vmap_and_multi():
    """Dense BB flavor under vmap (non-multiple-of-block batch) plus the
    dense multi-candidate value kernel."""
    K, S, bb_i = 2, 3, 1
    (anchor, nme, anchor_grid, nme_grid, strides, grid_shape,
     obs0) = _setup(K=K)
    rng = np.random.default_rng(3)
    n_toys = 5
    obs_b = np.zeros((n_toys, 128))
    obs_b[:, :100] = rng.poisson(3.0, (n_toys, 100)).astype(float)
    obs_b = jnp.asarray(obs_b)
    t_b = jnp.asarray(rng.uniform(0, 1, (n_toys, K)))
    idx_b = jnp.asarray(
        np.stack([rng.integers(0, g - 1, n_toys) for g in grid_shape],
                 axis=1), jnp.int32)
    m_b = jnp.asarray(rng.uniform(1, 10, (n_toys, S)))

    def one(idx, t, m, obs):
        return binned_bb_vgh_fused(anchor, nme, strides,
                                   [idx[d] for d in range(K)], t, m, obs,
                                   bb_i, interpret=True, dense=True)

    ll_b, g_b, H_b = jax.vmap(one)(idx_b, t_b, m_b, obs_b)
    assert ll_b.shape == (n_toys,)
    for i in range(n_toys):
        ii = [idx_b[i, d] for d in range(K)]
        cps = gather_corners(anchor_grid, ii, K)
        cnme = gather_corners(nme_grid, ii, K)
        ll_j, g_j, H_j = binned_bb_vgh(cps, cnme, m_b[i], t_b[i], obs_b[i],
                                       bb_i)
        np.testing.assert_allclose(float(ll_b[i]), float(ll_j), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g_j),
                                   rtol=1e-3,
                                   atol=1e-3 * float(np.abs(g_j).max()))
        np.testing.assert_allclose(np.asarray(H_b[i]), np.asarray(H_j),
                                   rtol=1e-3,
                                   atol=1e-3 * float(np.abs(H_j).max()))

    A = 4
    idx_c = jnp.asarray(
        np.stack([rng.integers(0, g - 1, (n_toys, A))
                  for g in grid_shape], axis=2), jnp.int32)
    t_c = jnp.asarray(rng.uniform(0, 1, (n_toys, A, K)))
    m_c = jnp.asarray(rng.uniform(1, 10, (n_toys, A, S)))
    lls = jax.vmap(lambda i, t, m, o: binned_bb_ll_fused_multi(
        anchor, nme, strides, i, t, m, o, bb_i, interpret=True,
        dense=True))(idx_c, t_c, m_c, obs_b)
    assert lls.shape == (n_toys, A)
    for b in range(n_toys):
        for a in range(A):
            ii = [idx_c[b, a, d] for d in range(K)]
            cps = gather_corners(anchor_grid, ii, K)
            cnme = gather_corners(nme_grid, ii, K)
            ll_j = binned_bb_ll(cps, cnme, m_c[b, a], t_c[b, a], obs_b[b],
                                bb_i)
            np.testing.assert_allclose(float(lls[b, a]), float(ll_j),
                                       rtol=1e-5)


def test_fused_bb_support_check():
    # 50x62-bin XENON-scale space: 3100 bins pad to 3200, x (S+1) x G anchors
    assert fused_bb_supported((16, 6, 3100))
    assert not fused_bb_supported((500, 20, 10000))
