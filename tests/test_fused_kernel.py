"""The Pallas fused vgh kernel (interpret mode on CPU) must reproduce the jnp
analytic engine exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.ops.binned_vgh import binned_vgh, gather_corners
from blueice_tpu.ops.fused import (binned_vgh_fused, pad_bins,
                                   fused_vgh_supported)


def _setup(K=2, S=3, N=100, seed=0):
    rng = np.random.default_rng(seed)
    grid = tuple(3 for _ in range(K))
    tensor = rng.random(grid + (S, N)) + 0.01
    tensor_p = pad_bins(tensor)
    N_pad = tensor_p.shape[-1]
    G = int(np.prod(grid)) if K else 1
    anchor_flat = tensor_p.reshape((G, S, N_pad))
    strides = []
    acc = 1
    for g in reversed(grid):
        strides.insert(0, acc)
        acc *= g
    strides = tuple(int(np.prod(grid[d + 1:])) for d in range(K))
    observed = pad_bins(rng.poisson(3.0, N).astype(float))
    m = jnp.asarray(rng.random(S) * 10 + 1)
    t = jnp.asarray(rng.random(K))
    idx = [jnp.asarray(rng.integers(0, 2), jnp.int32) for _ in range(K)]
    return tensor_p, anchor_flat, strides, idx, t, m, observed, K


@pytest.mark.parametrize("K", [0, 1, 2, 3])
def test_fused_matches_jnp(K):
    tensor_p, anchor_flat, strides, idx, t, m, observed, K = _setup(K=K)

    ll_f, g_f, H_f = binned_vgh_fused(anchor_flat, strides, idx, t, m,
                                      observed, interpret=True)

    corners = (gather_corners(tensor_p, idx, K).reshape(
        (2 ** K, anchor_flat.shape[1], anchor_flat.shape[2]))
        if K else anchor_flat)
    ll_j, g_j, H_j = binned_vgh(corners, m, t, observed)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-8,
                               atol=1e-12)


def test_fused_under_vmap():
    """vmapped over toys (the fitter's usage pattern)."""
    tensor_p, anchor_flat, strides, idx, t, m, observed, K = _setup(K=2)
    rng = np.random.default_rng(3)
    n_toys = 4
    obs_b = jnp.asarray(pad_bins(rng.poisson(3.0, (n_toys, 100)).astype(float)))
    t_b = jnp.asarray(rng.random((n_toys, K)))
    idx_b = jnp.asarray(rng.integers(0, 2, (n_toys, K)), jnp.int32)
    m_b = jnp.asarray(rng.random((n_toys, 3)) * 10 + 1)

    def one(idx, t, m, obs):
        return binned_vgh_fused(anchor_flat, strides,
                                [idx[d] for d in range(K)], t, m, obs,
                                interpret=True)

    ll_b, g_b, H_b = jax.vmap(one)(idx_b, t_b, m_b, obs_b)
    assert ll_b.shape == (n_toys,)

    for i in range(n_toys):
        corners = gather_corners(tensor_p, [idx_b[i, d] for d in range(K)],
                                 K).reshape((4, 3, -1))
        ll_j, g_j, H_j = binned_vgh(corners, m_b[i], t_b[i], obs_b[i])
        np.testing.assert_allclose(float(ll_b[i]), float(ll_j), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g_j),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(H_b[i]), np.asarray(H_j),
                                   rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("K", [0, 1, 2, 3, 4])
def test_dense_flavor_matches_jnp(K):
    """The dense (toy-vectorized, MXU-combine) kernel flavor agrees with the
    jnp analytic engine. The combine is a real weighted matmul (not a
    bit-exact one-hot extract), so accumulation order differs from the
    gather flavor — tolerances are f32-roundoff-scaled rather than exact."""
    tensor_p, anchor_flat, strides, idx, t, m, observed, K = _setup(K=K)

    ll_f, g_f, H_f = binned_vgh_fused(anchor_flat, strides, idx, t, m,
                                      observed, interpret=True, dense=True)

    corners = (gather_corners(tensor_p, idx, K).reshape(
        (2 ** K, anchor_flat.shape[1], anchor_flat.shape[2]))
        if K else anchor_flat)
    ll_j, g_j, H_j = binned_vgh(corners, m, t, observed)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-4,
                               atol=1e-3 * float(np.abs(g_j).max()))
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-4,
                               atol=1e-3 * float(np.abs(H_j).max()))


def test_dense_flavor_under_vmap():
    """Dense flavor vmapped over toys (the fitter's usage pattern), plus the
    dense multi-candidate value kernel."""
    from blueice_tpu.ops.binned_vgh import binned_ll
    from blueice_tpu.ops.fused import binned_ll_fused_multi

    tensor_p, anchor_flat, strides, idx, t, m, observed, K = _setup(K=2)
    rng = np.random.default_rng(7)
    n_toys = 5                       # non-multiple of TOY_BLOCK: pads
    obs_b = jnp.asarray(pad_bins(
        rng.poisson(3.0, (n_toys, 100)).astype(float)))
    t_b = jnp.asarray(rng.random((n_toys, K)))
    idx_b = jnp.asarray(rng.integers(0, 2, (n_toys, K)), jnp.int32)
    m_b = jnp.asarray(rng.random((n_toys, 3)) * 10 + 1)

    def one(idx, t, m, obs):
        return binned_vgh_fused(anchor_flat, strides,
                                [idx[d] for d in range(K)], t, m, obs,
                                interpret=True, dense=True)

    ll_b, g_b, H_b = jax.vmap(one)(idx_b, t_b, m_b, obs_b)
    assert ll_b.shape == (n_toys,)

    for i in range(n_toys):
        corners = gather_corners(tensor_p, [idx_b[i, d] for d in range(K)],
                                 K).reshape((4, 3, -1))
        ll_j, g_j, H_j = binned_vgh(corners, m_b[i], t_b[i], obs_b[i])
        np.testing.assert_allclose(float(ll_b[i]), float(ll_j), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g_j),
                                   rtol=1e-4,
                                   atol=1e-3 * float(np.abs(g_j).max()))
        np.testing.assert_allclose(np.asarray(H_b[i]), np.asarray(H_j),
                                   rtol=1e-4,
                                   atol=1e-3 * float(np.abs(H_j).max()))

    # dense multi-candidate value kernel vs binned_ll, vmapped over toys
    A = 3
    t_c = jnp.asarray(rng.random((n_toys, A, K)))
    idx_c = jnp.asarray(rng.integers(0, 2, (n_toys, A, K)), jnp.int32)
    m_c = jnp.asarray(rng.random((n_toys, A, 3)) * 10 + 1)

    def many(idx, t, m, obs):
        return binned_ll_fused_multi(anchor_flat, strides, idx, t, m, obs,
                                     interpret=True, dense=True)

    lls = jax.vmap(many)(idx_c, t_c, m_c, obs_b)
    assert lls.shape == (n_toys, A)
    for i in range(n_toys):
        for a in range(A):
            corners = gather_corners(
                tensor_p, [idx_c[i, a, d] for d in range(K)],
                K).reshape((4, 3, -1))
            ll_j = binned_ll(corners, m_c[i, a], t_c[i, a], obs_b[i])
            np.testing.assert_allclose(float(lls[i, a]), float(ll_j),
                                       rtol=1e-5)


def test_pad_and_support_check():
    assert pad_bins(np.ones((3, 100))).shape == (3, 128)
    assert pad_bins(np.ones((3, 128))).shape == (3, 128)
    assert fused_vgh_supported((81, 6, 3100))
    assert not fused_vgh_supported((2000, 20, 10000))


def test_fused_penalty_matches_jnp_on_negative_bins():
    """The fused kernels carry the negative-expectation penalty in value AND
    derivatives, exactly like binned_vgh/binned_ll (regression: a model with
    an allow_negative source forced onto engine='pallas' optimized a
    penalty-free surface that its own jnp line-search value rejected)."""
    from blueice_tpu.ops.binned_vgh import binned_ll
    from blueice_tpu.ops.fused import binned_ll_fused_multi

    # K=0 (single anchor), 2 sources, second pushes one observed==0 bin
    # mildly net-negative: lam = [1.0, -0.3, 2.4] at m = (1.0, 0.8)
    corners = np.zeros((1, 2, 128))
    corners[0, 0, :3] = [1.0, 0.5, 2.0]
    corners[0, 1, :3] = [0.0, -1.0, 0.5]
    observed = np.zeros(128)
    observed[2] = 3.0
    m = jnp.asarray([1.0, 0.8])
    t = jnp.zeros((0,))
    strides, idx = (), []

    ll_f, g_f, H_f = binned_vgh_fused(corners, strides, idx, t, m,
                                      jnp.asarray(observed), interpret=True)
    ll_j, g_j, H_j = binned_vgh(corners, m, t, observed)
    assert float(ll_j) < -1e4          # the penalty actually engaged
    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-8,
                               atol=1e-12)

    # the multi-candidate value kernel agrees with binned_ll too
    ms = jnp.asarray([[1.0, 0.8], [1.0, 0.2], [2.0, 1.5]])
    lls_f = binned_ll_fused_multi(corners, strides,
                                  jnp.zeros((3, 0), jnp.int32),
                                  jnp.zeros((3, 0)), ms,
                                  jnp.asarray(observed), interpret=True)
    for a in range(3):
        ll_a = binned_ll(corners, ms[a], t, observed)
        np.testing.assert_allclose(float(lls_f[a]), float(ll_a), rtol=1e-10)
