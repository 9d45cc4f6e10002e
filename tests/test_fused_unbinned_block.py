"""The block-vectorized unbinned kernels (full-grid weights, whole-toy-block
array ops — the small-model fast path) must match the per-toy gather kernels
exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.ops import fused_unbinned as fu


def _setup(K=1, S=2, G=3, E=256, B=6, seed=0):
    rng = np.random.default_rng(seed)
    ps_b = jnp.asarray(rng.uniform(0.001, 0.4, (B, G, S, E)))
    n_valid = rng.integers(E // 2, E, B)
    mask_b = jnp.asarray(np.arange(E)[None, :] < n_valid[:, None])
    idx_b = jnp.asarray(rng.integers(0, max(G - 1, 1), (B, K)), jnp.int32)
    t_b = jnp.asarray(rng.uniform(0, 1, (B, K)))
    m_b = jnp.asarray(rng.uniform(100, 2000, (B, S)))
    strides = tuple(1 for _ in range(K))
    return ps_b, mask_b, idx_b, t_b, m_b, strides


@pytest.mark.parametrize("K,outlier", [(1, 0.0), (1, 1e-12), (0, 0.0)])
def test_block_vgh_matches_per_toy(K, outlier, monkeypatch):
    ps_b, mask_b, idx_b, t_b, m_b, strides = _setup(K=K)
    B = ps_b.shape[0]

    def run():
        fu._OP_CACHE.clear()

        def one(ps, i, t, m, mk):
            return fu.unbinned_vgh_fused(
                ps, strides, [i[d] for d in range(K)], t, m, mk,
                outlier=outlier, interpret=True)
        return jax.vmap(one)(ps_b, idx_b, t_b, m_b, mask_b)

    ll_blk, g_blk, H_blk = run()
    monkeypatch.setattr(fu, 'FULL_GRID_MAX', 0)   # force the per-toy kernel
    ll_ref, g_ref, H_ref = run()
    fu._OP_CACHE.clear()

    np.testing.assert_allclose(np.asarray(ll_blk), np.asarray(ll_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H_blk), np.asarray(H_ref),
                               rtol=1e-9, atol=1e-11)
    assert ll_blk.shape == (B,)


def test_block_ll_multi_matches_per_toy(monkeypatch):
    K = 1
    ps_b, mask_b, idx_b, t_b, m_b, strides = _setup(K=K)
    rng = np.random.default_rng(3)
    A = 5
    idxs = jnp.asarray(rng.integers(0, 2, (ps_b.shape[0], A, K)), jnp.int32)
    ts = jnp.asarray(rng.uniform(0, 1, (ps_b.shape[0], A, K)))
    ms = jnp.asarray(rng.uniform(100, 2000, (ps_b.shape[0], A, 2)))

    def run():
        fu._OP_CACHE.clear()

        def one(ps, ii, tt, mm, mk):
            return fu.unbinned_ll_fused_multi(ps, strides, ii, tt, mm, mk,
                                              interpret=True)
        return jax.vmap(one)(ps_b, idxs, ts, ms, mask_b)

    ll_blk = run()
    monkeypatch.setattr(fu, 'FULL_GRID_MAX', 0)
    ll_ref = run()
    fu._OP_CACHE.clear()
    np.testing.assert_allclose(np.asarray(ll_blk), np.asarray(ll_ref),
                               rtol=1e-12)


def test_centered_block_path(monkeypatch):
    """inv_ref / ref_msum centering rides through the block kernels."""
    ps_b, mask_b, idx_b, t_b, m_b, strides = _setup(K=1)
    inv_ref = jnp.asarray(
        np.random.default_rng(9).uniform(0.5, 2.0, ps_b.shape[-1]))

    def one(ps, i, t, m, mk):
        return fu.unbinned_vgh_fused(ps, strides, [i[0]], t, m, mk,
                                     interpret=True, inv_ref=inv_ref,
                                     ref_msum=jnp.asarray(1000.0))
    fu._OP_CACHE.clear()
    ll_blk, _, _ = jax.vmap(one)(ps_b, idx_b, t_b, m_b, mask_b)
    monkeypatch.setattr(fu, 'FULL_GRID_MAX', 0)
    fu._OP_CACHE.clear()
    ll_ref, _, _ = jax.vmap(one)(ps_b, idx_b, t_b, m_b, mask_b)
    fu._OP_CACHE.clear()
    np.testing.assert_allclose(np.asarray(ll_blk), np.asarray(ll_ref),
                               rtol=1e-12)
