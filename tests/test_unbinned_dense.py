"""Parity of the single-stream dense unbinned engine (ops/unbinned_dense.py)
against the corner-gather closed forms it replaces on TPU — value, gradient,
Hessian and the A-candidate value batch, with and without float32 centering
and the outlier floor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blueice_tpu.ops.binned_vgh import gather_corners
from blueice_tpu.ops.unbinned_vgh import (unbinned_vgh, unbinned_ll,
                                          reference_center)
from blueice_tpu.ops.unbinned_dense import (unbinned_vgh_dense,
                                            unbinned_ll_dense_many)


def _setup(grid_shape, S, E, seed=0, dtype=np.float64, holes=False):
    rng = np.random.default_rng(seed)
    K = len(grid_shape)
    G = int(np.prod(grid_shape))
    ps = rng.uniform(0.01, 0.5, (G, S, E)).astype(dtype)
    if holes:
        ps[:, :, E // 3] = 0.0      # a dead event: exercises the outlier path
    strides = tuple(int(np.prod(grid_shape[d + 1:], dtype=int))
                    for d in range(K))
    idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
           for g in grid_shape]
    t = jnp.asarray(rng.uniform(0, 1, K), dtype)
    m = jnp.asarray(rng.uniform(5, 50, S), dtype)
    mask = jnp.asarray(rng.uniform(size=E) > 0.1)
    corners = gather_corners(
        jnp.asarray(ps).reshape(grid_shape + (S, E)), idx, K)
    return jnp.asarray(ps), strides, idx, t, m, mask, corners


@pytest.mark.parametrize('grid_shape,S,E', [((3,), 2, 96), ((3, 3), 3, 64),
                                            ((3, 3, 3, 3), 6, 160)])
@pytest.mark.parametrize('outlier', [0.0, 1e-12])
def test_vgh_dense_matches_gather(grid_shape, S, E, outlier):
    ps, strides, idx, t, m, mask, corners = _setup(
        grid_shape, S, E, holes=outlier != 0)
    ll_a, g_a, H_a = unbinned_vgh(corners, m, t, mask, outlier)
    ll_b, g_b, H_b = unbinned_vgh_dense(ps, strides, idx, t, m, mask,
                                        outlier_likelihood=outlier)
    np.testing.assert_allclose(float(ll_a), float(ll_b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b),
                               rtol=1e-9, atol=1e-10)


def test_vgh_dense_centered():
    ps, strides, idx, t, m, mask, corners = _setup((3, 3), 3, 64, seed=3)
    inv_ref, ref_msum, ref_ll = reference_center(corners, m, t, mask)
    ll_a, g_a, H_a = unbinned_vgh(corners, m, t, mask,
                                  inv_ref=inv_ref, ref_msum=ref_msum)
    ll_b, g_b, H_b = unbinned_vgh_dense(ps, strides, idx, t, m, mask,
                                        inv_ref=inv_ref, ref_msum=ref_msum)
    np.testing.assert_allclose(float(ll_a), float(ll_b),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize('outlier', [0.0, 1e-12])
def test_ll_dense_many_matches_per_candidate(outlier):
    grid_shape, S, E, A = (3, 3, 3, 3), 6, 160, 9
    rng = np.random.default_rng(7)
    ps, strides, _, _, _, mask, _ = _setup(grid_shape, S, E, seed=7,
                                           holes=outlier != 0)
    K = len(grid_shape)
    idxs = np.stack([rng.integers(0, g - 1, A) for g in grid_shape], axis=1)
    ts = jnp.asarray(rng.uniform(0, 1, (A, K)))
    ms = jnp.asarray(rng.uniform(5, 50, (A, S)))
    lls = unbinned_ll_dense_many(ps, strides, jnp.asarray(idxs, jnp.int32),
                                 ts, ms, mask, outlier_likelihood=outlier)
    for a in range(A):
        corners = gather_corners(
            ps.reshape(grid_shape + (S, E)),
            [jnp.asarray(i, jnp.int32) for i in idxs[a]], K)
        ll_ref = unbinned_ll(corners, ms[a], ts[a], mask, outlier)
        np.testing.assert_allclose(float(lls[a]), float(ll_ref), rtol=1e-12)


def test_ll_dense_many_centered_and_vgh_value_agree():
    """The vgh value and the A=1 candidate value must agree exactly enough
    for the Newton accept test (both centered the same way)."""
    ps, strides, idx, t, m, mask, corners = _setup((3, 3, 3, 3), 6, 160,
                                                   seed=11)
    inv_ref, ref_msum, _ = reference_center(corners, m, t, mask)
    ll_v, _, _ = unbinned_vgh_dense(ps, strides, idx, t, m, mask,
                                    inv_ref=inv_ref, ref_msum=ref_msum)
    ll_m = unbinned_ll_dense_many(
        ps, strides, jnp.stack(idx)[None], t[None], m[None], mask,
        inv_ref=inv_ref, ref_msum=ref_msum)[0]
    np.testing.assert_allclose(float(ll_v), float(ll_m),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_dense_engine_end_to_end_matches_gather():
    """The TPU single-stream dense engine, forced on the CPU backend, fits
    batched toys to the same optima as the default gather engine."""
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel import fitter
    from blueice_tpu.parallel.toys import UnbinnedToyStudy
    from blueice_tpu.test_helpers import conf_for_test

    conf = conf_for_test(mc=True, events_per_day=150.,
                         n_events_for_pdf=int(1e5))
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    key = jax.random.PRNGKey(13)
    res_gather = UnbinnedToyStudy(lf, engine='analytic').run(key, n_toys=16)
    assert not fitter._FORCE_DENSE_UNBINNED
    fitter._FORCE_DENSE_UNBINNED = True
    try:
        res_dense = UnbinnedToyStudy(lf, engine='analytic').run(key,
                                                                n_toys=16)
    finally:
        fitter._FORCE_DENSE_UNBINNED = False
    np.testing.assert_allclose(res_dense.max_ll, res_gather.max_ll,
                               rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(res_dense.x, res_gather.x,
                               rtol=1e-6, atol=1e-6)


def test_vgh_dense_grad_hess_vs_autodiff():
    """Closed forms against jax.grad/jax.hessian of the dense value."""
    ps, strides, idx, t, m, mask, _ = _setup((3, 3), 3, 48, seed=5)
    K, S = len(strides), m.shape[0]

    def val(mt):
        return unbinned_ll_dense_many(
            ps, strides, jnp.stack(idx)[None], mt[None, S:], mt[None, :S],
            mask)[0]

    mt0 = jnp.concatenate([m, t])
    _, g, H = unbinned_vgh_dense(ps, strides, idx, t, m, mask)
    np.testing.assert_allclose(np.asarray(jax.grad(val)(mt0)),
                               np.asarray(g), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jax.hessian(val)(mt0)),
                               np.asarray(H), rtol=1e-7, atol=1e-9)
