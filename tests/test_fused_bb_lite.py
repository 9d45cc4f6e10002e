"""The fused Pallas Barlow-Beeston-lite kernel (interpret mode on CPU)
against the jnp analytic engine ``binned_bblite_vgh``/``binned_bblite_ll``
on every code path the fitter uses (single vgh, vmapped toys,
multi-candidate value), plus the end-to-end pallas fit engine on a bb_lite
model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.ops.bb_lite import binned_bblite_vgh, binned_bblite_ll
from blueice_tpu.ops.binned_vgh import gather_corners
from blueice_tpu.ops.fused_bb_lite import (
    binned_bblite_vgh_fused, binned_bblite_ll_fused_multi,
    fused_bblite_supported)


def _setup(K=2, S=3, n_bins=100, seed=7):
    rng = np.random.default_rng(seed)
    grid_shape = tuple(rng.integers(2, 4) + 1 for _ in range(K))
    G = int(np.prod(grid_shape)) if K else 1
    N_pad = 128
    anchor = np.zeros((G, S, N_pad))
    anchor[:, :, :n_bins] = rng.uniform(0.01, 1.0, (G, S, n_bins))
    anchor[:, :, :n_bins] /= anchor[:, :, :n_bins].sum(-1, keepdims=True)
    nme_full = np.zeros((G, S, N_pad))
    nme_full[:, :, :n_bins] = rng.uniform(0, 40, (G, S, n_bins))
    nme_full[:, :, 5] = 0.0              # M == 0 bin (no MC anywhere)
    anchor[:, :, 7] = 0.0                # lam == 0 bin with MC counts
    obs = np.zeros(N_pad)
    obs[:n_bins] = rng.poisson(3.0, n_bins).astype(float)
    obs[11] = 0.0                        # empty data bin
    strides = tuple(int(np.prod(grid_shape[dd + 1:])) for dd in range(K))

    # Grid-shaped twins for the gather_corners-based jnp reference (the jnp
    # engine takes per-source MC counts and sums inside); the fused kernel
    # takes the pre-summed total rows
    anchor_grid = jnp.asarray(anchor).reshape(grid_shape + (S, N_pad))
    nme_grid = jnp.asarray(nme_full).reshape(grid_shape + (S, N_pad))
    nme_tot = jnp.asarray(nme_full.sum(axis=1))                # (G, N_pad)
    return (jnp.asarray(anchor), nme_tot, anchor_grid, nme_grid,
            strides, grid_shape, jnp.asarray(obs))


@pytest.mark.parametrize("K", [0, 1, 2, 3])
def test_fused_bblite_vgh_matches_jnp(K):
    S = 3
    (anchor, nme_tot, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(11)
    idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
           for g in grid_shape]
    t = jnp.asarray(rng.uniform(0, 1, K))
    m = jnp.asarray(rng.uniform(1, 10, S))

    ll_f, g_f, H_f = binned_bblite_vgh_fused(
        anchor, nme_tot, strides, idx, t, m, obs, interpret=True)

    cps = gather_corners(anchor_grid, idx, K) if K else anchor
    cnme = (gather_corners(nme_grid, idx, K) if K
            else nme_grid.reshape(1, S, -1))
    ll_j, g_j, H_j = binned_bblite_vgh(cps, cnme, m, t, obs)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_f).T,
                               atol=1e-9)


def test_fused_bblite_vgh_under_vmap():
    """The custom_vmap batch rule: a batch of toys in one kernel launch
    equals per-toy calls."""
    K, S = 2, 3
    (anchor, nme_tot, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(3)
    B = 5
    idxs = jnp.asarray(
        np.stack([rng.integers(0, g - 1, B) for g in grid_shape], axis=1),
        jnp.int32)
    ts = jnp.asarray(rng.uniform(0, 1, (B, K)))
    ms = jnp.asarray(rng.uniform(1, 10, (B, S)))
    obs_b = jnp.asarray(rng.poisson(3.0, (B,) + obs.shape).astype(float)
                        * (np.asarray(obs)[None] > -1))
    obs_b = obs_b * (jnp.asarray(np.asarray(anchor).sum((0, 1)))[None] > 0)

    ll_b, g_b, H_b = jax.vmap(
        lambda i, t, m, o: binned_bblite_vgh_fused(
            anchor, nme_tot, strides, [i[d] for d in range(K)], t, m, o,
            interpret=True))(idxs, ts, ms, obs_b)

    for b in range(B):
        ll_1, g_1, H_1 = binned_bblite_vgh_fused(
            anchor, nme_tot, strides, [idxs[b, d] for d in range(K)],
            ts[b], ms[b], obs_b[b], interpret=True)
        np.testing.assert_allclose(float(ll_b[b]), float(ll_1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_b[b]), np.asarray(g_1),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(H_b[b]), np.asarray(H_1),
                                   rtol=1e-12)


@pytest.mark.parametrize("K", [0, 2])
def test_fused_bblite_ll_multi_matches_jnp(K):
    S = 3
    (anchor, nme_tot, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(5)
    A = 6
    idxs = jnp.asarray(
        np.stack([rng.integers(0, g - 1, A) for g in grid_shape], axis=1)
        if K else np.zeros((A, 0)), jnp.int32)
    ts = jnp.asarray(rng.uniform(0, 1, (A, K)))
    ms = jnp.asarray(rng.uniform(1, 10, (A, S)))

    lls = binned_bblite_ll_fused_multi(anchor, nme_tot, strides, idxs,
                                       ts, ms, obs, interpret=True)
    assert lls.shape == (A,)
    for a in range(A):
        idx = [idxs[a, d] for d in range(K)]
        cps = gather_corners(anchor_grid, idx, K) if K else anchor
        cnme = (gather_corners(nme_grid, idx, K) if K
                else nme_grid.reshape(1, S, -1))
        ll_j = binned_bblite_ll(cps, cnme, ms[a], ts[a], obs)
        np.testing.assert_allclose(float(lls[a]), float(ll_j), rtol=1e-10)


@pytest.mark.parametrize("K", [0, 1, 2, 3])
def test_dense_flavor_bblite_vgh_matches_jnp(K):
    """The dense (toy-vectorized, MXU-combine) lite flavor agrees with the
    jnp analytic engine. The combine is a real weighted matmul, so
    tolerances are f32-roundoff-scaled rather than exact (see the binned
    dense tests in test_fused_kernel.py)."""
    S = 3
    (anchor, nme_tot, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(11)
    idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
           for g in grid_shape]
    t = jnp.asarray(rng.uniform(0, 1, K))
    m = jnp.asarray(rng.uniform(1, 10, S))

    ll_f, g_f, H_f = binned_bblite_vgh_fused(
        anchor, nme_tot, strides, idx, t, m, obs, interpret=True,
        dense=True)

    cps = gather_corners(anchor_grid, idx, K) if K else anchor
    cnme = (gather_corners(nme_grid, idx, K) if K
            else nme_grid.reshape(1, S, -1))
    ll_j, g_j, H_j = binned_bblite_vgh(cps, cnme, m, t, obs)

    np.testing.assert_allclose(float(ll_f), float(ll_j), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), rtol=1e-4,
                               atol=1e-3 * float(np.abs(g_j).max()))
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_j), rtol=1e-3,
                               atol=1e-3 * float(np.abs(H_j).max()))
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_f).T,
                               atol=1e-5 * float(np.abs(H_j).max()))


def test_dense_flavor_bblite_vmap_and_multi():
    """Dense lite flavor under vmap (non-multiple-of-block batch) plus the
    dense multi-candidate value kernel."""
    K, S = 2, 3
    (anchor, nme_tot, anchor_grid, nme_grid, strides, grid_shape,
     obs) = _setup(K=K)
    rng = np.random.default_rng(3)
    B = 5
    idxs = jnp.asarray(
        np.stack([rng.integers(0, g - 1, B) for g in grid_shape], axis=1),
        jnp.int32)
    ts = jnp.asarray(rng.uniform(0, 1, (B, K)))
    ms = jnp.asarray(rng.uniform(1, 10, (B, S)))
    obs_b = jnp.asarray(rng.poisson(3.0, (B,) + obs.shape).astype(float))
    obs_b = obs_b * (jnp.asarray(np.asarray(anchor).sum((0, 1)))[None] > 0)

    ll_b, g_b, H_b = jax.vmap(
        lambda i, t, m, o: binned_bblite_vgh_fused(
            anchor, nme_tot, strides, [i[d] for d in range(K)], t, m, o,
            interpret=True, dense=True))(idxs, ts, ms, obs_b)

    for b in range(B):
        idx = [idxs[b, d] for d in range(K)]
        cps = gather_corners(anchor_grid, idx, K)
        cnme = gather_corners(nme_grid, idx, K)
        ll_j, g_j, H_j = binned_bblite_vgh(cps, cnme, ms[b], ts[b],
                                           obs_b[b])
        np.testing.assert_allclose(float(ll_b[b]), float(ll_j), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[b]), np.asarray(g_j),
                                   rtol=1e-4,
                                   atol=1e-3 * float(np.abs(g_j).max()))
        np.testing.assert_allclose(np.asarray(H_b[b]), np.asarray(H_j),
                                   rtol=1e-3,
                                   atol=1e-3 * float(np.abs(H_j).max()))

    A = 4
    idx_c = jnp.asarray(
        np.stack([rng.integers(0, g - 1, (B, A)) for g in grid_shape],
                 axis=2), jnp.int32)
    t_c = jnp.asarray(rng.uniform(0, 1, (B, A, K)))
    m_c = jnp.asarray(rng.uniform(1, 10, (B, A, S)))
    lls = jax.vmap(lambda i, t, m, o: binned_bblite_ll_fused_multi(
        anchor, nme_tot, strides, i, t, m, o, interpret=True,
        dense=True))(idx_c, t_c, m_c, obs_b)
    assert lls.shape == (B, A)
    for b in range(B):
        for a in range(A):
            idx = [idx_c[b, a, d] for d in range(K)]
            cps = gather_corners(anchor_grid, idx, K)
            cnme = gather_corners(nme_grid, idx, K)
            ll_j = binned_bblite_ll(cps, cnme, m_c[b, a], t_c[b, a],
                                    obs_b[b])
            np.testing.assert_allclose(float(lls[b, a]), float(ll_j),
                                       rtol=1e-5)


def test_fused_bblite_support_check():
    assert fused_bblite_supported((16, 6, 3100))
    assert not fused_bblite_supported((500, 20, 10000))


@pytest.mark.slow
def test_bblite_pallas_engine_matches_analytic_fits():
    """End to end: the pallas fit engine (interpret mode on CPU) reproduces
    the jnp analytic engine's fits on a bb_lite model."""
    from blueice_tpu.test_helpers import conf_for_test
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.parallel import BinnedToyStudy
    from blueice_tpu.parallel.fitter import make_toy_fitter

    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(2e4))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['mu'] = 3.0
    lf = BinnedLogLikelihood(conf, likelihood_config={
        'model_statistical_uncertainty_handling': 'bb_lite'})
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1, 2))
    lf.prepare()

    study = BinnedToyStudy(lf)
    counts = study.simulate(jax.random.PRNGKey(1), 4)

    fit_an, names = make_toy_fitter(study.compiled, engine='analytic')
    fit_pl, names2 = make_toy_fitter(study.compiled, engine='pallas')
    assert names == names2

    x_an, ll_an, _ = jax.jit(jax.vmap(lambda d: fit_an(d)))(counts)
    x_pl, ll_pl, _ = jax.jit(jax.vmap(lambda d: fit_pl(d)))(counts)

    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_an),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_an),
                               rtol=1e-6, atol=1e-8)
