"""Float32 centering of the unbinned extended LL (ops/unbinned_vgh.py).

At ~1e5 events a float32 sum of |log lam| terms is O(1e5), so its ulp is
~1e-2 — larger than the LL differences the Newton loop and the profile-LR
statistic are built from. The centered form evaluates
``-(sum m - sum m0) + sum log(lam/lam0)`` — every term O(1) — and adds the
(per-toy constant) reference LL back outside.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blueice_tpu.ops.unbinned_vgh import (unbinned_ll, unbinned_vgh,
                                          reference_center)


def _toy_problem(E=100_000, seed=0):
    rng = np.random.default_rng(seed)
    # 1 anchor cell (K=1 -> 2 corners), 2 sources, E events
    corners = rng.uniform(0.05, 1.0, size=(2, 2, E))
    mask = np.ones(E, dtype=bool)
    mask[-17:] = False
    m = np.array([0.9e5, 0.2e5])
    t = np.array([0.37])
    return corners, m, t, mask


def test_centered_equals_uncentered_in_f64():
    corners, m, t, mask = _toy_problem()
    inv_ref, ref_msum, ref_ll = reference_center(corners, m, t, mask)
    ll_plain = unbinned_ll(corners, m, t, mask)
    ll_centered = unbinned_ll(corners, m, t, mask,
                              inv_ref=inv_ref, ref_msum=ref_msum)
    assert float(ll_centered) == pytest.approx(0.0, abs=1e-9)
    # shifted point: centered + ref == plain
    m2, t2 = m * 1.01, t + 0.05
    ll2_plain = unbinned_ll(corners, m2, t2, mask)
    ll2_centered = unbinned_ll(corners, m2, t2, mask,
                               inv_ref=inv_ref, ref_msum=ref_msum)
    assert float(ll2_centered + ref_ll) == pytest.approx(float(ll2_plain),
                                                         rel=1e-12)
    # gradient/Hessian are center-independent
    _, g_a, H_a = unbinned_vgh(corners, m2, t2, mask)
    _, g_b, H_b = unbinned_vgh(corners, m2, t2, mask,
                               inv_ref=inv_ref, ref_msum=ref_msum)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b), rtol=1e-12)


def test_f32_differences_need_centering():
    """LL *differences* (what fits and profile statistics consume) survive
    float32 only on the centered path."""
    corners, m, t, mask = _toy_problem()
    m2, t2 = m * 1.001, t + 0.003

    # float64 truth
    d64 = float(unbinned_ll(corners, m2, t2, mask)
                - unbinned_ll(corners, m, t, mask))

    c32 = jnp.asarray(corners, jnp.float32)
    m32, m232 = jnp.asarray(m, jnp.float32), jnp.asarray(m2, jnp.float32)
    t32, t232 = jnp.asarray(t, jnp.float32), jnp.asarray(t2, jnp.float32)

    d32_plain = float(unbinned_ll(c32, m232, t232, mask)
                      - unbinned_ll(c32, m32, t32, mask))

    inv_ref, ref_msum, _ = reference_center(c32, m32, t32, mask)
    d32_centered = float(
        unbinned_ll(c32, m232, t232, mask, inv_ref=inv_ref,
                    ref_msum=ref_msum)
        - unbinned_ll(c32, m32, t32, mask, inv_ref=inv_ref,
                      ref_msum=ref_msum))

    err_plain = abs(d32_plain - d64)
    err_centered = abs(d32_centered - d64)
    # |d64| is O(10); uncentered f32 rounds the two O(1e5) sums first
    assert err_centered < 2e-2 * max(1.0, abs(d64))
    assert err_centered < err_plain / 5


def test_pallas_kernel_centered_matches_jnp():
    """The fused kernel's centered value (interpret mode on CPU) equals the
    jnp engine's centered value; derivatives are center-independent."""
    from blueice_tpu.ops.fused_unbinned import unbinned_vgh_fused
    from blueice_tpu.ops.binned_vgh import gather_corners

    rng = np.random.default_rng(3)
    G, S, E = 3, 2, 256           # 1D grid of 3 anchors -> K=1, E lane-padded
    ps_toy = jnp.asarray(rng.uniform(0.05, 1.0, size=(G, S, E)))
    mask = np.ones(E, dtype=bool)
    mask[-9:] = False
    m = jnp.asarray([900.0, 150.0])
    t = jnp.asarray([0.41])
    idx = [jnp.asarray(1)]
    corners = gather_corners(ps_toy.reshape((3,) + ps_toy.shape[1:]),
                             idx, 1)

    inv_ref, ref_msum, ref_ll = reference_center(corners, m, t, mask)
    ll_j, g_j, H_j = unbinned_vgh(corners, m, t, mask,
                                  inv_ref=inv_ref, ref_msum=ref_msum)
    ll_p, g_p, H_p = unbinned_vgh_fused(
        ps_toy, (1,), idx, t, m, mask, interpret=True,
        inv_ref=inv_ref, ref_msum=ref_msum)
    assert float(ll_p) == pytest.approx(float(ll_j), rel=1e-9, abs=1e-9)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(H_p), np.asarray(H_j), rtol=1e-9)
    # centered + ref == plain
    ll_plain = unbinned_ll(corners, m, t, mask)
    assert float(ll_p + ref_ll) == pytest.approx(float(ll_plain), rel=1e-9)


def test_f32_fit_at_1e5_events_matches_f64(tmp_path):
    """End to end: an f32 unbinned fit at ~1e5 events lands on the f64
    optimum of the SAME event set (the engine routes big-E float32 fits to
    the centered analytic path)."""
    from blueice_tpu.compile import build_logl
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel.fitter import make_toy_fitter
    from blueice_tpu.parallel.toys import UnbinnedToyStudy
    from blueice_tpu.test_helpers import conf_for_test

    conf = conf_for_test(n_sources=2, events_per_day=5e4,
                         cache_dir=str(tmp_path / 'c'),
                         task_dir=str(tmp_path / 't'))
    conf['sources'][1]['mu'] = 3.0
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()

    # One sampled + scored event set, shared by both precisions
    study = UnbinnedToyStudy(lf, dtype=jnp.float64)
    assert study.n_max > 90_000
    weights = study.expected_weights()
    coords, mask, bins = study._sample_one(jax.random.PRNGKey(0), weights)
    ps64 = study._score_sampled(coords, bins)

    results = {}
    for dtype in (jnp.float64, jnp.float32):
        compiled = build_logl(lf, dtype=dtype)
        fit_one, names = make_toy_fitter(
            compiled, max_iter=60,
            tol=1e-8 if dtype == jnp.float64 else 3e-4)
        x, ll, it = fit_one(jnp.asarray(ps64, dtype=dtype), mask)
        results[dtype] = (np.asarray(x), float(ll), names)

    x64, ll64, names = results[jnp.float64]
    x32, ll32, _ = results[jnp.float32]
    i = names.index('s0_rate_multiplier')
    assert x32[i] == pytest.approx(x64[i], rel=2e-3)
    # absolute LL agrees to the f32 rounding of the (constant) reference:
    # one ulp at |LL| ~ 8.5e5 is 0.0625, so allow a couple of ulp. The fitted
    # optimum value itself is resolved far more finely than that
    assert ll32 == pytest.approx(ll64, abs=3 * np.spacing(np.float32(ll64)))
