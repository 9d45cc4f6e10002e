"""Unit tests of the device-side ops against numpy/scipy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy import stats
from scipy.interpolate import RegularGridInterpolator

from blueice_tpu.ops import (Hist, morph_templates, morph_templates_np,
                             interp_at_points, interp_at_points_np,
                             piecewise_lookup, poisson_logpmf,
                             binned_poisson_logl, extended_logl,
                             sample_from_template)


def test_hist_basics():
    h = Hist([[0, 1, 5], [0, 1, 4]])
    h.add(np.array([0.5, 1.5, 0.5]), np.array([0.5, 0.5, 2.0]))
    assert h.n == 3
    np.testing.assert_array_equal(h.values, [[1, 1], [1, 0]])
    np.testing.assert_array_equal(h.bin_volumes(), [[1, 3], [4, 12]])
    np.testing.assert_array_equal(h.bin_centers(0), [0.5, 3.0])
    # lookup: clipping and edge conventions
    np.testing.assert_array_equal(
        h.lookup(np.array([0.5, 1.5, 100.0]), np.array([0.5, 3.0, 100.0])),
        [1, 0, 0])
    # left-edge inclusive: x=1 goes in the second bin
    assert h.lookup(np.array([1.0]), np.array([0.5]))[0] == 1
    blank = h.similar_blank()
    assert blank.n == 0 and blank.shape == h.shape


def test_hist_get_random():
    h = Hist([[0, 1, 2]])
    h.values = np.array([1.0, 3.0])
    pts = h.get_random(10000, rng=42)
    assert pts.shape == (10000, 1)
    frac_hi = (pts[:, 0] > 1).mean()
    assert abs(frac_hi - 0.75) < 0.02


def test_morph_matches_scipy_rgi():
    rng = np.random.default_rng(0)
    axes = [np.array([0.0, 1.0, 2.5]), np.array([-1.0, 0.5])]
    tensor = rng.normal(size=(3, 2, 4, 5))   # payload shape (4, 5)
    rgi = RegularGridInterpolator(axes, tensor)
    for zs in ([0.3, -0.2], [1.0, 0.5], [2.5, -1.0], [2.0, 0.0]):
        expected = rgi(np.array(zs))[0]
        got_np = morph_templates_np(tensor, axes, np.array(zs))
        got_jax = np.asarray(morph_templates(jnp.asarray(tensor), axes,
                                             jnp.asarray(zs)))
        np.testing.assert_allclose(got_np, expected, rtol=1e-12)
        np.testing.assert_allclose(got_jax, expected, rtol=1e-12)


def test_morph_exact_at_anchors():
    axes = [np.array([0.5, 1.0, 2.0, 4.0])]
    tensor = np.arange(4 * 3, dtype=float).reshape(4, 3)
    for i, z in enumerate(axes[0]):
        np.testing.assert_array_equal(
            morph_templates_np(tensor, axes, np.array([z])), tensor[i])
        np.testing.assert_array_equal(
            np.asarray(morph_templates(tensor, axes, jnp.asarray([z]))),
            tensor[i])


def test_interp_at_points_matches_scipy():
    rng = np.random.default_rng(1)
    points = [np.linspace(-1, 1, 7), np.array([0.0, 2.0, 3.0])]
    values = rng.normal(size=(7, 3))
    rgi = RegularGridInterpolator(points, values)
    coords = np.stack([rng.uniform(-1, 1, 50), rng.uniform(0, 3, 50)], axis=-1)
    expected = rgi(coords)
    np.testing.assert_allclose(interp_at_points_np(values, points, coords),
                               expected, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(interp_at_points(values, points,
                                                           coords)),
                               expected, rtol=1e-10)
    # Out of range: constant extrapolation (clip)
    far = np.array([[5.0, -7.0]])
    np.testing.assert_allclose(interp_at_points_np(values, points, far),
                               rgi([[1.0, 0.0]]), rtol=1e-10)


def test_piecewise_lookup_matches_host():
    h = Hist([[0, 1, 5], [0, 1, 4]])
    h.values = np.arange(4.0).reshape(2, 2)
    coords = np.array([[0.5, 0.5], [1.0, 2.0], [4.9, 3.9], [-3, 99]])
    got = np.asarray(piecewise_lookup(h.values, h.edges, coords))
    expected = h.lookup(coords[:, 0], coords[:, 1])
    np.testing.assert_array_equal(got, expected)


def test_poisson_logpmf():
    k = np.array([0, 1, 5, 100])
    mu = np.array([0.0, 2.5, 5.0, 80.0])
    expected = stats.poisson(mu).logpmf(k)
    np.testing.assert_allclose(np.asarray(poisson_logpmf(k, mu)), expected,
                               rtol=1e-10)
    assert np.asarray(poisson_logpmf(0, 0.0)) == 0.0


def test_binned_poisson_logl():
    mus = np.array([10.0, 5.0])
    pmfs = np.array([[[0.5, 0.5]], [[0.2, 0.8]]])
    observed = np.array([[4.0, 9.0]])
    expected_counts = 10 * np.array([0.5, 0.5]) + 5 * np.array([0.2, 0.8])
    oracle = stats.poisson(expected_counts).logpmf([4, 9]).sum()
    got = float(binned_poisson_logl(mus, pmfs, observed))
    np.testing.assert_allclose(got, oracle, rtol=1e-12)


def test_extended_logl():
    mus = np.array([2.0, 3.0])
    ps = np.array([[0.1, 0.0], [0.3, 0.0]])
    # second event has zero density -> outlier floor
    oracle = -5.0 + np.log(2 * 0.1 + 3 * 0.3) + np.log(1e-12)
    got = float(extended_logl(mus, ps, outlier_likelihood=1e-12))
    np.testing.assert_allclose(got, oracle, rtol=1e-12)
    # mask drops padded events entirely
    got_masked = float(extended_logl(mus, ps, outlier_likelihood=1e-12,
                                     mask=np.array([True, False])))
    np.testing.assert_allclose(got_masked, -5.0 + np.log(2 * 0.1 + 3 * 0.3),
                               rtol=1e-12)


def test_sample_from_template():
    import jax
    key = jax.random.PRNGKey(0)
    weights = jnp.asarray([1.0, 0.0, 3.0])
    edges = [np.array([0.0, 1.0, 2.0, 3.0])]
    pts = np.asarray(sample_from_template(key, weights, edges, 8000))
    assert pts.shape == (8000, 1)
    assert ((pts >= 0) & (pts <= 3)).all()
    # No mass in the middle bin; 3:1 ratio between last and first
    assert ((pts[:, 0] >= 1) & (pts[:, 0] < 2)).sum() == 0
    frac_hi = (pts[:, 0] >= 2).mean()
    assert abs(frac_hi - 0.75) < 0.02


def test_uniform_prior_host_arrays():
    from blueice_tpu.priors import UniformPrior
    p = UniformPrior(0.0, 1.0)
    assert p(0.5) == 0.0 and p(2.0) == -float('inf')
    out = p(np.array([0.5, 2.0, -1.0, 1.0]))
    np.testing.assert_array_equal(out, [0.0, -np.inf, -np.inf, 0.0])


def test_extended_logl_masked_grad_no_nan():
    """Padded (zero-density) events must not poison gradients, even with the
    outlier floor disabled (double-where regression)."""
    import jax
    from blueice_tpu.ops.poisson import extended_logl

    ps = jnp.asarray([[0.2, 0.3, 0.0], [0.1, 0.4, 0.0]])   # last = padding
    mask = jnp.asarray([True, True, False])

    def f(mus):
        return extended_logl(mus, ps, outlier_likelihood=0.0, mask=mask)

    g = jax.grad(f)(jnp.asarray([5.0, 3.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_binned_logl_penalizes_negative_expectations():
    """With an allow_negative source, empty observed bins must not REWARD a
    negative expectation through the -(lambda - k) term."""
    from blueice_tpu.ops.poisson import binned_poisson_logl

    pmfs = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
    observed = jnp.asarray([0.0, 0.0])
    ll_ok = float(binned_poisson_logl(jnp.asarray([1.0, 0.0]), pmfs, observed))
    ll_neg = float(binned_poisson_logl(jnp.asarray([1.0, -3.0]), pmfs,
                                       observed))
    assert ll_neg < ll_ok - 1e5


def test_bb_adjust_empty_mc_bin_no_nan():
    """A finite-MC source with an EMPTY bin overlapping other sources must
    not poison the whole adjusted pmf with NaN (0/0 in the general root)."""
    import jax
    from blueice_tpu.ops.beeston_barlow import bb_single_adjust

    pmfs = jnp.asarray([[0.6, 0.4, 0.0], [0.3, 0.3, 0.4]])
    nme = jnp.asarray([[30.0, 20.0, 0.0], [10.0, 10.0, 10.0]])
    observed = jnp.asarray([4.0, 3.0, 2.0])

    mus_adj, pmf_adj = bb_single_adjust(jnp.asarray([5.0, 7.0]), pmfs, nme,
                                        observed, 0)
    assert np.isfinite(np.asarray(mus_adj)).all()
    assert np.isfinite(np.asarray(pmf_adj)).all()
    assert float(pmf_adj[0, 2]) == 0.0     # empty-MC bin stays empty

    def f(mus):
        a, p = bb_single_adjust(mus, pmfs, nme, observed, 0)
        return jnp.sum(a) + jnp.sum(p)
    g = jax.grad(f)(jnp.asarray([5.0, 7.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_sample_from_template_integer_weights():
    import jax
    from blueice_tpu.ops.sampling import sample_from_template
    edges = [jnp.linspace(0.0, 1.0, 3)]
    out = sample_from_template(jax.random.PRNGKey(0),
                               jnp.asarray([3, 1]), edges, 50)
    assert out.shape == (50, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_sample_from_template_rejects_bare_edge_array():
    """A flat edge array (instead of a one-per-axis list) must raise a clear
    ValueError, not a cryptic IndexError from scalar iteration."""
    import jax
    import pytest
    from blueice_tpu.ops.sampling import sample_from_template
    with pytest.raises(ValueError, match="one per weights axis"):
        sample_from_template(jax.random.PRNGKey(0), jnp.ones(4),
                             jnp.linspace(0.0, 1.0, 5), 8)
    # Wrong length per axis is caught too
    with pytest.raises(ValueError, match="one per weights axis"):
        sample_from_template(jax.random.PRNGKey(0), jnp.ones(4),
                             [jnp.linspace(0.0, 1.0, 4)], 8)


def test_gather_corners_dense_is_bit_exact():
    """The one-hot-matmul corner extraction (the TPU-friendly form the fit
    engines use under vmap) must be BIT-identical to the dynamic-slice form,
    single and vmapped, across grid shapes and dtypes."""
    import jax
    from blueice_tpu.ops.binned_vgh import (gather_corners,
                                            gather_corners_dense)
    rng = np.random.default_rng(0)
    for grid_shape, extra in [((3,), (2, 7)), ((3, 3), (5,)),
                              ((3, 3, 3, 3), (6, 11))]:
        K = len(grid_shape)
        for dtype in (np.float32, np.float64):
            t = jnp.asarray(rng.standard_normal(grid_shape + extra), dtype)
            idx = [jnp.asarray(rng.integers(0, g - 1), jnp.int32)
                   for g in grid_shape]
            a = gather_corners(t, idx, K)
            b = gather_corners_dense(t, idx, K)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # vmapped (per-toy corner cells): the case that matters on TPU
        t = jnp.asarray(rng.standard_normal(grid_shape + extra), np.float32)
        idx_b = jnp.asarray(rng.integers(0, grid_shape[0] - 1, (8, K)),
                            jnp.int32)
        va = jax.vmap(lambda i: gather_corners(t, [i[d] for d in range(K)],
                                               K))(idx_b)
        vb = jax.vmap(lambda i: gather_corners_dense(
            t, [i[d] for d in range(K)], K))(idx_b)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_gather_corners_dense_many_matches_single():
    """The stacked-candidates one-hot extraction equals per-candidate
    extraction exactly."""
    import jax
    from blueice_tpu.ops.binned_vgh import (gather_corners_dense,
                                            gather_corners_dense_many)
    rng = np.random.default_rng(1)
    for grid_shape, extra in [((3,), (4,)), ((3, 4, 3), (2, 5))]:
        K = len(grid_shape)
        t = jnp.asarray(rng.standard_normal(grid_shape + extra), np.float32)
        idxs = np.stack([rng.integers(0, g - 1, 6) for g in grid_shape],
                        axis=1)
        many = gather_corners_dense_many(t, idxs, K)
        singles = jnp.stack([
            gather_corners_dense(t, [jnp.asarray(i, jnp.int32)
                                     for i in row], K)
            for row in idxs])
        np.testing.assert_array_equal(np.asarray(many), np.asarray(singles))


def test_gather_corners_dense_clips_out_of_range_like_dynamic_slice():
    """ADVICE r4: an out-of-range lower-corner index (e.g. g-1, or negative)
    must clamp to a valid 2-wide block exactly as gather_corners'
    dynamic_slice does — not silently one-hot-match nothing and return
    zero rows."""
    from blueice_tpu.ops.binned_vgh import (gather_corners,
                                            gather_corners_dense,
                                            gather_corners_dense_many)
    rng = np.random.default_rng(2)
    for grid_shape, extra in [((3,), (4,)), ((3, 4), (2, 5))]:
        K = len(grid_shape)
        t = jnp.asarray(rng.standard_normal(grid_shape + extra), np.float32)
        bad_idxs = [[g - 1 for g in grid_shape],         # last row: clamp
                    [g + 3 for g in grid_shape],         # far out: clamp
                    [-2 for _ in grid_shape]]            # negative: clamp 0
        for raw in bad_idxs:
            idx = [jnp.asarray(i, jnp.int32) for i in raw]
            a = gather_corners(t, idx, K)
            b = gather_corners_dense(t, idx, K)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert np.abs(np.asarray(b)).sum() > 0
        many = gather_corners_dense_many(t, np.asarray(bad_idxs), K)
        singles = np.stack([np.asarray(gather_corners(
            t, [jnp.asarray(i, jnp.int32) for i in row], K))
            for row in bad_idxs])
        np.testing.assert_array_equal(np.asarray(many), singles)
