"""Unit tests for fit-engine features: runtime freeze-mask, snap-to-anchor
candidates, micro-step polish ladder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blueice_tpu.parallel.fitter import minimize_newton
from blueice_tpu.likelihood import BinnedLogLikelihood
from blueice_tpu.parallel.fitter import make_toy_fitter
from blueice_tpu.compile import build_logl
from blueice_tpu.test_helpers import conf_for_test


def _quad(center):
    center = jnp.asarray(center)

    def f(u):
        d = u - center
        return jnp.sum(d * d) + 0.5 * d[0] * d[1]
    return f


def test_transform_all_bound_kinds_finite_gradients():
    """Every bound kind — unbounded, lower-only, two-sided, upper-only —
    round-trips and has finite gradients. Regression: infinite bounds in the
    UNselected jnp.where branches NaN-poisoned the gradient of unbounded
    (allow_negative) coordinates, silently freezing them in Newton fits;
    upper-bounded-only parameters mapped to NaN values outright."""
    from blueice_tpu.parallel.fitter import make_transform

    tr = make_transform([(None, None), (0.0, None), (-1.0, 1.0),
                         (None, 5.0)])
    assert list(tr.kinds_np) == [0, 1, 2, 3]
    u = jnp.array([0.3, -0.2, 0.1, 0.4])
    x = tr.to_x(u)
    assert bool(jnp.isfinite(x).all())
    assert float(x[1]) > 0.0 and -1 < float(x[2]) < 1 and float(x[3]) < 5.0

    g = jax.grad(lambda u: tr.to_x(u).sum())(u)
    assert bool(jnp.isfinite(g).all())
    g2 = jax.grad(lambda x: tr.to_u(x).sum())(x)
    assert bool(jnp.isfinite(g2).all())

    np.testing.assert_allclose(np.asarray(tr.to_x(tr.to_u(x))),
                               np.asarray(x), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(tr.to_u_np(np.asarray(x)),
                               np.asarray(tr.to_u(x)), rtol=1e-12)
    for i in range(4):
        np.testing.assert_allclose(
            tr.to_u_coord(i, np.asarray(x[i])),
            np.asarray(tr.to_u(x))[i], rtol=1e-12)


def test_freeze_mask_pins_coordinates():
    f = _quad([1.0, -2.0, 0.5])
    u0 = jnp.zeros(3)

    # Unfrozen: reaches the center
    u, fval, it = minimize_newton(f, u0, max_iter=50, tol=1e-10)
    np.testing.assert_allclose(np.asarray(u), [1.0, -2.0, 0.5], atol=1e-6)

    # Coordinate 1 frozen at its start: stays exactly 0, others adjust to the
    # conditional optimum of the quadratic
    freeze = jnp.asarray([1.0, 0.0, 1.0])
    u, fval, it = minimize_newton(f, u0, max_iter=50, tol=1e-10,
                                         freeze=freeze)
    assert float(u[1]) == 0.0
    # conditional optimum: minimize over (u0, u2) with u1 = 0
    # d/du0: 2(u0-1) + 0.5(u1+2) = 0 -> u0 = 1 - 0.5
    np.testing.assert_allclose(float(u[0]), 1 - 0.5, atol=1e-6)
    np.testing.assert_allclose(float(u[2]), 0.5, atol=1e-6)


def test_freeze_mask_vmapped_lanes():
    """Free and frozen lanes coexist in one vmapped batch."""
    f = _quad([2.0, 3.0])

    def fit(u0, freeze):
        return minimize_newton(f, u0, max_iter=50, tol=1e-10,
                               freeze=freeze)[0]

    u0s = jnp.zeros((2, 2))
    freezes = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    us = jax.vmap(fit)(u0s, freezes)
    np.testing.assert_allclose(np.asarray(us[0]), [2.0, 3.0], atol=1e-6)
    assert float(us[1][1]) == 0.0
    # conditional: 2(u0-2) + 0.5(u1-3) = 0 with u1=0 -> u0 = 2 + 0.75
    np.testing.assert_allclose(float(us[1][0]), 2.75, atol=1e-6)


def test_toy_fitter_freeze_equals_runtime_fixed():
    """fit_one(freeze=...) reproduces the runtime_fixed conditional fit."""
    conf = conf_for_test(n_sources=2, mc=True, n_events_for_pdf=int(2e4))
    conf['sources'][1]['mu'] = 2.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1.0, 1.5))
    lf.prepare()
    rng = np.random.default_rng(4)
    lf.set_data(lf.base_model.simulate(rng=rng))
    compiled = build_logl(lf)
    data = compiled.data

    fit_free, names = make_toy_fitter(compiled, max_iter=60, tol=1e-9)
    ti = names.index('s0_rate_multiplier')

    # Conditional via runtime_fixed (the classic path)
    fit_cond, names_cond = make_toy_fitter(
        compiled, runtime_fixed=['s0_rate_multiplier'], max_iter=60, tol=1e-9)
    xc, llc, _ = fit_cond(data, None, (jnp.asarray(1.3),))

    # Conditional via freeze-mask on the FREE fitter
    x0 = np.array([float(compiled.defaults[n]) for n in names])
    x0[ti] = 1.3
    freeze = np.ones(len(names))
    freeze[ti] = 0.0
    xf, llf, _ = fit_free(data, None, (), jnp.asarray(x0),
                          jnp.asarray(freeze))

    assert float(llf) == pytest.approx(float(llc), abs=1e-6)
    assert float(xf[ti]) == pytest.approx(1.3, abs=1e-9)
    other = [i for i, n in enumerate(names) if n != 's0_rate_multiplier']
    for io, nc in zip(other, range(len(names_cond))):
        assert float(xf[io]) == pytest.approx(float(xc[nc]), abs=1e-4)


def test_far_guess_indefinite_region_converges():
    """Regression: where the log-bound transform makes the objective concave
    (a steep Poisson slope far below the optimum), the damped-Hessian solve
    is INDEFINITE and proposes an ascent direction; with every candidate
    rejected, the stall window ended the lane far from the optimum.
    Measured failure: a 1-bin model with best fit 7x the guess stopped at
    x=3.32 (gradient ~10), the polish ladder's capped rounds the only
    progress. Fixed by replacing ascent proposals (g.du > 0) with a
    curvature-scaled steepest-descent step."""
    from blueice_tpu.test_helpers import conf_for_test
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.parallel import BinnedToyStudy

    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-30.0, 30.0]]],
                         n_events_for_pdf=int(1e5))
    conf['sources'][0]['events_per_day'] = 20.0
    conf['sources'][1]['events_per_day'] = 400.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.prepare()
    study = BinnedToyStudy(lf)
    counts = jnp.asarray([[540.0], [700.0], [1000.0], [2000.0]])
    free = study.fit_toys(counts)
    # One bin, one rate: x_hat = (n - B) / S exactly
    expected = (np.asarray(counts).ravel() - 400.0) / 20.0
    assert np.allclose(np.asarray(free['s0_rate_multiplier']), expected,
                       rtol=1e-5)


def test_solve_spd_small_matches_lu_and_flags_indefinite():
    """The unrolled-Cholesky Newton solver (n in 4..16 — the XENON-scale
    path; jnp.linalg.solve's batched pivoting LU dominated the vmapped
    iteration on TPU) must agree with LU on SPD systems to roundoff, work
    under vmap, and yield NaNs on indefinite matrices (the signal the
    Newton loop's steepest-descent rescue keys on)."""
    from blueice_tpu.parallel.fitter import _solve_spd_small
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 4, 6, 9, 12, 16):
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        x = np.asarray(_solve_spd_small(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b),
                                   rtol=1e-10, atol=1e-12)
    # vmapped lanes (the real usage shape)
    n = 9
    Ms = rng.standard_normal((32, n, n))
    As = jnp.asarray(np.einsum('bij,bkj->bik', Ms, Ms) + n * np.eye(n))
    bs = jnp.asarray(rng.standard_normal((32, n)))
    xs = np.asarray(jax.vmap(_solve_spd_small)(As, bs))
    np.testing.assert_allclose(
        xs, np.linalg.solve(np.asarray(As),
                            np.asarray(bs)[..., None])[..., 0],
        rtol=1e-10, atol=1e-12)
    # indefinite -> NaN, never a silently wrong finite solution
    A_ind = jnp.asarray(np.diag([1.0, -1.0] + [1.0] * 7))
    x = np.asarray(_solve_spd_small(A_ind, jnp.asarray(np.ones(9))))
    assert not np.isfinite(x).all()
