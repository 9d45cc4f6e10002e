"""Gradient-based maximum-likelihood fitting of compiled likelihoods.

TPU-native replacement for the reference's scipy/minuit minimization of a
host-python objective (reference: blueice/inference.py:131-244). The objective
here is the compiled (pure-jax) likelihood, so we get exact gradients and
Hessians from autodiff and run a bound-respecting Levenberg-damped Newton
iteration inside ``lax.while_loop`` — a fixed-structure program that jit-compiles
once and **vmaps across thousands of toy datasets** (the reference fit one
dataset at a time in a Python loop).

Bounds are enforced by smooth reparameterization (log for one-sided rate
multipliers, scaled logistic for two-sided shape parameters), the same strategy
MINUIT uses, so the Newton steps live in an unconstrained space.

The parameter count here is small (a handful of nuisances), so each Newton step
is O(k^2) state with exact curvature — far fewer likelihood evaluations than
quasi-Newton, which is what matters when one evaluation is a fused XLA kernel.
"""

from collections import OrderedDict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['Transform', 'make_transform', 'minimize_newton', 'fit_single',
           'make_toy_fitter', 'make_batch_fitter']


class Transform:
    """Smooth bijection between the optimizer's unconstrained space u and the
    bounded parameter space x, applied per coordinate."""

    # kinds: 0 identity, 1 log (x = lo + exp(u)), 2 logistic in (lo, hi)
    def __init__(self, kinds, los, his):
        self.kinds = jnp.asarray(kinds)
        self.los = jnp.asarray(los)
        self.his = jnp.asarray(his)

    def to_x(self, u):
        safe_hi = jnp.where(jnp.isfinite(self.his), self.his, self.los + 1.0)
        x_log = self.los + jnp.exp(u)
        x_logistic = self.los + (safe_hi - self.los) * jax.nn.sigmoid(u)
        return jnp.where(self.kinds == 0, u,
                         jnp.where(self.kinds == 1, x_log, x_logistic))

    def to_u(self, x):
        safe_hi = jnp.where(jnp.isfinite(self.his), self.his, self.los + 1.0)
        eps = 1e-12
        u_log = jnp.log(jnp.maximum(x - self.los, eps))
        frac = jnp.clip((x - self.los) / (safe_hi - self.los), 1e-9, 1 - 1e-9)
        u_logistic = jnp.log(frac) - jnp.log1p(-frac)
        return jnp.where(self.kinds == 0, x,
                         jnp.where(self.kinds == 1, u_log, u_logistic))


def make_transform(bounds_list):
    """Build a Transform from a list of (lo, hi) tuples (None == unbounded)."""
    kinds, los, his = [], [], []
    for lo, hi in bounds_list:
        lo = -np.inf if lo is None else float(lo)
        hi = np.inf if hi is None else float(hi)
        if np.isneginf(lo) and np.isposinf(hi):
            kinds.append(0)
        elif np.isposinf(hi):
            kinds.append(1)
        else:
            kinds.append(2)
        los.append(lo)
        his.append(hi)
    return Transform(np.array(kinds), np.array(los), np.array(his))


def _solve_spd_small(A, b):
    """Solve A x = b for tiny symmetric systems with closed forms (n <= 3);
    falls back to LU for larger n. The batched LU path costs more than the
    whole likelihood evaluation at these sizes, so this matters inside the
    vmapped Newton loop."""
    n = A.shape[0]
    if n == 1:
        return b / A[0, 0:1]
    if n == 2:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        x0 = (A[1, 1] * b[0] - A[0, 1] * b[1]) / det
        x1 = (A[0, 0] * b[1] - A[1, 0] * b[0]) / det
        return jnp.stack([x0, x1])
    if n == 3:
        c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
        c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
        c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
        det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
        c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
        c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
        c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
        c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
        c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
        c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) / det
        x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) / det
        x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / det
        return jnp.stack([x0, x1, x2])
    return jnp.linalg.solve(A, b)


def minimize_newton(f, u0, max_iter=60, tol=1e-8, ftol=None,
                    init_damping=1e-3):
    """Minimize f (smooth scalar function of a small vector) with
    Levenberg-damped Newton steps. Pure jax: jit/vmap-compatible.

    Stops on gradient inf-norm < tol, OR on an accepted undamped-Newton step
    whose *absolute* f-decrease falls below ftol (default: 1e-3 in float32,
    1e-10 in float64 — log-likelihood units, i.e. well below the 0.5/2.71
    critical values that matter for intervals; without this, float32 fits would
    spin at max_iter against gradient noise they can never push below a tight
    tol).

    :return: (u_min, f_min, grad_norm, n_iters)
    """
    u0 = jnp.asarray(u0)
    n = u0.shape[0]
    eye = jnp.eye(n, dtype=u0.dtype)
    if ftol is None:
        ftol = 1e-3 if u0.dtype == jnp.float32 else 1e-10

    grad_f = jax.grad(f)
    vg_f = jax.value_and_grad(f)

    def val_grad_hess(u):
        # One primal + n forward-over-reverse passes: value, gradient and the
        # full Hessian share the primal/reverse computation (vs 3 separate
        # evaluations with jax.grad + jax.hessian + f)
        basis = jnp.eye(n, dtype=u.dtype)
        (vs, gs), (_, Hrows) = jax.vmap(
            lambda e: jax.jvp(vg_f, (u,), (e,)))(basis)
        return vs[0], gs[0], Hrows

    def cond(carry):
        u, fval, lam, it, done = carry
        return (~done) & (it < max_iter)

    def body(carry):
        u, fval, lam, it, done = carry
        _, g, H = val_grad_hess(u)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        H = jnp.where(jnp.isfinite(H), H, 0.0)

        du = -_solve_spd_small(H + lam * eye, g)
        # Fall back to (scaled) steepest descent if the solve went bad
        du = jnp.where(jnp.all(jnp.isfinite(du)), du,
                       -g / jnp.maximum(lam, 1.0))
        u_try = u + du
        f_try = f(u_try)

        accept = jnp.isfinite(f_try) & (f_try < fval)
        u_new = jnp.where(accept, u_try, u)
        f_new = jnp.where(accept, f_try, fval)
        lam_new = jnp.clip(jnp.where(accept, lam * 0.25, lam * 8.0),
                           1e-12, 1e12)

        gnorm = jnp.max(jnp.abs(g))
        step = jnp.max(jnp.abs(u_new - u))
        fdelta = fval - f_new
        # Only trust a small f-decrease as convergence when the step was a
        # (nearly) undamped Newton step — a heavily damped crawl can stall
        # while still far from the optimum
        done_new = ((gnorm < tol)
                    | (accept & (step < 1e-14))
                    | (accept & (fdelta <= ftol) & (lam < 1e-2) & (it > 3))
                    # Repeated rejections inflated the damping: no step of any
                    # size improves f — we are at the precision noise floor
                    | (lam_new > 1e5))
        return (u_new, f_new, lam_new, it + 1, done_new)

    f0 = f(u0)
    carry = (u0, f0, jnp.asarray(init_damping, dtype=u0.dtype),
             jnp.zeros((), dtype=jnp.int32), jnp.zeros((), dtype=bool))
    u, fval, lam, it, done = lax.while_loop(cond, body, carry)
    return u, fval, jnp.max(jnp.abs(grad_f(u))), it


def _floating_setup(compiled, fixed, guess=None):
    """Floating parameter names, their transform, and the initial u vector."""
    from ..exceptions import NoOpimizationNecessary
    fixed = dict(fixed or {})
    unknown = set(fixed) - set(compiled.param_names)
    if unknown:
        raise ValueError("Unknown fixed parameters: %s" % sorted(unknown))
    names = [p for p in compiled.param_names if p not in fixed]
    # Only parameters registered for fitting float by default: rate multipliers
    # of registered rate parameters + all shape parameters (+ livetime never).
    lf = compiled.lf
    registered = set(sn + '_rate_multiplier' for sn in lf.rate_parameters)
    registered |= set(lf.shape_parameters.keys())
    names = [p for p in names if p in registered]
    if not names:
        raise NoOpimizationNecessary(
            "There are no parameters to fit, no optimization is necessary")

    transform = make_transform([compiled.bounds[p] for p in names])
    guess = dict(guess or {})
    x0 = np.array([float(guess.get(p, compiled.defaults[p])) for p in names])
    return names, fixed, transform, x0


def fit_single(compiled, fixed=None, guess=None, return_errors=True,
               max_iter=60, tol=1e-8):
    """Fit one (already data-bound) compiled likelihood.

    :return: ({name: bestfit, name_error: parabolic error}, max loglikelihood).
    Mirrors the bestfit_* return convention (reference:
    blueice/inference.py:131-178,240-244); errors come from the exact
    jax.hessian at the optimum instead of Migrad's parabolic estimate.
    """
    from ..exceptions import NoOpimizationNecessary
    try:
        names, fixed, transform, x0 = _floating_setup(compiled, fixed, guess)
    except NoOpimizationNecessary:
        fixed = dict(fixed or {})
        return {}, float(compiled(**fixed))

    def params_of_x(x):
        p = dict(compiled.defaults)
        p.update(fixed)
        for i, name in enumerate(names):
            p[name] = x[i]
        return p

    data = compiled.data
    const = (float(compiled.data_constant(data)) if data is not None else 0.0)

    def neg_logl_u(u):
        params = params_of_x(transform.to_x(u))
        if data is not None:
            return -compiled.logl_with_data(params, data,
                                            include_constant=False)
        return -compiled.logl(params)

    u0 = transform.to_u(jnp.asarray(x0))
    run = jax.jit(partial(minimize_newton, neg_logl_u,
                          max_iter=max_iter, tol=tol))
    u, fval, gnorm, it = run(u0)
    fval = float(fval) - const
    x = np.asarray(transform.to_x(u))

    results = OrderedDict((name, float(x[i])) for i, name in enumerate(names))
    if return_errors:
        def neg_logl_x(xv):
            return -compiled.logl(params_of_x(xv))
        H = np.asarray(jax.hessian(neg_logl_x)(jnp.asarray(x)))
        try:
            cov = np.linalg.inv(H)
            errs = np.sqrt(np.clip(np.diag(cov), 0, None))
        except np.linalg.LinAlgError:
            errs = np.full(len(names), np.nan)
        for i, name in enumerate(names):
            results[name + '_error'] = float(errs[i])
    return results, float(-fval)


def make_toy_fitter(compiled, fixed=None, guess=None, max_iter=60, tol=1e-8):
    """Build the per-toy fit function fit_one(data, mask) ->
    (x (n_floating,), max_ll, n_iter). Pure jax: compose with vmap/jit/shard.
    :return: (fit_one, floating names list)
    """
    from ..exceptions import NoOpimizationNecessary
    try:
        names, fixed, transform, x0 = _floating_setup(compiled, fixed, guess)
    except NoOpimizationNecessary:
        # Everything fixed (e.g. the conditional fit of a 1-parameter model):
        # just evaluate the likelihood at the fixed point.
        fixed = dict(fixed or {})
        params = dict(compiled.defaults)
        params.update(fixed)

        def fit_one(data, mask=None):
            ll = compiled.logl_with_data(params, data, mask)
            return (jnp.zeros((0,)), ll, jnp.zeros((), dtype=jnp.int32))
        return fit_one, []

    u0 = transform.to_u(jnp.asarray(x0))

    def params_of_u(u):
        x = transform.to_x(u)
        p = dict(compiled.defaults)
        p.update(fixed)
        for i, name in enumerate(names):
            p[name] = x[i]
        return p

    def fit_one(data, mask=None):
        # The data-only constant is loop-invariant: keep it out of the
        # minimized objective, add it back to the reported maximum
        const = compiled.data_constant(data)

        def neg_logl_u(u):
            return -compiled.logl_with_data(params_of_u(u), data, mask,
                                            include_constant=False)
        u, fval, gnorm, it = minimize_newton(neg_logl_u, u0,
                                             max_iter=max_iter, tol=tol)
        return transform.to_x(u), -fval + const, it

    return fit_one, names


def make_batch_fitter(compiled, fixed=None, guess=None, max_iter=60, tol=1e-8):
    """Build a jit-able batched fitter over toy datasets.

    :return: fit(data_batch, mask_batch=None) -> (x_batch (n_toys, n_floating),
      max_ll_batch (n_toys,), n_iter_batch), plus the floating names list.
    The returned function vmaps the full Newton fit per toy; shard the leading
    (toys) axis across a device mesh for multi-chip ensembles.
    """
    fit_one, names = make_toy_fitter(compiled, fixed, guess, max_iter, tol)

    def fit(data_batch, mask_batch=None):
        if mask_batch is None:
            return jax.vmap(lambda d: fit_one(d, None))(data_batch)
        return jax.vmap(fit_one)(data_batch, mask_batch)

    return fit, names
