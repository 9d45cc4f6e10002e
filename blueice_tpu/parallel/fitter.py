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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['Transform', 'make_transform', 'minimize_newton', 'fit_single',
           'make_toy_fitter', 'make_batch_fitter']


class Transform:
    """Smooth bijection between the optimizer's unconstrained space u and the
    bounded parameter space x, applied per coordinate."""

    # kinds: 0 identity, 1 log (x = lo + exp(u)), 2 logistic in (lo, hi),
    # 3 mirrored log (x = hi - exp(-u), upper bound only)
    def __init__(self, kinds, los, his):
        # Host twins first: one-time setup math (u0, snap anchors) runs in
        # numpy so engine construction never does per-scalar device pulls
        # (ruinous through a degraded remote-TPU link)
        self.kinds_np = np.asarray(kinds)
        self.los_np = np.asarray(los, dtype=float)
        self.his_np = np.asarray(his, dtype=float)
        self.kinds = jnp.asarray(kinds)
        self.los = jnp.asarray(los)
        self.his = jnp.asarray(his)

    # All four branch expressions are evaluated for every coordinate (that is
    # what jnp.where does), and jnp.where's VJP feeds a 0 cotangent into the
    # UNselected branch — 0 * inf = nan, so an infinite unselected branch
    # poisons the selected coordinate's gradient. Infinite bounds therefore
    # get finite placeholders (they are never read by the selected branch).
    def _safe_bounds(self, xp=jnp):
        los, his = (self.los, self.his) if xp is jnp \
            else (self.los_np, self.his_np)
        lo = xp.where(xp.isfinite(los), los, 0.0)
        hi = xp.where(xp.isfinite(his), his, lo + 1.0)
        return lo, hi

    def to_x(self, u):
        lo, hi = self._safe_bounds()
        x_log = lo + jnp.exp(u)
        x_logistic = lo + (hi - lo) * jax.nn.sigmoid(u)
        x_mirror = hi - jnp.exp(-u)
        return jnp.where(self.kinds == 0, u,
                         jnp.where(self.kinds == 1, x_log,
                                   jnp.where(self.kinds == 2, x_logistic,
                                             x_mirror)))

    def to_u(self, x):
        lo, hi = self._safe_bounds()
        eps = 1e-12
        u_log = jnp.log(jnp.maximum(x - lo, eps))
        frac = jnp.clip((x - lo) / (hi - lo), 1e-9, 1 - 1e-9)
        u_logistic = jnp.log(frac) - jnp.log1p(-frac)
        u_mirror = -jnp.log(jnp.maximum(hi - x, eps))
        return jnp.where(self.kinds == 0, x,
                         jnp.where(self.kinds == 1, u_log,
                                   jnp.where(self.kinds == 2, u_logistic,
                                             u_mirror)))

    def to_u_np(self, x):
        """Host-numpy :meth:`to_u` for one-time setup values."""
        x = np.asarray(x, dtype=float)
        lo, hi = self._safe_bounds(xp=np)
        u_log = np.log(np.maximum(x - lo, 1e-12))
        frac = np.clip((x - lo) / (hi - lo), 1e-9, 1 - 1e-9)
        u_logistic = np.log(frac) - np.log1p(-frac)
        u_mirror = -np.log(np.maximum(hi - x, 1e-12))
        return np.where(self.kinds_np == 0, x,
                        np.where(self.kinds_np == 1, u_log,
                                 np.where(self.kinds_np == 2, u_logistic,
                                          u_mirror)))

    def to_u_coord(self, i, x):
        """u values of coordinate ``i`` at the given x values (host numpy;
        same formulas as :meth:`to_u`, one coordinate vectorized over x)."""
        kind = int(self.kinds_np[i])
        lo = float(self.los_np[i])
        x = np.asarray(x, dtype=float)
        if kind == 0:
            return x
        if kind == 1:
            return np.log(np.maximum(x - lo, 1e-12))
        hi = float(self.his_np[i])
        if kind == 3:
            return -np.log(np.maximum(hi - x, 1e-12))
        frac = np.clip((x - lo) / (hi - lo), 1e-9, 1 - 1e-9)
        return np.log(frac) - np.log1p(-frac)


def check_fixed_in_bounds(compiled, fixed):
    """Raise ValueError for any fixed/hypothesis value outside its
    parameter's bounds. Shared by the fit builders (build-time ``fixed``) and
    the toy studies (runtime hypothesis values): the closed-form engines only
    evaluate inside the anchor range, so out-of-range values must be rejected
    on host rather than silently clamped onto the grid edge."""
    for pname, value in (fixed or {}).items():
        lo, hi = compiled.bounds.get(pname, (None, None))
        try:
            v = float(value)
        except (TypeError, ValueError):
            continue        # traced/abstract values are checked elsewhere
        if (lo is not None and v < lo) or (hi is not None and v > hi):
            raise ValueError(
                "Fixed value %s=%g is outside the parameter's allowed range "
                "(%s, %s)" % (pname, v, lo, hi))


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
        elif np.isneginf(lo):
            kinds.append(3)
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
    if n <= 16:
        # Unpivoted Cholesky, fully unrolled at trace time into scalar-graph
        # ops (vectorized over the vmapped toy lanes). jnp.linalg.solve is a
        # batched pivoting LU whose serial pivot loop dominated the Newton
        # iteration on TPU at XENON scale (up to 6 solves of a 9x9 system
        # per iteration: main step + per-kink snap + active set). The damped
        # Marquardt matrix is SPD whenever its solution should be trusted;
        # an indefinite matrix produces NaNs here, which every caller
        # already routes to the scaled-steepest-descent rescue (the same
        # treatment LU's ascent/garbage solutions get).
        L = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i + 1):
                s = A[i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                if i == j:
                    L[i][j] = jnp.sqrt(s)
                else:
                    L[i][j] = s / L[j][j]
        y = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x)
    return jnp.linalg.solve(A, b)


def minimize_newton(f, u0, max_iter=60, tol=1e-8, ftol=None,
                    init_damping=1e-3, vgh=None, polish=4, f_many=None,
                    kink_coords=None, kink_jumps=(0.3, -0.3, 0.1, -0.1),
                    snap_anchors=None, freeze=None):
    """Minimize f (smooth scalar function of a small vector) with
    Levenberg-damped Newton steps. Pure jax: jit/vmap-compatible.

    Stops on gradient inf-norm < tol, OR on an accepted undamped-Newton step
    whose *absolute* f-decrease falls below ftol (default: 1e-3 in float32,
    1e-10 in float64 — log-likelihood units, i.e. well below the 0.5/2.71
    critical values that matter for intervals; without this, float32 fits would
    spin at max_iter against gradient noise they can never push below a tight
    tol).

    When a lane's stop condition fires it does not exit: it switches to a
    POLISH mode that line-searches one coordinate per iteration (a 14-step
    ladder, big kink-escape steps down to noise-floor nudges). If a full
    sweep over the coordinates improved f — an optimum pinned on an
    anchor-grid kink — Newton resumes from the improved point (up to
    ``polish`` rounds); otherwise the lane is done. Everything lives in ONE
    while loop: under vmap each lane spends exactly the iterations IT needs
    (Newton, polishing, or finished), and the wall time of the lockstep
    batch is the slowest lane's total — not the sum of globally sequenced
    fit/sweep/resume phases. (The newton and polish bodies are selected per
    lane per iteration; both subgraphs execute under vmap, but the polish
    body is one value-candidate batch — a fraction of a Newton body.)

    :param snap_anchors: optional list, parallel to ``kink_coords``, of
      arrays of u-space anchor positions for that coordinate. Adds one
      line-search candidate per kink coordinate: the Newton step on the other
      coordinates with this coordinate snapped exactly onto its NEAREST
      anchor. Rescues the common "optimum sits exactly ON an anchor" case
      (e.g. nuisances whose truth is an anchor point), where the one-sided
      local model stalls a fraction of a bin-width away and axis-aligned
      sweeps cannot cross the correlated valley.
    :param freeze: optional float vector (n,), 1 = floating, 0 = frozen: a
      frozen coordinate keeps its u0 value exactly. This is a *runtime* value
      (may differ per vmapped lane), which lets a free fit and a conditional
      fit (target frozen at the hypothesis) run as lanes of ONE lockstep
      batch — halving the sequenced Newton iterations of a profile-LR toy
      study versus running two vmapped fits back to back.
    :return: (u_min, f_min, n_iters)
    """
    u0 = jnp.asarray(u0)
    n = u0.shape[0]
    eye = jnp.eye(n, dtype=u0.dtype)
    if ftol is None:
        ftol = 1e-3 if u0.dtype == jnp.float32 else 1e-10
    # Coordinates whose objective can have C0 kinks (the anchor-grid lerp is
    # only piecewise-smooth along shape parameters); only these get
    # frozen-coordinate line-search candidates. None = all coordinates.
    if kink_coords is None:
        drop_dirs = eye
    elif len(kink_coords):
        drop_dirs = eye[jnp.asarray(list(kink_coords))]
    else:
        drop_dirs = jnp.zeros((0, n), dtype=u0.dtype)

    vg_f = jax.value_and_grad(f)

    if vgh is not None:
        val_grad_hess = vgh
    else:
        def val_grad_hess(u):
            # One primal + n forward-over-reverse passes: value, gradient and
            # the full Hessian share the primal/reverse computation (vs 3
            # separate evaluations with jax.grad + jax.hessian + f)
            basis = jnp.eye(n, dtype=u.dtype)
            (vs, gs), (_, Hrows) = jax.vmap(
                lambda e: jax.jvp(vg_f, (u,), (e,)))(basis)
            return vs[0], gs[0], Hrows

    # Carry: u, fval, lam, nu, it, done, stall,
    #        pc (-1 = Newton mode, >= 0 = polishing that coordinate),
    #        rounds (polish rounds used), improved (this sweep improved f)
    def cond(carry):
        return (~carry[5]) & (carry[4] < max_iter)

    def newton_step(carry):
        u, fval, lam, nu, it, done, stall, pc, rounds, improved = carry
        _, g, H = val_grad_hess(u)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        H = jnp.where(jnp.isfinite(H), H, 0.0)
        if freeze is not None:
            # Project onto the floating subspace: frozen rows/cols of H are
            # replaced by the identity and the frozen gradient zeroed, so the
            # Newton solve leaves frozen coordinates exactly in place.
            g = g * freeze
            H = (H * (freeze[:, None] * freeze[None, :])
                 + jnp.diag(1.0 - freeze))

        # Marquardt scaling: damp relative to the local curvature scale, so
        # the same lam schedule works whether Hessian entries are ~1 or ~1e5
        # (and large lam always yields a scaled steepest-descent step that can
        # rescue an indefinite H)
        d = jnp.maximum(jnp.abs(jnp.diag(H)), 1e-10)
        du = -_solve_spd_small(H + lam * (d * eye), g)
        # Fall back to (scaled) steepest descent if the solve went bad
        du = jnp.where(jnp.all(jnp.isfinite(du)), du,
                       -g / (jnp.maximum(lam, 1.0) * d))
        # An INDEFINITE damped Hessian (e.g. the log-bound transform turns a
        # steep Poisson slope concave far below the optimum) can flip the
        # solve into an ASCENT direction: every candidate along it is
        # rejected, the stall window ends the lane ~10 LL units short
        # (measured: a 1-bin model with the best fit 7x the guess stopped at
        # 3.32x). Replace ascent proposals with a curvature-scaled steepest-
        # descent step — the alpha ladder below then finds an accepting
        # length. For a PD solve g.du < 0 always, so this never perturbs a
        # healthy Newton iteration.
        du = jnp.where(g @ du > 0, -g / (d * (1.0 + lam)), du)

        # Line search over ONE vmapped candidate batch: backtracking steps
        # along du (rescue overshoots across the C0 kinks of the
        # piecewise-multilinear anchor morphing), plus the Newton step with
        # each single shape coordinate frozen — when the optimum is pinned ON
        # a kink in one coordinate, the full du keeps crossing it and gets
        # rejected, while the frozen-coordinate step is pure descent on the
        # smooth subspace and converges immediately.
        # Short alpha ladder: the Nielsen damping schedule handles step-size
        # control across iterations, so the in-step backtracking only needs
        # coarse rescue levels — keeps the candidate batch (and the value
        # kernel's work per Newton iteration) small.
        alphas = jnp.asarray([1.0, 0.4, 0.1], dtype=u.dtype)
        cands_alpha = u[None, :] + alphas[:, None] * du[None, :]
        cands_drop = u[None, :] + du[None, :] * (1.0 - drop_dirs)
        # Fixed-size jumps ALONG each kink coordinate: a toy pinned in the
        # wrong anchor cell (a false optimum the local Newton model cannot
        # see past) escapes DURING the loop, so the post-loop polish sweeps
        # rarely find anything — which keeps their Newton-resume rounds,
        # the expensive part of polishing a vmapped batch, almost free.
        jumps = jnp.asarray(kink_jumps, dtype=u.dtype)
        jump_dirs = drop_dirs if freeze is None else drop_dirs * freeze
        cands_jump = (u[None, None, :]
                      + jumps[:, None, None] * jump_dirs[None, :, :]
                      ).reshape(-1, n)
        # Snap-to-anchor candidates (see docstring). Snapping a coordinate
        # alone is not enough in a correlated valley — the OTHER coordinates
        # must move with it. Second-order snap: displace coordinate ci by
        # delta onto its nearest anchor, then solve the reduced Newton system
        # for the rest under that displacement:
        #   du_rest = -H[rest,rest]^-1 (g_rest + H[rest,ci] * delta)
        cands_snap = []
        if snap_anchors is not None:
            for j, ci in enumerate(kink_coords):
                au = jnp.asarray(snap_anchors[j], dtype=u.dtype)
                nearest = au[jnp.argmin(jnp.abs(au - u[ci]))]
                delta = nearest - u[ci]
                m = 1.0 - eye[ci]
                gm = (g + H[:, ci] * delta) * m
                Hm = (H * (m[:, None] * m[None, :])
                      + eye[ci][:, None] * eye[ci][None, :])
                dm = jnp.maximum(jnp.abs(jnp.diag(Hm)), 1e-10)
                du_s = -_solve_spd_small(Hm + lam * (dm * eye), gm)
                du_s = jnp.where(jnp.all(jnp.isfinite(du_s)), du_s, 0.0)
                cand = (u + du_s).at[ci].set(nearest)
                if freeze is not None:
                    cand = jnp.where(freeze[ci] > 0, cand, u)
                cands_snap.append(cand)
        # Active-set candidate: several kink coordinates commonly sit exactly
        # ON their anchors at once (toys are generated at anchor truths);
        # each contributes one-sided curvature that pollutes the full Newton
        # solve. Freeze ALL at-anchor kink coordinates simultaneously and
        # solve the smooth-subspace system for the rest.
        if snap_anchors is not None:
            act = jnp.ones((n,), dtype=u.dtype)
            for j, ci in enumerate(kink_coords):
                au = jnp.asarray(snap_anchors[j], dtype=u.dtype)
                at_anchor = jnp.min(jnp.abs(au - u[ci])) < 1e-6
                act = act * jnp.where(at_anchor, 1.0 - eye[ci], 1.0)
            if freeze is not None:
                act = act * freeze
            ga = g * act
            Ha = (H * (act[:, None] * act[None, :])
                  + jnp.diag(1.0 - act))
            da = jnp.maximum(jnp.abs(jnp.diag(Ha)), 1e-10)
            du_a = -_solve_spd_small(Ha + lam * (da * eye), ga)
            du_a = jnp.where(jnp.all(jnp.isfinite(du_a)), du_a, 0.0)
            cands_snap.append(u + du_a * act)
        cands_snap = (jnp.stack(cands_snap) if cands_snap
                      else jnp.zeros((0, n), dtype=u.dtype))
        cands = jnp.concatenate([cands_alpha, cands_drop, cands_jump,
                                 cands_snap], axis=0)
        fs = (jax.vmap(f)(cands) if f_many is None else f_many(cands))
        fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
        best = jnp.argmin(fs)
        f_try = fs[best]
        u_try = cands[best]
        du_eff = u_try - u

        accept = jnp.isfinite(f_try) & (f_try < fval)
        # Nielsen gain-ratio damping schedule: compare the actual decrease to
        # the quadratic model's prediction; shrink lam aggressively on good
        # steps, inflate geometrically on rejections. Far better than a fixed
        # up/down factor on ridge-shaped (near-degenerate) profiles.
        predicted = -((g @ du_eff) + 0.5 * (du_eff @ (H @ du_eff)))
        rho = (fval - f_try) / jnp.where(predicted > 0, predicted, 1.0)
        good = accept & (predicted > 0)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.clip(
            jnp.where(good, lam * shrink,
                      jnp.where(accept, lam, lam * nu)),
            1e-12, 1e10)
        nu_new = jnp.where(accept, 2.0, jnp.minimum(nu * 2.0, 64.0))

        u_new = jnp.where(accept, u_try, u)
        f_new = jnp.where(accept, f_try, fval)

        gnorm = jnp.max(jnp.abs(g))
        step = jnp.max(jnp.abs(u_new - u))
        fdelta = fval - f_new
        # Stall window: consecutive iterations whose f-decrease is below ftol
        # (including rejections). Catches fits grinding at the precision noise
        # floor that never satisfy the strict stop conditions — the polish
        # sweeps between loop rounds are the safety net against a premature
        # call.
        #
        # Every below-ftol iteration counts toward the stall window — there
        # is deliberately NO transient exemption here. Indefinite-Hessian
        # transients (the log-bound transform turning a steep Poisson slope
        # concave far below the optimum) used to burn the window with
        # all-rejected ascent proposals and end fits 10+ LL units short;
        # that is repaired at the SOLVE (the g.du > 0 replacement above),
        # which makes those iterations accept and reset the counter.
        # Exempting them here instead was measured on hardware to cost ~25%
        # XENON-ensemble throughput: lockstep wall time tracks the worst
        # lane, and any stall exemption lets tail lanes spin on the f32
        # noise-floor grind of ridge-shaped profiles.
        stall_new = jnp.where(fdelta > ftol, 0, stall + 1)
        # Only trust a small f-decrease as convergence when the step was an
        # undamped Newton step (full, or full on the smooth subspace with one
        # kink-pinned coordinate frozen) — a heavily damped crawl can stall
        # while still far from the optimum
        # (a selected kink jump is NOT a Newton step — exclude it here)
        undamped = (best == 0) | ((best >= alphas.shape[0])
                                  & (best < alphas.shape[0]
                                     + drop_dirs.shape[0]))
        converged = ((gnorm < tol)
                     | (accept & (step < 1e-14))
                     | (accept & (fdelta <= ftol) & (lam < 1e-2)
                        & undamped & (it > 3))
                     # Damping inflated to where steps are ~1e-8 of a Newton
                     # step and nothing improves f: precision noise floor
                     | (lam_new > 1e8)
                     | (stall_new >= 4))
        # A converged lane does not exit: it enters a polish sweep (up to
        # `polish` rounds), which either rescues it or confirms the stop.
        enter_polish = converged & (rounds < polish)
        return (u_new, f_new, lam_new, nu_new, it + 1,
                converged & ~enter_polish,
                jnp.where(converged, 0, stall_new),
                jnp.where(enter_polish, 0, pc), rounds,
                jnp.zeros((), dtype=bool))

    # Ladder from kink-escape scale down to micro-steps: near-degenerate
    # models can pin an optimum a few 1e-5 (u-space) OFF an anchor on a
    # V-shaped wall with one-sided gradients of order 1e4 — worth ~0.1 LL
    # that coarser ladders overshoot and reject.
    polish_steps = np.array([0.3, -0.3, 0.1, -0.1, 0.03, -0.03, 0.01, -0.01,
                             3e-3, -3e-3, 1e-3, -1e-3, 3e-4, -3e-4,
                             1e-4, -1e-4, 3e-5, -3e-5, 1e-5, -1e-5])

    def polish_step(carry):
        u, fval, lam, nu, it, done, stall, pc, rounds, improved = carry
        e = eye[jnp.clip(pc, 0, n - 1)]
        if freeze is not None:
            e = e * freeze
        cands = (u[None, :]
                 + jnp.asarray(polish_steps, dtype=u.dtype)[:, None]
                 * e[None, :])
        fs = (jax.vmap(f)(cands) if f_many is None else f_many(cands))
        fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
        best = jnp.argmin(fs)
        better = fs[best] < fval
        u_new = jnp.where(better, cands[best], u)
        f_new = jnp.where(better, fs[best], fval)
        improved = improved | (fs[best]
                               < fval - jnp.asarray(ftol, u.dtype) * 0.1)

        last = pc + 1 >= n
        resume = last & improved            # sweep rescued the lane -> Newton
        finished = last & ~improved         # sweep confirmed the optimum
        return (u_new, f_new,
                jnp.where(resume, jnp.asarray(init_damping, u.dtype), lam),
                jnp.where(resume, jnp.asarray(2.0, u.dtype), nu),
                it + 1, done | finished, jnp.zeros((), dtype=jnp.int32),
                jnp.where(last, -1, pc + 1),
                rounds + jnp.where(last, 1, 0).astype(rounds.dtype),
                improved & ~last)

    def body(carry):
        if not polish:
            return newton_step(carry)
        # pc >= 0 selects the (cheap) polish body for this lane; under vmap
        # both subgraphs run, but the polish body is a single 14-candidate
        # value batch — a fraction of a Newton body's vgh + line search.
        return lax.cond(carry[7] >= 0, polish_step, newton_step, carry)

    f0 = f(u0)
    carry = (u0, f0, jnp.asarray(init_damping, dtype=u0.dtype),
             jnp.asarray(2.0, dtype=u0.dtype),
             jnp.zeros((), dtype=jnp.int32), jnp.zeros((), dtype=bool),
             jnp.zeros((), dtype=jnp.int32),
             -jnp.ones((), dtype=jnp.int32),
             jnp.zeros((), dtype=jnp.int32), jnp.zeros((), dtype=bool))
    carry = lax.while_loop(cond, body, carry)

    # No diagnostic gradient recomputation here: a full val_grad_hess after
    # the loop costs one extra Newton body per fit (x thousands of vmapped
    # toys) for a value no caller consumed.
    return carry[0], carry[1], carry[4]


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
               max_iter=250, tol=1e-8):
    """Fit one (already data-bound) compiled likelihood.

    :return: ({name: bestfit, name_error: parabolic error}, max loglikelihood).
    Mirrors the bestfit_* return convention (reference:
    blueice/inference.py:131-178,240-244); errors come from the exact
    jax.hessian at the optimum instead of Migrad's parabolic estimate.

    Fixed-parameter *values* enter at runtime, so e.g. the conditional fits of
    a profile-likelihood interval scan reuse ONE compiled program (cached on
    the compiled likelihood, keyed by the fixed-parameter name set).

    The default iteration budget is deliberately generous: a single
    (un-vmapped) fit pays no lockstep tax, and ridge-shaped many-nuisance
    profiles (XENON-style) genuinely use ~150-200 damped-Newton + polish
    iterations — at which point this fit matches or beats scipy's optimum on
    every measured dataset. Toy STUDIES size their own (smaller) cap for the
    ensemble bulk and refine stragglers separately.
    """
    from ..exceptions import NoOpimizationNecessary
    fixed = dict(fixed or {})
    fixed_names = tuple(sorted(fixed))
    cache = compiled.__dict__.setdefault('_fit_single_cache', {})
    key = (fixed_names, tuple(sorted((guess or {}).items())), max_iter, tol,
           return_errors)

    if key not in cache:
        try:
            fit_one, names = make_toy_fitter(
                compiled, guess=guess, max_iter=max_iter, tol=tol,
                runtime_fixed=list(fixed_names))
        except NoOpimizationNecessary:
            cache[key] = None
        else:
            hess_fn = None
            if return_errors:
                def neg_logl_x(xv, data, fixed_values):
                    p = dict(compiled.defaults)
                    for i, rname in enumerate(fixed_names):
                        p[rname] = fixed_values[i]
                    for i, name in enumerate(names):
                        p[name] = xv[i]
                    return -compiled.logl_with_data(p, data,
                                                    include_constant=False)
                hess_fn = jax.jit(jax.hessian(neg_logl_x))
            cache[key] = (jax.jit(fit_one), names, hess_fn)

    if cache[key] is None:
        return {}, float(compiled(**fixed))

    fit_one, names, hess_fn = cache[key]
    fixed_values = tuple(jnp.asarray(float(fixed[n])) for n in fixed_names)
    data = compiled.data
    x, ll, it = fit_one(data, None, fixed_values)
    x = np.asarray(x)

    results = OrderedDict((name, float(x[i])) for i, name in enumerate(names))
    if return_errors:
        H = np.asarray(hess_fn(jnp.asarray(x), data, fixed_values))
        try:
            cov = np.linalg.inv(H)
            errs = np.sqrt(np.clip(np.diag(cov), 0, None))
        except np.linalg.LinAlgError:
            errs = np.full(len(names), np.nan)
        for i, name in enumerate(names):
            results[name + '_error'] = float(errs[i])
    return results, float(ll)


def _grid_dims(compiled):
    """(K shape params, S sources, G flattened anchor-grid size, n_bins) of
    a compiled binned likelihood's anchor tensor — the shape vocabulary of
    every engine-eligibility check."""
    K = len(compiled.shape_names)
    S = len(compiled.rate_names)
    ps = compiled.ps_tensor
    G = int(np.prod(ps.shape[:K])) if K else 1
    n_bins = int(np.prod(ps.shape[K + 1:]))
    return K, S, G, n_bins


def _has_negative(compiled):
    return any(getattr(compiled.lf, 'source_allowed_negative', ()))


def _analytic_supported(compiled):
    """The closed-form derivative engine covers binned likelihoods on a dense
    global anchor grid (or no shape parameters); with Beeston-Barlow enabled it
    additionally needs the n_model_events tensor on the same layout (the
    profiled root's derivatives then come from ops.bb_vgh in one pass)."""
    if not (compiled.is_binned and compiled.ps_tensor is not None
            and compiled.anchor_arrays is not None):
        return False
    if compiled.has_bb or getattr(compiled, 'has_bb_lite', False):
        # The BB engines lerp the pmf corners LINEARLY internally; geometric
        # (log) pmf morphing with a BB mode falls back to the AD engine
        if getattr(compiled, 'log_morph', False):
            return False
        return getattr(compiled, 'nme_tensor', None) is not None
    return True


def _unbinned_analytic_supported(compiled):
    """The closed-form unbinned engine covers global-grid (or shape-free)
    extended likelihoods; source-wise grids fall back to the AD engine."""
    return (compiled.is_binned is False
            and compiled.anchor_arrays is not None)


def _sum_analytic_supported(compiled):
    """Closed-form engine eligibility of a compiled LogLikelihoodSum
    (joint/combined fits, e.g. multi-science-run): every DATASET child must
    itself be analytic-eligible (binned, dense global anchor grid); dataset-
    free children (ancillary constraints) ride along via autodiff of their
    tiny param-only graphs."""
    children = getattr(compiled, 'children', None)
    if not children or getattr(compiled, 'child_routed', None) is None:
        return False
    has_dataset_child = False
    for c in children:
        if not getattr(c, 'has_data', True):
            continue
        if not (c.is_binned and _analytic_supported(c)):
            return False
        has_dataset_child = True
    return has_dataset_child


def _routed_params_of_u(defaults, names, fixed, transform, runtime_fixed=(),
                        routed=None):
    """The u -> params-dict closure shared by every closed-form engine:
    floating names, build-time fixed and runtime-fixed values applied on top
    of ``defaults``, each filtered by a Sum child's ``routed`` name set (None
    routes everything) — joint parameters not declared on a child must never
    override that child's own defaults (composition.LogLikelihoodSum
    routing). One definition so the routing semantics cannot drift between
    the dataset-child and ancillary-child paths."""
    runtime_fixed = list(runtime_fixed)

    def params_of_u(u, fixed_values):
        x = transform.to_x(u)
        p = dict(defaults)
        for k, v in fixed.items():
            if routed is None or k in routed:
                p[k] = v
        for i, rname in enumerate(runtime_fixed):
            if routed is None or rname in routed:
                p[rname] = fixed_values[i]
        for i, name in enumerate(names):
            if routed is None or name in routed:
                p[name] = x[i]
        return p

    return params_of_u


def _make_param_graph(compiled, names, fixed, transform, runtime_fixed=(),
                      routed=None):
    """The tiny differentiable graph from the optimizer's u vector to the
    likelihood's natural parameters: params dict, float (m, t) vector, integer
    anchor-cell indices, and the prior term. Shared by the binned and
    unbinned closed-form engines.

    :param routed: for a CHILD of a compiled LogLikelihoodSum, the set of
      joint parameter names DECLARED on this child — joint values (floating,
      fixed or runtime-fixed) outside it must not override the child's own
      defaults, matching the host Sum's routing (composition.py). None (the
      default, single likelihoods) routes everything.
    """
    shape_names = compiled.shape_names
    # This builder can be entered lazily inside a jit trace (the unbinned
    # engine choice depends on the per-trace event count). The anchor-array
    # conversion must then still produce CONCRETE constants: without x64 the
    # float64->float32 cast is otherwise traced, and the resulting tracer —
    # captured by these closures, which outlive the trace via the engine's
    # parts memo — leaks into the next retrace (UnexpectedTracerError on the
    # first set_data rebind).
    with jax.ensure_compile_time_eval():
        anchor_arrays = [jnp.asarray(a) for a in compiled.anchor_arrays]
    runtime_fixed = list(runtime_fixed)
    params_of_u = _routed_params_of_u(compiled.defaults, names, fixed,
                                      transform, runtime_fixed, routed)

    def mt_of_u(u, fixed_values):
        """Float (m, t) vector — the differentiable tiny graph."""
        p = params_of_u(u, fixed_values)
        m = compiled.rates(p)
        ts = []
        for d, sp in enumerate(shape_names):
            arr = anchor_arrays[d]
            z = jnp.clip(jnp.asarray(p[sp]), arr[0], arr[-1])
            i = jnp.clip(jnp.searchsorted(arr, z, side='right') - 1,
                         0, arr.shape[0] - 2)
            ts.append(jnp.clip((z - arr[i]) / (arr[i + 1] - arr[i]), 0.0, 1.0))
        t = (jnp.stack(ts) if ts
             else jnp.zeros((0,), dtype=m.dtype))
        return jnp.concatenate([m.astype(u.dtype), t.astype(u.dtype)])

    def idx_of_u(u, fixed_values):
        p = params_of_u(u, fixed_values)
        idxs = []
        for d, sp in enumerate(shape_names):
            arr = anchor_arrays[d]
            z = jnp.clip(jnp.asarray(p[sp]), arr[0], arr[-1])
            idxs.append(jnp.clip(
                jnp.searchsorted(arr, z, side='right') - 1,
                0, arr.shape[0] - 2))
        return idxs

    def prior_of_u(u, fixed_values):
        p = params_of_u(u, fixed_values)
        out = jnp.zeros(())
        for pname, prior in compiled.prior_terms:
            out = out + prior(jnp.asarray(p[pname]))
        return out

    return params_of_u, mt_of_u, idx_of_u, prior_of_u


def _chain_vgh(mt_of_u, prior_of_u, raw_vgh):
    """Chain a closed-form (ll, g, H) in (m, t) space through the parameter
    graph: negated objective value, gradient and Hessian in u space."""
    def vgh_fn(u, *args):
        fixed_values = args[-1]
        ll, g_mt, H_mt = raw_vgh(u, *args)
        J = jax.jacfwd(lambda v: mt_of_u(v, fixed_values))(u)     # (M, n)
        Hmap = jax.jacfwd(jax.jacfwd(
            lambda v: mt_of_u(v, fixed_values)))(u)               # (M, n, n)
        pv, pg = jax.value_and_grad(
            lambda v: prior_of_u(v, fixed_values))(u)
        pH = jax.hessian(lambda v: prior_of_u(v, fixed_values))(u)
        val = -(ll + pv)
        g = -(J.T @ g_mt.astype(u.dtype) + pg)
        H = -(J.T @ H_mt.astype(u.dtype) @ J
              + jnp.tensordot(g_mt.astype(u.dtype), Hmap, axes=(0, 0)) + pH)
        return val, g, H
    return vgh_fn


# Test hook: force the TPU-only single-stream dense unbinned engine on the
# CPU backend so its end-to-end fit behavior is pinned against the gather
# engine in CI (tests/test_unbinned_dense.py) — on CPU a dense G-row matmul
# only wastes G/2^K x the work, so it is never the production choice there.
_FORCE_DENSE_UNBINNED = False


def _make_unbinned_parts(compiled, names, fixed, transform, runtime_fixed=(),
                         use_pallas=False):
    """(value_fn, vgh_fn, value_many_fn, ref_fn) for the closed-form
    unbinned engine. value/vgh/value_many take (u[s], flat_ps_tensor, mask,
    center, fixed_values): the density tensor arrives at call time (each
    toy's scored events, grid axes flattened, and — on the Pallas path —
    events padded to the lane width), so one program serves the whole
    ensemble; ``center = ref_fn(tensor, mask)[0]`` is the per-toy float32
    centering data (see ops.unbinned_vgh.reference_center)."""
    from ..ops.binned_vgh import gather_corners, gather_corners_dense
    from ..ops.unbinned_vgh import (unbinned_vgh, unbinned_ll,
                                    reference_center)
    from ..ops import fused_unbinned

    K = len(compiled.shape_names)
    S = len(compiled.rate_names)
    outlier = compiled.outlier_likelihood
    _, mt_of_u, idx_of_u, prior_of_u = _make_param_graph(
        compiled, names, fixed, transform, runtime_fixed)
    grid_shape = tuple(len(a) for a in compiled.anchor_arrays)
    strides = tuple(int(np.prod(grid_shape[d + 1:])) for d in range(K))
    interpret = jax.default_backend() != 'tpu'

    # Per-toy corner extraction: dynamic_slice under vmap lowers to an
    # elementwise gather (slow on TPU — it dominated the XENON-scale
    # unbinned Newton loop); the one-hot-matmul form streams the tensor
    # through the MXU instead. CPU keeps the slice (a dense G-row matmul
    # there only wastes G/2^K x the work).
    corner_fn = (gather_corners_dense
                 if jax.default_backend() == 'tpu' else gather_corners)

    def _corners(tensor, u, fixed_values):
        if K == 0:
            return tensor
        return corner_fn(tensor.reshape(grid_shape + tensor.shape[1:]),
                         idx_of_u(u, fixed_values), K)

    # The reference point for float32 centering is built from HOST-SIDE
    # literal constants (every parameter at its default — ignoring guesses
    # and runtime-fixed hypothesis values on purpose), so every program that
    # fits the same toy — free fit, conditional fit, straggler refinement —
    # embeds the bit-identical reference computation. The centered optima
    # then difference exactly; the only residual float32 rounding in the
    # profile-LR statistic is the final add-back of ref_ll (bounded by
    # ~2 ulp(|ref_ll|)), vs O(ulp) losses in every line-search comparison
    # without centering.
    p0 = dict(compiled.defaults)
    # _make_unbinned_parts can be entered lazily inside a jit trace (the
    # engine choice depends on the event count, known only per trace);
    # compute the reference constants eagerly regardless.
    with jax.ensure_compile_time_eval():
        m0 = np.asarray(compiled.rates(
            {k: jnp.asarray(float(v)) for k, v in p0.items()}))
    idx0, t0 = [], []
    for d, sp in enumerate(compiled.shape_names):
        arr = np.asarray(compiled.anchor_arrays[d], dtype=float)
        z = float(np.clip(float(p0[sp]), arr[0], arr[-1]))
        i = int(np.clip(np.searchsorted(arr, z, side='right') - 1,
                        0, len(arr) - 2))
        idx0.append(i)
        t0.append(float(np.clip((z - arr[i]) / (arr[i + 1] - arr[i]),
                                0.0, 1.0)))

    def ref_fn(tensor, mask):
        if K:
            corners0 = gather_corners(
                tensor.reshape(grid_shape + tensor.shape[1:]),
                [jnp.asarray(i, jnp.int32) for i in idx0], K)
        else:
            corners0 = tensor
        inv_ref, ref_msum, ref_ll = reference_center(
            corners0, jnp.asarray(m0, tensor.dtype),
            jnp.asarray(t0, tensor.dtype), mask, outlier)
        return (inv_ref, ref_msum), ref_ll

    if use_pallas:
        def value_fn(u, tensor, mask, center, fixed_values=()):
            mt = mt_of_u(u, fixed_values)
            idx = idx_of_u(u, fixed_values)
            idxs = (jnp.stack(idx)[None] if K
                    else jnp.zeros((1, 0), jnp.int32))
            inv_ref, ref_msum = center
            ll = fused_unbinned.unbinned_ll_fused_multi(
                tensor, strides, idxs, mt[None, S:], mt[None, :S], mask,
                outlier=outlier, interpret=interpret,
                inv_ref=inv_ref, ref_msum=ref_msum)[0]
            return -(ll.astype(u.dtype) + prior_of_u(u, fixed_values))

        def value_many_fn(u_cands, tensor, mask, center, fixed_values=()):
            mts = jax.vmap(lambda v: mt_of_u(v, fixed_values))(u_cands)
            priors = jax.vmap(
                lambda v: prior_of_u(v, fixed_values))(u_cands)
            if K:
                idxs = jax.vmap(lambda v: jnp.stack(
                    idx_of_u(v, fixed_values)))(u_cands)
            else:
                idxs = jnp.zeros((u_cands.shape[0], 0), jnp.int32)
            inv_ref, ref_msum = center
            lls = fused_unbinned.unbinned_ll_fused_multi(
                tensor, strides, idxs, mts[:, S:], mts[:, :S], mask,
                outlier=outlier, interpret=interpret,
                inv_ref=inv_ref, ref_msum=ref_msum)
            return -(lls.astype(u_cands.dtype) + priors)

        def _raw_vgh(u, tensor, mask, center, fixed_values):
            mt = mt_of_u(u, fixed_values)
            inv_ref, ref_msum = center
            return fused_unbinned.unbinned_vgh_fused(
                tensor, strides, idx_of_u(u, fixed_values), mt[S:], mt[:S],
                mask, outlier=outlier, interpret=interpret,
                inv_ref=inv_ref, ref_msum=ref_msum)

        return (value_fn, _chain_vgh(mt_of_u, prior_of_u, _raw_vgh),
                value_many_fn, ref_fn)

    if jax.default_backend() == 'tpu' or _FORCE_DENSE_UNBINNED:
        # Single-stream dense engine (ops/unbinned_dense.py): every Newton
        # iteration streams the per-toy anchor tensor from HBM exactly
        # twice (once for the vgh morph matmul, once for the line-search
        # candidate matmul) instead of materializing (A, 2^K, S, E) corner
        # blocks — at XENON scale the corner round trips were ~22 MB/toy/
        # iteration and bound the scenario to ~9% of roof (VERDICT r4 #2).
        # Measured on the v5e: unbinned_xenon 44.2 -> 150.6 fits/s.
        from ..ops.unbinned_dense import (unbinned_vgh_dense,
                                          unbinned_ll_dense_many)

        def _ll_many(u_cands, tensor, mask, center, fixed_values):
            mts = jax.vmap(lambda v: mt_of_u(v, fixed_values))(u_cands)
            if K:
                idxs = jax.vmap(lambda v: jnp.stack(
                    idx_of_u(v, fixed_values)))(u_cands)
            else:
                idxs = jnp.zeros((u_cands.shape[0], 0), jnp.int32)
            inv_ref, ref_msum = center
            return unbinned_ll_dense_many(
                tensor, strides, idxs, mts[:, S:], mts[:, :S], mask,
                outlier_likelihood=outlier, inv_ref=inv_ref,
                ref_msum=ref_msum)

        def value_fn(u, tensor, mask, center, fixed_values=()):
            ll = _ll_many(u[None], tensor, mask, center, fixed_values)[0]
            return -(ll.astype(u.dtype) + prior_of_u(u, fixed_values))

        def value_many_fn(u_cands, tensor, mask, center, fixed_values=()):
            lls = _ll_many(u_cands, tensor, mask, center, fixed_values)
            priors = jax.vmap(
                lambda v: prior_of_u(v, fixed_values))(u_cands)
            return -(lls.astype(u_cands.dtype) + priors)

        def _raw_vgh(u, tensor, mask, center, fixed_values):
            mt = mt_of_u(u, fixed_values)
            inv_ref, ref_msum = center
            return unbinned_vgh_dense(
                tensor, strides, idx_of_u(u, fixed_values), mt[S:], mt[:S],
                mask, outlier_likelihood=outlier, inv_ref=inv_ref,
                ref_msum=ref_msum)

        return (value_fn, _chain_vgh(mt_of_u, prior_of_u, _raw_vgh),
                value_many_fn, ref_fn)

    def value_fn(u, tensor, mask, center, fixed_values=()):
        mt = mt_of_u(u, fixed_values)
        inv_ref, ref_msum = center
        ll = unbinned_ll(_corners(tensor, u, fixed_values), mt[:S], mt[S:],
                         mask, outlier, inv_ref=inv_ref, ref_msum=ref_msum)
        return -(ll + prior_of_u(u, fixed_values))

    def _raw_vgh(u, tensor, mask, center, fixed_values):
        mt = mt_of_u(u, fixed_values)
        inv_ref, ref_msum = center
        return unbinned_vgh(_corners(tensor, u, fixed_values), mt[:S],
                            mt[S:], mask, outlier, inv_ref=inv_ref,
                            ref_msum=ref_msum)

    def value_many_fn(u_cands, tensor, mask, center, fixed_values=()):
        """All line-search candidates in ONE call, their corner blocks
        extracted by a single stacked one-hot matmul — the anchor tensor
        streams from HBM once per Newton iteration instead of once per
        candidate (the dominant cost of the XENON-scale unbinned fit)."""
        from ..ops.binned_vgh import gather_corners_dense_many
        mts = jax.vmap(lambda v: mt_of_u(v, fixed_values))(u_cands)
        priors = jax.vmap(lambda v: prior_of_u(v, fixed_values))(u_cands)
        inv_ref, ref_msum = center
        if K:
            idxs = jax.vmap(lambda v: jnp.stack(
                idx_of_u(v, fixed_values)))(u_cands)
            corners = gather_corners_dense_many(
                tensor.reshape(grid_shape + tensor.shape[1:]), idxs, K)
        else:
            corners = jnp.broadcast_to(
                tensor[None], (u_cands.shape[0],) + tensor.shape)
        lls = jax.vmap(lambda c, mt: unbinned_ll(
            c, mt[:S], mt[S:], mask, outlier,
            inv_ref=inv_ref, ref_msum=ref_msum))(corners, mts)
        return -(lls.astype(u_cands.dtype) + priors)

    return (value_fn, _chain_vgh(mt_of_u, prior_of_u, _raw_vgh),
            value_many_fn, ref_fn)


def _make_analytic_parts(compiled, names, fixed, transform,
                         use_pallas=False, runtime_fixed=(), routed=None):
    """Build (value_fn(u, data_flat, fixed_values),
    vgh_fn(u, data_flat, fixed_values)) computing the negated objective from
    closed-form (m, t)-derivatives + chain rule through the (tiny) parameter
    graph: transforms, rate morphing, priors. ``fixed_values`` supplies the
    runtime-fixed parameters (aligned with ``runtime_fixed``).

    With use_pallas, the heavy (ll, g, H) op runs as the fused Pallas kernel
    (anchor tensor VMEM-resident); interpret mode is selected automatically on
    non-TPU backends. Must be called OUTSIDE any jit trace (it prepares
    device-constant tensors).
    """
    from ..ops.binned_vgh import (binned_vgh, binned_ll, gather_corners,
                                  gather_corners_dense,
                                  binned_vgh_log, binned_ll_log)
    from ..ops.bb_vgh import binned_bb_vgh, binned_bb_ll
    from ..ops.bb_lite import binned_bblite_vgh, binned_bblite_ll
    from ..ops import fused

    shape_names = compiled.shape_names
    K = len(shape_names)
    S = len(compiled.rate_names)
    ps_tensor = compiled.ps_tensor
    # Flatten analysis-space bins: (*grid, S, N)
    grid_shape = ps_tensor.shape[:K]
    ps_flat = ps_tensor.reshape(grid_shape + (S, -1))
    anchor_arrays = [jnp.asarray(a) for a in compiled.anchor_arrays]
    has_bb = compiled.has_bb
    has_bb_lite = getattr(compiled, 'has_bb_lite', False)
    if has_bb:
        bb_i = compiled.bb_source_i
    if has_bb or has_bb_lite:
        nme_flat = compiled.nme_tensor.reshape(grid_shape + (S, -1))
    log_morph = getattr(compiled, 'log_morph', False)
    if log_morph and use_pallas:
        raise ValueError(
            "the fused Pallas kernels bake in linear template morphing; "
            "log-morphed (template_interpolation='log') models use "
            "engine='analytic'")
    if log_morph:
        # Per-anchor template masses for the linear mass-rescale of the
        # geometric morph (morphers.LogMorpher._anchor_mass); precomputed
        # from the HOST twin of the log anchor tensor — exp+sum of the full
        # payload runs once here, never on the device per fit
        ps_host = getattr(compiled, 'ps_tensor_host', None)
        logT = (np.asarray(ps_host) if ps_host is not None
                else np.asarray(ps_flat))
        mass_grid = jnp.asarray(
            np.exp(logT.reshape(grid_shape + (S, -1))).sum(axis=-1),
            dtype=ps_tensor.dtype)                        # (*grid, S)

    if use_pallas:
        from ..ops import fused_bb, fused_bb_lite
        n_bins = int(np.prod(ps_tensor.shape[K + 1:]))
        G = int(np.prod(grid_shape)) if K else 1
        # Use the host twin of the anchor tensor when available: padding on a
        # pulled-back device array costs a multi-MB d2h round trip (minutes
        # on a degraded remote-TPU link)
        ps_host = getattr(compiled, 'ps_tensor_host', None)
        ps_np = (np.asarray(ps_host) if ps_host is not None
                 else np.asarray(ps_flat))
        anchor_flat = jnp.asarray(fused.pad_bins(
            ps_np.reshape(G, S, n_bins)))
        n_pad = anchor_flat.shape[-1] - n_bins
        strides = tuple(int(np.prod(grid_shape[d + 1:])) for d in range(K))
        interpret = jax.default_backend() != 'tpu'
        if has_bb:
            nme_host = getattr(compiled, 'nme_tensor_host', None)
            nme_np = (np.asarray(nme_host) if nme_host is not None
                      else np.asarray(nme_flat))
            nme_bb = nme_np.reshape(grid_shape + (S, n_bins))[
                ..., bb_i, :].reshape(G, n_bins)
            nme_bb_flat = jnp.asarray(
                np.pad(nme_bb, ((0, 0), (0, n_pad))) if n_pad else nme_bb)
        elif has_bb_lite:
            # The lite root only sees the TOTAL per-bin MC counts: pre-sum
            # over sources so the resident scratch is one (G, N) row set
            nme_host = getattr(compiled, 'nme_tensor_host', None)
            nme_np = (np.asarray(nme_host) if nme_host is not None
                      else np.asarray(nme_flat))
            nme_tot = nme_np.reshape(G, S, n_bins).sum(axis=1)
            nme_tot_flat = jnp.asarray(
                np.pad(nme_tot, ((0, 0), (0, n_pad))) if n_pad else nme_tot)

    runtime_fixed = list(runtime_fixed)
    params_of_u, mt_of_u, idx_of_u, prior_of_u = _make_param_graph(
        compiled, names, fixed, transform, runtime_fixed, routed=routed)

    # Same gather-vs-matmul tradeoff as the unbinned engine: under vmap the
    # slice is an elementwise gather; on TPU the one-hot matmul wins
    corner_fn = (gather_corners_dense
                 if jax.default_backend() == 'tpu' else gather_corners)

    def _corners_of(tensor_flat, u, fixed_values):
        if K == 0:
            return tensor_flat[None]
        return corner_fn(tensor_flat, idx_of_u(u, fixed_values), K)

    def _corners(u, fixed_values):
        return _corners_of(ps_flat, u, fixed_values)

    def value_fn(u, data_flat, fixed_values=()):
        mt = mt_of_u(u, fixed_values)
        if has_bb_lite:
            ll = binned_bblite_ll(_corners(u, fixed_values),
                                  _corners_of(nme_flat, u, fixed_values),
                                  mt[:S], mt[S:], data_flat)
        elif has_bb:
            ll = binned_bb_ll(_corners(u, fixed_values),
                              _corners_of(nme_flat, u, fixed_values),
                              mt[:S], mt[S:], data_flat, bb_i)
        elif log_morph:
            ll = binned_ll_log(_corners(u, fixed_values),
                               _corners_of(mass_grid, u, fixed_values),
                               mt[:S], mt[S:], data_flat)
        else:
            ll = binned_ll(_corners(u, fixed_values), mt[:S], mt[S:],
                           data_flat)
        return -(ll + prior_of_u(u, fixed_values))

    def _raw_vgh(u, data_flat, fixed_values):
        mt = mt_of_u(u, fixed_values)
        if has_bb_lite and use_pallas:
            data_padded = (jnp.pad(data_flat, (0, n_pad)) if n_pad
                           else data_flat)
            return fused_bb_lite.binned_bblite_vgh_fused(
                anchor_flat, nme_tot_flat, strides,
                idx_of_u(u, fixed_values), mt[S:], mt[:S], data_padded,
                interpret=interpret)
        if has_bb_lite:
            return binned_bblite_vgh(_corners(u, fixed_values),
                                     _corners_of(nme_flat, u, fixed_values),
                                     mt[:S], mt[S:], data_flat)
        if has_bb and use_pallas:
            data_padded = (jnp.pad(data_flat, (0, n_pad)) if n_pad
                           else data_flat)
            return fused_bb.binned_bb_vgh_fused(
                anchor_flat, nme_bb_flat, strides,
                idx_of_u(u, fixed_values), mt[S:], mt[:S], data_padded,
                bb_i, interpret=interpret)
        if has_bb:
            return binned_bb_vgh(_corners(u, fixed_values),
                                 _corners_of(nme_flat, u, fixed_values),
                                 mt[:S], mt[S:], data_flat, bb_i)
        if use_pallas:
            data_padded = (jnp.pad(data_flat, (0, n_pad)) if n_pad
                           else data_flat)
            return fused.binned_vgh_fused(
                anchor_flat, strides, idx_of_u(u, fixed_values), mt[S:],
                mt[:S], data_padded, interpret=interpret)
        if log_morph:
            return binned_vgh_log(_corners(u, fixed_values),
                                  _corners_of(mass_grid, u, fixed_values),
                                  mt[:S], mt[S:], data_flat)
        return binned_vgh(_corners(u, fixed_values), mt[:S], mt[S:],
                          data_flat)

    vgh_fn = _chain_vgh(mt_of_u, prior_of_u, _raw_vgh)

    value_many_fn = None
    if use_pallas:
        assert routed is None  # Sum children never take the Pallas path
        def value_many_fn(u_cands, data_flat, fixed_values=()):
            """Objective at A parameter candidates sharing one dataset — one
            value-kernel launch for the optimizer's line search / polish."""
            mts = jax.vmap(lambda v: mt_of_u(v, fixed_values))(u_cands)
            priors = jax.vmap(
                lambda v: prior_of_u(v, fixed_values))(u_cands)
            if K:
                idxs = jax.vmap(lambda v: jnp.stack(
                    idx_of_u(v, fixed_values)))(u_cands)
            else:
                idxs = jnp.zeros((u_cands.shape[0], 0), jnp.int32)
            data_padded = (jnp.pad(data_flat, (0, n_pad)) if n_pad
                           else data_flat)
            if has_bb_lite:
                lls = fused_bb_lite.binned_bblite_ll_fused_multi(
                    anchor_flat, nme_tot_flat, strides, idxs, mts[:, S:],
                    mts[:, :S], data_padded, interpret=interpret)
            elif has_bb:
                lls = fused_bb.binned_bb_ll_fused_multi(
                    anchor_flat, nme_bb_flat, strides, idxs, mts[:, S:],
                    mts[:, :S], data_padded, bb_i, interpret=interpret)
            else:
                lls = fused.binned_ll_fused_multi(
                    anchor_flat, strides, idxs, mts[:, S:], mts[:, :S],
                    data_padded, interpret=interpret)
            return -(lls.astype(u_cands.dtype) + priors)

    return value_fn, vgh_fn, value_many_fn


def _make_sum_analytic_parts(compiled, names, fixed, transform,
                             runtime_fixed=()):
    """(value_fn(u, data_list, fixed_values), vgh_fn(...)) for a compiled
    LogLikelihoodSum: each dataset child contributes its closed-form
    (value, gradient, Hessian) already chained to the JOINT u space — the
    `routed` filter keeps undeclared joint parameters from overriding the
    child's own defaults, matching the host Sum's routing
    (composition.LogLikelihoodSum) — weighted by the sum's likelihood
    weights; dataset-free (ancillary) children contribute autodiff of their
    tiny param-only graphs. ``data_list`` aligns with the children (None
    entries for dataset-free children)."""
    entries = []
    for i, (c, w) in enumerate(zip(compiled.children,
                                   compiled.child_weights)):
        routed = compiled.child_routed[i]
        if getattr(c, 'has_data', True):
            vf, gf, _ = _make_analytic_parts(
                c, names, fixed, transform, use_pallas=False,
                runtime_fixed=runtime_fixed, routed=routed)
        else:
            def _mk(c=c, routed=routed):
                p_of_u = _routed_params_of_u(c.defaults, names, fixed,
                                             transform, runtime_fixed, routed)

                def vf(u, _data, fixed_values=()):
                    return -c.logl(p_of_u(u, fixed_values))

                def gf(u, _data, fixed_values=()):
                    f = lambda v: vf(v, None, fixed_values)  # noqa: E731
                    val, g = jax.value_and_grad(f)(u)
                    return val, g, jax.hessian(f)(u)
                return vf, gf
            vf, gf = _mk()
        entries.append((i, float(w), vf, gf))

    def value_fn(u, data_list, fixed_values=()):
        out = jnp.zeros((), dtype=u.dtype)
        for i, w, vf, _ in entries:
            out = out + w * vf(u, data_list[i], fixed_values)
        return out

    def vgh_fn(u, data_list, fixed_values=()):
        val = jnp.zeros((), dtype=u.dtype)
        g = jnp.zeros_like(u)
        H = jnp.zeros((u.shape[0], u.shape[0]), dtype=u.dtype)
        for i, w, _, gf in entries:
            v_i, g_i, H_i = gf(u, data_list[i], fixed_values)
            val = val + w * v_i.astype(u.dtype)
            g = g + w * g_i.astype(u.dtype)
            H = H + w * H_i.astype(u.dtype)
        return val, g, H

    return value_fn, vgh_fn


def make_toy_fitter(compiled, fixed=None, guess=None, max_iter=60, tol=1e-8,
                    engine='auto', runtime_fixed=(), polish=4,
                    kink_jumps=None):
    """Build the per-toy fit function fit_one(data, mask[, fixed_values]) ->
    (x (n_floating,), max_ll, n_iter). Pure jax: compose with vmap/jit/shard.

    :param engine: 'ad' uses autodiff value/grad/Hessian of the compiled
      likelihood; 'analytic' uses the closed-form (m, t)-derivative engine
      (binned incl. BB modes and log morphing, unbinned, and Sums of binned
      children); 'pallas' the fused TPU kernels; 'auto' picks the fastest
      supported engine for the backend.
    :param runtime_fixed: parameter names fixed at *call time* — their values
      arrive as fit_one's third argument (a vector aligned with this list), so
      e.g. a Neyman hypothesis scan reuses one compiled program instead of
      recompiling per hypothesis value.
    :param kink_jumps: in-loop fixed-size escape steps along each kink (shape)
      coordinate, or None for the measured default: ON for models with <= 2
      kink coordinates (on the Gaussian scenario they take the false-optimum
      tail from 10/4096 toys to 0), OFF for higher-dimensional morphing grids
      (on the near-degenerate XENON scenario the greedy jumps both cost line
      search time and *worsen* optima: 70/512 short vs 7/512 without).
    :return: (fit_one, floating names list)
    """
    from ..exceptions import NoOpimizationNecessary
    runtime_fixed = list(runtime_fixed)
    fixed = dict(fixed or {})
    # Build-time fixed values must be inside the parameter's range: the
    # analytic/pallas engines evaluate clamped-to-the-anchor-grid values
    # (their morphing math only exists inside it), so an out-of-range fixed
    # value would silently fit a DIFFERENT parameter point — only the AD
    # engine would report -inf. Fail loudly on host instead, for every
    # engine alike. (Runtime hypothesis values get the same check in the
    # toy-study entry points, where their values are known on host.)
    check_fixed_in_bounds(compiled, fixed)
    for rname in runtime_fixed:
        fixed.setdefault(rname, compiled.defaults[rname])  # placeholder

    try:
        names, fixed, transform, x0 = _floating_setup(compiled, fixed, guess)
    except NoOpimizationNecessary:
        # Everything fixed (e.g. the conditional fit of a 1-parameter model):
        # just evaluate the likelihood at the fixed point.
        base_params = dict(compiled.defaults)
        base_params.update(fixed)

        def fit_one(data, mask=None, fixed_values=(), x0=None, freeze=None):
            params = dict(base_params)
            for i, rname in enumerate(runtime_fixed):
                params[rname] = fixed_values[i]
            ll = compiled.logl_with_data(params, data, mask)
            return (jnp.zeros((0,)), ll, jnp.zeros((), dtype=jnp.int32))
        return fit_one, []

    u0 = jnp.asarray(transform.to_u_np(x0))
    # Only shape (morph-weight) coordinates can pin on anchor-grid kinks
    kink_coords = tuple(i for i, nm in enumerate(names)
                        if nm in compiled.shape_names)
    if kink_jumps is None:
        kink_jumps = ((0.3, -0.3, 0.1, -0.1) if len(kink_coords) <= 2
                      else ())
    # u-space anchor positions per kink coordinate, for the snap-to-anchor
    # line-search candidates (optima sitting exactly ON an anchor are common:
    # toys are usually generated at anchor-point nuisance truths)
    snap_anchors = None
    if kink_coords and compiled.anchor_arrays is not None:
        shape_idx = {nm: d for d, nm in enumerate(compiled.shape_names)}
        snap_anchors = [
            transform.to_u_coord(
                ci, np.asarray(compiled.anchor_arrays[shape_idx[names[ci]]]))
            for ci in kink_coords]
    elif kink_coords and getattr(compiled, 'children', None) is not None:
        # Compiled Sum: no joint anchor grid, but every kink (shape)
        # coordinate is anchored on the children it routes to. The UNION of
        # those per-child anchor sets is where the joint objective has C0
        # kinks, so it is the right snap-candidate set for the joint fit —
        # without this, Sum fits silently lost the snap-to-anchor line-search
        # candidates that rescue toys generated at anchor-point truths.
        per_coord = []
        for ci in kink_coords:
            nm = names[ci]
            vals = []
            for c, routed in zip(compiled.children, compiled.child_routed):
                if (nm in routed and c.anchor_arrays
                        and nm in c.shape_names):
                    d = list(c.shape_names).index(nm)
                    # ps_build_kind='constant' children carry shape_names
                    # but an empty/short anchor_arrays — skip, don't crash
                    if d < len(c.anchor_arrays):
                        vals.append(np.asarray(c.anchor_arrays[d]))
            if not vals:
                break
            per_coord.append(transform.to_u_coord(
                ci, np.unique(np.concatenate(vals))))
        if len(per_coord) == len(kink_coords):
            snap_anchors = per_coord

    if engine in ('analytic', 'pallas') and not (
            _analytic_supported(compiled)
            or _unbinned_analytic_supported(compiled)
            or (engine == 'analytic' and _sum_analytic_supported(compiled))):
        raise ValueError("The analytic derivative engine supports binned and "
                         "unbinned likelihoods on a dense global anchor grid "
                         "(with Beeston-Barlow, the n_model_events tensor "
                         "must be on the same layout), and LogLikelihoodSums "
                         "of such binned likelihoods; source-wise grids use "
                         "the AD engine")
    if engine == 'auto' and compiled.has_bb and _analytic_supported(compiled):
        # Closed-form BB derivative engine; on real TPUs take the fused
        # Pallas kernel (pmf anchors + the finite-MC source's count rows
        # VMEM-resident) when both fit the budget
        from ..ops import fused_bb
        K_, S_, G_, n_bins_ = _grid_dims(compiled)
        if (jax.default_backend() == 'tpu'
                and not _has_negative(compiled)
                and fused_bb.fused_bb_supported(
                    (G_, S_, n_bins_), compiled.ps_tensor.dtype)):
            engine = 'pallas'
        else:
            engine = 'analytic'
    if engine == 'auto' and getattr(compiled, 'has_bb_lite', False) \
            and _analytic_supported(compiled):
        # Closed-form Barlow-Beeston-lite derivative engine (ops/bb_lite.py);
        # on real TPUs take the fused Pallas kernel (pmf anchors + the
        # total-MC-count rows VMEM-resident) when both fit the budget. The
        # lite kernel shares the jnp engine's per-bin closed forms including
        # the negative-expectation penalty, so allow_negative models stay
        # eligible.
        from ..ops import fused_bb_lite
        K_, S_, G_, n_bins_ = _grid_dims(compiled)
        if (jax.default_backend() == 'tpu'
                and fused_bb_lite.fused_bblite_supported(
                    (G_, S_, n_bins_), compiled.ps_tensor.dtype)):
            engine = 'pallas'
        else:
            engine = 'analytic'
    if engine == 'auto' and _unbinned_analytic_supported(compiled):
        # Fused per-toy kernel on real TPUs; the event count is only known at
        # call time, so fit_one falls back to the jnp engine per trace when a
        # toy block would not fit VMEM
        engine = ('pallas' if jax.default_backend() == 'tpu'
                  else 'analytic')
    if engine == 'auto' and _analytic_supported(compiled):
        # Prefer the fused Pallas kernels on real TPUs when the anchor tensor
        # fits VMEM *and* the per-toy payload is big enough to feed the VPU
        # from the kernel's per-toy loop (small templates vectorize better
        # across toys in plain XLA); interpret-mode pallas on CPU would always
        # be slower than XLA.
        from ..ops import fused
        K, S, G, n_bins = _grid_dims(compiled)
        per_toy_payload = S * fused._round_up(n_bins, fused.LANE)
        # allow_negative models need the negative-expectation penalty that
        # only the jnp value paths carry — keep them off the Pallas kernels;
        # log-morphed models use the jnp closed forms (the kernels bake in
        # linear lerp)
        if (jax.default_backend() == 'tpu'
                and per_toy_payload >= 4096
                and not _has_negative(compiled)
                and not getattr(compiled, 'log_morph', False)
                and fused.fused_vgh_supported((G, S, n_bins),
                                              compiled.ps_tensor.dtype)):
            engine = 'pallas'
        else:
            engine = 'analytic'
    if engine == 'auto' and _sum_analytic_supported(compiled):
        # Compiled LogLikelihoodSum of analytic-eligible binned children:
        # joint closed-form engine (per-child Pallas kernels would each pin
        # their anchor tensor in VMEM; keep the jnp path for sums)
        engine = 'analytic'
    use_pallas = engine == 'pallas'
    use_analytic = engine in ('analytic', 'pallas')

    if use_analytic and getattr(compiled, 'children', None) is not None:
        value_fn, vgh_fn = _make_sum_analytic_parts(
            compiled, names, fixed, transform, runtime_fixed=runtime_fixed)
        children = compiled.children

        def fit_one(data, mask=None, fixed_values=(), x0=None, freeze=None):
            if mask is not None:
                # The binned closed-form engines carry no per-bin mask (the
                # AD engine's logl_with_data does); silently ignoring one
                # would make engine='auto' disagree with engine='ad'
                raise ValueError(
                    "the closed-form Sum engine does not support per-child "
                    "masks; use engine='ad' for masked fits")
            const = compiled.data_constant(data)
            data_list = [jnp.asarray(d).reshape(-1)
                         if getattr(c, 'has_data', True) else None
                         for c, d in zip(children, data)]
            u_start = u0 if x0 is None else transform.to_u(jnp.asarray(x0))
            u, fval, it = minimize_newton(
                lambda u: value_fn(u, data_list, fixed_values), u_start,
                max_iter=max_iter, tol=tol, polish=polish,
                kink_coords=kink_coords, kink_jumps=kink_jumps,
                snap_anchors=snap_anchors, freeze=freeze,
                vgh=lambda u: vgh_fn(u, data_list, fixed_values))
            return transform.to_x(u), -fval + const, it

        return fit_one, names

    if use_analytic and not compiled.is_binned:
        from ..ops import fused_unbinned
        K = len(compiled.shape_names)
        S = len(compiled.rate_names)
        G = int(np.prod([len(a) for a in compiled.anchor_arrays])) if K else 1
        parts = {}   # engine flag -> (value_fn, vgh_fn, value_many_fn)

        def _parts(pallas):
            if pallas not in parts:
                parts[pallas] = _make_unbinned_parts(
                    compiled, names, fixed, transform,
                    runtime_fixed=runtime_fixed, use_pallas=pallas)
            return parts[pallas]

        def fit_one(data, mask=None, fixed_values=(), x0=None, freeze=None):
            # data = anchor per-event density tensor (a toy's scored events);
            # None falls back to the set_data-bound tensor
            tensor = jnp.asarray(data if data is not None
                                 else compiled.ps_tensor)
            tensor = tensor.reshape((G, S, -1))
            E = tensor.shape[-1]
            event_mask = (mask if mask is not None
                          else jnp.ones(E, dtype=bool))
            # The event count is only known here (per trace): take the fused
            # kernel when the toy-block working set fits VMEM
            pallas = (use_pallas and fused_unbinned.fused_unbinned_supported(
                (G, S, E), tensor.dtype))
            if pallas:
                E_pad = fused_unbinned._round_up(E, fused_unbinned.LANE)
                if E_pad != E:
                    tensor = jnp.pad(tensor, ((0, 0), (0, 0), (0, E_pad - E)))
                    event_mask = jnp.pad(event_mask, (0, E_pad - E))
            value_fn, vgh_fn, value_many_fn, ref_fn = _parts(pallas)
            u_start = u0 if x0 is None else transform.to_u(jnp.asarray(x0))
            # Center the LL at a fixed per-toy reference so float32 fits
            # stay exact at any event count (see reference_center); both
            # engines take the same center, both report centered + ref_ll.
            center, ref_ll = ref_fn(tensor, event_mask)
            value = lambda u: value_fn(u, tensor, event_mask, center,
                                       fixed_values)           # noqa: E731
            vghl = lambda u: vgh_fn(u, tensor, event_mask, center,
                                    fixed_values)              # noqa: E731
            f_many = (None if value_many_fn is None else
                      (lambda cands: value_many_fn(
                          cands, tensor, event_mask, center, fixed_values)))
            u, fval, it = minimize_newton(
                value, u_start, max_iter=max_iter, tol=tol, polish=polish,
                kink_coords=kink_coords, kink_jumps=kink_jumps,
                snap_anchors=snap_anchors,
                f_many=f_many, freeze=freeze, vgh=vghl)
            return transform.to_x(u), -fval + ref_ll, it

        return fit_one, names

    if use_analytic:
        value_fn, vgh_fn, value_many_fn = _make_analytic_parts(
            compiled, names, fixed, transform, use_pallas=use_pallas,
            runtime_fixed=runtime_fixed)

        def fit_one(data, mask=None, fixed_values=(), x0=None, freeze=None):
            if compiled.is_binned and mask is not None:
                raise ValueError(
                    "the binned closed-form/Pallas engines do not support a "
                    "bin mask; use engine='ad' for masked fits")
            const = compiled.data_constant(data)
            data_flat = jnp.asarray(data).reshape(-1)
            f_many = (None if value_many_fn is None else
                      (lambda cands: value_many_fn(cands, data_flat,
                                                   fixed_values)))
            u_start = u0 if x0 is None else transform.to_u(jnp.asarray(x0))
            u, fval, it = minimize_newton(
                lambda u: value_fn(u, data_flat, fixed_values), u_start,
                max_iter=max_iter, tol=tol, polish=polish, f_many=f_many,
                kink_coords=kink_coords, kink_jumps=kink_jumps,
                snap_anchors=snap_anchors,
                freeze=freeze,
                vgh=lambda u: vgh_fn(u, data_flat, fixed_values))
            return transform.to_x(u), -fval + const, it

        return fit_one, names

    def fit_one(data, mask=None, fixed_values=(), x0=None, freeze=None):
        run_fixed = dict(fixed)
        for i, rname in enumerate(runtime_fixed):
            run_fixed[rname] = fixed_values[i]

        def params_of_u(u):
            x = transform.to_x(u)
            p = dict(compiled.defaults)
            p.update(run_fixed)
            for i, name in enumerate(names):
                p[name] = x[i]
            return p

        # The data-only constant is loop-invariant: keep it out of the
        # minimized objective, add it back to the reported maximum
        const = compiled.data_constant(data)

        def neg_logl_u(u):
            return -compiled.logl_with_data(params_of_u(u), data, mask,
                                            include_constant=False)
        u_start = u0 if x0 is None else transform.to_u(jnp.asarray(x0))
        u, fval, it = minimize_newton(neg_logl_u, u_start,
                                             max_iter=max_iter, tol=tol,
                                             polish=polish, freeze=freeze,
                                             kink_jumps=kink_jumps,
                                             snap_anchors=snap_anchors,
                                             kink_coords=kink_coords)
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
