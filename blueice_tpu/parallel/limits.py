"""Per-toy upper limits and expected-sensitivity ("Brazil") bands.

The reference leaves sensitivity studies to user loops: simulate, set_data,
``one_parameter_interval``, repeated thousands of times — each interval itself
a brentq scan of scipy fits (reference: blueice/inference.py:332-389). Here
the whole construction is three compiled XLA programs: one toy ensemble, one
batched free fit, and one batched conditional fit reused across the hypothesis
grid (:meth:`~blueice_tpu.parallel.toys.BinnedToyStudy.profile_ts_grid`). The
per-toy limit is then the crossing of that toy's profile-LR curve with the
critical curve, linearly interpolated on the grid — no per-toy optimizer loop
ever runs on the host.

Statistic conventions match ``one_parameter_interval``: the default critical
value is Wilks' ``norm.ppf(cl)**2`` (reference: blueice/inference.py:360-364),
and a toy-calibrated ``t_ppf(hypothesis, cl)`` — e.g.
:meth:`~blueice_tpu.parallel.neyman.NeymanConstruction.t_ppf` — plugs in the
same way. Limits use the one-sided (q_mu) convention: a toy whose best fit
exceeds the hypothesis does not reject it from below.
"""

import warnings
from collections import OrderedDict

import numpy as np

__all__ = ['toy_upper_limits', 'sensitivity_band']


def _critical_curve(hypotheses, cl, t_ppf):
    if t_ppf is None:
        from scipy import stats
        return np.full(len(hypotheses), float(stats.norm.ppf(cl) ** 2))
    return np.array([float(t_ppf(h, cl)) for h in hypotheses])


def _first_upcrossing(hyps, excess):
    """Per toy (column), the smallest hypothesis where ``excess`` (t - crit)
    reaches 0, linearly interpolated between grid points.

    :param hyps: (H,) ascending hypothesis grid.
    :param excess: (H, T).
    :return: (T,) crossings; NaN where the curve stays below 0 on the whole
      grid (limit beyond the grid); the grid start where it is already >= 0
      at the first point (limit at or below the grid start).
    """
    H, T = excess.shape
    nonneg = excess >= 0
    crossed = nonneg.any(axis=0)
    j = np.argmax(nonneg, axis=0)               # first nonneg index per toy
    uls = np.full(T, np.nan)
    at_start = crossed & (j == 0)
    uls[at_start] = hyps[0]
    ok = crossed & (j > 0)
    if ok.any():
        cols = np.flatnonzero(ok)
        jj = j[cols]
        e_hi = excess[jj, cols]
        e_lo = excess[jj - 1, cols]             # < 0 by first-crossing choice
        frac = -e_lo / (e_hi - e_lo)
        uls[cols] = hyps[jj - 1] + frac * (hyps[jj] - hyps[jj - 1])
    return uls


def _quantile_inf_aware(sorted_vals, q):
    """Linear-interpolation quantile that stays inf (not inf - inf = NaN)
    when the position lands among +inf order statistics."""
    pos = q * (len(sorted_vals) - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    a, b = float(sorted_vals[lo]), float(sorted_vals[hi])
    if np.isinf(b):
        return a if pos == lo else np.inf
    return a + (b - a) * (pos - lo)


def _auto_grid(study, key, target, n_toys, truth, fixed, mesh, n_points=33):
    """Hypothesis grid sized from a free-fit pass over the ensemble: cover
    the best-fit distribution plus a 4-sigma one-sided margin (the 90/95%
    limit sits ~1.3-1.7 sigma above the best fit). The free fits reuse the
    grid run's own compiled program, and the toys regenerate bit-identically
    from the key, so the extra cost is one program execution."""
    free = study.run(key, n_toys, truth=truth, fixed=fixed, mesh=mesh)
    x = np.asarray(free[target])
    q16, q50, q84 = np.percentile(x, [16, 50, 84])
    # Spread estimate robust to boundary pile-up (bg-only rate fits pile at
    # 0, which crushes the IQR — std survives a half-pile at ~0.6 sigma)
    sigma = max((q84 - q16) / 2.0, float(np.std(x)), abs(q50) / 4.0, 1e-6)
    lo = min(0.0, float(np.min(x)))
    # The limit sits ~1.3-2.3 sigma_fit above the best fit (cl 0.68-0.99),
    # and sigma here underestimates sigma_fit by up to ~2x under pile-up:
    # 6 sigma past the LARGEST best fit covers both with margin
    hi = float(np.max(x)) + 6.0 * sigma
    return np.linspace(lo, hi, n_points)


def toy_upper_limits(study, key, target, hypotheses, n_toys, truth=None,
                     fixed=None, cl=0.9, t_ppf=None, mesh=None,
                     return_grid=False):
    """Batched per-toy upper limits on ``target``.

    For each toy dataset, the limit is the smallest hypothesis h where the
    one-sided profile-LR statistic t(h) = 2(LL_free - LL(target=h)) (zeroed
    where the best fit exceeds h) reaches the critical value — the batched
    equivalent of running ``one_parameter_interval(kind='upper')`` on every
    toy, at thousands of limits per second instead of one optimizer loop each.

    :param study: a BinnedToyStudy or UnbinnedToyStudy (prepared likelihood).
    :param key: jax PRNG key for the toy ensemble.
    :param hypotheses: grid of target values to scan; the limit is
      interpolated between grid points, so spacing sets the resolution.
      The grid must cover the limits: toys whose curve never crosses within
      the grid come back NaN (widen the grid). Pass ``'auto'`` to size the
      grid from the ensemble itself: a free-fit pass (the same compiled
      program the grid run reuses; toys are regenerated bit-identically from
      the key) sets the range to cover best fits plus a 4-sigma one-sided
      margin.
    :param truth: simulation truth dict; default ``{target: 0.0}`` — the
      standard background-only expected-limit ensemble.
    :param cl: confidence level (default 0.9).
    :param t_ppf: optional toy-calibrated critical-value hook
      ``t_ppf(hypothesis, cl)`` (e.g. ``NeymanConstruction.t_ppf``); default
      Wilks, exactly as in ``one_parameter_interval``.
    :param return_grid: also return (ts, hypotheses, free ToyResults) for
      diagnostics.
    :return: (n_toys,) array of limits; with return_grid, (limits, ts,
      hypotheses, free).
    """
    if truth is None:
        truth = {target: 0.0}
    if isinstance(hypotheses, str):
        if hypotheses != 'auto':
            raise ValueError("hypotheses must be a grid of values or 'auto'")
        hypotheses = _auto_grid(study, key, target, n_toys, truth, fixed,
                                mesh)
    ts, hyps, free, _ = study.profile_ts_grid(
        key, target, hypotheses, n_toys, truth=truth, fixed=fixed, mesh=mesh)
    crit = _critical_curve(hyps, cl, t_ppf)
    if (crit <= 0).any():
        raise ValueError(
            "critical values must be positive for limit setting; got %s "
            "(is the t_ppf quantile convention right? It is called as "
            "t_ppf(hypothesis, cl))" % crit[crit <= 0][:3])
    x_hat = np.asarray(free[target])
    # One-sided q_mu: an upward best-fit fluctuation past h is not evidence
    # against h as an upper limit
    t_os = np.where(x_hat[None, :] <= hyps[:, None], ts, 0.0)
    uls = _first_upcrossing(hyps, t_os - crit[:, None])
    if return_grid:
        return uls, ts, hyps, free
    return uls


def sensitivity_band(study, key, target, hypotheses, n_toys, truth=None,
                     fixed=None, cl=0.9, t_ppf=None, mesh=None,
                     quantiles=(0.025, 0.16, 0.5, 0.84, 0.975)):
    """Expected-limit (Brazil) band: quantiles of the per-toy upper limits
    over a background-only (by default) toy ensemble — the standard
    sensitivity deliverable of a counting experiment.

    Toys whose limit lies beyond the hypothesis grid enter the quantiles as
    +inf (they ARE larger than every in-grid limit, so the order statistics
    stay unbiased); a band edge that lands among them comes back inf with a
    warning to widen the grid.

    :return: dict with 'limits' ((n_toys,), NaN->inf preserved as inf),
      'band' (OrderedDict quantile -> limit), 'n_beyond_grid'.
    """
    uls = toy_upper_limits(study, key, target, hypotheses, n_toys,
                           truth=truth, fixed=fixed, cl=cl, t_ppf=t_ppf,
                           mesh=mesh)
    beyond = ~np.isfinite(uls)
    n_beyond = int(beyond.sum())
    uls_full = np.where(beyond, np.inf, uls)
    srt = np.sort(uls_full)
    band = OrderedDict((float(q), _quantile_inf_aware(srt, float(q)))
                       for q in sorted(quantiles))
    if not np.isfinite(list(band.values())).all():
        warnings.warn(
            "%d/%d toy limits lie beyond the hypothesis grid: band edges "
            "among them are inf — widen the grid" % (n_beyond, len(uls)))
    return {'limits': uls_full, 'band': band, 'n_beyond_grid': n_beyond}
