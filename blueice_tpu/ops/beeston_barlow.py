"""Beeston-Barlow finite-MC-statistics correction (single finite source).

When a source's PMF template comes from a finite Monte-Carlo / calibration sample,
the per-bin expected counts A_j of that source are nuisance parameters constrained
by Poisson terms around the observed MC counts a_j. For a single finite-statistics
source plus infinite-statistics others, the profile over each A_j has a closed-form
per-bin quadratic solution (Beeston & Barlow 1993).

Role parity with the reference's analytic implementation
(reference: blueice/likelihood.py:618-660 and the root formulas at 693-712),
vectorized in jnp over all bins at once so the whole adjustment fuses into the
binned-likelihood reduction on device.
"""

import jax.numpy as jnp

__all__ = ['beeston_barlow_root1', 'beeston_barlow_root2', 'beeston_barlow_roots',
           'bb_single_adjust']


def _bb_quadratic_parts(a, p, U, d):
    """(A2, b, s) of the per-bin quadratic A2*x^2 + b*x + c with c = -U*a;
    s = sqrt(discriminant) >= |b| since c <= 0. The discriminant is
    b^2 - 4*A2*c = b^2 + 4*A2*U*a — every term nonnegative, so this form is
    cancellation-free and needs no clamp (the reference's 10-term expanded
    polynomial, blueice/likelihood.py:704-706, is the same quantity but
    mixed-sign, losing all significant digits near zero). Floor at tiny
    anyway: sqrt'(0) = inf would poison gradients of the compiled path."""
    A2 = p * (p + 1.0)
    b = U * (p + 1.0) - p * (a + d)
    disc = b * b + 4.0 * A2 * (U * a)
    s = jnp.sqrt(jnp.maximum(disc, jnp.finfo(jnp.result_type(disc)).tiny))
    return A2, b, s


def beeston_barlow_root1(a, p, U, d):
    """The unphysical (non-positive) root of the per-bin Beeston-Barlow quadratic.
    Kept, like the reference, only for regression checking — do not use."""
    a, p, U, d = (jnp.asarray(x, dtype=jnp.result_type(float)) for x in (a, p, U, d))
    A2, b, s = _bb_quadratic_parts(a, p, U, d)
    tiny = jnp.finfo(b.dtype).tiny
    sel = b >= 0
    den_hi = jnp.maximum(jnp.where(sel, 2.0 * A2, 1.0), tiny)
    den_lo = jnp.maximum(jnp.where(sel, 1.0, s - b), tiny)
    return jnp.where(sel, -(b + s) / den_hi, -2.0 * U * a / den_lo)


def beeston_barlow_root2(a, p, U, d):
    """The physical root of the per-bin Beeston-Barlow quadratic, evaluated in
    the cancellation-free form per sign of the linear coefficient (Citardauq
    for b >= 0) — the naive (-b + sqrt(disc))/(2*A2) loses all precision as
    p -> 0 with U > 0. Both stable branches are nonnegative in floating point.

    :param a: observed MC/calibration counts per bin of the finite source.
    :param p: data/MC livetime (rate) ratio per bin (or scalar).
    :param U: total expected counts per bin from all *other* (infinite-stat) sources.
    :param d: observed data counts per bin.
    """
    a, p, U, d = (jnp.asarray(x, dtype=jnp.result_type(float)) for x in (a, p, U, d))
    A2, b, s = _bb_quadratic_parts(a, p, U, d)
    tiny = jnp.finfo(b.dtype).tiny
    # Double-where denominator guards: keep the unselected branch's partials
    # finite so reverse-mode AD (cotangent 0) never meets 0 * inf
    sel = b >= 0
    den_hi = jnp.maximum(jnp.where(sel, b + s, 1.0), tiny)
    den_lo = jnp.maximum(jnp.where(sel, 1.0, 2.0 * A2), tiny)
    return jnp.where(sel, 2.0 * U * a / den_hi, (s - b) / den_lo)


def beeston_barlow_roots(a, p, U, d):
    return beeston_barlow_root1(a, p, U, d), beeston_barlow_root2(a, p, U, d)


def bb_single_adjust(mus, pmfs, n_model_events, observed, source_i):
    """Adjust (mus, pmfs) for the finite MC statistics of source ``source_i``.

    All inputs follow the binned-likelihood layout:

    :param mus: (n_sources,) expected counts per source (already rate-multiplied).
    :param pmfs: (n_sources, *bins) per-source PMFs.
    :param n_model_events: (n_sources, *bins) MC counts behind each PMF.
    :param observed: (*bins,) observed data counts.
    :param source_i: static int index of the finite-statistics source.
    :return: (mus, pmfs) with the finite source's pmf and mu replaced by the
      profiled Beeston-Barlow solution (the U==0 bins use the separate closed form,
      since the general root is singular there).
    """
    mus = jnp.asarray(mus, dtype=jnp.result_type(float))
    pmfs = jnp.asarray(pmfs, dtype=jnp.result_type(float))
    n_model_events = jnp.asarray(n_model_events, dtype=jnp.result_type(float))
    observed = jnp.asarray(observed, dtype=jnp.result_type(float))

    n_sources = mus.shape[0]
    # Expected counts per bin from all sources except source_i
    other_mask = jnp.arange(n_sources) != source_i
    u_bins = jnp.tensordot(jnp.where(other_mask, mus, 0.0), pmfs, axes=(0, 0))

    a_bins = n_model_events[source_i]
    n_mc_total = jnp.sum(n_model_events[source_i])
    p_calibration = mus[source_i] / n_mc_total
    # Per-bin weights: pmf relative to raw MC counts, scaled to total MC size
    safe_a = jnp.where(a_bins > 0, a_bins, 1.0)
    w_calibration = jnp.where(a_bins > 0,
                              pmfs[source_i] / safe_a * n_mc_total,
                              0.0)

    # Empty-MC bins (a == 0 -> w == 0) make the general root 0/0: evaluate
    # it at a SAFE p there and zero the result afterwards (double-where —
    # a jnp.where over a NaN branch still back-propagates NaN)
    p_eff = jnp.where(w_calibration > 0,
                      w_calibration * p_calibration, 1.0)
    A_general = beeston_barlow_root2(a_bins, p_eff, u_bins, observed)
    # U == 0 bins: the general root is singular, use the dedicated closed
    # form. Uses the bare p_calibration — matching the reference's special
    # case exactly (reference: blueice/likelihood.py:651-653), which assumes
    # pmf == a/n_mc_total (w == 1) in such bins.
    A_special = (observed + a_bins) / (1.0 + p_calibration)
    A_bins = jnp.where(u_bins == 0, A_special, A_general)
    A_bins = jnp.where(w_calibration > 0, A_bins, 0.0)

    new_raw = A_bins * w_calibration
    new_pmf = new_raw / jnp.sum(new_raw)
    new_mu = jnp.sum(new_raw) * p_calibration

    mus = mus.at[source_i].set(new_mu)
    pmfs = pmfs.at[source_i].set(new_pmf)
    return mus, pmfs
