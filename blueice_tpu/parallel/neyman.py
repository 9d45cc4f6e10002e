"""Toy-calibrated (Neyman) confidence intervals.

The reference exposes a ``t_ppf`` hook in ``one_parameter_interval`` for users
who construct their own test-statistic distributions (reference:
blueice/inference.py:341-343,365-367) — but leaves the construction itself,
the expensive part, to the user (thousands of toy fits per hypothesis).
Here the construction IS the framework: a hypothesis scan of the batched
profile-LR toy engine (one compiled XLA program, toys vmapped and mesh-sharded)
produces the critical-value surface, which then plugs straight back into
``one_parameter_interval``.
"""

import numpy as np
import jax

__all__ = ['NeymanConstruction']


class NeymanConstruction:
    """Critical values of the profile-LR statistic from toy ensembles.

    Usage::

        study = BinnedToyStudy(lf)                  # prepared likelihood
        nc = NeymanConstruction(study, 'wimp_rate_multiplier')
        nc.scan(jax.random.PRNGKey(0), hypotheses=np.linspace(0, 5, 11),
                n_toys=2000)
        lf.set_data(observed_events)
        ul = lf.one_parameter_interval('wimp_rate_multiplier', bound=10,
                                       kind='upper', confidence_level=0.9,
                                       t_ppf=nc.t_ppf)
    """

    def __init__(self, study, target, fixed=None, truth=None, mesh=None):
        self.study = study
        self.target = target
        self.fixed = dict(fixed or {})
        self.truth = dict(truth or {})
        self.mesh = mesh
        self.hypotheses = None
        self.t_sorted = None

    def scan(self, key, hypotheses, n_toys=1000):
        """Run the toy ensembles: for each hypothesis h, simulate n_toys
        datasets with target=h and collect the profile-LR distribution.
        The hypothesis grid is sorted internally (np.interp over a
        non-monotonic grid would silently return nonsense)."""
        hypotheses = np.asarray(hypotheses, dtype=float)
        order = np.argsort(hypotheses)
        self.hypotheses = hypotheses[order]
        ts = self.study.profile_ts_scan(
            key, self.target, self.hypotheses, n_toys,
            fixed=self.fixed, mesh=self.mesh, truth=self.truth,
            truth_at_hypothesis=True)
        self.t_sorted = np.sort(ts, axis=1)
        return self

    def t_ppf(self, hypothesis, quantile):
        """Critical value: the ``quantile`` of the toy t-distribution at
        ``hypothesis`` (linear interpolation across the hypothesis grid).
        Signature matches the reference's t_ppf hook."""
        if self.t_sorted is None:
            raise RuntimeError("Call scan() first")
        # brentq in one_parameter_interval passes the quantile wrapped in a
        # sequence; accept scalars or length-1 containers
        quantile = float(np.asarray(quantile).reshape(-1)[0])
        # one_parameter_interval passes quantile = 1 - CL (lower limits) or
        # the tail probability (central): for the NONNEGATIVE profile-LR
        # statistic the relevant critical value is always the upper tail —
        # mirror small quantiles like Wilks' norm.ppf(q)^2 does implicitly
        # (it is symmetric in q <-> 1-q); without this, lower limits would
        # compare against a ~0 critical value and collapse to the best fit.
        quantile = max(quantile, 1.0 - quantile)
        hypothesis = float(np.asarray(hypothesis).reshape(-1)[0])
        n = self.t_sorted.shape[1]
        # quantile within each hypothesis's sorted toy statistics
        pos = np.clip(quantile * (n - 1), 0, n - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        per_hyp = (1 - frac) * self.t_sorted[:, lo] \
            + frac * self.t_sorted[:, hi]
        # interpolate across hypotheses (constant beyond the scan range)
        h = np.clip(hypothesis, self.hypotheses[0], self.hypotheses[-1])
        return float(np.interp(h, self.hypotheses, per_hyp))

    def coverage_check(self, quantile=0.9):
        """Fraction of toys below their own hypothesis's critical value —
        should be ~quantile by construction (sanity diagnostic)."""
        crits = np.array([self.t_ppf(h, quantile) for h in self.hypotheses])
        return (self.t_sorted <= crits[:, None]).mean(axis=1)
