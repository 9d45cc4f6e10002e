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
        """Critical value: the toy-calibrated analog of Wilks'
        ``norm.ppf(quantile)**2`` at ``hypothesis`` (linear interpolation
        across the hypothesis grid). Signature matches the reference's t_ppf
        hook.

        The toy statistic t = max(2(LL_free - LL_cond), 0) is TWO-sided
        (up- and down-fluctuations both produce t > 0), while
        one_parameter_interval's quantile is the one-sided level (CL for
        upper limits, 1 - CL for lower, the tail probabilities for central).
        Wilks' default norm.ppf(q)^2 equals chi2(1).ppf(|2q - 1|), so the
        consistent toy quantile is |2q - 1| — e.g. a 90% upper limit uses the
        0.8-quantile of t (~1.64 in the Wilks regime), NOT the 0.9-quantile
        (~2.71), which would overcover (~95%). Exact when up/down
        fluctuations split evenly (the Wilks regime); a rejected-direction
        asymmetry shifts one-sided coverage accordingly."""
        if self.t_sorted is None:
            raise RuntimeError("Call scan() first")
        # brentq in one_parameter_interval passes the quantile wrapped in a
        # sequence; accept scalars or length-1 containers
        quantile = float(np.asarray(quantile).reshape(-1)[0])
        quantile = abs(2.0 * quantile - 1.0)
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
        should be ~|2*quantile - 1| by construction (t_ppf returns the
        one-sided-consistent quantile of the two-sided statistic; see
        :meth:`t_ppf`). Sanity diagnostic."""
        crits = np.array([self.t_ppf(h, quantile) for h in self.hypotheses])
        return (self.t_sorted <= crits[:, None]).mean(axis=1)
