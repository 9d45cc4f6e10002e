"""Contract tests for optional-dependency code paths (iminuit, emcee,
ipyparallel).

These packages are not installed in the CI image, so the branches that use them
would otherwise never execute. Each test injects a *fake* module into
sys.modules that asserts the exact API surface our code relies on
(iminuit 2.x: Minuit(f, x0, name=...), errordef, limits[name], migrad,
values/errors/fval; emcee 3.x: EnsembleSampler/run_mcmc/get_chain layout;
emcee 2.x: .chain layout; ipyparallel: client[:].use_dill +
load_balanced_view().map). If we ever drift from the real APIs, these fakes
must be updated against the real packages — they encode the contract.
"""

import sys

import numpy as np
import pytest
from scipy.optimize import minimize

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.inference import (bestfit_scipy, bestfit_minuit,
                                   bestfit_emcee, BESTFIT_ROUTINES)
from blueice_tpu.likelihood import UnbinnedLogLikelihood as LogLikelihood
from blueice_tpu.parallel.tasks import create_models_ipyparallel


def _rate_lf(seed=0):
    lf = LogLikelihood(conf_for_test())
    lf.add_rate_parameter('s0')
    rng = np.random.default_rng(seed)
    lf.set_data(lf.base_model.simulate(rng=rng))
    return lf


# ---------------------------------------------------------------- iminuit 2.x

class _FakeValuesView(dict):
    """iminuit's values/errors support [name] lookup — a dict suffices."""


class _FakeLimits:
    """iminuit 2.x exposes m.limits[name] = (lo, hi) assignment."""

    def __init__(self, names):
        self._names = set(names)
        self.set = {}

    def __setitem__(self, name, bounds):
        assert name in self._names, "limit set for unknown parameter %r" % name
        lo, hi = bounds   # must be a 2-sequence
        self.set[name] = (lo, hi)


class _FakeMinuit:
    """Emulates the iminuit 2.x surface bestfit_minuit uses, with a real
    scipy minimization behind migrad() so results are checkable."""

    instances = []

    def __init__(self, fcn, x0, name=None):
        assert name is not None and len(name) == len(np.atleast_1d(x0)), \
            "iminuit 2.x array-mode requires name= with one entry per param"
        self._fcn = fcn
        self._x0 = np.atleast_1d(np.asarray(x0, dtype=float))
        self._names = list(name)
        self.errordef = None
        self.limits = _FakeLimits(self._names)
        self.values = _FakeValuesView()
        self.errors = _FakeValuesView()
        self.fval = None
        self._migrad_called = False
        _FakeMinuit.instances.append(self)

    def migrad(self):
        assert self.errordef == 0.5, \
            "log-likelihoods need errordef=0.5 for correct 1-sigma errors"
        bounds = [self.limits.set.get(n, (None, None)) for n in self._names]
        res = minimize(self._fcn, self._x0, bounds=bounds, method='L-BFGS-B')
        for i, n in enumerate(self._names):
            self.values[n] = float(np.atleast_1d(res.x)[i])
            # parabolic error from the BFGS inverse-Hessian diagonal,
            # scaled by errordef (as real Migrad does)
            hinv = res.hess_inv.todense() if hasattr(res.hess_inv, 'todense') \
                else np.atleast_2d(res.hess_inv)
            self.errors[n] = float(np.sqrt(2 * self.errordef * hinv[i, i]))
        self.fval = float(res.fun)
        self._migrad_called = True
        return self


def test_bestfit_minuit_contract(monkeypatch):
    fake_mod = type(sys)('iminuit')
    fake_mod.Minuit = _FakeMinuit
    monkeypatch.setitem(sys.modules, 'iminuit', fake_mod)
    _FakeMinuit.instances.clear()

    lf = _rate_lf()
    fit_m, ll_m = bestfit_minuit(lf)
    fit_s, ll_s = bestfit_scipy(lf)

    assert len(_FakeMinuit.instances) == 1
    m = _FakeMinuit.instances[0]
    assert m._migrad_called
    # rate multipliers get their (0, None) bound passed through limits[]
    assert m.limits.set['s0_rate_multiplier'][0] == 0
    # same optimum as the scipy route, errors attached under param_error keys
    assert abs(fit_m['s0_rate_multiplier'] - fit_s['s0_rate_multiplier']) < 1e-3
    assert abs(ll_m - ll_s) < 1e-3
    assert fit_m['s0_rate_multiplier_error'] > 0
    # registry route resolves to the same function
    assert BESTFIT_ROUTINES['minuit'] is bestfit_minuit


def test_bestfit_minuit_kwargs_and_fixed(monkeypatch):
    fake_mod = type(sys)('iminuit')
    fake_mod.Minuit = _FakeMinuit
    monkeypatch.setitem(sys.modules, 'iminuit', fake_mod)
    _FakeMinuit.instances.clear()

    lf = _rate_lf()
    # minimize_kwargs entries become attribute assignments on the Minuit object
    fit, ll = bestfit_minuit(lf, minimize_kwargs={'print_level': 0})
    assert _FakeMinuit.instances[-1].print_level == 0

    # everything fixed -> no Minuit instantiated, plain evaluation returned
    n_before = len(_FakeMinuit.instances)
    res, ll = bestfit_minuit(lf, s0_rate_multiplier=1)
    assert res == {}
    assert ll == lf(s0_rate_multiplier=1)
    assert len(_FakeMinuit.instances) == n_before


def test_bestfit_minuit_without_package_raises():
    if 'iminuit' in sys.modules:        # genuine install: nothing to test
        pytest.skip("real iminuit present")
    lf = _rate_lf()
    with pytest.raises(ImportError, match='bestfit_jax'):
        bestfit_minuit(lf)


# ------------------------------------------------------------------ emcee 3.x

class _FakeSampler3x:
    """emcee 3.x contract: get_chain() returns (n_steps, n_walkers, n_dim).

    The synthetic chain value is the *step index*, so the post-burn-in median
    proves the caller transposed to (walkers, steps, dim) before slicing off
    the burn-in: mishandling the layout would slice walkers instead and shift
    the median by ~n_burn_in/2.
    """

    def __init__(self, n_walkers, n_dim, log_prob_fn):
        assert callable(log_prob_fn)
        self.n_walkers, self.n_dim = n_walkers, n_dim
        self._chain = None

    def run_mcmc(self, p0, n_steps):
        assert p0.shape == (self.n_walkers, self.n_dim)
        steps = np.arange(n_steps, dtype=float)
        self._chain = np.broadcast_to(
            steps[:, None, None],
            (n_steps, self.n_walkers, self.n_dim)).copy()

    def get_chain(self):
        return self._chain


class _FakeSampler2x:
    """emcee 2.x contract: .chain attribute is (n_walkers, n_steps, n_dim),
    and there is no get_chain method."""

    def __init__(self, n_walkers, n_dim, log_prob_fn):
        self.n_walkers, self.n_dim = n_walkers, n_dim
        self.chain = None

    def run_mcmc(self, p0, n_steps):
        steps = np.arange(n_steps, dtype=float)
        self.chain = np.broadcast_to(
            steps[None, :, None],
            (self.n_walkers, n_steps, self.n_dim)).copy()


@pytest.mark.parametrize('sampler_cls', [_FakeSampler3x, _FakeSampler2x],
                         ids=['emcee3', 'emcee2'])
def test_bestfit_emcee_chain_layout(monkeypatch, sampler_cls):
    fake_mod = type(sys)('emcee')
    fake_mod.EnsembleSampler = sampler_cls
    monkeypatch.setitem(sys.modules, 'emcee', fake_mod)

    lf = _rate_lf()
    n_steps, n_burn = 40, 20
    fit, ll = bestfit_emcee(lf, n_walkers=8, n_steps=n_steps, n_burn_in=n_burn,
                            seed=1)
    # median over the post-burn-in steps {20..39} -> 29.5 for BOTH emcee
    # versions iff the version-specific layout handling is right
    assert fit['s0_rate_multiplier'] == pytest.approx((n_burn + n_steps - 1) / 2)


def test_bestfit_emcee_builtin_matches_scipy():
    """Without the package, the built-in stretch-move sampler still finds the
    optimum region (statistical agreement, generous tolerance)."""
    if 'emcee' in sys.modules:
        pytest.skip("real emcee present")
    lf = _rate_lf()
    fit_e, _ = bestfit_emcee(lf, n_walkers=20, n_steps=150, n_burn_in=75,
                             seed=3)
    fit_s, _ = bestfit_scipy(lf)
    assert fit_e['s0_rate_multiplier'] == pytest.approx(
        fit_s['s0_rate_multiplier'], rel=0.15)


# ---------------------------------------------------------------- ipyparallel

class _FakeDirectView:
    def __init__(self):
        self.dill_enabled = False

    def use_dill(self):
        self.dill_enabled = True


class _FakeLoadBalancedView:
    def __init__(self):
        self.calls = []

    def map(self, fn, sequence, ordered=False, block=False):
        self.calls.append(dict(ordered=ordered, block=block))
        # AsyncMapResult is iterable whether or not block=True
        return [fn(item) for item in sequence]


class _FakeIppClient:
    """ipyparallel.Client contract: client[:] -> DirectView (use_dill),
    client.load_balanced_view() -> view whose .map returns an iterable."""

    def __init__(self):
        self._dv = _FakeDirectView()
        self._lb = _FakeLoadBalancedView()

    def __getitem__(self, key):
        assert key == slice(None), "expected the client[:] direct view"
        return self._dv

    def load_balanced_view(self):
        return self._lb


def test_create_models_ipyparallel_contract():
    client = _FakeIppClient()
    configs = [conf_for_test(), conf_for_test(some_multiplier=2)]
    models = client_models = create_models_ipyparallel(configs, client,
                                                       block=True)
    assert client._dv.dill_enabled, "engines must be switched to dill first"
    assert client._lb.calls == [dict(ordered=True, block=True)]
    assert len(client_models) == 2
    r0 = models[0].expected_events()
    r1 = models[1].expected_events()
    assert r1 == pytest.approx(2 * r0)


def test_create_models_ipyparallel_serial_fallback():
    models = create_models_ipyparallel([conf_for_test()], ipp_client=None)
    assert len(models) == 1
    assert models[0].expected_events() > 0


def test_bestfit_minuit_log_space_decode(monkeypatch):
    """rates_in_log_space=True: Migrad optimizes log10(rate), but the result
    dict must report the DECODED linear-space value (and a Jacobian-scaled
    error), matching bestfit_scipy (regression: raw log10 values leaked)."""
    fake_mod = type(sys)('iminuit')
    fake_mod.Minuit = _FakeMinuit
    monkeypatch.setitem(sys.modules, 'iminuit', fake_mod)
    _FakeMinuit.instances.clear()

    lf = _rate_lf()
    fit_m, ll_m = bestfit_minuit(lf, rates_in_log_space=True)
    fit_lin, ll_lin = bestfit_scipy(lf)

    assert abs(fit_m['s0_rate_multiplier']
               - fit_lin['s0_rate_multiplier']) < 1e-2
    assert abs(ll_m - ll_lin) < 1e-3
    assert fit_m['s0_rate_multiplier_error'] > 0
