from copy import deepcopy

import numpy as np
import pytest
from scipy import stats

from blueice_tpu.test_helpers import conf_for_reparam_test, BASE_CONV_CONFIG
from blueice_tpu.likelihood import UnbinnedLogLikelihood, LogLikelihoodReParam


def _make_old_lf(config):
    lf_old = UnbinnedLogLikelihood(config)
    lf_old.add_rate_parameter("op0")
    lf_old.add_rate_parameter("op1")
    lf_old.add_rate_parameter("op2")
    lf_old.prepare()
    return lf_old


def test_likelihood_value():
    """Closed-form check of the reparameterized likelihood."""
    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    lf_old = _make_old_lf(config)
    lf_reparam = LogLikelihoodReParam(lf_old, conv_config)

    d = np.zeros(3, dtype=[('x', float), ('source', int)])
    lf_reparam.set_data(d)

    def compute_lf(np0=1, np1=1):
        op0 = np0 ** 2
        op1 = np1 ** 2
        op2 = np0 * np1
        sum_s = op0 + op1 + op2
        return -sum_s + 3 * np.log(sum_s) + 3 * stats.norm.logpdf(0)

    for np0, np1 in zip([1, 2, 3], [1, 2, 3]):
        assert np.isclose(lf_reparam(np0=np0, np1=np1),
                          compute_lf(np0=np0, np1=np1), atol=1e-08)


def test_likelihoods_before_after_reparam():
    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    lf_old = _make_old_lf(config)
    lf_reparam = LogLikelihoodReParam(lf_old, conv_config)

    d = lf_reparam.base_model.simulate()
    lf_reparam.set_data(d)
    lf_old.set_data(d)

    assert np.isclose(lf_reparam(), lf_old())
    assert np.isclose(lf_reparam(np0=2),
                      lf_old(op0_rate_multiplier=4, op2_rate_multiplier=2))
    assert np.isclose(lf_reparam(np1=2),
                      lf_old(op1_rate_multiplier=4, op2_rate_multiplier=2))
    assert np.isclose(lf_reparam(np0=2, np1=2),
                      lf_old(op0_rate_multiplier=4, op1_rate_multiplier=4,
                             op2_rate_multiplier=4))


@pytest.mark.parametrize("wrong_config,wrong_conv", [(True, False),
                                                     (False, True)])
def test_consistency_new_params(wrong_config, wrong_conv):
    """Inconsistent new parameters (in config or conv_config) are rejected."""
    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)

    if wrong_config:
        config.pop("np0")
        config.pop("np1")
    if wrong_conv:
        conv_config["np2"] = (np.linspace(1e-12, 10, 2), None, None)

    lf_old = _make_old_lf(config)
    with pytest.raises(AssertionError):
        LogLikelihoodReParam(lf_old, conv_config)


def test_reparam_compiled():
    """The reparameterized likelihood compiles: the parameter transform traces
    in front of the wrapped XLA program, and gradients flow through it."""
    import jax
    import jax.numpy as jnp
    from blueice_tpu.compile import build_logl

    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    lf_old = _make_old_lf(config)
    lf_reparam = LogLikelihoodReParam(lf_old, conv_config)

    d = np.zeros(3, dtype=[('x', float), ('source', int)])
    lf_reparam.set_data(d)

    c = build_logl(lf_reparam)
    assert set(c.param_names) == {'np0', 'np1'}
    for kwargs in [dict(), dict(np0=2.0), dict(np0=2.0, np1=3.0)]:
        assert np.isclose(float(c(**kwargs)), lf_reparam(**kwargs),
                          atol=1e-8)

    # Gradient through the transform: d/dnp0 of -(np0^2+np1^2+np0*np1)
    # + 3 log(...) at np0=np1=1 is -(2+1) + 3*(2+1)/3 = 0
    g = jax.grad(lambda p: c.logl(p))({'np0': jnp.float64(1.0),
                                       'np1': jnp.float64(1.0)})
    assert np.isclose(float(g['np0']), 0.0, atol=1e-8)

    # And the gradient fitter works directly on the reparam object
    fit, ll = lf_reparam.bestfit_jax(return_errors=False)
    assert set(fit) == {'np0', 'np1'}
    res_scipy, ll_scipy = lf_reparam.bestfit_scipy()
    assert np.isclose(ll, ll_scipy, atol=1e-4)


def test_reparam_compiled_rejects_unknown_target():
    """A typo'd transform target must fail at compile time, not silently make
    the new parameters no-ops (the host path raises at call time when the
    transform's output reaches the parameter registry)."""
    from blueice_tpu.compile import build_logl
    from blueice_tpu.exceptions import InvalidParameter

    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    conv_config['op3_rate_multiplier'] = dict(params=["np0"],
                                              func=lambda np0: np0)
    lf_old = _make_old_lf(config)
    lf_reparam = LogLikelihoodReParam(lf_old, conv_config)
    lf_reparam.set_data(np.zeros(3, dtype=[('x', float), ('source', int)]))
    with pytest.raises(InvalidParameter, match="op3_rate_multiplier"):
        build_logl(lf_reparam)


def test_reparam_parameters_and_bounds():
    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    lf_old = _make_old_lf(config)
    lf_reparam = LogLikelihoodReParam(lf_old, conv_config)

    # Converted rate parameters disappear; new shape parameters appear
    assert set(lf_reparam.rate_parameters.keys()) == set()
    assert {'np0', 'np1'} <= set(lf_reparam.shape_parameters.keys())
    lo, hi = lf_reparam.get_bounds('np0')
    assert lo == pytest.approx(1e-12)
    assert hi == pytest.approx(10)

    # Simulation through the reparameterized model works
    d = lf_reparam.base_model.simulate(kwargs=dict(np0=2))
    assert len(d) > 0


def test_reparam_bestfit_jax_refreshes_on_set_data():
    """bestfit_jax through the ReParam wrapper must recompile after the
    wrapped likelihood's data changes (stale-program regression)."""
    lf = UnbinnedLogLikelihood(conf_for_reparam_test())
    for sn in ('op0', 'op1', 'op2'):
        lf.add_rate_parameter(sn)
    lfr = LogLikelihoodReParam(lf, BASE_CONV_CONFIG)

    rng = np.random.default_rng(0)
    lf.set_data(lf.base_model.simulate(rng=rng))
    fit1, ll1 = lfr.bestfit_jax(return_errors=False)

    d2 = lf.base_model.simulate(rate_multipliers={'op0': 3.0}, rng=rng)
    lf.set_data(d2)
    fit2, ll2 = lfr.bestfit_jax(return_errors=False)
    fit2_ref, ll2_ref = lfr.bestfit_scipy()
    assert abs(ll2 - ll2_ref) < 1e-3, (ll2, ll2_ref, ll1)


def test_transform_base_zero_rejected():
    """A conversion function that evaluates to 0 at the base point would make
    every call divide by zero; construction must reject it."""
    from blueice_tpu.exceptions import InvalidParameterSpecification

    config = conf_for_reparam_test(events_per_day=1)
    conv_config = deepcopy(BASE_CONV_CONFIG)
    conv_config['op0_rate_multiplier'] = dict(params=["np0"],
                                              func=lambda np0: np0 - 1.0)
    lf_old = _make_old_lf(config)   # base np0 == 1 -> func(base) == 0
    with pytest.raises(InvalidParameterSpecification, match="base"):
        LogLikelihoodReParam(lf_old, conv_config)
