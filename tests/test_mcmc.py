"""Device-side stretch-move MCMC: algorithmic agreement with the host
sampler and posterior sanity on the Gaussian oracle scenario."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blueice_tpu.parallel.mcmc import (sample_stretch, make_device_log_prob,
                                       bestfit_emcee_device)


def test_sample_stretch_gaussian_posterior():
    """On a known 2D Gaussian target the sampled moments must match."""
    mean = jnp.asarray([1.5, -0.5])
    prec = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])

    def log_prob(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    key = jax.random.PRNGKey(0)
    p0 = mean[None, :] + 0.1 * jax.random.normal(key, (64, 2))
    chain, logps = sample_stretch(log_prob, key, p0, 1500)
    assert chain.shape == (64, 1500, 2)
    samples = np.asarray(chain[:, 500:, :]).reshape(-1, 2)
    cov = np.linalg.inv(np.asarray(prec))
    np.testing.assert_allclose(samples.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.12)


def test_sample_stretch_odd_walkers_rejected():
    with pytest.raises(ValueError, match="even"):
        sample_stretch(lambda x: -jnp.sum(x ** 2), jax.random.PRNGKey(0),
                       jnp.zeros((7, 2)), 10)


def _gauss_lf():
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.test_helpers import conf_for_test
    conf = conf_for_test(n_sources=2)
    conf['sources'][1]['mu'] = 3.0
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    d = lf.base_model.simulate(rng=np.random.default_rng(5))
    lf.set_data(d)
    return lf


def test_device_emcee_matches_host_sampler():
    """bestfit_emcee_device recovers the same posterior medians as the host
    built-in sampler (same model, same data) within Monte-Carlo error, and
    tracks the scipy optimum."""
    lf = _gauss_lf()

    res_dev, ll_dev = bestfit_emcee_device(lf, n_walkers=40, n_steps=300,
                                           n_burn_in=150, seed=3)
    res_host, ll_host = lf.bestfit_emcee(n_walkers=40, n_steps=300,
                                         n_burn_in=150, seed=3)
    res_opt, ll_opt = lf.bestfit_scipy()

    assert set(res_dev) == set(res_host)
    for k in res_dev:
        assert abs(res_dev[k] - res_host[k]) < 0.15, (k, res_dev, res_host)
        assert abs(res_dev[k] - res_opt[k]) < 0.15, (k, res_dev, res_opt)
    # Medians sit near the optimum: LL within a few units of the maximum
    assert ll_opt - ll_dev < 3.0

    # -inf handling: walkers proposing out-of-bounds mu must never poison the
    # chain (the compiled likelihood returns -inf there, like the host)
    res2, ll2, samples = bestfit_emcee_device(
        lf, n_walkers=40, n_steps=200, n_burn_in=100, seed=7,
        return_samples=True)
    assert np.isfinite(ll2)
    assert np.isfinite(samples).all()
    assert (samples[:, 1] >= -1.0).all() and (samples[:, 1] <= 1.0).all()


def test_device_emcee_fixed_and_errors():
    lf = _gauss_lf()
    res, ll, errs = bestfit_emcee_device(lf, n_walkers=32, n_steps=200,
                                         n_burn_in=100, seed=1,
                                         return_errors=True, mu=0.0)
    assert list(res) == ['s0_rate_multiplier']
    assert errs['s0_rate_multiplier'] > 0


def test_zero_default_parameter_is_actually_sampled():
    """Regression: affine-invariant proposals are linear combinations of
    walker positions, so a coordinate where every walker starts at exactly 0
    (multiplicative spread x a 0 default — mu here) could never move; its
    'posterior' came back as a zero-variance spike at 0. Both samplers now
    jitter degenerate coordinates additively at init."""
    lf = _gauss_lf()
    _, _, samples = bestfit_emcee_device(
        lf, n_walkers=32, n_steps=200, n_burn_in=100, seed=11,
        return_samples=True)
    assert samples[:, 1].std() > 1e-3        # mu explores

    _, _, host_samples = lf.bestfit_emcee(
        n_walkers=32, n_steps=200, n_burn_in=100, seed=11,
        return_samples=True)
    assert host_samples[:, 1].std() > 1e-3


def test_device_emcee_rejects_unknown_parameters():
    """Typo'd conditional kwargs must raise like the host path, not silently
    sample the intended-fixed parameter unconstrained."""
    from blueice_tpu.exceptions import InvalidParameter
    lf = _gauss_lf()
    with pytest.raises(InvalidParameter, match="mu_typo"):
        bestfit_emcee_device(lf, n_walkers=8, n_steps=4, n_burn_in=0,
                             mu_typo=0.5)
