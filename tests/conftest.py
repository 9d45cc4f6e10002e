"""Test session setup: CPU backend with 8 virtual devices (so multi-chip sharding
is exercised host-count-independently — a capability the reference's test suite
lacked, see SURVEY.md §4), float64 enabled for closed-form parity assertions.

Note: this environment pre-imports jax and registers a TPU plugin at interpreter
startup, so JAX_PLATFORMS env vars are too late — we must override through
jax.config before the first backend query.
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

assert jax.devices()[0].platform == 'cpu'
assert len(jax.devices()) == 8

# Persistent XLA compile cache for the test session (VERDICT r4 #7: the
# full suite was 44 minutes, dominated by re-compiling near-identical
# toy-study programs per test file and per run). Identical HLO compiled by
# ANY earlier test — or any earlier run — becomes a cache load. Repo-local
# (survives between runs on the same box), LRU-bounded, and entries
# written before the bound existed get their -atime marker backfilled
# (without it every subsequent cache WRITE fails with FileNotFoundError —
# same pitfall bench.py documents for the TPU cache).
_TEST_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_tests')
try:
    os.makedirs(_TEST_CACHE, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _TEST_CACHE)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    for _name in os.listdir(_TEST_CACHE):
        if _name.endswith('-cache'):
            _marker = os.path.join(_TEST_CACHE,
                                   _name[:-len('-cache')] + '-atime')
            if not os.path.exists(_marker):
                open(_marker, 'a').close()
    jax.config.update('jax_compilation_cache_max_size', 4 * 2 ** 30)
except Exception as _e:   # cache is an optimization, never a failure
    print("test compile cache unavailable:", _e)

# MC template builds draw from the global numpy state (reference-parity
# behavior); seed it so templates — and everything downstream — are
# deterministic regardless of test selection/order
np.random.seed(1234567)

import pytest  # noqa: E402

# Test tiers. `pytest -m "not slow"` is the FAST GATE: < 5 minutes on the
# 1-core box, still covering every reference-parity oracle
# (test_likelihood, test_binned_likelihood, test_BeestonBarlow,
# test_morphers, test_inference, test_likelihood_reparam, ...) and every
# derivative-level engine-equivalence test (test_compile*, the
# vgh-matches-autodiff halves of test_analytic_engine / test_fused* /
# test_bb_lite / test_log_morphing). The files below are multi-minute
# compile-heavy toy ENSEMBLES and statistics-toolkit runs — valuable, but
# not gate material; they run in the full (default) suite.
SLOW_FILES = {
    'test_toys.py', 'test_toys_fixes.py', 'test_examples.py',
    'test_profile_map.py', 'test_limits.py', 'test_cls.py',
    'test_xenon_example.py', 'test_device_templates.py', 'test_mcmc.py',
    'test_neyman.py', 'test_coverage.py', 'test_discovery.py',
    'test_gof.py', 'test_ranking.py', 'test_stats_fixes.py',
    'test_fuzz_bb.py', 'test_fuzz_engines.py', 'test_fuzz_new_features.py',
    'test_unbinned_centering.py',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
