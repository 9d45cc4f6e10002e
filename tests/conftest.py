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

# MC template builds draw from the global numpy state (reference-parity
# behavior); seed it so templates — and everything downstream — are
# deterministic regardless of test selection/order
np.random.seed(1234567)
