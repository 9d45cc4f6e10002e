"""A/B microbenchmark: gather vs dense flavor of the fused binned vgh
kernel, plus the multi-candidate value kernel, at XENON scale.

Run on the TPU:  python examples/ab_dense_kernel.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from blueice_tpu.utils import roofline
from blueice_tpu.ops.fused import binned_ll_fused_multi
from blueice_tpu.utils.roofline import (_common_setup, _amortized_elapsed,
                                        _default_n_inner)


def main():
    out = {}
    K, B = 4, 512
    for dense in (False, True):
        v = roofline.measure_binned_kernel(G=81, S=6, N=3200, K=K, B=B,
                                           dense=dense)
        key = 'vgh_dense' if dense else 'vgh_gather'
        out[key] = {k: (round(x, 6) if isinstance(x, float) else x)
                    for k, x in v.items()}
        print(key, json.dumps(out[key]))

    # multi-candidate value kernel, A=12 (the newton candidate batch size)
    interpret = jax.default_backend() != 'tpu'
    anchor, strides, idx_b, t_b, m_b, obs_b = _common_setup(81, 6, 3200, K, B)
    A = 12
    rng = np.random.default_rng(5)
    idx_c = jnp.asarray(rng.integers(0, 2, (B, A, K)), jnp.int32)
    t_c = jnp.asarray(rng.uniform(0, 1, (B, A, K)), jnp.float32)
    m_c = jnp.asarray(rng.uniform(1, 10, (B, A, 6)), jnp.float32)
    for dense in (False, True):
        fn = jax.jit(jax.vmap(lambda i, t, m, o: binned_ll_fused_multi(
            anchor, strides, i, t, m, o, interpret=interpret, dense=dense)))
        r = fn(idx_c, t_c, m_c, obs_b)
        jax.block_until_ready(r)
        n_inner = _default_n_inner()
        elapsed = _amortized_elapsed(
            lambda m: fn(idx_c, t_c, m, obs_b), m_c, n_inner)
        key = 'll_multi_dense' if dense else 'll_multi_gather'
        out[key] = {'elapsed_per_call_s': elapsed}
        print(key, json.dumps(out[key]))

    print('AB_RESULT', json.dumps(out))


if __name__ == '__main__':
    main()
