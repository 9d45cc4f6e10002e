"""Roofline accounting: cost models, verdict logic, and (tiny, interpret-mode)
kernel microbenchmarks."""

import numpy as np

from blueice_tpu.utils.roofline import (
    PEAKS, binned_vgh_cost, bb_vgh_cost, bblite_vgh_cost, unbinned_vgh_cost,
    xla_cost, roofline_verdict, measure_binned_kernel,
    measure_bblite_kernel, format_report)


def test_cost_models_scale_sanely():
    c1 = binned_vgh_cost(81, 6, 3200, 3)
    c2 = binned_vgh_cost(81, 6, 6400, 3)
    # FLOPs scale linearly in bins; HBM per toy stays far below the anchor
    # tensor size (the VMEM-resident design's whole point)
    assert abs(c2['flops'] / c1['flops'] - 2.0) < 0.05
    assert c1['hbm_bytes'] < 81 * 6 * 3200 * 4 / 100

    # BB adds the count-row combine + per-bin closed forms: strictly more.
    # The lite variant sits between plain and full BB (two-input chain
    # instead of five)
    assert bb_vgh_cost(81, 6, 3200, 3)['flops'] > c1['flops']
    assert c1['flops'] < bblite_vgh_cost(81, 6, 3200, 3)['flops'] \
        < bb_vgh_cost(81, 6, 3200, 3)['flops']

    # The unbinned kernel streams its per-toy density tensor from HBM
    cu = unbinned_vgh_cost(3, 2, 2304, 1)
    assert cu['hbm_bytes'] > 3 * 2 * 2304 * 4


def test_roofline_verdict_binding_logic():
    # High intensity -> compute-bound; low intensity -> HBM-bound
    hi = roofline_verdict(dict(flops=1e9, hbm_bytes=1e3), 1.0, 1)
    lo = roofline_verdict(dict(flops=1e3, hbm_bytes=1e9), 1.0, 1)
    assert hi['binding'] == 'compute'
    assert lo['binding'] == 'hbm'
    # Achieved fraction of the binding roof is in (0, 1] for a real
    # measurement slower than the roof
    assert 0 < hi['frac_of_binding_roof'] <= 1.0


def test_xla_cost_reports_flops():
    import jax.numpy as jnp
    r = xla_cost(lambda x: jnp.sum(x @ x), jnp.ones((64, 64)))
    if r is not None:                      # backend-dependent availability
        assert r['flops'] >= 2 * 64 ** 3 * 0.9


def test_measure_binned_kernel_interpret():
    """Tiny-shape end-to-end microbench through the interpret-mode kernel."""
    v = measure_binned_kernel(G=4, S=2, N=128, K=2, B=8, chip='cpu-1core')
    assert v['gflops_achieved'] > 0
    assert v['binding'] in ('compute', 'hbm')
    assert 'binned_vgh_fused' in v['kernel']
    # Dispatch-amortized timing: the single-dispatch measurement rides along
    assert v['dispatch_s'] > 0 and v['n_inner'] >= 2
    assert format_report([v]).count('\n') == 1


def test_measure_bblite_kernel_interpret():
    v = measure_bblite_kernel(G=4, S=2, N=128, K=2, B=8, chip='cpu-1core')
    assert v['gflops_achieved'] > 0
    assert 'binned_bblite_vgh_fused' in v['kernel']
