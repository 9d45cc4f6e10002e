"""Roofline / MFU accounting for the fit-engine kernels.

"Fast vs a 1-core host" says nothing about whether a kernel is fast *for the
chip*. This module answers that: per-fit-engine FLOP and byte counts (analytic
for the Pallas kernels — XLA's ``cost_analysis`` cannot see inside a custom
call — and compiler-reported for XLA programs), hardware peaks, and a
microbenchmark that times one kernel invocation at ensemble batch size and
reports achieved throughput as a fraction of the *binding* roofline.

Peak numbers (PEAKS) and derivations:

* ``hbm_gbps``: TPU v5e HBM bandwidth, 819 GB/s (public spec).
* ``mxu_bf16``: 197 TFLOP/s (public spec); ``mxu_f32`` ~= 1/4 of bf16.
* ``vpu_f32``: the VPU executes elementwise ops on (8, 128) vregs across 4
  ALUs at ~940 MHz: 8*128*4*0.94e9 ~= 3.85 TFLOP/s. The fused likelihood
  kernels are elementwise-dominated (per-bin residual math; the only MXU work
  is the tiny (S+K)^2 curvature contraction), so THIS is their compute
  roofline, not the MXU number.

The kernels keep the anchor tensors VMEM-resident (ops/fused*.py), so per-toy
HBM traffic is only the toy's own inputs/outputs — by design the binned
engines sit far up the arithmetic-intensity axis, pinned against the VPU
compute roof, and the roofline verdict states exactly that with numbers.
"""

import time

import numpy as np

__all__ = ['PEAKS', 'binned_vgh_cost', 'bb_vgh_cost', 'bblite_vgh_cost',
           'unbinned_vgh_cost', 'xla_cost', 'measure_binned_kernel',
           'measure_bb_kernel', 'measure_bblite_kernel',
           'measure_unbinned_kernel', 'roofline_verdict', 'format_report']

PEAKS = {
    'tpu-v5e': dict(hbm_gbps=819e9, mxu_bf16=197e12, mxu_f32=49e12,
                    vpu_f32=3.85e12),
    # 1-core host CPU (the bench baseline machine): ~3 GHz * 8-wide FMA
    'cpu-1core': dict(hbm_gbps=2e10, mxu_bf16=5e10, mxu_f32=5e10,
                      vpu_f32=5e10),
}


def _pairs(K):
    return K * (K - 1) // 2


def binned_vgh_cost(G, S, N, K, dtype_bytes=4):
    """Per-toy FLOPs / bytes of one fused binned (ll, g, H) kernel call
    (ops/fused.py:_vgh_kernel). Dominant terms only (elementwise transcendental
    ops counted as 1 flop, like the compiler does).

    :return: dict(flops, hbm_bytes, vmem_bytes) per toy per invocation.
    """
    C = 2 ** K
    NP = _pairs(K)
    acc = 1 + K + NP                 # accumulated corner-combine targets
    P = S + K
    flops = N * (
        2 * C * acc * S              # corner gather+lerp (FMA = 2 flops)
        + 2 * S + 12                 # lam + residual elementwise chain
        + 2 * S                      # g_m
        + 2 * K * S + 2 * K          # Dbar + g_t
        + 2 * S * S + S              # H_mm (+ Pq scale)
        + 4 * S * K + 2 * K * S      # H_mt (dot + D*r reduction)
        + 2 * K * K + K              # H_tt
        + NP * (2 * S + 2))          # cross-pair reductions
    # Per-toy HBM: inputs (ids, weights, m, obs) + outputs (ll, g, H); the
    # anchor tensor is amortized over the whole batch (one DMA per launch)
    hbm = dtype_bytes * (N + C * (2 + K + NP) + S + 1 + P + P * P)
    # VMEM reads: C corner rows for each accumulation target + the working
    # arrays ((1 + K + NP) ~(S, N) accumulators re-read by each reduction)
    vmem = dtype_bytes * N * S * (C * acc + 4 * acc + 2 * S + 2 * K)
    return dict(flops=flops, hbm_bytes=hbm, vmem_bytes=vmem)


def bb_vgh_cost(G, S, N, K, dtype_bytes=4):
    """Per-toy FLOPs / bytes of one fused Beeston-Barlow (ll, g, H) call
    (ops/fused_bb.py). Adds to the plain binned cost: the count-row corner
    combine (one extra pseudo-source), ~200 flops/bin of closed-form per-bin
    root derivatives (ops/bb_vgh.py:bb_lam_parts), the 5-input chain-rule
    assembly, and ~19 (v, w) Hessian outer-product contractions."""
    C = 2 ** K
    NP = _pairs(K)
    acc = 1 + K + NP
    P = S + K
    flops = N * (
        2 * C * acc * (S + 1)        # pmf + bb-count corner combine
        + 2 * S + 2                  # U, T reductions
        + 200                        # bb_lam_parts closed forms per bin
        + 2 * 5 * P                  # dlam = sum_v gam_v * Gv
        + 2 * P * P                  # -q dlam dlam^T
        + 19 * (P + 2 * P * P) / 4   # om (v,w) contractions (sparse Gv rows:
                                     # ~1/4 of entries are nonzero)
        + 2 * K * S + NP * 8)        # T2 extras
    hbm = dtype_bytes * (N + C * (2 + K + NP) + S + 1 + P + P * P)
    vmem = dtype_bytes * N * (S + 1) * (C * acc + 6 * acc + 3 * S)
    return dict(flops=flops, hbm_bytes=hbm, vmem_bytes=vmem)


def bblite_vgh_cost(G, S, N, K, dtype_bytes=4):
    """Per-toy FLOPs / bytes of one fused Barlow-Beeston-lite (ll, g, H)
    call (ops/fused_bb_lite.py). Adds to the plain binned cost: the
    total-count-row corner combine (one extra pseudo-source), ~40 flops/bin
    of per-bin lite closed forms (ops/bb_lite.py:_per_bin_parts), and the
    (lam, M) two-input Hessian outer products."""
    C = 2 ** K
    NP = _pairs(K)
    acc = 1 + K + NP
    P = S + K
    flops = N * (
        2 * C * acc * (S + 1)        # pmf + total-count corner combine
        + 2 * S                      # lam reduction
        + 40                         # per-bin lite closed forms
        + 2 * K * S                  # Dbar
        + 2 * P + 2 * K              # g assembly
        + 2 * P * P + 4 * P * K + 2 * K * K + 3 * P  # H outer products
        + 2 * K * S + NP * (2 * S + 4))              # second-order extras
    hbm = dtype_bytes * (N + C * (2 + K + NP) + S + 1 + P + P * P)
    vmem = dtype_bytes * N * (S + 1) * (C * acc + 4 * acc + 2 * S + 2 * K)
    return dict(flops=flops, hbm_bytes=hbm, vmem_bytes=vmem)


def unbinned_vgh_cost(G, S, E, K, dtype_bytes=4):
    """Per-toy FLOPs / bytes of one fused unbinned (ll, g, H) call
    (ops/fused_unbinned.py). Structurally the binned kernel over the event
    axis, except the per-toy anchor tensor (G, S, E) itself streams from HBM
    every call — the density tensor is per-toy data, not a shared constant."""
    c = binned_vgh_cost(G, S, E, K, dtype_bytes)
    c['hbm_bytes'] += dtype_bytes * (G * S * E + 2 * E)  # ps_toy + mask/invref
    return c


def xla_cost(fn, *args, backend=None):
    """Compiler-reported (flops, bytes accessed) of a jitted XLA program —
    for the non-Pallas engines. Returns dict(flops, hbm_bytes) or None when
    the backend offers no cost analysis."""
    import jax
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return dict(flops=float(ca.get('flops', 0.0)),
                    hbm_bytes=float(ca.get('bytes accessed', 0.0)))
    except Exception:
        return None


def _time_op(run, warmup=2, repeats=5):
    for _ in range(warmup):
        run()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times)


def _default_n_inner():
    """Chain length for dispatch-amortized timing: long on real TPU (where a
    single dispatch through the remote tunnel costs ~tens of ms — more than
    these kernels' on-chip time), short in interpret mode (tests)."""
    import jax
    return 32 if jax.default_backend() == 'tpu' else 2


def _amortized_elapsed(call_with_m, m_b, n_inner):
    """Per-call seconds with dispatch overhead amortized away: apply the
    kernel ``n_inner`` times inside ONE jitted ``lax.scan``, each iteration's
    rate input nudged by ``1e-30 * ll`` of the previous output — numerically
    a no-op (rounds to the identical float32 value), structurally a data
    dependency the compiler cannot elide or reorder — then divide the blocked
    wall time of the chain by ``n_inner``. A bare single-dispatch timing of
    these microsecond-scale kernels otherwise measures the host->device
    round trip (through the remote-TPU tunnel: ~20-30 ms), not the kernel."""
    import jax
    from jax import lax

    def step(m, _):
        ll = call_with_m(m)[0]
        return m + (1e-30 * ll)[:, None].astype(m.dtype), None

    chained = jax.jit(lambda m0: lax.scan(step, m0, None, length=n_inner)[0])

    def run():
        jax.block_until_ready(chained(m_b))
    return _time_op(run, warmup=1, repeats=3) / n_inner


def roofline_verdict(per_call, elapsed, batch, chip='tpu-v5e',
                     compute_peak='vpu_f32'):
    """Turn (per-toy cost, measured seconds, batch size) into the roofline
    verdict: achieved rates, the time each roof alone would take, which bound
    binds, and the fraction of that binding roof achieved."""
    peaks = PEAKS[chip]
    flops = per_call['flops'] * batch
    hbm = per_call['hbm_bytes'] * batch
    t_comp = flops / peaks[compute_peak]
    t_hbm = hbm / peaks['hbm_gbps']
    binding = 'compute' if t_comp >= t_hbm else 'hbm'
    t_bound = max(t_comp, t_hbm)
    out = dict(
        batch=batch, elapsed_s=elapsed,
        gflops_achieved=flops / elapsed / 1e9,
        gbps_hbm_achieved=hbm / elapsed / 1e9,
        intensity_flops_per_hbm_byte=flops / max(hbm, 1.0),
        compute_roof=compute_peak,
        t_compute_s=t_comp, t_hbm_s=t_hbm, binding=binding,
        frac_of_binding_roof=t_bound / elapsed,
        frac_of_compute_roof=(flops / elapsed) / peaks[compute_peak],
        frac_of_hbm_roof=(hbm / elapsed) / peaks['hbm_gbps'])
    return out


def _common_setup(G, S, N, K, B, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    anchor = jnp.asarray(rng.uniform(0.01, 1.0, (G, S, N)), jnp.float32)
    grid_per_axis = max(2, int(round(G ** (1 / K)))) if K else 1
    strides = tuple(int(grid_per_axis ** (K - 1 - d)) for d in range(K))
    max_idx = max(grid_per_axis - 2, 0)
    idx_b = jnp.asarray(rng.integers(0, max_idx + 1, (B, K)), jnp.int32)
    t_b = jnp.asarray(rng.uniform(0, 1, (B, K)), jnp.float32)
    m_b = jnp.asarray(rng.uniform(1, 10, (B, S)), jnp.float32)
    obs_b = jnp.asarray(rng.poisson(3.0, (B, N)).astype(np.float32))
    return anchor, strides, idx_b, t_b, m_b, obs_b


def measure_op_mix(kind, chip='tpu-v5e', reps=None, grid=8,
                   block=(64, 512)):
    """Achievable VPU rate for a pure elementwise op mix, measured with a
    VMEM-RESIDENT Pallas loop — the mix-specific compute bound the fused
    kernels should be judged against (VERDICT r4 #4: 'what binds the BB
    kernels?').

    The nominal ``vpu_f32`` peak counts every ALU slot as one flop per
    cycle; real op mixes fall short of it for reasons that have nothing to
    do with kernel quality — transcendentals (div, sqrt, log) occupy the
    VPU for many slots, and ``jnp.where`` select chains add ops the cost
    models don't count as flops. The probe loads one block into VMEM and
    applies the mix ``reps`` times in a serially-dependent fori_loop (an
    XLA-jit flat-array version of this measures HBM streaming, not the
    VPU — each scan step re-reads the arrays from HBM). A kernel near its
    mix bound is done: the gap to the nominal roof is the price of its
    math, not of its schedule.

    Kinds: 'fma' (the corner-combine mix, counted 2 flops/elem like the
    cost models), 'bb' (ops/bb_vgh.bb_lam_parts, the per-bin Beeston-
    Barlow closed forms, 200 flops/bin in the cost model), 'bblite'
    (ops/bb_lite._per_bin_parts, 40 flops/bin), 'poisson' (the plain
    binned per-bin residual chain, ~16 flops/bin).

    :return: dict(kind, gflops_achieved, frac_of_nominal_vpu, ...)
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    rng = np.random.default_rng(9)
    dt = jnp.float32
    interpret = jax.default_backend() != 'tpu'
    if interpret:
        reps, grid = 2, 1
    n_elems_ = block[0] * block[1]
    # The mix is applied `unroll` times per fori_loop iteration: enough
    # total work to dwarf the tunnel dispatch (~30 GFLOP/call) while the
    # trip count stays in the thousands (a ~100k-trip Mosaic loop
    # compiled pathologically slowly in round 5)
    unroll = {'fma': 16, 'bb': 1, 'bblite': 4, 'poisson': 4}[kind]
    if reps is None:
        charge = {'fma': 2, 'bb': 200, 'bblite': 40, 'poisson': 16}[kind]
        reps = max(64, int(30e9 / (charge * unroll * n_elems_ * grid)))

    if kind == 'fma':
        flops_per_elem = 2

        def step_fn(x, aux):
            return 1.0001 * x + 0.0001
    elif kind == 'bb':
        from ..ops.bb_vgh import bb_lam_parts
        flops_per_elem = 200        # bb_vgh_cost's per-bin charge

        def step_fn(P, aux):
            N_, U, M, T, d = aux
            lam, dlam, om = bb_lam_parts(P, N_, U, M, T, d)
            # Touch every output so nothing is dead-code-eliminated
            acc = lam + sum(dlam) + sum(om.values())
            return P + 1e-30 * acc
    elif kind == 'bblite':
        from ..ops.bb_lite import _per_bin_parts
        flops_per_elem = 40         # bblite_vgh_cost's per-bin charge

        def step_fn(lam0, aux):
            Ntot, d = aux[0], aux[-1]
            parts = _per_bin_parts(lam0, Ntot, d, dt)
            return lam0 + 1e-30 * (parts[0] + sum(parts[1:]))
    elif kind == 'poisson':
        flops_per_elem = 16         # lam chain + log residual, as modeled

        def step_fn(lam, aux):
            d = aux[-1]
            pos = lam > 0
            lam_safe = jnp.where(pos, lam, 1.0)
            r = jnp.where(pos, d * jnp.log(lam_safe) - lam, 0.0)
            inv = jnp.where(pos, d / lam_safe, 0.0)
            q = inv / lam_safe
            return lam + 1e-30 * (r + inv + q)
    else:
        raise ValueError(kind)

    # Only the aux arrays each mix actually reads are kernel inputs (an
    # unused VMEM ref still costs allocation under Mosaic)
    n_aux = {'fma': 0, 'bb': 5, 'bblite': 2, 'poisson': 1}[kind]

    # Only the aux arrays each mix actually reads are kernel inputs (an
    # unused VMEM ref still costs allocation under Mosaic)
    n_aux = {'fma': 0, 'bb': 5, 'bblite': 2, 'poisson': 1}[kind]

    def make_call(r):
        def kern(*refs):
            x_ref, aux_refs, o_ref = refs[0], refs[1:-1], refs[-1]
            aux_vals = [ref[...] for ref in aux_refs]
            if kind == 'bblite':
                aux = (aux_vals[0], None, None, None, aux_vals[1])
            elif kind == 'poisson':
                aux = (None, None, None, None, aux_vals[0])
            else:
                aux = tuple(aux_vals) if aux_vals else ()
            def body(i, x):
                for _ in range(unroll):
                    x = step_fn(x, aux)
                return x
            o_ref[...] = lax.fori_loop(0, r, body, x_ref[...])

        spec = pl.BlockSpec((1,) + block, lambda i: (i, 0, 0))
        call = pl.pallas_call(
            lambda *refs: kern(*[ref.at[0] for ref in refs]),
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((grid,) + block, dt),
            in_specs=[spec] * (1 + n_aux), out_specs=spec,
            interpret=interpret)
        return jax.jit(lambda *a: call(*a))

    n_elems = n_elems_
    pools = dict(
        bb=[rng.uniform(1, 40, block), rng.uniform(0.0, 5.0, block),
            rng.uniform(10, 100, block), rng.uniform(100, 1000, block),
            rng.poisson(3.0, block).astype(np.float32)],
        bblite=[rng.uniform(10, 240, block),
                rng.poisson(3.0, block).astype(np.float32)],
        poisson=[rng.poisson(3.0, block).astype(np.float32)],
        fma=[])
    raw = [rng.uniform(0.5, 2.0, block)] + pools[kind]
    args = [jnp.asarray(np.tile(v, (grid, 1, 1)), dt) for v in raw]

    # Two loop lengths, each timed on PER-CALL-UNIQUE inputs (the remote-
    # TPU tunnel memoizes identical executions, which round 5 caught
    # returning physically impossible PFLOP/s rates); the difference
    # cancels dispatch and any constant per-call overhead.
    def timed(fn, salt):
        best = np.inf
        for i in range(3):
            a0 = args[0] * np.float32(1.0 + 1e-6 * (salt + i))
            _ = np.asarray(a0[0, 0, 0])
            t0 = time.perf_counter()
            # Synchronize by FETCHING a result element: on the remote-TPU
            # tunnel block_until_ready returns immediately (round 5
            # measured t=0.0000 for a 50-GFLOP kernel), so a host read is
            # the only reliable completion barrier
            _ = np.asarray(fn(a0, *args[1:])[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    fn1, fn2 = make_call(reps), make_call(2 * reps)
    timed(fn1, 0), timed(fn2, 0)            # warm both compiles
    t1 = timed(fn1, 10)
    t2 = timed(fn2, 20)
    elapsed = max(t2 - t1, 1e-9)            # pure compute of `reps` loops
    flops = flops_per_elem * unroll * n_elems * reps * grid
    gflops = flops / elapsed / 1e9
    peak = PEAKS[chip]['vpu_f32']
    return dict(kind=kind, gflops_achieved=round(gflops, 1),
                frac_of_nominal_vpu=round(gflops * 1e9 / peak, 4),
                reps=reps, grid=grid, block=list(block),
                t_single_s=round(t1, 4), t_double_s=round(t2, 4),
                flops_per_elem=flops_per_elem)


def measure_binned_kernel(G=81, S=6, N=3200, K=3, B=1024, chip='tpu-v5e',
                          n_inner=None, dense=None):
    """Microbenchmark the fused binned vgh kernel at ensemble batch size and
    return its roofline verdict (dispatch-amortized; see
    :func:`_amortized_elapsed`). ``dense`` selects the kernel flavor
    (None = the module default; see ops.fused.DENSE_DEFAULT)."""
    import jax
    from ..ops.fused import binned_vgh_fused
    interpret = jax.default_backend() != 'tpu'
    anchor, strides, idx_b, t_b, m_b, obs_b = _common_setup(G, S, N, K, B)

    fn = jax.jit(jax.vmap(lambda i, t, m, o: binned_vgh_fused(
        anchor, strides, [i[d] for d in range(K)], t, m, o,
        interpret=interpret, dense=dense)))

    def run():
        out = fn(idx_b, t_b, m_b, obs_b)
        jax.block_until_ready(out)
    dispatch_s = _time_op(run)
    n_inner = n_inner or _default_n_inner()
    elapsed = _amortized_elapsed(
        lambda m: fn(idx_b, t_b, m, obs_b), m_b, n_inner)
    v = roofline_verdict(binned_vgh_cost(G, S, N, K), elapsed, B, chip)
    v.update(dispatch_s=dispatch_s, n_inner=n_inner)
    from ..ops.fused import resolve_dense
    if resolve_dense(dense):
        # The cost model counts the gather flavor's USEFUL (2^K-corner)
        # census; the dense flavor computes the same quantities through a
        # G-row MXU matmul, so its useful-flop rate can exceed the VPU f32
        # roof — the roof the fraction is quoted against no longer binds it.
        v['note'] = ('dense flavor: combine rides the MXU; gflops/fracs '
                     'are gather-census-equivalent useful work, so '
                     'frac_of_compute_roof may exceed 1')
        v['kernel'] = 'binned_vgh_fused(G=%d,S=%d,N=%d,K=%d,dense)' % (
            G, S, N, K)
    else:
        v['kernel'] = 'binned_vgh_fused(G=%d,S=%d,N=%d,K=%d)' % (G, S, N, K)
    return v


def measure_bb_kernel(G=81, S=6, N=3200, K=3, B=256, bb_i=0, chip='tpu-v5e',
                      n_inner=None):
    import jax
    import jax.numpy as jnp
    from ..ops.fused_bb import binned_bb_vgh_fused
    interpret = jax.default_backend() != 'tpu'
    anchor, strides, idx_b, t_b, m_b, obs_b = _common_setup(G, S, N, K, B)
    rng = np.random.default_rng(1)
    nme = jnp.asarray(rng.uniform(1, 40, (G, N)), jnp.float32)

    fn = jax.jit(jax.vmap(lambda i, t, m, o: binned_bb_vgh_fused(
        anchor, nme, strides, [i[d] for d in range(K)], t, m, o, bb_i,
        interpret=interpret)))

    def run():
        out = fn(idx_b, t_b, m_b, obs_b)
        jax.block_until_ready(out)
    dispatch_s = _time_op(run)
    n_inner = n_inner or _default_n_inner()
    elapsed = _amortized_elapsed(
        lambda m: fn(idx_b, t_b, m, obs_b), m_b, n_inner)
    v = roofline_verdict(bb_vgh_cost(G, S, N, K), elapsed, B, chip)
    v.update(dispatch_s=dispatch_s, n_inner=n_inner)
    from ..ops.fused import resolve_dense
    dense = resolve_dense(None)
    if dense:
        v['note'] = ('dense flavor: combine rides the MXU; gflops/fracs '
                     'are gather-census-equivalent useful work')
    v['kernel'] = 'binned_bb_vgh_fused(G=%d,S=%d,N=%d,K=%d%s)' % (
        G, S, N, K, ',dense' if dense else '')
    return v


def measure_bblite_kernel(G=81, S=6, N=3200, K=3, B=256, chip='tpu-v5e',
                          n_inner=None):
    import jax
    import jax.numpy as jnp
    from ..ops.fused_bb_lite import binned_bblite_vgh_fused
    interpret = jax.default_backend() != 'tpu'
    anchor, strides, idx_b, t_b, m_b, obs_b = _common_setup(G, S, N, K, B)
    rng = np.random.default_rng(1)
    nme_tot = jnp.asarray(rng.uniform(1, 240, (G, N)), jnp.float32)

    fn = jax.jit(jax.vmap(lambda i, t, m, o: binned_bblite_vgh_fused(
        anchor, nme_tot, strides, [i[d] for d in range(K)], t, m, o,
        interpret=interpret)))

    def run():
        out = fn(idx_b, t_b, m_b, obs_b)
        jax.block_until_ready(out)
    dispatch_s = _time_op(run)
    n_inner = n_inner or _default_n_inner()
    elapsed = _amortized_elapsed(
        lambda m: fn(idx_b, t_b, m, obs_b), m_b, n_inner)
    v = roofline_verdict(bblite_vgh_cost(G, S, N, K), elapsed, B, chip)
    v.update(dispatch_s=dispatch_s, n_inner=n_inner)
    from ..ops.fused import resolve_dense
    dense = resolve_dense(None)
    if dense:
        v['note'] = ('dense flavor: combine rides the MXU; gflops/fracs '
                     'are gather-census-equivalent useful work')
    v['kernel'] = 'binned_bblite_vgh_fused(G=%d,S=%d,N=%d,K=%d%s)' % (
        G, S, N, K, ',dense' if dense else '')
    return v


def measure_unbinned_kernel(G=3, S=2, E=2304, K=1, B=256, chip='tpu-v5e',
                            n_inner=None):
    import jax
    import jax.numpy as jnp
    from ..ops.fused_unbinned import unbinned_vgh_fused
    interpret = jax.default_backend() != 'tpu'
    rng = np.random.default_rng(2)
    ps_b = jnp.asarray(rng.uniform(0.001, 0.4, (B, G, S, E)), jnp.float32)
    idx_b = jnp.zeros((B, K), jnp.int32)
    t_b = jnp.asarray(rng.uniform(0, 1, (B, K)), jnp.float32)
    m_b = jnp.asarray(rng.uniform(100, 2000, (B, S)), jnp.float32)
    mask_b = jnp.ones((B, E), bool)
    strides = tuple(1 for _ in range(K))

    fn = jax.jit(jax.vmap(lambda ps, i, t, m, mk: unbinned_vgh_fused(
        ps, strides, [i[d] for d in range(K)], t, m, mk,
        interpret=interpret)))

    def run():
        out = fn(ps_b, idx_b, t_b, m_b, mask_b)
        jax.block_until_ready(out)
    dispatch_s = _time_op(run)
    n_inner = n_inner or _default_n_inner()
    elapsed = _amortized_elapsed(
        lambda m: fn(ps_b, idx_b, t_b, m, mask_b), m_b, n_inner)
    v = roofline_verdict(unbinned_vgh_cost(G, S, E, K), elapsed, B, chip)
    v.update(dispatch_s=dispatch_s, n_inner=n_inner)
    v['kernel'] = 'unbinned_vgh_fused(G=%d,S=%d,E=%d,K=%d)' % (G, S, E, K)
    return v


def measure_unbinned_jnp(G=81, S=6, E=2048, K=4, B=64, chip='tpu-v5e',
                         n_inner=None):
    """The XLA (jnp) closed-form unbinned engine at XENON scale — the engine
    the unbinned_xenon bench scenario runs when the per-toy density block
    exceeds the Pallas kernel's VMEM budget (ops/fused_unbinned.py
    fused_unbinned_supported makes make_toy_fitter fall back to the dense
    engine). Runs the ACTUAL shipped op, ops/unbinned_dense.py's
    unbinned_vgh_dense: one stacked (J, G) x (G, S*E) morph matmul
    streaming the whole per-toy tensor from HBM once, then the closed
    forms — so the grid has its true per-axis strides and the HBM
    accounting is unbinned_vgh_cost's full-tensor stream. The morph
    matmul's MXU flops (AI ~ 2J/4 flops per streamed byte, far below the
    MXU ridge) ride in the bandwidth shadow of that stream, so they are
    deliberately not added to the (VPU) flop count."""
    import jax
    import jax.numpy as jnp
    from ..ops.unbinned_dense import unbinned_vgh_dense
    rng = np.random.default_rng(3)
    g = max(2, int(round(G ** (1 / K)))) if K else 1
    if K and g ** K != G:
        raise ValueError("G=%d is not a K=%d-dim grid" % (G, K))
    grid_shape = (g,) * K
    strides = tuple(int(np.prod(grid_shape[d + 1:], dtype=int))
                    for d in range(K))
    ps_b = jnp.asarray(rng.uniform(0.001, 0.4, (B, G, S, E)), jnp.float32)
    idx_b = jnp.asarray(rng.integers(0, max(g - 1, 1), (B, K)), jnp.int32)
    t_b = jnp.asarray(rng.uniform(0, 1, (B, K)), jnp.float32)
    m_b = jnp.asarray(rng.uniform(100, 2000, (B, S)), jnp.float32)
    mask_b = jnp.ones((B, E), bool)

    def one(ps, idx, t, m, mask):
        return unbinned_vgh_dense(ps, strides, [idx[d] for d in range(K)],
                                  t, m, mask)

    fn = jax.jit(jax.vmap(one))

    def run():
        jax.block_until_ready(fn(ps_b, idx_b, t_b, m_b, mask_b))
    dispatch_s = _time_op(run)
    n_inner = n_inner or _default_n_inner()
    elapsed = _amortized_elapsed(
        lambda m: fn(ps_b, idx_b, t_b, m, mask_b), m_b, n_inner)
    cost = unbinned_vgh_cost(G, S, E, K)
    v = roofline_verdict(cost, elapsed, B, chip)
    v.update(dispatch_s=dispatch_s, n_inner=n_inner)
    v['kernel'] = 'unbinned_vgh_jnp(G=%d,S=%d,E=%d,K=%d)' % (G, S, E, K)
    return v


def format_report(verdicts):
    """Human-readable roofline table. 'disp ms' is the single-dispatch wall
    time — on the remote-TPU tunnel it is dominated by the host->device round
    trip, which the amortized %roof column excludes."""
    lines = ["%-44s %9s %9s %8s %8s %8s %s" % (
        'kernel', 'GFLOP/s', 'HBM GB/s', 'AI', '%roof', 'disp ms', 'binding')]
    for v in verdicts:
        lines.append("%-44s %9.1f %9.2f %8.1f %7.1f%% %8.1f %s" % (
            v['kernel'], v['gflops_achieved'], v['gbps_hbm_achieved'],
            v['intensity_flops_per_hbm_byte'],
            100 * v['frac_of_binding_roof'],
            1e3 * v.get('dispatch_s', float('nan')), v['binding']))
    return "\n".join(lines)
