"""Multi-host (process-spanning) toy ensembles.

The reference scales past one machine by shipping dill-pickled model configs
to an ipyparallel cluster over a shared filesystem
(blueice/parallel.py:76-103). The TPU-native successor keeps the same
embarrassingly-parallel structure but expresses it as SPMD over a global
device mesh: every host runs the same program, ``jax.distributed`` wires the
processes together, the toy axis is sharded over ALL chips of the slice (ICI
within a host's chips, DCN between hosts), and XLA partitions the vmapped fit
with zero cross-toy communication — the only collective is the final result
gather.

Flow (every process runs this identically):

    init_distributed(coordinator, num_processes, process_id)   # once
    mesh = global_mesh()                                       # all chips
    t, free, cond = profile_ts_distributed(study, key, n, target, h,
                                           mesh=mesh)          # replicated

Toy assignment is layout-invariant: the ensemble is simulated from one PRNG
key with global shapes, so toy i's dataset — and therefore every statistic —
is bit-identical whether the mesh spans 1 process or 16 (pinned by the
two-process CPU test in tests/test_distributed.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['init_distributed', 'global_mesh', 'to_global_toys',
           'gather_to_hosts', 'profile_ts_distributed', 'run_distributed']


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, **kwargs):
    """Opt-in ``jax.distributed.initialize`` wrapper (idempotent).

    On Cloud TPU pods the arguments are auto-detected from the environment and
    may all be None; for manual process groups (including the CPU contract
    test) pass coordinator/num_processes/process_id explicitly. Must be called
    before any other JAX API touches the backend.

    :return: (process_index, process_count) after initialization.
    """
    # Idempotence check WITHOUT querying the backend: jax.process_count()
    # would itself initialize XLA, after which initialize() refuses to run
    try:
        from jax._src.distributed import global_state
        already = global_state.client is not None
    except Exception:           # pragma: no cover - jax internals moved
        already = False
    if not already and (num_processes is None or int(num_processes) > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    return jax.process_index(), jax.process_count()


def global_mesh(axis_name='toys', devices=None):
    """A 1-d mesh over every device of every process, ordered so the toy axis
    maps to each process's devices as one contiguous block (process-local
    simulation then feeds its rows without a shuffle)."""
    devices = list(jax.devices() if devices is None else devices)
    devices.sort(key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devices), (axis_name,))


def to_global_toys(mesh, tree, axis_name='toys'):
    """Assemble global device arrays from host values whose leading axis is
    the FULL toy axis (every process passes the same full-ensemble array; each
    contributes the rows its devices own).

    This is the multi-process generalisation of :func:`toys.shard_toys` — on a
    single process it reduces to exactly that placement.
    """
    n_local = len(mesh.local_devices)
    n_total = int(mesh.devices.size)
    # This process's block of the (device-blocked) toy axis. The slice below
    # is only correct when the process's devices are one CONTIGUOUS run of
    # the mesh order — global_mesh() guarantees that by sorting on
    # (process_index, id); verify rather than silently mis-assign rows on a
    # user-built interleaved mesh.
    flat = [d for d in mesh.devices.flat]
    pos = sorted(flat.index(d) for d in mesh.local_devices)
    first = pos[0]
    if pos != list(range(first, first + n_local)):
        raise ValueError(
            "to_global_toys needs this process's devices to form one "
            "contiguous block of the mesh device order (positions %s of %d) "
            "— build the mesh with global_mesh(), which sorts devices by "
            "(process_index, id)" % (pos, n_total))

    def put(x):
        x = np.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        rows_per_dev = x.shape[0] // n_total
        lo = first * rows_per_dev
        hi = lo + n_local * rows_per_dev
        return jax.make_array_from_process_local_data(
            sharding, x[lo:hi], x.shape)
    return jax.tree_util.tree_map(put, tree)


def gather_to_hosts(tree):
    """Fully-replicated numpy values of (possibly non-addressable) global
    arrays on every process — the cross-host result gather.

    Addressable leaves come back in ONE batched ``jax.device_get`` (each
    separate per-leaf transfer is a full round-trip on a remote device
    link); only non-addressable leaves need the per-leaf allgather
    collective."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    remote = [isinstance(x, jax.Array) and not x.is_fully_addressable
              for x in leaves]
    local_fetched = iter(jax.device_get(
        [x for x, r in zip(leaves, remote) if not r]))
    out = [np.asarray(multihost_utils.process_allgather(x, tiled=True))
           if r else np.asarray(next(local_fetched))
           for x, r in zip(leaves, remote)]
    return jax.tree_util.tree_unflatten(treedef, out)


def _prepare_ensemble(study, key, n_toys, truth, mesh, axis_name='toys'):
    """Layout-invariant toy inputs, already placed on the global mesh: the
    same key yields the same toys at any process count.

    Binned ensembles are Poisson-drawn *sharded over the mesh inside one
    jitted program* (``BinnedToyStudy.simulate(mesh=...)``): no device ever
    materializes the full ensemble and no host round-trip happens — threefry
    is counter-based, so each device's rows are bit-identical to the
    unsharded draw. Unbinned ensembles ship only the per-toy raw uint32 PRNG
    keys (simulation runs inside the fit program).

    :return: (n_toys, toys, toys_host_fn, extra): ``toys`` is the
      mesh-sharded input tree of the fit program; ``toys_host_fn()`` yields
      the full ensemble as replicated host numpy on demand (the straggler
      refinement needs host-indexable rows — only called when stragglers
      exist); ``extra`` is the replicated per-ensemble payload appended to
      every fit/refine call (() for binned, (weights,) for unbinned).
    """
    from .toys import BinnedToyStudy, UnbinnedToyStudy, _round_up_toys
    n_toys = _round_up_toys(n_toys, mesh)
    if isinstance(study, BinnedToyStudy):
        toys = study.simulate(key, n_toys, truth, mesh=mesh)
        return (n_toys, toys,
                lambda: jax.tree_util.tree_map(np.asarray,
                                               gather_to_hosts(toys)), ())
    if isinstance(study, UnbinnedToyStudy):
        weights = study.expected_weights(**(truth or {}))
        keys = jax.random.split(key, n_toys)
        if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
            # Typed key arrays cannot round-trip numpy for the host-side
            # sharding/refinement; the raw uint32 data drives jax.random
            # identically (same threefry counters)
            keys = jax.random.key_data(keys)
        keys_host = np.asarray(jax.device_get(keys))
        toys = to_global_toys(mesh, keys_host, axis_name)
        return n_toys, toys, (lambda: keys_host), (weights,)
    raise TypeError("distributed toy ensembles need a BinnedToyStudy or "
                    "UnbinnedToyStudy; got %s" % type(study).__name__)


def profile_ts_distributed(study, key, n_toys, target, hypothesis,
                           truth=None, fixed=None, mesh=None,
                           axis_name='toys'):
    """Multi-host twin of ``study.profile_ts``: the free+conditional double
    fit runs as ONE SPMD program over the global mesh; results come back
    fully replicated on every process.

    Straggler refinement (the two-stage pass) runs on replicated host arrays
    after the gather — every process refits the (few) stragglers identically,
    which keeps the programs single-host and the results deterministic.

    :return: (t (n_toys,), free ToyResults, cond ToyResults) — identical on
      every process, and identical to the single-process mesh result for the
      same key.
    """
    from .toys import ToyResults, _refine_stragglers
    from .fitter import check_fixed_in_bounds

    check_fixed_in_bounds(study.compiled, {target: hypothesis})
    mesh = global_mesh(axis_name) if mesh is None else mesh
    n_toys, toys, toys_host_fn, extra = _prepare_ensemble(
        study, key, n_toys, truth, mesh, axis_name)

    entry = study._profile_fn(target, fixed)
    run_fn, free_long, cond_long, names_free, names_cond = entry
    h = jnp.asarray(float(hypothesis))
    t, free, cond = run_fn(toys, *extra, h)

    t, free, cond = gather_to_hosts((t, free, cond))
    cap = study.max_iter
    if free_long is not None and (
            (np.asarray(free[2]) >= cap).any()
            or (np.asarray(cond[2]) >= cap).any()):
        # Stragglers exist: refinement indexes individual toys on host, so
        # gather the ensemble (replicated) once — the no-straggler fast path
        # never pays this transfer
        toys_np = toys_host_fn()
        xf, llf, itf = _refine_stragglers(
            free_long, toys_np, *free, cap=cap, extra_args=extra)[:3]
        xc, llc, itc = _refine_stragglers(
            cond_long, toys_np, *cond, cap=cap,
            extra_args=extra + (h,))[:3]
        free, cond = (xf, llf, itf), (xc, llc, itc)
        t = np.maximum(2.0 * (llf - llc), 0.0)
    return (np.asarray(t), ToyResults(names_free, *free),
            ToyResults(names_cond, *cond))


def run_distributed(study, key, n_toys, truth=None, fixed=None, mesh=None,
                    axis_name='toys'):
    """Multi-host twin of ``study.run`` (simulate + free fit only)."""
    from .toys import ToyResults, _refine_stragglers

    mesh = global_mesh(axis_name) if mesh is None else mesh
    n_toys, toys, toys_host_fn, extra = _prepare_ensemble(
        study, key, n_toys, truth, mesh, axis_name)

    fit, long_j, names = study._fit_entry(fixed)
    x, ll, it = gather_to_hosts(fit(toys, *extra))
    if long_j is not None and (np.asarray(it) >= study.max_iter).any():
        x, ll, it, _ = _refine_stragglers(long_j, toys_host_fn(), x, ll, it,
                                          study.max_iter, extra_args=extra)
    return ToyResults(names, x, ll, it)
