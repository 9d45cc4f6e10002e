"""Worker for the 2-process distributed contract test (run as a subprocess
pair by tests/test_distributed.py; each process executes this identical
program — the SPMD contract).

argv: process_id num_processes port cache_dir out_prefix
"""

import json
import sys

import numpy as np

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
port, cache_dir, out_prefix = sys.argv[3], sys.argv[4], sys.argv[5]

import jax  # noqa: E402

from blueice_tpu.parallel.distributed import (  # noqa: E402
    init_distributed, global_mesh, profile_ts_distributed)

init_distributed('localhost:' + port, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
jax.config.update('jax_enable_x64', True)

# Deterministic MC templates: same global-numpy seed in every process (and in
# the single-process oracle) -> identical anchor tensors everywhere
np.random.seed(1234567)

from blueice_tpu.likelihood import (  # noqa: E402
    BinnedLogLikelihood, UnbinnedLogLikelihood)
from blueice_tpu.test_helpers import conf_for_test  # noqa: E402
from blueice_tpu.parallel.toys import (  # noqa: E402
    BinnedToyStudy, UnbinnedToyStudy)

conf = conf_for_test(n_sources=2, mc=True,
                     analysis_space=[['x', np.linspace(-10, 10, 41)]],
                     n_events_for_pdf=int(5e3),
                     cache_dir=cache_dir + '/p%d' % pid,
                     task_dir=cache_dir + '/p%d' % pid)
conf['sources'][1]['mu'] = 3.0
lf = BinnedLogLikelihood(conf)
lf.add_rate_parameter('s0')
lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
lf.prepare()

study = BinnedToyStudy(lf, max_iter=25, tol=1e-8)
mesh = global_mesh()
assert int(mesh.devices.size) == nproc * len(jax.local_devices())

t, free, cond = profile_ts_distributed(
    study, jax.random.PRNGKey(0), n_toys=16, target='s0_rate_multiplier',
    hypothesis=1.0, mesh=mesh)

# Split profile mode (two SPMD programs, host-composed) must reproduce the
# fused double-fit program's statistics over the SAME multi-process mesh
study_split = BinnedToyStudy(lf, max_iter=25, tol=1e-8, profile_mode='split')
t_split, _, _ = profile_ts_distributed(
    study_split, jax.random.PRNGKey(0), n_toys=16,
    target='s0_rate_multiplier', hypothesis=1.0, mesh=mesh)
assert np.allclose(np.asarray(t_split), np.asarray(t),
                   rtol=1e-9, atol=1e-11), (t_split, t)

# Unbinned twin over the same global mesh (the per-toy simulation runs
# INSIDE the SPMD fit program there; only the key axis is sharded)
lfu = UnbinnedLogLikelihood(conf)
lfu.add_rate_parameter('s0')
lfu.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
lfu.prepare()
ustudy = UnbinnedToyStudy(lfu, max_iter=25, tol=1e-8)
tu, freeu, _ = profile_ts_distributed(
    ustudy, jax.random.PRNGKey(0), n_toys=16, target='s0_rate_multiplier',
    hypothesis=1.0, mesh=mesh)

with open('%s.%d.json' % (out_prefix, pid), 'w') as f:
    json.dump({'t': np.asarray(t).tolist(),
               'll': np.asarray(free.max_ll).tolist(),
               'x': np.asarray(free.x).tolist(),
               't_unbinned': np.asarray(tu).tolist(),
               'll_unbinned': np.asarray(freeu.max_ll).tolist(),
               'n_global_devices': int(mesh.devices.size)}, f)
print("worker %d done" % pid)
