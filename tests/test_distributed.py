"""Multi-host mesh support: a 2-process jax.distributed group (CPU transport)
must produce the SAME toy-ensemble statistics as the single-process mesh.

This is the process-spanning half of the distributed story (SURVEY §5: the
role of the reference's ipyparallel cluster fan-out, blueice/parallel.py:
76-103) — verified here without TPU pod hardware by spanning the mesh over
two CPU processes x 4 virtual devices each. Real DCN remains untested in this
environment (single chip); the *program* is the same.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_local_devices):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=%d'
                        % n_local_devices)
    # Drop accelerator-plugin trigger vars so the children are pure-CPU
    # (same pitfall as __graft_entry__.dryrun_multichip)
    for trigger in ('PALLAS_AXON_POOL_IPS', 'TPU_LIBRARY_PATH',
                    'PJRT_LIBRARY_PATH'):
        env.pop(trigger, None)
    env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get('PYTHONPATH', ''))
    return env


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'distributed_worker.py')
    env = _worker_env(4)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), '2', str(port), str(tmp_path),
         str(tmp_path / 'out')],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors='replace')[-4000:]

    results = []
    for pid in range(2):
        with open(str(tmp_path / 'out') + '.%d.json' % pid) as f:
            results.append(json.load(f))

    # Both processes hold the fully-replicated ensemble result
    assert results[0]['n_global_devices'] == 8
    np.testing.assert_array_equal(results[0]['t'], results[1]['t'])
    np.testing.assert_array_equal(results[0]['ll'], results[1]['ll'])
    np.testing.assert_array_equal(results[0]['t_unbinned'],
                                  results[1]['t_unbinned'])
    np.testing.assert_array_equal(results[0]['ll_unbinned'],
                                  results[1]['ll_unbinned'])

    # Single-process oracle: same templates (same global-numpy seed at session
    # start is NOT reused here — reseed), same key, mesh = this session's 8
    # virtual devices
    np.random.seed(1234567)
    from blueice_tpu.likelihood import BinnedLogLikelihood
    from blueice_tpu.test_helpers import conf_for_test
    from blueice_tpu.parallel.toys import BinnedToyStudy, make_mesh
    from blueice_tpu.parallel.distributed import profile_ts_distributed

    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', np.linspace(-10, 10, 41)]],
                         n_events_for_pdf=int(5e3),
                         cache_dir=str(tmp_path / 'sp'),
                         task_dir=str(tmp_path / 'sp'))
    conf['sources'][1]['mu'] = 3.0
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lf.prepare()
    study = BinnedToyStudy(lf, max_iter=25, tol=1e-8)

    t_sp, free_sp, _ = study.profile_ts(
        jax.random.PRNGKey(0), n_toys=16, target='s0_rate_multiplier',
        hypothesis=1.0, mesh=make_mesh())

    np.testing.assert_allclose(results[0]['t'], np.asarray(t_sp),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(results[0]['ll'], np.asarray(free_sp.max_ll),
                               rtol=1e-10)

    # The single-process path through profile_ts_distributed is the same code
    # (mesh size 1 process): exercise it directly too
    t_d, free_d, _ = profile_ts_distributed(
        study, jax.random.PRNGKey(0), n_toys=16,
        target='s0_rate_multiplier', hypothesis=1.0)
    np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_sp),
                               rtol=1e-10, atol=1e-12)

    # Unbinned twin: the 2-process result must match this session's
    # single-process mesh bit-for-bit as well
    from blueice_tpu.likelihood import UnbinnedLogLikelihood
    from blueice_tpu.parallel.toys import UnbinnedToyStudy
    lfu = UnbinnedLogLikelihood(conf)
    lfu.add_rate_parameter('s0')
    lfu.add_shape_parameter('mu', (-1.0, 0.0, 1.0))
    lfu.prepare()
    ustudy = UnbinnedToyStudy(lfu, max_iter=25, tol=1e-8)
    tu_sp, freeu_sp, _ = ustudy.profile_ts(
        jax.random.PRNGKey(0), n_toys=16, target='s0_rate_multiplier',
        hypothesis=1.0, mesh=make_mesh())
    np.testing.assert_allclose(results[0]['t_unbinned'], np.asarray(tu_sp),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(results[0]['ll_unbinned'],
                               np.asarray(freeu_sp.max_ll), rtol=1e-10)
