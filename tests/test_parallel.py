"""Delayed/parallel template computation and the bluethaw CLI — coverage the
reference's own test suite never had (SURVEY.md §4: 'Multi-process/distributed
testing: none')."""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from blueice_tpu.test_helpers import conf_for_test
from blueice_tpu.models import Model
from blueice_tpu.parallel import compute_single, compute_many, compute_all
from blueice_tpu.likelihood import UnbinnedLogLikelihood


@pytest.fixture
def dirs():
    task_dir = tempfile.mkdtemp(prefix='bt_tasks_')
    cache_dir = tempfile.mkdtemp(prefix='bt_cache_')
    yield task_dir, cache_dir
    shutil.rmtree(task_dir)
    shutil.rmtree(cache_dir)


def _delayed_conf(task_dir, cache_dir, **kw):
    return conf_for_test(mc=True, n_events_for_pdf=int(1e4),
                         delay_pdf_computation=True,
                         task_dir=task_dir, cache_dir=cache_dir, **kw)


def test_delayed_computation_roundtrip(dirs):
    task_dir, cache_dir = dirs
    conf = _delayed_conf(task_dir, cache_dir, sigma=1.23)

    m = Model(conf)
    s = m.sources[0]
    assert not s.pdf_has_been_computed
    assert os.path.exists(os.path.join(task_dir, s.hash))

    compute_single(s.hash, task_dir=task_dir, result_dir=cache_dir)
    # Task file consumed, result exists
    assert not os.path.exists(os.path.join(task_dir, s.hash))
    assert os.path.exists(os.path.join(cache_dir, s.hash))

    # Reload: cache hit, PDF usable
    conf2 = _delayed_conf(task_dir, cache_dir, sigma=1.23)
    m2 = Model(conf2)
    assert m2.sources[0].from_cache
    assert m2.sources[0].pdf_has_been_computed
    from scipy import stats
    assert abs(m2.sources[0].pdf([0.0])[0]
               - stats.norm(0, 1.23).pdf(0)) < 0.05

    # Idempotent: computing an already-computed hash is a no-op
    compute_single(s.hash, task_dir=task_dir, result_dir=cache_dir)

    # Unknown hash is an error
    with pytest.raises(ValueError):
        compute_single('deadbeef', task_dir=task_dir, result_dir=cache_dir)


def test_compute_all_and_many(dirs):
    task_dir, cache_dir = dirs
    hashes = []
    for sigma in (0.8, 1.0, 1.4):
        m = Model(_delayed_conf(task_dir, cache_dir, sigma=sigma))
        hashes.append(m.sources[0].hash)
    assert len(os.listdir(task_dir)) == 3

    compute_all(task_dir, task_dir=task_dir, result_dir=cache_dir)
    assert len(os.listdir(task_dir)) == 0
    for h in hashes:
        assert os.path.exists(os.path.join(cache_dir, h))


def test_prepare_with_n_cores(dirs):
    """likelihood.prepare(n_cores>1) goes through task files + a process pool
    and reloads the computed models."""
    task_dir, cache_dir = dirs
    conf = conf_for_test(mc=True, n_events_for_pdf=int(1e4),
                         task_dir=task_dir, cache_dir=cache_dir)
    lf = UnbinnedLogLikelihood(conf)
    lf.add_shape_parameter('sigma', (0.9, 1.0, 1.1))
    lf.prepare(n_cores=2)
    lf.set_data(lf.base_model.simulate(rng=np.random.default_rng(0)))
    assert np.isfinite(lf())
    assert np.isfinite(lf(sigma=1.05))


def test_bluethaw_cli(dirs):
    task_dir, cache_dir = dirs
    m = Model(_delayed_conf(task_dir, cache_dir, sigma=2.0))
    h = m.sources[0].hash

    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, '-m', 'blueice_tpu.cli',
         '--input', task_dir, '--output', cache_dir],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(cache_dir, h))
    assert not os.path.exists(os.path.join(task_dir, h))
