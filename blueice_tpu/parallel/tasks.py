"""Delayed / multi-process / cluster computation of source PDF templates.

Role parity with the reference (reference: blueice/parallel.py): content-addressed
task files written by ``Source.prepare_task`` are consumed by workers
(``compute_single``), fanned out over a process pool (``compute_many``) or a whole
directory (``compute_all``, the CLI entry point). The protocol is restartable and
idempotent: finished hashes are skipped, task files are only deleted after the
result exists, and cache writes are atomic — a killed precompute run simply
resumes.

On TPU this machinery only feeds the *host-side* template build; the per-anchor
fan-out that motivated it in the reference is complemented by the vmapped/sharded
device paths in :mod:`blueice_tpu.parallel.toys`.
"""

import logging
import os
from concurrent.futures import ProcessPoolExecutor

from ..utils import read_pickle

__all__ = ['create_models_ipyparallel', 'compute_single', 'compute_many',
           'compute_all']
log = logging.getLogger('blueice_tpu.parallel')


def compute_single(hash, task_dir='pdf_tasks', result_dir='pdf_cache'):
    """Compute one source PDF template from its saved task file."""
    result_filename = os.path.join(result_dir, hash)
    if os.path.exists(result_filename):
        log.debug("Task %s already computed, nothing done.", hash)
        return

    task_filename = os.path.join(task_dir, hash)
    if not os.path.exists(task_filename):
        raise ValueError("Hash %s does not correspond to a task or result" % hash)

    source_class, source_config = read_pickle(task_filename)
    source_config['cache_dir'] = result_dir
    source_config['delay_pdf_computation'] = False
    s = source_class(source_config)

    # Only delete the task once the result provably exists — the module's
    # restartability invariant: a crash (or a config that skipped the cache
    # write) leaves the task file in place for the next sweep to retry
    if s.hash != hash:
        raise ValueError("source hash changed somehow??")
    if not os.path.exists(result_filename):
        raise RuntimeError(
            "Task %s computed but produced no cache file at %s (is "
            "never_save_to_cache set?); keeping the task file for retry"
            % (hash, result_filename))
    os.remove(task_filename)


def compute_many(hashes, n_cpus=1, *args, **kwargs):
    """Compute several task files, optionally on a process pool."""
    from ..utils.progress import progress_iter
    hashes = list(hashes)
    if n_cpus != 1:
        with ProcessPoolExecutor(max_workers=n_cpus) as pool:
            futures = [pool.submit(compute_single, h, *args, **kwargs)
                       for h in hashes]
            for f in progress_iter(futures,
                                   desc="Computing on %d cores" % n_cpus):
                f.result()   # re-raise worker exceptions on the driver
    else:
        for h in progress_iter(hashes, desc="Computing templates"):
            compute_single(h, *args, **kwargs)


def compute_all(input_dir='./pdf_tasks', *args, **kwargs):
    """Compute every pending task file in input_dir. Dotfiles are skipped:
    a hard-killed atomic write can leave a '.tmp_*.part' behind in the task
    dir, and a resumed run must step over it rather than abort on a
    truncated pickle."""
    if not os.path.exists(input_dir):
        raise FileNotFoundError("Input directory %s does not exist" % input_dir)
    compute_many([h for h in os.listdir(input_dir) if not h.startswith('.')],
                 *args, **kwargs)


def create_models_ipyparallel(configs, ipp_client=None, block=False):
    """Build a Model per config on an ipyparallel cluster (serial fallback if no
    client is given). Engines must run in the same working directory."""
    from ..models import Model

    if ipp_client is None:
        return [Model(conf) for conf in configs]

    ipp_client[:].use_dill()

    def compute_model(conf):
        from blueice_tpu.models import Model
        return Model(conf)

    asyncresult = ipp_client.load_balanced_view().map(
        compute_model, configs, ordered=True, block=block)
    return list(asyncresult)
