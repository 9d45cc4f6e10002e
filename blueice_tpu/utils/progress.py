"""Progress reporting and profiling hooks.

Role parity with the reference's tqdm instrumentation on every long host loop
(reference: blueice/likelihood.py:191-208, parallel.py:55-66,
pdf_morphers.py:173) — tqdm is used when importable, with a lightweight stderr
ticker fallback, and everything can be silenced globally. Device-side work is
observed through jax.profiler instead (:func:`trace` / :func:`profile_to`),
since XLA programs don't have host loops to hang a progress bar on.
"""

import contextlib
import sys
import time

__all__ = ['progress_iter', 'set_progress', 'trace', 'profile_to']

_ENABLED = True


def set_progress(enabled):
    """Globally enable/disable host-side progress reporting."""
    global _ENABLED
    _ENABLED = bool(enabled)


def progress_iter(iterable, desc=None, total=None):
    """Iterate with progress feedback: tqdm when available, otherwise a plain
    stderr ticker (1 line/s max). Silent when disabled."""
    if not _ENABLED:
        yield from iterable
        return
    # Import in its OWN try: wrapping the yield-from would also catch an
    # ImportError raised inside the CALLER's loop body (thrown into the
    # generator), silently swallowing it and re-iterating the sequence
    # through the fallback ticker below.
    try:
        from tqdm import tqdm
    except ImportError:
        tqdm = None
    if tqdm is not None:
        yield from tqdm(iterable, desc=desc, total=total)
        return

    if total is None:
        try:
            total = len(iterable)
        except TypeError:
            total = None
    start = last = time.time()
    for i, item in enumerate(iterable):
        yield item
        now = time.time()
        if now - last > 1.0:
            last = now
            msg = ("%s: %d/%s (%.1fs)"
                   % (desc or 'progress', i + 1, total or '?', now - start))
            print(msg, file=sys.stderr, flush=True)


@contextlib.contextmanager
def trace(name):
    """Annotate a region for the jax profiler (shows up as a named span in the
    trace viewer); no-op overhead when no trace is being taken."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir):
    """Capture a jax/XLA device profile into log_dir (open with tensorboard or
    xprof). Wrap the region of interest::

        with profile_to('/tmp/prof'):
            study.run(key, 10_000)
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
