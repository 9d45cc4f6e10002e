"""File-valued config settings: replace strings ending in a known extension with the
loaded file contents.

Role parity with the reference's config file-reader
(reference: blueice/data_reading.py:15-51): same extensible ``FILE_READERS``
registry, same module-level read cache so shared inputs (e.g. big maps referenced by
many anchor configs) are read from disk exactly once per process.
"""

from copy import deepcopy
import os

import numpy as np

from .io import data_file_name, read_pickle

__all__ = ['read_csv', 'read_npy', 'read_files_in', 'FILE_READERS', 'CACHE']


def read_csv(filename):
    """Read a two-column (x, y) csv into a (2, n) float array."""
    import pandas as pd
    result = pd.read_csv(filename, delimiter=',', names=['x', 'y'], comment='#')
    return result.values[1:].astype(float).T


def read_npy(filename):
    return np.load(filename, allow_pickle=False)


FILE_READERS = {'.pkl': read_pickle, '.csv': read_csv, '.npy': read_npy}
CACHE = dict()


def read_files_in(d, data_dirs=tuple('.')):
    """Return a new dict in which every string value of d ending in a supported
    extension is replaced with that file's contents. Other keys are left alone.
    A module-level cache ensures each file is read only once per process.
    :param data_dirs: directories to search for files. Defaults to '.'.
    """
    d = deepcopy(d)
    for k, x in d.items():
        if not isinstance(x, str):
            continue
        _, extension = os.path.splitext(x)
        if extension not in FILE_READERS:
            continue
        x = data_file_name(x, data_dirs)
        if x in CACHE:
            d[k] = CACHE[x]
        else:
            d[k] = CACHE[x] = FILE_READERS[extension](x)
    return d
