import os
import shutil
import tempfile

import pytest

from blueice_tpu.utils import data_reading, io
from blueice_tpu.test_helpers import conf_for_test


@pytest.fixture
def tempdir():
    tmpdir = tempfile.mkdtemp()
    yield tmpdir
    shutil.rmtree(tmpdir)


def test_data_reading(tempdir):
    fn = 'important_setting.pkl'
    full_path = os.path.join(tempdir, fn)
    content = 'howdy'

    io.save_pickle(content, full_path)
    assert io.read_pickle(full_path) == content

    with pytest.raises(FileNotFoundError):
        io.find_file_in_folders('gnork', folders=tempdir)
    assert io.find_file_in_folders(fn, folders=tempdir) == full_path
    assert io.data_file_name(fn, data_dirs=tempdir) == full_path
    with pytest.raises(FileNotFoundError):
        io.data_file_name('gnork.pkl', data_dirs=tempdir)

    # Ordinary settings are left alone
    c = dict(bla='nothing_special')
    c_pimped = data_reading.read_files_in(c, data_dirs=tempdir)
    assert c_pimped['bla'] == 'nothing_special'

    # File-valued settings are replaced by contents (original dict untouched)
    c = dict(bla=fn)
    assert '.pkl' in data_reading.FILE_READERS
    c_pimped = data_reading.read_files_in(c, data_dirs=tempdir)
    assert c['bla'] == fn
    assert c_pimped['bla'] == content
    assert full_path in data_reading.CACHE

    # The test config reads without crashing
    data_reading.read_files_in(conf_for_test(), data_dirs=tempdir)


def test_atomic_npz(tempdir):
    import numpy as np
    path = os.path.join(tempdir, 'payload.npz')
    io.save_npz(dict(a=np.arange(5), s=3.5), path)
    loaded = io.load_npz(path)
    np.testing.assert_array_equal(loaded['a'], np.arange(5))
    assert float(loaded['s']) == 3.5
