"""Pickle round-trips of prepared likelihoods.

The reference's workflow ships prepared likelihoods between processes by
(dill-)pickling them (blueice/parallel.py:85-92 dill-ships Model configs to
ipyparallel engines; user analyses pickle whole likelihoods — that is why
the reference depends on dill at all, blueice/utils.py:65-77). Here the
interpolators are closures over (morpher, tensor) payloads stored in
``lf._builds``, dropped on dump and rebuilt on load — so PLAIN stdlib
pickle works whenever the user's config pickles.
"""

import pickle

import numpy as np
import jax
import pytest

from blueice_tpu.test_helpers import conf_for_test, make_data
from blueice_tpu.likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
from blueice_tpu.utils.io import read_pickle, save_pickle

KW = dict(s0_rate_multiplier=1.3, some_multiplier=1.4)


def _binned_lf(**conf_kw):
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5), **conf_kw)
    lf = BinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1.0, 2.0))
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    return lf


def test_binned_pickle_roundtrip(tmp_path):
    lf = _binned_lf()
    v1 = float(lf(**KW))
    lf2 = pickle.loads(pickle.dumps(lf))
    assert float(lf2(**KW)) == v1
    # ... and through the package's atomic pickle I/O (reference parity:
    # utils.py read_pickle/save_pickle)
    p = str(tmp_path / 'lf.pkl')
    save_pickle(lf, p)
    assert float(read_pickle(p)(**KW)) == v1


@pytest.mark.slow
def test_unpickled_likelihood_drives_the_compiled_path():
    """The unpickled object must feed the device engines too: _builds and
    the anchor payloads survive, so a toy study on the loaded likelihood
    compiles and fits."""
    from blueice_tpu.parallel import BinnedToyStudy
    lf2 = pickle.loads(pickle.dumps(_binned_lf()))
    study = BinnedToyStudy(lf2)
    res = study.run(jax.random.PRNGKey(0), 4)
    assert np.isfinite(np.asarray(res.max_ll)).all()


def test_binned_bb_pickle_roundtrip():
    """bb_single stores an extra n_model_events interpolator — rebuild it."""
    conf = conf_for_test(n_sources=2, mc=True,
                         analysis_space=[['x', [-10, -1, 1, 10]]],
                         n_events_for_pdf=int(1e5))
    lf = BinnedLogLikelihood(
        conf, likelihood_config={
            'model_statistical_uncertainty_handling': 'bb_single',
            'bb_single_source': 's1'})
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1.0, 2.0))
    lf.prepare()
    lf.set_data(lf.base_model.simulate())
    v1 = float(lf(**KW))
    lf2 = pickle.loads(pickle.dumps(lf))
    assert float(lf2(**KW)) == v1
    assert lf2.n_model_events_interpolator(np.array([1.4])) is not None


@pytest.mark.parametrize('source_wise', [False, True])
def test_unbinned_pickle_roundtrip(source_wise):
    conf = conf_for_test(n_sources=2, mc=False,
                         source_wise_interpolation=source_wise)
    lf = UnbinnedLogLikelihood(conf)
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1.0, 2.0))
    lf.prepare()
    lf.set_data(make_data([dict(n_events=10, x=0.0)])[0])
    v1 = float(lf(**KW))
    lf2 = pickle.loads(pickle.dumps(lf))
    assert float(lf2(**KW)) == v1
    # Rebinding data AFTER the round trip rebuilds the per-event tensors
    lf2.set_data(make_data([dict(n_events=5, x=1.0)])[0])
    v_new = float(lf2(**KW))
    lf.set_data(make_data([dict(n_events=5, x=1.0)])[0])
    assert v_new == float(lf(**KW))


def test_unprepared_likelihood_pickles():
    conf = conf_for_test(n_sources=1, mc=False)
    lf = UnbinnedLogLikelihood(conf)
    lf2 = pickle.loads(pickle.dumps(lf))
    assert not lf2.is_prepared
    assert lf2.n_model_events_interpolator(np.array([0.0])) is None


# Composition classes: picklable whenever the user's functions are (the
# reference needs dill for its lambda-valued conv_configs; module-level
# functions round-trip with plain pickle).

def _sq0(np0):
    return np0 ** 2


def _sq1(np1):
    return np1 ** 2


def _bil(np0, np1):
    return np0 * np1


def _anc(pars):
    return -0.5 * (pars['theta'] - 1.0) ** 2


def _unbinned_lf():
    lf = UnbinnedLogLikelihood(conf_for_test(n_sources=2, mc=False))
    lf.add_rate_parameter('s0')
    lf.add_shape_parameter('some_multiplier', (0.5, 1.0, 2.0))
    lf.prepare()
    lf.set_data(make_data([dict(n_events=10, x=0.0)])[0])
    return lf


def test_sum_pickle_roundtrip():
    from blueice_tpu.composition import LogLikelihoodSum
    s = LogLikelihoodSum([_unbinned_lf(), _unbinned_lf()],
                         likelihood_weights=[1.0, 0.5])
    v1 = float(s(**KW))
    s2 = pickle.loads(pickle.dumps(s))
    assert float(s2(**KW)) == v1


def test_reparam_and_ancillary_pickle_roundtrip():
    from blueice_tpu.composition import (LogLikelihoodReParam,
                                         LogAncillaryLikelihood)
    from blueice_tpu.test_helpers import conf_for_reparam_test
    conv = dict(
        np0=(np.linspace(1e-12, 10, 2), None, None),
        np1=(np.linspace(1e-12, 10, 2), None, None),
        op0_rate_multiplier=dict(params=['np0'], func=_sq0),
        op1_rate_multiplier=dict(params=['np1'], func=_sq1),
        op2_rate_multiplier=dict(params=['np0', 'np1'], func=_bil),
    )
    lf = UnbinnedLogLikelihood(conf_for_reparam_test())
    lf.prepare()
    lf.set_data(make_data([dict(n_events=10, x=0.0)])[0])
    rp = LogLikelihoodReParam(lf, conv)
    v1 = float(rp(np0=1.3))
    rp2 = pickle.loads(pickle.dumps(rp))
    assert float(rp2(np0=1.3)) == v1

    al = LogAncillaryLikelihood(_anc, ['theta'], config={'theta': 1.0})
    a1 = float(al(theta=1.5))
    al2 = pickle.loads(pickle.dumps(al))
    assert float(al2(theta=1.5)) == a1
