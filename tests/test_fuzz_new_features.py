"""Property fuzzing for the round-3 feature set: LogMorpher (host/jax
agreement, anchor exactness, linear mass), weighted density estimation
(integer-weight duplication oracle)."""

import numpy as np
import numpy.testing as npt

from blueice_tpu.morphers import GridInterpolator, LogMorpher
from blueice_tpu.models import Model
from blueice_tpu.test_helpers import conf_for_test, FixedSampleSource


def _random_grid_morpher(rng, k):
    shape_parameters = {}
    for i in range(k):
        n_anchor = int(rng.integers(2, 4))
        zs = np.sort(rng.uniform(-3, 3, n_anchor))
        while np.any(np.diff(zs) < 1e-3):
            zs = np.sort(rng.uniform(-3, 3, n_anchor))
        shape_parameters['p%d' % i] = (
            {float(z): float(z) for z in zs}, None, None)
    return GridInterpolator({}, shape_parameters)


def test_fuzz_logmorpher_host_jax_agree():
    rng = np.random.default_rng(123)
    for trial in range(25):
        k = int(rng.integers(1, 4))
        inner = _random_grid_morpher(rng, k)
        grid_shape = tuple(len(a) for a in inner.anchor_z_arrays)
        n_sources = int(rng.integers(1, 4))
        n_bins = int(rng.integers(2, 9))
        tensor = rng.uniform(0.0, 2.0, grid_shape + (n_sources, n_bins))
        # sprinkle exact zeros (the floor path)
        tensor[rng.random(tensor.shape) < 0.1] = 0.0
        lm = LogMorpher(inner, n_template_axes=1)
        log_t = np.log(np.maximum(tensor, lm.floor))

        los = [a[0] for a in inner.anchor_z_arrays]
        his = [a[-1] for a in inner.anchor_z_arrays]
        zs = np.array([rng.uniform(lo, hi) for lo, hi in zip(los, his)])

        host = lm.host_eval(log_t, zs)
        dev = np.asarray(lm.jax_eval(log_t, zs))
        npt.assert_allclose(dev, host, rtol=2e-5, atol=1e-12,
                            err_msg="trial %d" % trial)
        assert np.all(host >= 0)

        # anchor exactness: pick a random full anchor corner
        idx = tuple(int(rng.integers(len(a))) for a in inner.anchor_z_arrays)
        z_anchor = np.array([a[i]
                             for a, i in zip(inner.anchor_z_arrays, idx)])
        at_anchor = lm.host_eval(log_t, z_anchor)
        npt.assert_allclose(at_anchor, np.maximum(tensor[idx], lm.floor),
                            rtol=1e-9, err_msg="trial %d anchor" % trial)

        # total mass interpolates linearly: equals the linear morph of masses
        mass = lm.host_eval(log_t, zs).sum(axis=-1)
        lin_mass = inner.host_eval(
            np.maximum(tensor, lm.floor).sum(axis=-1), zs)
        npt.assert_allclose(mass, lin_mass, rtol=1e-9,
                            err_msg="trial %d mass" % trial)


def test_fuzz_weighted_integer_duplication_oracle():
    """Integer weights k are equivalent to duplicating each event k times for
    the TEMPLATE and fraction_in_range (the effective counts legitimately
    differ — that is the feature)."""
    rng = np.random.default_rng(7)
    space = [['x', np.linspace(0, 5, 6)]]
    for trial in range(8):
        n = int(rng.integers(5, 40))
        xs = rng.uniform(-1, 6, n)          # some out of range
        ks = rng.integers(1, 5, n)

        dw = np.zeros(n, dtype=[('x', float), ('source', int), ('w', float)])
        dw['x'], dw['w'] = xs, ks.astype(float)

        du = np.zeros(int(ks.sum()), dtype=[('x', float), ('source', int)])
        du['x'] = np.repeat(xs, ks)

        class W(FixedSampleSource):
            def get_events_for_density_estimate(self):
                d = self.config['data']
                return d, float(np.sum(d['w']))

        sw = Model(conf_for_test(
            default_source_class=W, analysis_space=space,
            weight_field='w', data=dw,
            force_recalculation=True)).sources[0]
        su = Model(conf_for_test(
            default_source_class=FixedSampleSource, analysis_space=space,
            data=du, force_recalculation=True)).sources[0]

        npt.assert_allclose(sw._pdf_histogram.values,
                            su._pdf_histogram.values, rtol=1e-12,
                            err_msg="trial %d" % trial)
        npt.assert_allclose(sw.fraction_in_range, su.fraction_in_range,
                            rtol=1e-12)
        # effective <= raw, equality iff all weights equal
        neff = sw._n_events_histogram.values.sum()
        raw = su._n_events_histogram.values.sum()
        assert neff <= raw + 1e-9
