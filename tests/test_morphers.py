from collections import OrderedDict

import numpy as np
import pytest

import blueice_tpu.exceptions
from blueice_tpu import morphers


def test_morpher_api():
    """Generic contract test over the MORPHERS registry."""
    conf = dict(hypercube_shuffle_steps=2, r_sample_points=2)

    for name, morph_class in morphers.MORPHERS.items():
        with pytest.raises(blueice_tpu.exceptions.NoShapeParameters):
            morph_class(config=conf, shape_parameters=OrderedDict())

        shape_pars = OrderedDict([('bla', ({-1: -1, 0: 0, 1: 1}, None, None))])
        mr = morph_class(config=conf, shape_parameters=shape_pars)
        aps = mr.get_anchor_points(bounds=[(-1, 1)], n_models=3)
        assert isinstance(aps, list)
        assert isinstance(aps[0], tuple)

        def scalar_f(_):
            return 0

        scalar_itp = mr.make_interpolator(scalar_f, extra_dims=[],
                                          anchor_models={z: None for z in aps})
        assert scalar_itp([0]) == 0

        matrix_itp = mr.make_interpolator(scalar_f, extra_dims=[2, 2],
                                          anchor_models={z: None for z in aps})
        np.testing.assert_array_equal(matrix_itp([0]), np.zeros((2, 2)))


def test_grid_interpolator_values():
    """GridInterpolator is exact at anchors and multilinear between them."""
    shape_pars = OrderedDict([
        ('a', ({0.0: 0.0, 1.0: 1.0}, None, None)),
        ('b', ({0.0: 0.0, 2.0: 2.0}, None, None)),
    ])
    mr = morphers.GridInterpolator({}, shape_pars)
    aps = mr.get_anchor_points(bounds=None)
    assert len(aps) == 4

    # f = a + 10*b is linear, so interpolation is exact everywhere
    models = {zs: zs for zs in aps}
    itp = mr.make_interpolator(lambda m: np.array([m[0] + 10 * m[1]]),
                               extra_dims=[1], anchor_models=models)
    for a, b in [(0, 0), (1, 2), (0.25, 0.5), (1.0, 1.3)]:
        np.testing.assert_allclose(itp(np.array([a, b])), [a + 10 * b],
                                   rtol=1e-12)

    # jax path agrees with host path
    import jax.numpy as jnp
    tensor = mr.build_tensor(lambda m: np.array([m[0] + 10 * m[1]]),
                             [1], models)
    got = np.asarray(mr.jax_eval(jnp.asarray(tensor),
                                 jnp.asarray([0.25, 0.5])))
    np.testing.assert_allclose(got, [0.25 + 5.0], rtol=1e-12)


def test_radial_interpolator_smoke():
    shape_pars = OrderedDict([('a', ({0.0: 0.0, 1.0: 1.0}, None, None))])
    mr = morphers.RadialInterpolator(dict(hypercube_shuffle_steps=5),
                                     shape_pars)
    aps = mr.get_anchor_points(bounds=[(0, 1)], n_models=5)
    models = {zs: zs for zs in aps}
    itp = mr.make_interpolator(lambda m: np.array([m[0]]), extra_dims=[1],
                               anchor_models=models)
    out = itp(np.array([0.5]))
    assert out.shape == (1,)
    assert 0 <= out[0] <= 1


def test_latin():
    pts = morphers.latin(5, 2, shuffle_steps=10)
    assert pts.shape == (5, 2)
    # Each column is a permutation of the diagonal values
    for d in range(2):
        np.testing.assert_allclose(np.sort(pts[:, d]),
                                   np.arange(5) / 4.0, rtol=1e-12)
    boxed = morphers.latin(4, 1, box=[(10, 20)], shuffle_steps=5)
    assert (boxed >= 10).all() and (boxed <= 20).all()


def test_single_anchor_axis_rejected():
    """Grid morphing needs >= 2 anchors per axis; a single anchor must raise
    a clear error instead of crashing inside jit with a slice-size failure."""
    from blueice_tpu.morphers import MORPHERS
    from blueice_tpu.exceptions import InvalidParameterSpecification
    from collections import OrderedDict

    shape_parameters = OrderedDict(
        mu=({-1.0: -1.0, 0.0: 0.0, 1.0: 1.0}, None, None),
        sigma=({1.0: 1.0}, None, None))
    with pytest.raises(InvalidParameterSpecification, match='at least 2'):
        MORPHERS['GridInterpolator']({}, shape_parameters)
