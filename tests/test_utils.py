import numpy as np
import pytest

from blueice_tpu.utils import (arrays_to_grid, InterpolateAndExtrapolate1D,
                               combine_dicts, deterministic_hash, hashablize)


def test_arrays_to_grid():
    np.testing.assert_array_equal(
        arrays_to_grid([np.array([0, 1]), np.array([0, 1])]),
        np.array([[[0, 0], [0, 1]], [[1, 0], [1, 1]]]))
    np.testing.assert_array_equal(
        arrays_to_grid([np.array([1, 2]), np.array([3, 4])]),
        np.array([[[1, 3], [1, 4]], [[2, 3], [2, 4]]]))


def test_interpolate():
    # Single point: constant everywhere, scalar in -> scalar out
    itp = InterpolateAndExtrapolate1D(0, 42)
    assert itp(3) == 42
    assert itp([3]) == [42]

    itp = InterpolateAndExtrapolate1D([0], [42])
    assert itp(3) == 42

    # Multiple points: linear inside, constant outside
    itp = InterpolateAndExtrapolate1D([0, 1], [0, 42])
    assert itp(3) == 42
    assert itp([3]) == [42]
    assert itp(0.5) == 21
    assert itp(-5) == 0


def test_combine_dicts():
    assert combine_dicts(dict(a=1), dict(a=2, b=3)) == dict(a=2, b=3)
    assert combine_dicts(dict(a=1, b=2), exclude=['b']) == dict(a=1)
    base = dict(a=[1, 2])
    out = combine_dicts(base, deep_copy=True)
    out['a'].append(3)
    assert base['a'] == [1, 2]
    assert combine_dicts() == {}


def test_deterministic_hash():
    # Stable across orderings, types distinguished
    assert deterministic_hash(dict(a=1, b=2)) == deterministic_hash(dict(b=2, a=1))
    assert deterministic_hash(1) != deterministic_hash('1')
    assert deterministic_hash(1) != deterministic_hash(1.0)
    assert (deterministic_hash(np.array([1.0, 2.0]))
            == deterministic_hash(np.array([1.0, 2.0])))
    assert (deterministic_hash(dict(x=np.linspace(0, 1, 5)))
            != deterministic_hash(dict(x=np.linspace(0, 2, 5))))
    # Classes hash by qualified name
    class A:
        pass
    h1 = deterministic_hash(dict(cls=A))
    assert isinstance(h1, str) and len(h1) == 40


def test_closure_hashing():
    """Local functions differing only in a captured cell value, default
    argument, or referenced global must hash differently — otherwise a cached
    template silently serves the wrong config."""
    def make(scale):
        return lambda x: x * scale
    assert deterministic_hash(make(2.0)) != deterministic_hash(make(3.0))
    assert deterministic_hash(make(2.0)) == deterministic_hash(make(2.0))

    # Defaults participate
    f1 = lambda x, a=1: x + a   # noqa: E731
    f2 = lambda x, a=2: x + a   # noqa: E731
    assert deterministic_hash(f1) != deterministic_hash(f2)

    # Nested lambdas: inner code objects in co_consts must not collapse
    g1 = lambda x: (lambda y: y + 1)(x)   # noqa: E731
    g2 = lambda x: (lambda y: y + 2)(x)   # noqa: E731
    assert deterministic_hash(g1) != deterministic_hash(g2)

    # Captured cells may themselves be closures
    def wrap(f):
        return lambda x: f(x)
    assert (deterministic_hash(wrap(make(2.0)))
            != deterministic_hash(wrap(make(3.0))))


def test_hashablize():
    h = hashablize(dict(b=[1, 2], a=np.array([3, 4])))
    hash(h)  # must not raise
    class Unhashable:
        __hash__ = None
    with pytest.raises(TypeError):
        hashablize(Unhashable())


def test_hashablize_2d_array():
    """2-d (and deeper) arrays must hashablize to nested tuples, not tuples
    of (unhashable) lists."""
    from blueice_tpu.utils import hashablize
    h = hashablize({'a': np.ones((2, 2)), 'b': [np.arange(3)]})
    hash(h)   # must not raise


def test_save_npz_rejects_object_dtype(tmp_path):
    from blueice_tpu.utils import save_npz
    with pytest.raises(TypeError, match='object dtype'):
        save_npz({'labels': np.array(['a', None], dtype=object)},
                 str(tmp_path / 'x.npz'))
