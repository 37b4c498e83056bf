"""NumPy shape/manipulation function conformance
(reference: tests/fields/test_numpy_functions.py — condensed)."""

import numpy as np
import pytest


@pytest.fixture(params=[31, 2**8, 7**3], scope="module")
def field(request):
    import galois_tpu as g

    return g.GF(request.param)


def test_concatenate(field):
    a1 = field.Random((2, 3), seed=1)
    a2 = field.Random((1, 3), seed=2)
    b = np.concatenate((a1, a2), axis=0)
    assert b.shape == (3, 3)
    assert type(b) is field
    assert np.array_equal(np.asarray(b)[:2], np.asarray(a1))


def test_stack_variants(field):
    a = field.Random((2, 3), seed=3)
    assert np.vstack((a, a)).shape == (4, 3)
    assert np.hstack((a, a)).shape == (2, 6)
    assert type(np.vstack((a, a))) is field


def test_reshape_ravel_transpose(field):
    a = field.Random((2, 6), seed=4)
    assert np.reshape(a, (3, 4)).shape == (3, 4)
    assert np.ravel(a).shape == (12,)
    assert np.transpose(a).shape == (6, 2)
    assert a.reshape(4, 3).shape == (4, 3)
    assert a.T.shape == (6, 2)


def test_tile_repeat_roll_flip(field):
    a = field.Random((4,), seed=5)
    assert np.tile(a, 3).shape == (12,)
    assert np.repeat(a, 2).shape == (8,)
    assert np.array_equal(np.asarray(np.roll(a, 1))[0], np.asarray(a)[-1])
    assert np.array_equal(np.asarray(np.flip(a)), np.asarray(a)[::-1])


def test_split(field):
    a = field.Random((6,), seed=6)
    parts = np.split(a, 3)
    assert len(parts) == 3 and all(type(p) is field for p in parts)


def test_insert_delete_append(field):
    a = field([1, 2, 3])
    b = np.insert(a, 1, 0)
    assert np.asarray(b).tolist() == [1, 0, 2, 3]
    assert type(b) is field
    c = np.delete(b, 1)
    assert np.asarray(c).tolist() == [1, 2, 3]
    d = np.append(a, field([4]))
    assert np.asarray(d).tolist() == [1, 2, 3, 4]


def test_insert_out_of_range_raises(field):
    a = field([1, 2, 3])
    with pytest.raises(ValueError):
        np.insert(a, 1, field.order)


def test_atleast_broadcast_squeeze(field):
    a = field([1, 2, 3])
    assert np.atleast_2d(a).shape == (1, 3)
    assert np.broadcast_to(a, (2, 3)).shape == (2, 3)
    assert np.squeeze(np.atleast_2d(a)).shape == (3,)


def test_trace(field):
    A = field.Random((3, 3), seed=7)
    t = np.trace(A)
    expect = field(0)
    for i in range(3):
        expect = expect + A[i, i]
    assert int(t) == int(expect)


def test_sort_unique_count(field):
    a = field([3, 1, 2, 1])
    assert np.asarray(np.sort(a)).tolist() == [1, 1, 2, 3]
    assert np.asarray(np.unique(a)).tolist() == [1, 2, 3]
    assert np.count_nonzero(a) == 4
