"""Behavioral edge matrix ported from the reference's contract suites.

Reference analogues (behavior only, re-asserted independently):
  tests/fields/test_broadcasting.py          — shape/type propagation
  tests/fields/test_assignment.py            — setitem typing/range rules
  tests/fields/test_conversion.py            — view / astype rules
  tests/fields/test_numpy_ufuncs.py          — reduce/accumulate/reduceat/
                                               outer/at matrix + must-raise
  tests/fields/test_arithmetic_exceptions.py — int-operand TypeErrors,
                                               zero-division, log(0)

Fields span every storage kind: int (GF(2), GF(7), GF(2^8), GF(3^5) digits
ride int? no — GF(3^5) is digits), planar limbs (GF(2^100), Goldilocks).
"""

import numpy as np
import pytest

FIELD_ORDERS = [2, 7, 2**8, 3**5, 2**32 - 5, 2**64 - 2**32 + 1, 2**100]


@pytest.fixture(params=FIELD_ORDERS, ids=lambda q: f"GF({q})", scope="module")
def field(request):
    import galois_tpu as g

    if request.param == 3**5:
        return g.GF(3, 5)
    return g.GF(request.param)


def _rand(field, shape, seed, low=0):
    x = field.Random(shape, seed=seed)
    if low:
        arr = np.asarray(x, dtype=object)
        arr[arr == 0] = 1
        return field(arr if np.ndim(arr) else int(arr))
    return x


# ---------------------------------------------------------------------------
# Broadcasting (reference: tests/fields/test_broadcasting.py)
# ---------------------------------------------------------------------------

BROADCAST_SHAPES = [
    ((), (), ()),
    ((2, 2), (), (2, 2)),
    ((), (2, 2), (2, 2)),
    ((2, 4), (4,), (2, 4)),
    ((3, 1), (1, 4), (3, 4)),
]


@pytest.mark.parametrize("s1,s2,sr", BROADCAST_SHAPES)
def test_broadcasting(field, s1, s2, sr):
    a = _rand(field, s1, 1)
    b = _rand(field, s2, 2, low=1)
    for op in (lambda x, y: x + y, lambda x, y: x - y, lambda x, y: x * y, lambda x, y: x / y):
        z = op(a, b)
        assert type(z) is field
        assert z.shape == sr
    z = -a
    assert type(z) is field and z.shape == s1
    z = a**2
    assert type(z) is field and z.shape == s1


def test_broadcast_values_match_elementwise(field):
    """(3,1) x (1,4) broadcast equals the explicit outer loop."""
    a = _rand(field, (3, 1), 3)
    b = _rand(field, (1, 4), 4, low=1)
    z = a * b
    for i in range(3):
        for j in range(4):
            assert int(z[i, j]) == int(a[i, 0] * b[0, j])


# ---------------------------------------------------------------------------
# Assignment (reference: tests/fields/test_assignment.py)
# ---------------------------------------------------------------------------

class TestAssignment:
    def test_scalar_valid(self, field):
        a = _rand(field, 10, 5)
        a[0] = 1
        assert int(a[0]) == 1

    def test_scalar_invalid_type(self, field):
        a = _rand(field, 10, 5)
        with pytest.raises(TypeError):
            a[0] = 1.0

    def test_scalar_out_of_range(self, field):
        a = _rand(field, 10, 5)
        with pytest.raises(ValueError):
            a[0] = field.order

    def test_slice_constant(self, field):
        a = _rand(field, 10, 6)
        a[0:2] = 1
        assert int(a[0]) == 1 and int(a[1]) == 1

    def test_slice_list(self, field):
        a = _rand(field, 10, 6)
        a[0:2] = [1, 0]
        assert int(a[0]) == 1 and int(a[1]) == 0

    def test_slice_list_invalid_type(self, field):
        a = _rand(field, 10, 6)
        with pytest.raises(TypeError):
            a[0:2] = [1.0, 1]

    def test_slice_list_out_of_range(self, field):
        a = _rand(field, 10, 6)
        with pytest.raises(ValueError):
            a[0:2] = [field.order, 1]

    def test_slice_array_small_dtype(self, field):
        a = _rand(field, 10, 6)
        a[0:2] = np.array([1, 1], dtype=np.int8)
        assert int(a[0]) == 1

    def test_slice_array_invalid_type(self, field):
        a = _rand(field, 10, 6)
        with pytest.raises(TypeError):
            a[0:2] = np.array([1.0, 1])

    def test_slice_array_out_of_range(self, field):
        a = _rand(field, 10, 6)
        with pytest.raises(ValueError):
            a[0:2] = np.array([int(field.order), 1], dtype=object)

    def test_2d_slice(self, field):
        a = _rand(field, (10, 10), 7)
        a[0:2, 0:2] = [[1, 1], [1, 0]]
        assert int(a[0, 0]) == 1 and int(a[1, 1]) == 0

    def test_2d_out_of_range(self, field):
        a = _rand(field, (10, 10), 7)
        with pytest.raises(ValueError):
            a[0:2, 0:2] = [[int(field.order), 1], [1, 1]]

    def test_field_element_assignment(self, field):
        a = _rand(field, 10, 8)
        a[0] = field(1)
        assert int(a[0]) == 1
        a[0:3] = field([1, 0, 1])
        assert int(a[2]) == 1


# ---------------------------------------------------------------------------
# Conversion (reference: tests/fields/test_conversion.py) — dtype contract
# per docs/DTYPES.md: storage is internal; view/astype govern the DISPLAY
# dtype and np.asarray() output dtype.
# ---------------------------------------------------------------------------

class TestConversion:
    # ndarray.view(field) is an ndarray-subclass idiom the reference
    # inherits from numpy; FieldArray is a jnp-backed pytree wrapper
    # (jnp buffers are immutable, so view-vs-copy is moot) — the validated
    # conversion spelling here is the constructor. See docs/DTYPES.md.
    def test_constructor_valid_dtype(self, field):
        for dtype in field.dtypes:
            if dtype == np.object_:
                continue
            v = np.array([0, 1, 0, 1], dtype=dtype)
            a = field(v)
            assert type(a) is field
            assert np.asarray(a).tolist() == [0, 1, 0, 1]

    def test_constructor_float_raises(self, field):
        v = np.array([0, 1, 0, 1], dtype=float)
        with pytest.raises(TypeError):
            field(v)

    def test_constructor_out_of_range_raises(self, field):
        v = np.array([0, 1, 0, int(field.order)], dtype=object)
        with pytest.raises(ValueError):
            field(v)

    def test_astype_valid(self, field):
        a = _rand(field, 10, 9)
        for dtype in field.dtypes:
            b = a.astype(dtype)
            assert type(b) is field
            assert np.array_equal(np.asarray(b, dtype=object), np.asarray(a, dtype=object))

    def test_astype_too_small_raises(self, field):
        a = _rand(field, 10, 9)
        bad = [d for d in (np.uint8, np.int8) if d not in field.dtypes]
        for dtype in bad:
            with pytest.raises(TypeError):
                a.astype(dtype)


# ---------------------------------------------------------------------------
# NumPy ufunc methods (reference: tests/fields/test_numpy_ufuncs.py)
# ---------------------------------------------------------------------------

class TestUfuncMethods:
    def test_reduce(self, field):
        a = _rand(field, 10, 10, low=1)
        for np_op, py_op in [
            (np.add, lambda x, y: x + y),
            (np.subtract, lambda x, y: x - y),
            (np.multiply, lambda x, y: x * y),
            (np.true_divide, lambda x, y: x / y),
            (np.floor_divide, lambda x, y: x // y),
        ]:
            b = np_op.reduce(a)
            truth = a[0]
            for ai in a[1:]:
                truth = py_op(truth, ai)
            assert int(b) == int(truth), np_op.__name__

    def test_reduce_must_raise(self, field):
        a = _rand(field, 10, 10)
        for np_op in (np.negative, np.reciprocal, np.power, np.square, np.log):
            with pytest.raises(ValueError):
                np_op.reduce(a)

    def test_accumulate(self, field):
        a = _rand(field, 10, 11, low=1)
        for np_op, py_op in [
            (np.add, lambda x, y: x + y),
            (np.subtract, lambda x, y: x - y),
            (np.multiply, lambda x, y: x * y),
            (np.true_divide, lambda x, y: x / y),
        ]:
            b = np_op.accumulate(a)
            assert type(b) is field
            truth = a[0]
            for i, ai in enumerate(a):
                if i == 0:
                    continue
                truth = py_op(truth, ai)
                assert int(b[i]) == int(truth), np_op.__name__

    def test_accumulate_must_raise(self, field):
        a = _rand(field, 10, 11)
        for np_op in (np.negative, np.reciprocal, np.square, np.log):
            with pytest.raises(ValueError):
                np_op.accumulate(a)

    def test_reduceat(self, field):
        a = _rand(field, 10, 12, low=1)
        idx = [1, 4, 5, 8]
        for np_op, py_op in [
            (np.add, lambda x, y: x + y),
            (np.multiply, lambda x, y: x * y),
        ]:
            b = np_op.reduceat(a, idx)
            assert type(b) is field
            for k, (lo, hi) in enumerate(zip(idx, idx[1:] + [10])):
                truth = a[lo]
                for ai in a[lo + 1 : hi]:
                    truth = py_op(truth, ai)
                assert int(b[k]) == int(truth)

    def test_outer(self, field):
        a = _rand(field, 5, 13, low=1)
        b = _rand(field, 4, 14, low=1)
        for np_op, py_op in [
            (np.add, lambda x, y: x + y),
            (np.multiply, lambda x, y: x * y),
        ]:
            z = np_op.outer(a, b)
            assert type(z) is field and z.shape == (5, 4)
            for i in (0, 4):
                for j in (0, 3):
                    assert int(z[i, j]) == int(py_op(a[i], b[j]))

    def test_outer_must_raise(self, field):
        a = _rand(field, 5, 13)
        with pytest.raises(ValueError):
            np.square.outer(a, a)

    def test_at(self, field):
        a = _rand(field, 6, 15)
        before = np.asarray(a, dtype=object).copy()
        np.add.at(a, [0, 3], field(1))
        assert int(a[0]) == int(field(int(before[0])) + field(1))
        assert int(a[3]) == int(field(int(before[3])) + field(1))
        assert int(a[1]) == int(before[1])

    def test_divide_reduce_by_zero_raises(self, field):
        a = field([1, 0, 1])
        with pytest.raises(ZeroDivisionError):
            np.true_divide.reduce(a)


# ---------------------------------------------------------------------------
# Arithmetic exceptions (reference: tests/fields/test_arithmetic_exceptions.py)
# ---------------------------------------------------------------------------

class TestArithmeticExceptions:
    def test_add_int_raises(self, field):
        x = _rand(field, 10, 20)
        for y in (1, np.int64(1), [1] * 10, np.ones(10, dtype=np.int64)):
            with pytest.raises(TypeError):
                x + y
            with pytest.raises(TypeError):
                y + x

    def test_subtract_int_raises(self, field):
        x = _rand(field, 10, 20)
        for y in (1, np.ones(10, dtype=np.int64)):
            with pytest.raises(TypeError):
                x - y
            with pytest.raises(TypeError):
                y - x

    def test_divide_int_raises(self, field):
        x = _rand(field, 10, 20, low=1)
        for y in (1, np.ones(10, dtype=np.int64)):
            with pytest.raises(TypeError):
                x / y
            with pytest.raises(TypeError):
                y / x

    def test_multiply_int_is_scalar_multiple(self, field):
        x = _rand(field, 10, 21)
        p = field.characteristic
        z = x * 3
        truth = x + x + x if p != 3 else field.Zeros(10)
        assert np.array_equal(np.asarray(z, dtype=object), np.asarray(truth, dtype=object))
        z2 = 3 * x
        assert np.array_equal(np.asarray(z2, dtype=object), np.asarray(z, dtype=object))

    def test_multiply_float_raises(self, field):
        x = _rand(field, 10, 21)
        with pytest.raises(TypeError):
            x * 1.5

    def test_divide_by_zero_raises(self, field):
        x = _rand(field, 10, 22)
        with pytest.raises(ZeroDivisionError):
            x / field.Zeros(10)
        with pytest.raises(ZeroDivisionError):
            field.Zeros(10) ** -1

    def test_zero_to_negative_power_raises(self, field):
        with pytest.raises(ZeroDivisionError):
            field.Zeros(3) ** -2

    def test_power_field_exponent_raises(self, field):
        x = _rand(field, 3, 23)
        with pytest.raises(TypeError):
            x ** field([1, 0, 1])

    def test_log_of_zero_raises(self, field):
        if field.order > 2**34:
            pytest.skip("discrete log only supported for small fields")
        with pytest.raises(ArithmeticError):
            field.Zeros(3).log()

    def test_cross_field_raises(self, field):
        import galois_tpu as g

        other = g.GF(11) if field.order != 11 else g.GF(13)
        x = _rand(field, 3, 24)
        with pytest.raises(TypeError):
            x + other([1, 2, 3])
