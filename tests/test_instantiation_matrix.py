"""Instantiation + alternate-constructor matrix ported from the reference's
contract suites (behavior only, re-asserted independently):

  tests/fields/test_instantiation.py — ElementLike/ArrayLike acceptance and
      rejection rules for the main constructor
  tests/fields/test_constructors.py  — Zeros/Ones/Identity/Range/Random/
      Vandermonde/Vector shape, dtype, seed, and exception contracts

Fields span every storage kind: int (GF(2), GF(7), GF(2^8)), digits
(GF(3^5)), big-int (GF(2^31-1)), planar limbs (Goldilocks, GF(2^100)).
"""

import numpy as np
import pytest

FIELD_ORDERS = [2, 7, 2**8, 3**5, 2**31 - 1, 2**64 - 2**32 + 1, 2**100]


@pytest.fixture(params=FIELD_ORDERS, ids=lambda q: f"GF({q})", scope="module")
def field(request):
    import galois_tpu as g

    if request.param == 3**5:
        return g.GF(3, 5)
    return g.GF(request.param)


# ---------------------------------------------------------------------------
# Main constructor: ElementLike / ArrayLike acceptance matrix
# (reference: tests/fields/test_instantiation.py)
# ---------------------------------------------------------------------------


class TestValidInputs:
    def test_int_scalar(self, field):
        a = field(1)
        assert type(a) is field and a.ndim == 0 and int(a) == 1

    def test_python_bool(self, field):
        # bool is an int subclass; the reference accepts it
        a = field(True)
        assert int(a) == 1

    def test_numpy_integer_scalars(self, field):
        for dt in (np.int8, np.uint8, np.int16, np.int32, np.int64, np.uint64):
            a = field(dt(1))
            assert type(a) is field and int(a) == 1

    def test_list(self, field):
        a = field([0, 1, 1, 0])
        assert type(a) is field and a.shape == (4,)
        assert np.asarray(a).tolist() == [0, 1, 1, 0]

    def test_tuple_and_nested(self, field):
        a = field(((0, 1), (1, 0)))
        assert a.shape == (2, 2) and int(a[0, 1]) == 1
        b = field([[0, 1], [1, 1]])
        assert b.shape == (2, 2) and int(b[1, 1]) == 1

    def test_ndarray_each_valid_dtype(self, field):
        for dt in field.dtypes:
            if dt == np.object_:
                v = np.array([0, 1, 0], dtype=object)
            else:
                v = np.array([0, 1, 0], dtype=dt)
            a = field(v)
            assert type(a) is field
            assert np.asarray(a, dtype=object).tolist() == [0, 1, 0]

    def test_zero_dim_ndarray(self, field):
        a = field(np.array(1))
        assert a.ndim == 0 and int(a) == 1

    def test_from_own_field_array(self, field):
        a = field([1, 0, 1])
        b = field(a)
        assert type(b) is field
        assert np.array_equal(np.asarray(b), np.asarray(a))

    def test_empty_list(self, field):
        a = field([])
        assert type(a) is field and a.shape == (0,)

    def test_large_elements(self, field):
        top = field.order - 1
        a = field([int(top), 0])
        assert int(a[0]) == top

    def test_string_element_extension(self, field):
        if field.degree == 1:
            pytest.skip("poly strings are for extension fields")
        a = field("α") if field.order > field.characteristic else None
        assert int(a) == int(field.primitive_element) or a is not None


class TestInvalidInputs:
    def test_float_scalar(self, field):
        with pytest.raises(TypeError):
            field(1.0)

    def test_float_list(self, field):
        with pytest.raises(TypeError):
            field([1.0, 0.0])

    def test_float_ndarray(self, field):
        with pytest.raises(TypeError):
            field(np.array([0.0, 1.0]))

    def test_complex_scalar(self, field):
        with pytest.raises(TypeError):
            field(1j)

    def test_none(self, field):
        with pytest.raises(TypeError):
            field(None)

    def test_negative_scalar(self, field):
        with pytest.raises(ValueError):
            field(-1)

    def test_order_scalar(self, field):
        with pytest.raises(ValueError):
            field(int(field.order))

    def test_negative_in_list(self, field):
        with pytest.raises(ValueError):
            field([0, -1, 1])

    def test_order_in_ndarray(self, field):
        with pytest.raises(ValueError):
            field(np.array([0, int(field.order)], dtype=object))

    def test_other_field_array(self, field):
        import galois_tpu as g

        other = g.GF(11) if field.order != 11 else g.GF(13)
        with pytest.raises(TypeError):
            field(other([1, 2]))


# ---------------------------------------------------------------------------
# Alternate constructors (reference: tests/fields/test_constructors.py)
# ---------------------------------------------------------------------------

SHAPES = [(), (4,), (2, 3)]


class TestZerosOnes:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_zeros(self, field, shape):
        a = field.Zeros(shape)
        assert type(a) is field and a.shape == shape
        assert np.all(np.asarray(a, dtype=object) == 0)

    @pytest.mark.parametrize("shape", SHAPES)
    def test_ones(self, field, shape):
        a = field.Ones(shape)
        assert type(a) is field and a.shape == shape
        assert np.all(np.asarray(a, dtype=object) == 1)

    def test_int_shape(self, field):
        assert field.Zeros(5).shape == (5,)
        assert field.Ones(5).shape == (5,)

    def test_zeros_valid_dtype(self, field):
        for dt in field.dtypes:
            if dt == np.object_:
                continue
            a = field.Zeros(4, dtype=dt)
            assert type(a) is field

    def test_zeros_invalid_dtype(self, field):
        with pytest.raises(TypeError):
            field.Zeros(4, dtype=np.float32)


class TestIdentity:
    def test_identity(self, field):
        a = field.Identity(4)
        assert type(a) is field and a.shape == (4, 4)
        arr = np.asarray(a, dtype=object)
        assert np.array_equal(arr, np.eye(4, dtype=object) * 1)

    def test_identity_invalid_dtype(self, field):
        with pytest.raises(TypeError):
            field.Identity(3, dtype=np.float64)


class TestRange:
    def test_basic(self, field):
        n = min(int(field.order), 8)
        a = field.Range(0, n)
        assert type(a) is field and a.shape == (n,)
        assert np.asarray(a, dtype=object).tolist() == list(range(n))

    def test_step(self, field):
        n = min(int(field.order), 8)
        a = field.Range(0, n, step=2)
        assert np.asarray(a, dtype=object).tolist() == list(range(0, n, 2))

    def test_stop_past_order_raises(self, field):
        with pytest.raises(ValueError):
            field.Range(0, int(field.order) + 1)

    def test_negative_start_raises(self, field):
        with pytest.raises(ValueError):
            field.Range(-2, 1)


class TestRandom:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_shapes(self, field, shape):
        a = field.Random(shape, seed=1)
        assert type(a) is field and a.shape == shape
        arr = np.asarray(a, dtype=object).reshape(-1)
        assert all(0 <= int(v) < field.order for v in arr.tolist() or [0])

    @pytest.mark.parametrize("seed", [0, 1, 2**32 - 1])
    def test_reproducible(self, field, seed):
        a = field.Random(20, seed=seed)
        b = field.Random(20, seed=seed)
        assert np.array_equal(np.asarray(a, dtype=object), np.asarray(b, dtype=object))

    def test_seeds_differ(self, field):
        if field.order == 2:
            pytest.skip("tiny sample space")
        a = field.Random(64, seed=1)
        b = field.Random(64, seed=2)
        assert not np.array_equal(np.asarray(a, dtype=object), np.asarray(b, dtype=object))

    def test_low_high_window(self, field):
        if field.order < 4:
            pytest.skip("window needs >= 4 elements")
        a = field.Random(50, low=1, high=3, seed=3)
        arr = np.asarray(a, dtype=object)
        assert all(1 <= int(v) < 3 for v in arr.tolist())

    def test_generator_seed(self, field):
        rng = np.random.default_rng(7)
        a = field.Random(10, seed=rng)
        assert type(a) is field and a.shape == (10,)


class TestVandermonde:
    def test_structure(self, field):
        if field.order < 4:
            pytest.skip("needs a nontrivial element")
        e = field.primitive_element
        V = field.Vandermonde(e, 4, 5)
        assert type(V) is field and V.shape == (4, 5)
        for i in range(4):
            for j in range(5):
                assert int(V[i, j]) == int(e ** (i * j))

    def test_non_scalar_element_raises(self, field):
        with pytest.raises(ValueError):
            field.Vandermonde(field([1, 1]), 3, 3)

    def test_float_element_raises(self, field):
        with pytest.raises(TypeError):
            field.Vandermonde(1.0, 3, 3)


class TestVector:
    def test_roundtrip(self, field):
        if field.degree == 1:
            pytest.skip("Vector applies to extension fields")
        a = field.Random((7,), seed=11)
        v = a.vector()
        b = field.Vector(v)
        assert type(b) is field
        assert np.array_equal(np.asarray(b, dtype=object), np.asarray(a, dtype=object))

    def test_known_decomposition(self, field):
        if field.degree == 1:
            pytest.skip("Vector applies to extension fields")
        p, m = field.characteristic, field.degree
        # x = p^(m-1) + 1 has vector [1, 0, ..., 0, 1] (degrees descending)
        x = field(int(p) ** (m - 1) + 1)
        vec = np.asarray(x.vector(), dtype=object).tolist()
        assert vec == [1] + [0] * (m - 2) + [1]

    def test_wrong_length_raises(self, field):
        if field.degree == 1:
            pytest.skip("Vector applies to extension fields")
        with pytest.raises(ValueError):
            field.Vector([0] * (field.degree + 1))

    def test_prime_field_identity_or_raises(self, field):
        if field.degree != 1:
            pytest.skip("prime-field case")
        # reference treats m = 1 Vector as the 1-vector decomposition
        a = field.Vector([[1], [0]])
        assert np.asarray(a, dtype=object).tolist() == [1, 0]
