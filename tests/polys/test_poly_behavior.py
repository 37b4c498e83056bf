"""Poly behavioral contracts ported from the reference's poly suites
(behavior re-asserted independently, no reference code):

  tests/polys/test_operations.py          — coefficients/reverse/repr/str/
      int/bin/oct/hex/equality/len/immutability
  tests/polys/test_instantiation.py       — coeff forms, leading zeros,
      ascending order, field override, zero polys
  tests/polys/test_non_poly_arithmetic.py — Poly (op) PolyLike coercions
  tests/polys/test_arithmetic_exceptions.py — true-div / 3-arg-pow rules
"""

import numpy as np
import pytest

import galois_tpu as g
from galois_tpu import Poly

FIELDS = [g.GF2, g.GF(7), g.GF(2**8), g.GF(3, 5), g.GF(2**31 - 1)]


@pytest.fixture(params=range(len(FIELDS)), ids=lambda i: FIELDS[i].name, scope="module")
def field(request):
    return FIELDS[request.param]


# ---------------------------------------------------------------------------
# Operations
# ---------------------------------------------------------------------------


class TestOperations:
    def test_coefficients_default(self, field):
        f = Poly([1, 0, 1, 2 % field.order], field=field)
        c = f.coefficients()
        assert type(c) is field
        assert np.asarray(c, dtype=object).tolist() == [1, 0, 1, 2 % field.order]

    def test_coefficients_padded(self, field):
        f = Poly([1, 1], field=field)
        c = f.coefficients(5)
        assert np.asarray(c, dtype=object).tolist() == [0, 0, 0, 1, 1]

    def test_coefficients_ascending(self, field):
        f = Poly([1, 0, 2 % field.order], field=field)
        c = f.coefficients(order="asc")
        assert np.asarray(c, dtype=object).tolist() == [2 % field.order, 0, 1]

    def test_coefficients_size_too_small_raises(self, field):
        f = Poly([1, 0, 1], field=field)
        with pytest.raises(ValueError):
            f.coefficients(2)

    def test_reverse(self, field):
        f = Poly([1, 0, 0, 2 % field.order, 3 % field.order], field=field)
        r = f.reverse()
        # reverse strips what become leading zeros
        assert int(r) == int(Poly(np.asarray(f.coefficients(), dtype=object)[::-1].tolist(), field=field))

    def test_int_identity(self, field):
        q = int(field.order)
        f = Poly([1, 0, min(2, q - 1)], field=field)
        assert int(f) == q**2 + min(2, q - 1)
        assert int(Poly.Int(int(f), field=field)) == int(f)

    def test_bin_oct_hex_gf2(self):
        f = Poly([1, 0, 1, 1])
        assert bin(int(f)) == "0b1011"
        assert format(int(f), "o") == "13"
        assert hex(int(f)) == "0xb"

    def test_len(self, field):
        f = Poly([1, 0, 0, 1], field=field)
        assert len(f) == 4 and f.degree == 3

    def test_equal_int_and_str(self, field):
        f = Poly([1, 0, 1], field=field)
        assert f == int(f)
        assert f == Poly([1, 0, 1], field=field)
        assert f != Poly([1, 1], field=field)

    def test_equal_same_coeffs_other_field(self):
        f2 = Poly([1, 0, 1], field=g.GF2)
        f3 = Poly([1, 0, 1], field=g.GF(3))
        assert f2 != f3  # different fields compare unequal

    def test_coeffs_immutable_semantics(self, field):
        f = Poly([1, 0, 1], field=field)
        c = f.coefficients()
        # mutating the returned coefficients must not change the poly
        c[0] = 0
        assert f.degree == 2
        assert int(f.coefficients()[0]) == 1

    def test_str_and_repr(self, field):
        f = Poly([1, 0, 1], field=field)
        assert str(f) == "x^2 + 1"
        assert str(Poly([1, 0], field=field)) == "x"
        assert str(Poly([0], field=field)) == "0"
        assert "Poly(x^2 + 1" in repr(f)

    def test_nonzero_degrees_coeffs(self, field):
        f = Poly.Degrees([5, 2, 0], [1, 1, 1], field=field)
        assert f.nonzero_degrees.tolist() == [5, 2, 0]
        assert np.asarray(f.nonzero_coeffs, dtype=object).tolist() == [1, 1, 1]


# ---------------------------------------------------------------------------
# Instantiation
# ---------------------------------------------------------------------------


class TestInstantiation:
    def test_leading_zeros_stripped(self, field):
        f = Poly([0, 0, 1, 1], field=field)
        assert f.degree == 1
        assert np.asarray(f.coefficients(), dtype=object).tolist() == [1, 1]

    def test_all_zero(self, field):
        f = Poly([0, 0, 0], field=field)
        assert f == Poly.Zero(field)
        assert f.degree == 0 and int(f) == 0

    def test_ascending_order_kwarg(self, field):
        f = Poly([1, 2 % field.order, 0], order="asc", field=field)
        g_ = Poly([0, 2 % field.order, 1], field=field)
        assert f == g_

    def test_field_array_coeffs(self, field):
        c = field([1, 0, 1])
        f = Poly(c)
        assert f.field is field and f.degree == 2

    def test_field_override(self):
        c = g.GF2([1, 0, 1])
        f = Poly(c, field=g.GF(3))
        assert f.field.order == 3

    def test_invalid_coeff_type_raises(self, field):
        with pytest.raises(TypeError):
            Poly([1.5, 0], field=field)

    def test_invalid_field_kwarg_raises(self):
        with pytest.raises(TypeError):
            Poly([1, 0], field=int)

    def test_zero_one_identity_singletondegrees(self, field):
        assert Poly.Zero(field).degree == 0
        assert int(Poly.One(field)) == 1
        ident = Poly.Identity(field)
        assert ident.degree == 1 and str(ident) == "x"

    def test_random_degree(self, field):
        f = Poly.Random(7, field=field, seed=5)
        assert f.degree == 7 and f.field is field
        f2 = Poly.Random(7, field=field, seed=5)
        assert f == f2

    def test_str_constructor_roundtrip(self, field):
        f = Poly([1, 0, 0, 1, 1], field=field)
        assert Poly.Str(str(f), field=field) == f


# ---------------------------------------------------------------------------
# Poly (op) PolyLike — non-Poly operands coerce
# (reference: tests/polys/test_non_poly_arithmetic.py)
# ---------------------------------------------------------------------------


class TestPolyLikeArithmetic:
    def test_add_int(self, field):
        f = Poly([1, 0, 1], field=field)
        assert f + 1 == f + Poly.One(field)
        assert 1 + f == f + Poly.One(field)

    def test_subtract_int(self, field):
        f = Poly([1, 0, 1], field=field)
        assert f - 1 == f - Poly.One(field)
        assert int((f - f)) == 0

    def test_multiply_int_is_scalar_multiple(self, field):
        # reference semantics: an int operand is scalar multiplication by
        # (int % characteristic) (src/galois/_polys/_poly.py:1770-1779)
        f = Poly([1, 1], field=field)
        p = int(field.characteristic)
        assert f * (p + 1) == f
        assert (p + 1) * f == f
        assert f * p == Poly.Zero(field)

    def test_floordiv_mod_polylike(self, field):
        f = Poly([1, 0, 0, 1], field=field)
        d = Poly([1, 1], field=field)
        quo, rem = divmod(f, d)
        assert f // int(d) == quo
        assert f % int(d) == rem
        assert quo * d + rem == f

    def test_field_scalar_multiplies_coeffs(self, field):
        if field.order == 2:
            pytest.skip("only scalar 1 exists")
        f = Poly([1, 0, 1], field=field)
        s = field(field.order - 1)
        fs = f * Poly(s.reshape(1))
        assert np.array_equal(
            np.asarray(fs.coefficients(), dtype=object),
            np.asarray(f.coefficients() * s, dtype=object),
        )


# ---------------------------------------------------------------------------
# Arithmetic exceptions
# (reference: tests/polys/test_arithmetic_exceptions.py)
# ---------------------------------------------------------------------------


class TestArithmeticExceptions:
    def test_true_division_raises(self, field):
        f = Poly([1, 0, 1], field=field)
        d = Poly([1, 1], field=field)
        with pytest.raises(NotImplementedError):
            f / d

    def test_divide_by_zero_raises(self, field):
        f = Poly([1, 0, 1], field=field)
        z = Poly.Zero(field)
        with pytest.raises(ZeroDivisionError):
            f // z
        with pytest.raises(ZeroDivisionError):
            f % z
        with pytest.raises(ZeroDivisionError):
            divmod(f, z)

    def test_negative_power_raises(self, field):
        f = Poly([1, 1], field=field)
        with pytest.raises(ValueError):
            f ** -2

    def test_three_arg_pow(self, field):
        f = Poly([1, 1], field=field)
        m = Poly([1, 0, 1, 1], field=field)
        assert pow(f, 13, m) == (f**13) % m

    def test_cross_field_add_raises(self, field):
        other = g.GF(11) if field.order != 11 else g.GF(13)
        f = Poly([1, 1], field=field)
        h = Poly([1, 1], field=other)
        with pytest.raises(TypeError):
            f + h


# ---------------------------------------------------------------------------
# Derivative / evaluation contracts
# ---------------------------------------------------------------------------


class TestCalculus:
    def test_derivative_linearity(self, field):
        f = Poly.Random(6, field=field, seed=9)
        h = Poly.Random(4, field=field, seed=10)
        assert (f + h).derivative() == f.derivative() + h.derivative()

    def test_derivative_product_rule(self, field):
        f = Poly.Random(3, field=field, seed=11)
        h = Poly.Random(4, field=field, seed=12)
        assert (f * h).derivative() == f.derivative() * h + f * h.derivative()

    def test_kth_derivative(self, field):
        f = Poly.Random(5, field=field, seed=13)
        assert f.derivative(2) == f.derivative().derivative()

    def test_evaluate_matches_horner(self, field):
        f = Poly.Random(5, field=field, seed=14)
        xs = field.Random(8, seed=15)
        ys = f(xs)
        coeffs = f.coefficients()
        for k in range(8):
            acc = field(0)
            for c in coeffs:
                acc = acc * xs[k] + c
            assert int(ys[k]) == int(acc)

    def test_evaluate_square_matrix(self, field):
        f = Poly([1, 1, 1], field=field)  # x^2 + x + 1
        A = field.Random((3, 3), seed=16)
        Y = f(A, elementwise=False)
        expect = A @ A + A + field.Identity(3)
        assert np.array_equal(np.asarray(Y, dtype=object), np.asarray(expect, dtype=object))

    def test_composition(self, field):
        f = Poly([1, 0, 1], field=field)
        h = Poly([1, 1], field=field)
        comp = f(h)
        # f(g) = g^2 + 1
        assert comp == h * h + Poly.One(field)
