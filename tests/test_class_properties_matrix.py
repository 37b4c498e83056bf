"""Field-class property matrix ported from the reference's contract suites
(behavior re-asserted independently):

  tests/fields/test_classes.py    — dtypes-per-order rule, properties text,
      read-only class attributes, is_primitive_poly correctness
  tests/fields/test_properties.py — name/characteristic/degree/order/
      elements/units/primitive+normal element sets
  tests/fields/test_squares.py    — squares/non_squares partitions
"""

import numpy as np
import pytest

import galois_tpu as g


def _euler_is_square(field, x):
    """Independent Euler-criterion oracle (odd characteristic)."""
    hf_pow = lambda a, k: pow_field(field, a, k)
    q = int(field.order)
    return x == 0 or hf_pow(x, (q - 1) // 2) == 1


def pow_field(field, a, k):
    from galois_tpu.fields._hostfield import get_host_field

    return get_host_field(field._meta).power(int(a), int(k))


class TestDtypesRule:
    """Reference rule (src/galois/_domains/_meta.py:94-102): valid dtypes
    are those whose max value >= order - 1, object for > 64-bit fields."""

    CASES = [
        (2, [np.uint8, np.uint16, np.uint32, np.int8, np.int16, np.int32, np.int64]),
        (7, [np.uint8, np.uint16, np.uint32, np.int8, np.int16, np.int32, np.int64]),
        (2**8, [np.uint8, np.uint16, np.uint32, np.int16, np.int32, np.int64]),
        (3191, [np.uint16, np.uint32, np.int16, np.int32, np.int64]),
        (2**31 - 1, [np.uint32, np.int32, np.int64]),
        (7**3, [np.uint16, np.uint32, np.int16, np.int32, np.int64]),
    ]

    @pytest.mark.parametrize("order,expected", CASES, ids=lambda v: str(v)[:24])
    def test_small_fields(self, order, expected):
        GF = g.GF(order)
        assert GF.dtypes == expected

    def test_large_fields_are_object(self):
        for order in (2**100, 2**64 - 2**32 + 1, 36893488147419103183):
            GF = g.GF(order)
            assert GF.dtypes == [np.object_]


class TestProperties:
    def test_gf7_properties_text(self):
        GF = g.GF(7)
        assert GF.properties == (
            "Galois Field:\n"
            "  name: GF(7)\n"
            "  characteristic: 7\n"
            "  degree: 1\n"
            "  order: 7\n"
            "  irreducible_poly: x + 4\n"
            "  is_primitive_poly: True\n"
            "  primitive_element: 3"
        )

    def test_gf256_properties_text(self):
        GF = g.GF(2**8)
        assert GF.properties == (
            "Galois Field:\n"
            "  name: GF(2^8)\n"
            "  characteristic: 2\n"
            "  degree: 8\n"
            "  order: 256\n"
            "  irreducible_poly: x^8 + x^4 + x^3 + x^2 + 1\n"
            "  is_primitive_poly: True\n"
            "  primitive_element: x"
        )

    @pytest.mark.parametrize(
        "order,name",
        [(2, "GF(2)"), (7, "GF(7)"), (2**8, "GF(2^8)"), (3**5, "GF(3^5)")],
    )
    def test_names(self, order, name):
        assert g.GF(order).name == name

    def test_prime_subfield(self):
        GF = g.GF(3**5)
        sub = GF.prime_subfield
        assert sub.order == 3 and sub.degree == 1
        assert g.GF(7).prime_subfield is g.GF(7)

    def test_is_prime_extension_flags(self):
        assert g.GF(7).is_prime_field and not g.GF(7).is_extension_field
        assert g.GF(2**8).is_extension_field and not g.GF(2**8).is_prime_field

    def test_primitive_element_has_full_order(self):
        for order in (7, 31, 2**8, 3**5):
            GF = g.GF(order)
            alpha = int(GF.primitive_element)
            q = int(GF.order)
            # alpha^(q-1) = 1 and alpha^((q-1)/p) != 1 for each prime p | q-1
            assert pow_field(GF, alpha, q - 1) == 1
            primes, _ = g.factors(q - 1)
            for pi in primes:
                assert pow_field(GF, alpha, (q - 1) // pi) != 1

    def test_elements_and_units(self):
        for order in (7, 2**4, 3**3):
            GF = g.GF(order)
            els = np.asarray(GF.elements, dtype=object).tolist()
            assert els == list(range(order))
            units = np.asarray(GF.units, dtype=object).tolist()
            assert units == list(range(1, order))

    def test_primitive_elements_count(self):
        # number of primitive elements = euler_phi(q - 1)
        for order in (7, 31, 2**4, 3**3):
            GF = g.GF(order)
            prim = np.asarray(GF.primitive_elements, dtype=object).tolist()
            assert len(prim) == g.euler_phi(order - 1)
            assert int(GF.primitive_element) in prim

    def test_cant_set_class_attributes(self):
        GF = g.GF2
        for attr in (
            "name",
            "characteristic",
            "degree",
            "order",
            "irreducible_poly",
            "is_primitive_poly",
            "primitive_element",
            "is_prime_field",
            "is_extension_field",
            "dtypes",
            "element_repr",
            "ufunc_mode",
            "ufunc_modes",
        ):
            with pytest.raises(AttributeError):
                setattr(GF, attr, None)

    def test_is_primitive_poly_flag(self):
        # Conway polys are primitive by construction
        assert g.GF(2**8).is_primitive_poly
        # x^8 + x^4 + x^3 + x + 1 (0x11B, AES) is irreducible but NOT primitive
        GF_aes = g.GF(2**8, irreducible_poly=0x11B, primitive_element=3)
        assert not GF_aes.is_primitive_poly

    def test_repr_of_class(self):
        assert "GF(3^5" in repr(g.GF(3**5))


class TestSquares:
    @pytest.mark.parametrize("order", [7, 11, 31, 3**3, 5**2])
    def test_partition_odd_characteristic(self, order):
        GF = g.GF(order)
        sq = set(np.asarray(GF.squares, dtype=object).tolist())
        nsq = set(np.asarray(GF.non_squares, dtype=object).tolist())
        assert sq | nsq == set(range(order))
        assert not (sq & nsq)
        # (q+1)/2 squares including 0 in odd-characteristic fields
        assert len(sq) == (order + 1) // 2
        for x in sq:
            assert _euler_is_square(GF, x)
        for x in nsq:
            assert not _euler_is_square(GF, x)

    @pytest.mark.parametrize("order", [2, 2**4, 2**8])
    def test_char2_everything_is_square(self, order):
        GF = g.GF(order)
        sq = np.asarray(GF.squares, dtype=object).tolist()
        assert sq == list(range(order))
        assert np.asarray(GF.non_squares).size == 0

    @pytest.mark.parametrize("order", [7, 31, 2**4, 3**3])
    def test_is_square_matches_sqrt(self, order):
        GF = g.GF(order)
        x = GF.elements
        flags = x.is_square()
        sq = set(np.asarray(GF.squares, dtype=object).tolist())
        for v, f in zip(np.asarray(x, dtype=object).tolist(), np.asarray(flags).tolist()):
            assert bool(f) == (v in sq)
            if f:
                r = GF(v).sqrt()
                assert int(r * r) == v
