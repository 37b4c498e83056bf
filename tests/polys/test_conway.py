"""Conway polynomial tests (reference: tests/polys/test_conway_polys.py)."""

import pytest


def test_conway_poly_values():
    import galois_tpu as g

    f = g.conway_poly(2, 8)
    assert str(f) == "x^8 + x^4 + x^3 + x^2 + 1"
    assert f.field is g.GF(2)

    f = g.conway_poly(3, 8)
    assert str(f) == "x^8 + 2x^5 + x^4 + 2x^2 + 2x + 2"

    f = g.conway_poly(5, 8)
    assert str(f) == "x^8 + x^4 + 3x^2 + 4x + 2"


def test_conway_poly_exceptions():
    import galois_tpu as g

    with pytest.raises(ValueError):
        g.conway_poly(4, 3)  # composite characteristic
    with pytest.raises(LookupError):
        g.conway_poly(2, 410)  # beyond Luebeck's tables


def test_conway_search_matches_database():
    """The defining exhaustive search reproduces the table entries."""
    import galois_tpu as g
    from galois_tpu.polys._conway import _conway_search

    for p, m in [(2, 1), (2, 2), (2, 3), (2, 4), (3, 1), (3, 2), (3, 3), (5, 2), (7, 2)]:
        assert _conway_search(p, m) == g.conway_poly(p, m), (p, m)


def test_is_conway_and_consistent():
    import galois_tpu as g

    f = g.conway_poly(2, 4)
    assert f.is_conway()
    assert f.is_conway_consistent()
    # x^4 + x^3 + 1 is primitive over GF(2) but is not the Conway polynomial
    other = g.Poly.Degrees([4, 3, 0])
    assert other.is_primitive()
    assert not other.is_conway()


def test_poly_constructors_misc():
    """Reference analogues: tests/polys/test_constructors.py essentials."""
    import numpy as np

    import galois_tpu as g

    GF = g.GF(7)
    # Roots with multiplicity
    f = g.Poly.Roots([1, 2], multiplicities=[2, 1], field=GF)
    r, m = f.roots(multiplicity=True)
    assert np.asarray(r).tolist() == [1, 2] and m.tolist() == [2, 1]
    # Random is monic-leading (nonzero leading coeff) and reproducible
    f1 = g.Poly.Random(5, seed=11, field=GF)
    f2 = g.Poly.Random(5, seed=11, field=GF)
    assert f1 == f2 and f1.degree == 5
    # Degrees validation
    import pytest

    with pytest.raises(ValueError):
        g.Poly.Degrees([-1], [1])
    with pytest.raises(ValueError):
        g.Poly.Degrees([2, 1], [1])
    # Zero/One/Identity
    assert g.Poly.Zero(GF).is_zero
    assert g.Poly.One(GF).is_one
    assert str(g.Poly.Identity(GF)) == "x"
    # coefficients sizing
    f = g.Poly([1, 2, 3], field=GF)
    assert np.asarray(f.coefficients(5)).tolist() == [0, 0, 1, 2, 3]
    assert np.asarray(f.coefficients(5, order="asc")).tolist() == [3, 2, 1, 0, 0]


def test_sparse_dense_equivalence():
    """Reference analogue: tests/polys/test_arithmetic_implementations.py —
    internal representations give identical results."""
    import numpy as np

    import galois_tpu as g
    from galois_tpu.polys._poly import Poly

    GF = g.GF(7)
    dense = g.Poly([3, 0, 0, 2, 1], field=GF)
    sparse = Poly._from_sparse([4, 1, 0], [3, 2, 1], GF)
    sparse._type = "sparse"  # force the sparse arithmetic paths
    assert dense == sparse
    other = g.Poly([1, 5], field=GF)
    assert dense + other == sparse + other
    assert dense * other == sparse * other
    assert dense - other == sparse - other
    assert (dense % other) == (sparse % other)
    assert int(dense.reverse()) == int(sparse.reverse())
