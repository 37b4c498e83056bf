"""Parity tests against the reference's hand-committed LUT modules
(reference: tests/polys/luts/, tests/fields/luts/)."""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

REF_TESTS = pathlib.Path("/root/reference/tests")


def load_lut(rel):
    path = REF_TESTS / rel
    if not path.exists():
        pytest.skip(f"LUT {rel} not available")
    spec = importlib.util.spec_from_file_location(path.stem + "_lut", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def poly_coeffs(poly):
    return [int(c) for c in np.asarray(poly.coefficients(), dtype=np.int64)]


# ----------------------------------------------------------------------
# Irreducible / primitive polynomial enumeration
# ----------------------------------------------------------------------

IRREDUCIBLE_CASES = [
    (2, "polys/luts/irreducible_polys_2.py", [1, 2, 3, 4, 5, 6, 7, 8]),
    (3, "polys/luts/irreducible_polys_3.py", [1, 2, 3, 4, 5]),
    (4, "polys/luts/irreducible_polys_4.py", [1, 2, 3]),
    (5, "polys/luts/irreducible_polys_5.py", [1, 2, 3, 4]),
    (9, "polys/luts/irreducible_polys_9.py", [1, 2, 3]),
    (25, "polys/luts/irreducible_polys_25.py", [1, 2]),
]


@pytest.mark.parametrize("order,rel,degrees", IRREDUCIBLE_CASES)
def test_irreducible_polys_lut(order, rel, degrees):
    import galois_tpu as g

    mod = load_lut(rel)
    for degree in degrees:
        name = f"IRREDUCIBLE_POLYS_{order}_{degree}"
        if not hasattr(mod, name):
            continue
        expected = getattr(mod, name)
        if len(expected) > 64:
            expected = expected[:]  # full check; enumeration is cheap
        mine = [poly_coeffs(p) for p in g.irreducible_polys(order, degree)]
        assert mine == expected, f"{name} mismatch"


PRIMITIVE_CASES = [
    (2, "polys/luts/primitive_polys_2.py", [1, 2, 3, 4, 5, 6]),
    (3, "polys/luts/primitive_polys_3.py", [1, 2, 3, 4]),
    (4, "polys/luts/primitive_polys_4.py", [1, 2, 3]),
    (5, "polys/luts/primitive_polys_5.py", [1, 2, 3]),
]


@pytest.mark.parametrize("order,rel,degrees", PRIMITIVE_CASES)
def test_primitive_polys_lut(order, rel, degrees):
    import galois_tpu as g

    mod = load_lut(rel)
    for degree in degrees:
        name = f"PRIMITIVE_POLYS_{order}_{degree}"
        if not hasattr(mod, name):
            continue
        expected = getattr(mod, name)
        mine = [poly_coeffs(p) for p in g.primitive_polys(order, degree)]
        assert mine == expected, f"{name} mismatch"


# ----------------------------------------------------------------------
# Primitive / normal elements
# ----------------------------------------------------------------------

def _element_cases(kind):
    cases = []
    for p, degrees in [(2, [2, 3, 4, 5, 6]), (3, [2, 3, 4]), (5, [2, 3, 4])]:
        mod_rel = f"fields/luts/{kind}_elements_{p}.py"
        for m in degrees:
            cases.append((p, m, mod_rel, f"{kind.upper()}_ELEMENTS_{p}_{m}"))
    return cases


@pytest.mark.parametrize("p,m,rel,name", _element_cases("primitive"))
def test_primitive_elements_lut(p, m, rel, name):
    import galois_tpu as g

    mod = load_lut(rel)
    if not hasattr(mod, name):
        pytest.skip(f"{name} not in LUT")
    expected = getattr(mod, name)
    f = g.GF(p**m).irreducible_poly
    assert poly_coeffs(g.primitive_element(f)) == expected[0]
    assert poly_coeffs(g.primitive_element(f, method="max")) == expected[-1]
    mine = [poly_coeffs(e) for e in g.primitive_elements(f)]
    assert mine == expected


@pytest.mark.parametrize("p,m,rel,name", _element_cases("normal"))
def test_normal_elements_lut(p, m, rel, name):
    import galois_tpu as g

    mod = load_lut(rel)
    if not hasattr(mod, name):
        pytest.skip(f"{name} not in LUT")
    expected = getattr(mod, name)
    f = g.GF(p**m).irreducible_poly
    assert poly_coeffs(g.normal_element(f)) == expected[0]
    mine = [poly_coeffs(e) for e in g.normal_elements(f)]
    assert mine == expected


# ----------------------------------------------------------------------
# Poly factorization LUT
# ----------------------------------------------------------------------

def test_poly_factors_lut():
    import galois_tpu as g

    mod = load_lut("polys/luts/poly_factors.py")
    data = getattr(mod, "POLY_FACTORS", None)
    if data is None:
        pytest.skip("POLY_FACTORS missing")
    for p, m, cases in data:
        GF = g.GF(p**m)
        for poly_coeffs_desc, factors_coeffs, multiplicities in cases:
            f = g.Poly(poly_coeffs_desc, field=GF)
            facs, mults = f.factors()
            got = sorted((tuple(poly_coeffs(fa)), mu) for fa, mu in zip(facs, mults))
            exp = sorted((tuple(c), mu) for c, mu in zip(factors_coeffs, multiplicities))
            assert got == exp, f"factors mismatch over GF({p}^{m}) for {poly_coeffs_desc}"


def test_irreducible_poly_min_terms_db_consistency():
    """The DB fast path for terms='min' agrees with the search."""
    import galois_tpu as g
    from galois_tpu.polys._irreducible import is_irreducible
    from galois_tpu.polys._search import deterministic_search_fixed_terms, minimum_terms

    for order, degree in [(2, 8), (2, 12), (3, 5), (5, 4), (7, 3)]:
        db_poly = g.irreducible_poly(order, degree, terms="min")
        assert is_irreducible(db_poly)
        t = minimum_terms(order, degree, is_irreducible)
        assert len(db_poly.nonzero_degrees) == t, (order, degree)
        field = g.GF(order)
        searched = deterministic_search_fixed_terms(field, degree, t, is_irreducible)
        assert searched == db_poly, (order, degree)


def test_irreducible_poly_methods():
    import galois_tpu as g
    from galois_tpu.polys._irreducible import is_irreducible

    f_min = g.irreducible_poly(7, 3)
    f_max = g.irreducible_poly(7, 3, method="max")
    f_rand = g.irreducible_poly(7, 3, method="random")
    assert int(f_min) < int(f_max)
    for f in (f_min, f_max, f_rand):
        assert is_irreducible(f) and f.degree == 3
