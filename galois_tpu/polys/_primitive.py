"""Primitive polynomial tests and searches
(reference: src/galois/_polys/_primitive.py:28-433)."""

from __future__ import annotations

from typing import Iterator, Union

from ..nt import factors as int_factors
from . import _hostpoly as hp
from ._irreducible import is_irreducible
from ._poly import Poly, _hf
from ._search import (
    deterministic_search,
    deterministic_search_fixed_terms,
    minimum_terms,
    random_search,
    random_search_fixed_terms,
)

__all__ = ["is_primitive", "primitive_poly", "primitive_polys", "matlab_primitive_poly"]


def is_primitive(poly: Poly) -> bool:
    """f (monic, degree m, over GF(q)) is primitive iff x has multiplicative
    order q^m - 1 in GF(q)[x]/(f): equivalently f | x^(q^m-1) - 1 and
    f does not divide x^((q^m-1)/pi) - 1 for any prime pi | q^m - 1
    (reference: src/galois/_polys/_primitive.py:28-104)."""
    field = poly.field
    q = field.order
    m = poly.degree
    if m == 0:
        return False
    if m == 1:
        # f = x - a primitive iff a is a primitive element of GF(q)
        from ..fields._hostfield import get_host_field

        a = _hf(field).negative(poly._asc()[0])
        if a == 0:
            return False
        return get_host_field(field._meta).is_primitive_element(a)
    if not poly.is_monic:
        return False
    if poly._asc()[0] == 0:
        return False
    if not is_irreducible(poly):
        return False

    F = _hf(field)
    f = poly._asc()
    n = q**m - 1
    # order of x must be exactly n
    if hp.pow_mod(F, [0, 1], n, f) != [1]:
        return False
    primes, _ = int_factors(n)
    for pi in primes:
        if hp.pow_mod(F, [0, 1], n // pi, f) == [1]:
            return False
    return True


def primitive_poly(
    order: int,
    degree: int,
    terms: Union[int, str, None] = None,
    method: str = "min",
) -> Poly:
    """Find a monic primitive polynomial
    (reference: src/galois/_polys/_primitive.py:108-238)."""
    from ..fields import GF

    order, degree = int(order), int(degree)
    if method not in ("min", "max", "random"):
        raise ValueError(f"Argument 'method' must be in ['min', 'max', 'random'], not {method!r}.")
    field = GF(order)
    test = is_primitive
    if terms == "min":
        t = minimum_terms(order, degree, test)
        poly = deterministic_search_fixed_terms(field, degree, t, test, reverse=(method == "max"))
    elif isinstance(terms, int):
        if method == "random":
            poly = random_search_fixed_terms(field, degree, terms, test)
        else:
            poly = deterministic_search_fixed_terms(field, degree, terms, test, reverse=(method == "max"))
    elif method == "random":
        poly = random_search(field, degree, test)
    else:
        poly = deterministic_search(field, degree, test, reverse=(method == "max"))
    if poly is None:
        raise RuntimeError(
            f"No monic primitive polynomial of degree {degree} over GF({order}) "
            f"with {terms} terms exists."
        )
    return poly


def primitive_polys(
    order: int,
    degree: int,
    terms: Union[int, str, None] = None,
    reverse: bool = False,
) -> Iterator[Poly]:
    from ..fields import GF

    order, degree = int(order), int(degree)
    field = GF(order)
    if terms == "min":
        terms = minimum_terms(order, degree, is_primitive)
    start = order**degree
    stop = 2 * order**degree
    rng = range(stop - 1, start - 1, -1) if reverse else range(start, stop)
    for i in rng:
        poly = Poly.Int(i, field=field)
        if terms is not None and len(poly.nonzero_degrees) != terms:
            continue
        if is_primitive(poly):
            yield poly


def matlab_primitive_poly(characteristic: int, degree: int) -> Poly:
    """Matlab's default primitive polynomial: the lexicographically first,
    with three hard-coded exceptions (degrees 7, 14, 16 over GF(2)) where
    Matlab differs (reference: src/galois/_polys/_primitive.py:358-433)."""
    characteristic, degree = int(characteristic), int(degree)
    if characteristic == 2 and degree == 7:
        return Poly.Degrees([7, 3, 0])
    if characteristic == 2 and degree == 14:
        return Poly.Degrees([14, 10, 6, 1, 0])
    if characteristic == 2 and degree == 16:
        return Poly.Degrees([16, 12, 3, 1, 0])
    return primitive_poly(characteristic, degree)
