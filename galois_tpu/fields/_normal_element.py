"""Normal elements of GF(q^m)
(reference: src/galois/_fields/_normal_element.py:18-411).

An element b of GF(q^m) = GF(q)[x]/(f) is normal over GF(q) if its Frobenius
conjugates {b, b^q, ..., b^(q^(m-1))} form a GF(q)-basis — a rank test on the
conjugates' vector representations."""

from __future__ import annotations

import random as _random

import numpy as np

from ..polys._poly import Poly
from ._hostfield import get_host_field

__all__ = ["is_normal_element", "normal_element", "normal_elements"]


def _field_from_poly(irreducible_poly: Poly):
    from ._primitive_element import _field_from_poly as f

    return f(irreducible_poly)


def _conjugate_matrix_rank(field, e: int) -> int:
    meta = field._meta
    hf = get_host_field(meta)
    p, m = meta.characteristic, meta.degree
    rows = []
    cur = e
    for _ in range(m):
        rows.append(meta.int_to_digits(cur))
        cur = hf.power(cur, p)
    A = [[int(v) for v in row] for row in rows]
    rank = 0
    col = 0
    while rank < m and col < m:
        piv = next((r for r in range(rank, m) if A[r][col] % p != 0), None)
        if piv is None:
            col += 1
            continue
        A[rank], A[piv] = A[piv], A[rank]
        inv = pow(A[rank][col], -1, p)
        A[rank] = [(v * inv) % p for v in A[rank]]
        for r in range(m):
            if r != rank and A[r][col] % p:
                fac = A[r][col]
                A[r] = [(v - fac * w) % p for v, w in zip(A[r], A[rank])]
        rank += 1
        col += 1
    return rank


def is_normal_element(element, irreducible_poly: Poly) -> bool:
    """Whether `element` (PolyLike over GF(q)) is normal in
    GF(q^m) = GF(q)[x]/(irreducible_poly)."""
    from ._primitive_element import _element_to_int

    field = _field_from_poly(irreducible_poly)
    e = _element_to_int(element, field)
    if not 0 < e < field.order:
        return False
    return _conjugate_matrix_rank(field, e) == irreducible_poly.degree


def normal_element(irreducible_poly: Poly, method: str = "min") -> Poly:
    """Find a normal element of GF(q^m) = GF(q)[x]/(f)
    (reference: src/galois/_fields/_normal_element.py:189)."""
    if method not in ("min", "max", "random"):
        raise ValueError(f"Argument 'method' must be in ['min', 'max', 'random'], not {method!r}.")
    if irreducible_poly.degree < 1 or not irreducible_poly.is_irreducible():
        raise ValueError(f"Argument 'irreducible_poly' must be irreducible with degree >= 1.")
    field = _field_from_poly(irreducible_poly)
    m = irreducible_poly.degree
    q = field.order
    sub = field.prime_subfield
    if method == "min":
        rng = range(1, q)
    elif method == "max":
        rng = range(q - 1, 0, -1)
    else:
        r = _random.Random()
        while True:
            e = r.randrange(1, q)
            if _conjugate_matrix_rank(field, e) == m:
                return Poly.Int(e, field=sub)
    for e in rng:
        if _conjugate_matrix_rank(field, e) == m:
            return Poly.Int(e, field=sub)
    raise RuntimeError("No normal element found.")


def normal_elements(irreducible_poly: Poly) -> list:
    """All normal elements (reference: src/galois/_fields/_normal_element.py:303)."""
    field = _field_from_poly(irreducible_poly)
    m = irreducible_poly.degree
    sub = field.prime_subfield
    return [
        Poly.Int(e, field=sub)
        for e in range(1, field.order)
        if _conjugate_matrix_rank(field, e) == m
    ]
