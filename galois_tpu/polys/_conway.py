"""Conway polynomials (reference: src/galois/_polys/_conway.py:19-363).

Lookup goes to the packed Luebeck table (galois_tpu/_databases); `search=True`
falls back to the defining exhaustive search in Conway's lexicographic order.
"""

from __future__ import annotations

import functools
import itertools

from ..nt import divisors
from . import _hostpoly as hp
from ._poly import Poly, _hf
from ._primitive import is_primitive

__all__ = ["conway_poly", "is_conway", "is_conway_consistent"]


@functools.lru_cache(maxsize=None)
def conway_poly(characteristic: int, degree: int, search: bool = False) -> Poly:
    """The degree-`degree` Conway polynomial over GF(characteristic)
    (reference: src/galois/_polys/_conway.py:205-331)."""
    from ..fields import GF
    from ..nt import is_prime

    p, m = int(characteristic), int(degree)
    if not is_prime(p):
        raise ValueError(f"Argument 'characteristic' must be prime, not {p}.")
    if m < 1:
        raise ValueError(f"Argument 'degree' must be at least 1, not {m}.")
    field = GF(p)
    try:
        from .._databases import ConwayPolyDatabase

        degs, coeffs = ConwayPolyDatabase().fetch(p, m)
        return Poly.Degrees(degs, coeffs, field=field)
    except LookupError:
        if not search:
            raise LookupError(
                f"The Conway polynomial C_{{{p},{m}}} is not in the database. "
                "Pass search=True to run the (exponential-time) defining search."
            )
    return _conway_search(p, m)


def _conway_lex_key(poly: Poly):
    """Conway's ordering: compare the word w_i = (-1)^(m-i) * a_i (mod p) for
    i = m-1 .. 0 lexicographically (reference helper: _conway.py:332)."""
    p = poly.field.characteristic
    m = poly.degree
    asc = poly._asc()
    word = []
    for i in range(m - 1, -1, -1):
        a = asc[i] if i < len(asc) else 0
        word.append((a if (m - i) % 2 == 0 else (-a) % p))
    return tuple(word)


def _conway_search(p: int, m: int) -> Poly:
    from ..fields import GF

    field = GF(p)
    candidates = []
    for i in range(p**m, 2 * p**m):
        f = Poly.Int(i, field=field)
        candidates.append(f)
    candidates.sort(key=_conway_lex_key)
    for f in candidates:
        if is_conway_consistent(f):
            return f
    raise RuntimeError(f"No Conway polynomial found for GF({p}^{m}) — this should not happen.")


def is_conway(poly: Poly, search: bool = False) -> bool:
    """Whether `poly` equals the Conway polynomial C_{p,m}
    (reference: src/galois/_polys/_conway.py:19-105)."""
    p = poly.field.characteristic
    if poly.field.degree != 1:
        raise ValueError("Conway polynomials are defined over prime fields GF(p).")
    m = poly.degree
    return poly == conway_poly(p, m, search=search)


def is_conway_consistent(poly: Poly, search: bool = False) -> bool:
    """Whether `poly` is primitive and norm-compatible with the Conway
    polynomials of all proper divisor degrees:
    C_{p,d}( x^((p^m-1)/(p^d-1)) ) ≡ 0 (mod f(x)) for every d | m, d < m
    (reference: src/galois/_polys/_conway.py:106-204)."""
    field = poly.field
    p = field.characteristic
    if field.degree != 1:
        raise ValueError("Conway polynomials are defined over prime fields GF(p).")
    m = poly.degree
    if not poly.is_monic:
        return False
    if not is_primitive(poly):
        return False
    F = _hf(field)
    f = poly._asc()
    for d in divisors(m):
        if d == m:
            continue
        g = conway_poly(p, d, search=search)
        e = (p**m - 1) // (p**d - 1)
        # evaluate g at y = x^e mod f
        y = hp.pow_mod(F, [0, 1], e, f)
        acc = [0]
        for deg, coeff in zip(g._ensure_terms()._degrees, g._coeffs):
            term = hp.pow_mod(F, y, deg, f)
            acc = hp.add(F, acc, hp.scalar_mul(F, term, coeff))
        if hp.trim(hp.mod(F, acc, f)) != [0]:
            return False
    return True
