"""Root-finding for polynomials over GF(p^m).

Two paths, chosen by field size:
- small fields (order <= 2^20): device Chien scan — evaluate f at every
  field element in one batched Horner sweep (the vectorized analogue of the
  reference's roots_jit, src/galois/_polys/_dense.py:443-513);
- large fields: host factorization into linear factors (always exact,
  degree-bounded work instead of order-bounded).
"""

from __future__ import annotations

import numpy as np

from ..fields._meta import LOOKUP_TABLE_MAX_ORDER
from . import _hostpoly as hp
from ._poly import Poly, _hf

__all__ = ["poly_roots"]


def poly_roots(poly: Poly, multiplicity: bool = False):
    field = poly.field
    if poly.degree == 0:
        roots = field([])
        return (roots, np.array([], dtype=np.int64)) if multiplicity else roots

    if field.order <= LOOKUP_TABLE_MAX_ORDER and poly.degree < 10_000:
        roots_int = _chien_roots(poly)
    else:
        roots_int = _factor_roots(poly)

    roots_int = sorted(roots_int)
    roots = field(roots_int)
    if not multiplicity:
        return roots
    mults = np.array([_root_multiplicity(poly, r) for r in roots_int], dtype=np.int64)
    return roots, mults


def _chien_roots(poly: Poly):
    """Evaluate at all field elements on device; return int reprs of zeros."""
    from ..ops._poly_eval import evaluate

    field = poly.field
    x = field.elements
    vals = np.asarray(evaluate(poly, x), dtype=np.int64)
    elems = np.asarray(x, dtype=np.int64)
    return [int(e) for e in elems[vals == 0]]


def _factor_roots(poly: Poly):
    """Extract linear factors: g = gcd(f, x^q - x) computed as
    (x^q mod f) - x, then factor g into linear factors."""
    from ._factor import equal_degree_factors

    field = poly.field
    F = _hf(field)
    q = field.order
    f = poly._asc()
    f = hp.scalar_mul(F, f, F.reciprocal(f[-1]))
    xq = hp.pow_mod(F, [0, 1], q, f)
    g = hp.gcd(F, f, hp.sub(F, xq, [0, 1]))
    if hp.degree(g) < 1:
        return []
    linear_factors = equal_degree_factors(Poly._from_asc(g, field), 1)
    roots = []
    for lf in linear_factors:
        asc = lf._asc()  # x + c0 (monic)
        roots.append(F.negative(asc[0]))
    return roots


def _root_multiplicity(poly: Poly, root: int) -> int:
    """Multiplicity by explicit division by (x - root) — exact in any
    characteristic (the reference's derivative trick needs a char-p fallback
    anyway, src/galois/_polys/_poly.py:1672-1700)."""
    field = poly.field
    F = _hf(field)
    linear = Poly([1, F.negative(root)], field=field)
    mult = 0
    cur = poly
    while cur.degree >= 1:
        qout, r = divmod(cur, linear)
        if not r.is_zero:
            break
        mult += 1
        cur = qout
    return mult
