"""Polynomial factorization over GF(p^m).

Square-free (Yun), distinct-degree, and equal-degree (Cantor-Zassenhaus)
factorization, composed into `factors()` — same pipeline as the reference
(reference: src/galois/_polys/_factor.py:15-450), implemented on the host
exact-arithmetic layer (trace-time work).
"""

from __future__ import annotations

import random
from typing import List, Tuple

from . import _hostpoly as hp
from ._poly import Poly, _hf

__all__ = [
    "square_free_factors",
    "distinct_degree_factors",
    "equal_degree_factors",
    "factors",
    "is_square_free",
]


def _monic(F, f):
    if f == [0]:
        return f
    return hp.scalar_mul(F, f, F.reciprocal(f[-1]))


def square_free_factors(poly: Poly) -> Tuple[List[Poly], List[int]]:
    """Yun's algorithm adapted to characteristic p."""
    if poly.degree < 1:
        raise ValueError("The polynomial must have degree >= 1.")
    field = poly.field
    F = _hf(field)
    p = field.characteristic
    q = field.order
    m_exp = q // p  # q/p = p^(m-1); coefficient p-th roots are c^(q/p)

    f = _monic(F, poly._asc())
    factors_, multiplicities = [], []

    d = hp.derivative(F, f)
    if hp.trim(d) != [0]:
        c = hp.gcd(F, f, d)
        w = hp.divmod_(F, f, c)[0]
        i = 1
        while hp.degree(w) > 0:
            y = hp.gcd(F, w, c)
            z = hp.divmod_(F, w, y)[0]
            if hp.degree(z) > 0:
                factors_.append(z)
                multiplicities.append(i)
            w = y
            c = hp.divmod_(F, c, y)[0]
            i += 1
    else:
        c = f

    if hp.degree(c) > 0:
        # c(x) = g(x^p); take the p-th root of each coefficient.
        root = []
        for j in range(0, hp.degree(c) + 1, p):
            coef = c[j] if j < len(c) else 0
            root.append(F.power(coef, m_exp))
        sub_factors, sub_mults = square_free_factors(Poly._from_asc(root, field))
        for sf, sm in zip(sub_factors, sub_mults):
            factors_.append(sf._asc())
            multiplicities.append(sm * p)

    polys = [Poly._from_asc(fa if isinstance(fa, list) else fa, field) for fa in factors_]
    # sort by integer repr for determinism (reference sorts ascending)
    order = sorted(range(len(polys)), key=lambda k: int(polys[k]))
    return [polys[k] for k in order], [multiplicities[k] for k in order]


def distinct_degree_factors(poly: Poly) -> Tuple[List[Poly], List[int]]:
    """Splits a square-free monic poly into products of equal-degree
    irreducibles."""
    field = poly.field
    F = _hf(field)
    q = field.order
    f = _monic(F, poly._asc())
    n = hp.degree(f)

    factors_, degrees = [], []
    h = [0, 1]  # x
    d = 1
    while n >= 2 * d:
        h = hp.pow_mod(F, h, q, f)
        g = hp.gcd(F, f, hp.sub(F, h, [0, 1]))
        if hp.degree(g) > 0:
            factors_.append(g)
            degrees.append(d)
            f = hp.divmod_(F, f, g)[0]
            h = hp.mod(F, h, f)
            n = hp.degree(f)
        d += 1
    if n > 0:
        factors_.append(f)
        degrees.append(n)
    return [Poly._from_asc(fa, field) for fa in factors_], degrees


def equal_degree_factors(poly: Poly, degree: int, _rng=None) -> List[Poly]:
    """Cantor-Zassenhaus: factor a monic square-free product of
    degree-`degree` irreducibles into its irreducible factors."""
    field = poly.field
    F = _hf(field)
    q = field.order
    d = int(degree)
    f = _monic(F, poly._asc())
    n = hp.degree(f)
    if n % d != 0:
        raise ValueError(f"Polynomial degree {n} is not a multiple of {d}.")
    r = n // d
    if r == 1:
        return [Poly._from_asc(f, field)]

    rng = _rng or random.Random(0xC0FFEE ^ int(poly))

    def split(f):
        n_f = hp.degree(f)
        if n_f == d:
            return [f]
        while True:
            # random poly of degree < n_f
            h = [rng.randrange(q) for _ in range(n_f)]
            h = hp.trim(h)
            if hp.degree(h) < 1:
                continue
            g = hp.gcd(F, f, h)
            if hp.degree(g) == 0:
                if q % 2 == 1:
                    # t = h^((q^d - 1)/2) - 1
                    t = hp.pow_mod(F, h, (q**d - 1) // 2, f)
                    t = hp.sub(F, t, [1])
                else:
                    # even char: additive trace T(h) = sum h^(2^i), i < d*log2(q)
                    k = d * (q.bit_length() - 1)
                    t = [0]
                    cur = hp.mod(F, h, f)
                    for _ in range(k):
                        t = hp.add(F, t, cur)
                        cur = hp.mod(F, hp.mul(F, cur, cur), f)
                g = hp.gcd(F, f, t)
            if 0 < hp.degree(g) < n_f:
                g2 = hp.divmod_(F, f, g)[0]
                return split(g) + split(g2)

    out = [Poly._from_asc(fa, field) for fa in split(f)]
    return sorted(out, key=int)


def factors(poly: Poly) -> Tuple[List[Poly], List[int]]:
    """Complete factorization: SFF -> DDF -> EDF
    (reference: src/galois/_polys/_factor.py:369)."""
    if poly.degree < 1:
        raise ValueError("The polynomial must have degree >= 1.")
    field = poly.field
    F = _hf(field)
    lead = poly._ensure_terms()._coeffs[0]
    f = poly
    if lead != 1:
        f = f * Poly([F.reciprocal(lead)], field=field)

    all_factors: List[Poly] = []
    all_mults: List[int] = []
    sf_polys, sf_mults = square_free_factors(f)
    for sf, mult in zip(sf_polys, sf_mults):
        dd_polys, dd_degrees = distinct_degree_factors(sf)
        for dd, deg in zip(dd_polys, dd_degrees):
            for irr in equal_degree_factors(dd, deg):
                all_factors.append(irr)
                all_mults.append(mult)
    order = sorted(range(len(all_factors)), key=lambda k: int(all_factors[k]))
    return [all_factors[k] for k in order], [all_mults[k] for k in order]


def is_square_free(poly: Poly) -> bool:
    """f is square-free iff gcd(f, f') = 1 — with the char-p caveat that a
    vanishing derivative means a p-th power."""
    if poly.degree == 0:
        return True
    field = poly.field
    F = _hf(field)
    f = _monic(F, poly._asc())
    d = hp.derivative(F, f)
    if hp.trim(d) == [0]:
        return False
    return hp.gcd(F, f, d) == [1]
