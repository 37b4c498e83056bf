"""Polymorphic int/Poly API façade
(reference: src/galois/_polymorphic.py:38-652).

Each function dispatches on argument type: Python ints route to the integer
number-theory layer (galois_tpu.nt), Polys route to the polynomial layer.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

from . import nt as _nt
from .polys._factor import factors as _poly_factors
from .polys._factor import is_square_free as _poly_is_square_free
from .polys._functions import poly_crt, poly_egcd, poly_gcd, poly_lcm, poly_prod
from .polys._poly import Poly

__all__ = [
    "gcd",
    "egcd",
    "lcm",
    "prod",
    "are_coprime",
    "crt",
    "factors",
    "is_square_free",
]


def _is_int(x) -> bool:
    import numpy as np

    return isinstance(x, (int, np.integer))


def gcd(a, b):
    """Greatest common divisor of two ints or two Polys
    (reference: src/galois/_polymorphic.py:22-89)."""
    if _is_int(a) and _is_int(b):
        return _nt.gcd(int(a), int(b))
    if isinstance(a, Poly) and isinstance(b, Poly):
        return poly_gcd(a, b)
    raise TypeError(f"Arguments must both be ints or both be Polys, not {type(a)} and {type(b)}.")


def egcd(a, b):
    """Extended Euclidean algorithm: (d, s, t) with a s + b t = d
    (reference: src/galois/_polymorphic.py:92-170)."""
    if _is_int(a) and _is_int(b):
        return _nt.egcd(int(a), int(b))
    if isinstance(a, Poly) and isinstance(b, Poly):
        return poly_egcd(a, b)
    raise TypeError(f"Arguments must both be ints or both be Polys, not {type(a)} and {type(b)}.")


def lcm(*values):
    """Least common multiple of ints or Polys
    (reference: src/galois/_polymorphic.py:173-236)."""
    if all(_is_int(v) for v in values):
        return _nt.lcm(*[int(v) for v in values])
    if all(isinstance(v, Poly) for v in values):
        return poly_lcm(*values)
    raise TypeError("Arguments must all be ints or all be Polys.")


def prod(*values):
    """Product of ints or Polys (reference: src/galois/_polymorphic.py:239-300)."""
    if all(_is_int(v) for v in values):
        return _nt.prod(*[int(v) for v in values])
    if all(isinstance(v, Poly) for v in values):
        return poly_prod(*values)
    raise TypeError("Arguments must all be ints or all be Polys.")


def are_coprime(*values) -> bool:
    """Whether the arguments are PAIRWISE coprime — equivalently, their LCM
    equals their product (reference: src/galois/_polymorphic.py:313-386)."""
    if all(_is_int(v) for v in values):
        return _nt.lcm(*[int(v) for v in values]) == _nt.prod(*[int(v) for v in values])
    if all(isinstance(v, Poly) for v in values):
        l = poly_lcm(*values)
        p = poly_prod(*values)
        # compare up to a unit (leading coefficient)
        if p.is_zero:
            return l.is_zero
        from .polys._poly import _hf

        F = _hf(p.field)
        lead = p._ensure_terms()._coeffs[0]
        p_monic = p * Poly([F.reciprocal(lead)], field=p.field) if lead != 1 else p
        return l == p_monic
    raise TypeError("Arguments must all be ints or all be Polys.")


def crt(remainders: Sequence, moduli: Sequence):
    """Chinese remainder theorem over ints or Polys: the unique solution
    modulo the moduli's product (reference: src/galois/_polymorphic.py:389-475)."""
    if all(_is_int(v) for v in list(remainders) + list(moduli)):
        return _nt.crt([int(r) for r in remainders], [int(m) for m in moduli])
    if all(isinstance(v, Poly) for v in list(remainders) + list(moduli)):
        return poly_crt(list(remainders), list(moduli))
    raise TypeError("Arguments must all be ints or all be Polys.")


def factors(value):
    """Factor an int into primes or a Poly into irreducibles, with
    multiplicities (reference: src/galois/_polymorphic.py:478-565)."""
    if _is_int(value):
        return _nt.factors(int(value))
    if isinstance(value, Poly):
        return _poly_factors(value)
    raise TypeError(f"Argument must be an int or Poly, not {type(value)}.")


def is_square_free(value) -> bool:
    """Whether an int or Poly has no repeated factor
    (reference: src/galois/_polymorphic.py:568-639)."""
    if _is_int(value):
        return _nt.is_square_free(int(value))
    if isinstance(value, Poly):
        return _poly_is_square_free(value)
    raise TypeError(f"Argument must be an int or Poly, not {type(value)}.")
