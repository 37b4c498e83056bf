"""Primitive elements of GF(p^m)
(reference: src/galois/_fields/_primitive_element.py:19-410)."""

from __future__ import annotations

import random as _random
from typing import Optional

import numpy as np

from ..nt import factors, totatives
from ..polys._poly import Poly
from ._hostfield import HostField
from ._meta import FieldMeta

__all__ = ["is_primitive_element", "primitive_element", "primitive_elements"]


def _field_from_poly(irreducible_poly: Poly):
    """Construct GF(q^m) = GF(q)[x]/f for a degree-m irreducible f over GF(q)."""
    from ._factory import GF

    base = irreducible_poly.field
    if not base.is_prime_field:
        raise ValueError("Primitive-element search requires a prime base field GF(p).")
    p = base.characteristic
    m = irreducible_poly.degree
    return GF(p**m, irreducible_poly=int(irreducible_poly))


def is_primitive_element(element, irreducible_poly: Poly) -> bool:
    """Whether `element` (a PolyLike over GF(q)) generates the multiplicative
    group of GF(q^m) = GF(q)[x]/(irreducible_poly)."""
    field = _field_from_poly(irreducible_poly)
    e = _element_to_int(element, field)
    if not 0 < e < field.order:
        return False
    hf = HostField(field._meta)
    return hf.is_primitive_element(e)


def _element_to_int(element, field) -> int:
    from ..polys._conversions import str_to_integer

    if isinstance(element, Poly):
        return int(element)
    if isinstance(element, str):
        return str_to_integer(element, field.characteristic)
    return int(element)


def primitive_element(irreducible_poly: Poly, method: str = "min") -> Poly:
    """Find a primitive element of GF(q^m) = GF(q)[x]/f
    (reference: src/galois/_fields/_primitive_element.py:170)."""
    if method not in ("min", "max", "random"):
        raise ValueError(f"Argument 'method' must be in ['min', 'max', 'random'], not {method!r}.")
    field = _field_from_poly(irreducible_poly)
    hf = HostField(field._meta)
    q = field.order
    p = field.characteristic
    if method == "min":
        rng = range(1, q)
    elif method == "max":
        rng = range(q - 1, 0, -1)
    else:
        r = _random.Random()
        while True:
            e = r.randrange(1, q)
            if hf.is_primitive_element(e):
                return Poly.Int(e, field=field.prime_subfield)
    for e in rng:
        if hf.is_primitive_element(e):
            return Poly.Int(e, field=field.prime_subfield)
    raise RuntimeError("No primitive element found — is the polynomial irreducible?")


def primitive_elements(irreducible_poly: Poly) -> list:
    """All primitive elements, generated as powers of one primitive element
    with exponents coprime to q^m - 1
    (reference: src/galois/_fields/_primitive_element.py:305)."""
    field = _field_from_poly(irreducible_poly)
    hf = HostField(field._meta)
    alpha = int(primitive_element(irreducible_poly))
    elems = sorted(hf.power(alpha, k) for k in totatives(field.order - 1))
    return [Poly.Int(e, field=field.prime_subfield) for e in elems]
