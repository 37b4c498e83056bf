"""Lagrange interpolating polynomial
(reference: src/galois/_polys/_lagrange.py:19-133)."""

from __future__ import annotations

import numpy as np

from . import _hostpoly as hp
from ._poly import Poly, _hf

__all__ = ["lagrange_poly"]


def lagrange_poly(x, y) -> Poly:
    """The unique degree < k polynomial through the k points (x_i, y_i)."""
    from ..fields._array import FieldArray

    if not isinstance(x, FieldArray) or not isinstance(y, FieldArray):
        raise TypeError("Arguments 'x' and 'y' must be FieldArrays.")
    field = type(x)
    if type(y)._meta != field._meta:
        raise TypeError(f"Arguments 'x' and 'y' must be over the same field.")
    if x.ndim != 1 or y.ndim != 1 or x.shape != y.shape:
        raise ValueError("Arguments 'x' and 'y' must be 1-D with equal shapes.")

    xs = [int(v) for v in np.asarray(x, dtype=object)]
    ys = [int(v) for v in np.asarray(y, dtype=object)]
    if len(set(xs)) != len(xs):
        raise ValueError("Argument 'x' must have unique elements.")

    F = _hf(field)
    k = len(xs)
    result = [0]
    for j in range(k):
        # ell_j(x) = prod_{i != j} (x - x_i) / (x_j - x_i)
        num = [1]
        denom = 1
        for i in range(k):
            if i == j:
                continue
            num = hp.mul(F, num, [F.negative(xs[i]), 1])
            denom = F.multiply(denom, F.subtract(xs[j], xs[i]))
        scale = F.multiply(ys[j], F.reciprocal(denom))
        result = hp.add(F, result, hp.scalar_mul(F, num, scale))
    return Poly._from_asc(result, field)
