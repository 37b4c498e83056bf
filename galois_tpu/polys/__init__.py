"""Polynomials over Galois fields."""

from ._conway import conway_poly, is_conway, is_conway_consistent
from ._irreducible import irreducible_poly, irreducible_polys, is_irreducible
from ._lagrange import lagrange_poly
from ._poly import Poly
from ._primitive import (
    is_primitive,
    matlab_primitive_poly,
    primitive_poly,
    primitive_polys,
)

__all__ = [
    "Poly",
    "irreducible_poly",
    "irreducible_polys",
    "is_irreducible",
    "primitive_poly",
    "primitive_polys",
    "is_primitive",
    "matlab_primitive_poly",
    "conway_poly",
    "is_conway",
    "is_conway_consistent",
    "lagrange_poly",
]
