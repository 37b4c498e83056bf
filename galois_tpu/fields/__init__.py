"""Galois-field arrays: the GF() factory and FieldArray classes."""

from ._array import FieldArray, FieldArrayMeta
from ._factory import GF, Field
from ._meta import FieldMeta
from . import _methods  # noqa: F401  (attaches matrix/Galois-theory methods)
from ._normal_element import is_normal_element, normal_element, normal_elements
from ._primitive_element import (
    is_primitive_element,
    primitive_element,
    primitive_elements,
)

# The canonical GF(2) class (reference: src/galois/_fields/_gf2.py:111).
GF2 = GF(2)

__all__ = [
    "GF", "Field", "FieldArray", "FieldArrayMeta", "FieldMeta", "GF2",
    "is_primitive_element", "primitive_element", "primitive_elements",
    "is_normal_element", "normal_element", "normal_elements",
]
