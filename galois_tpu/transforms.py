"""Public NTT API (reference: src/galois/_ntt.py:16-278)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .fields import GF
from .fields._array import FieldArray
from .nt import is_prime
from .ops._ntt import field_fft, field_ifft

__all__ = ["ntt", "intt"]


def ntt(x, size: Optional[int] = None, modulus: Optional[int] = None) -> FieldArray:
    """Number-theoretic transform of x over GF(modulus)."""
    if isinstance(x, FieldArray) and not type(x).is_prime_field:
        raise ValueError(f"If argument 'x' is a FieldArray, it must be over a prime field, not {type(x).name}.")
    if modulus is None and isinstance(x, FieldArray):
        modulus = type(x).characteristic
    return _ntt(x, size=size, modulus=modulus, forward=True)


def intt(
    X, size: Optional[int] = None, modulus: Optional[int] = None, scaled: bool = True
) -> FieldArray:
    """Inverse number-theoretic transform."""
    if isinstance(X, FieldArray) and not type(X).is_prime_field:
        raise ValueError(f"If argument 'X' is a FieldArray, it must be over a prime field, not {type(X).name}.")
    if modulus is None and isinstance(X, FieldArray):
        modulus = type(X).characteristic
    return _ntt(X, size=size, modulus=modulus, forward=False, scaled=scaled)


def _ntt(x, size=None, modulus=None, forward=True, scaled=True):
    arr = np.asarray(x if not isinstance(x, FieldArray) else np.asarray(x))
    if size is None:
        size = len(arr)
    if modulus is None:
        # The smallest prime p = m*size + 1 with p > max(x)
        # (reference: src/galois/_ntt.py:250-255).
        m = max(1, int(np.ceil(int(np.max(arr)) / size)))
        while not is_prime(m * size + 1):
            m += 1
        modulus = m * size + 1

    if size < len(arr):
        raise ValueError(f"Argument 'size' must be at least the input length {len(arr)}, not {size}.")
    if not is_prime(modulus):
        raise ValueError(f"Argument 'modulus' must be prime, {modulus} is not.")
    if (modulus - 1) % size != 0:
        raise ValueError("Argument 'modulus' must equal m * size + 1 for the transform size.")
    if not modulus > int(np.max(arr)):
        raise ValueError(f"Argument 'modulus' must exceed the max input value {int(np.max(arr))}.")

    field = GF(modulus)
    xf = field(arr)
    if forward:
        return field_fft(xf, n=size)
    norm = "backward" if scaled else "forward"
    return field_ifft(xf, n=size, norm=norm)
