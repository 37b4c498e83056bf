"""The GF() class factory.

Manufactures FieldArray subclasses for GF(p^m), flyweight-cached per
(p, m, primitive element, irreducible poly), registered as JAX pytrees, and
made picklable (reference: src/galois/_fields/_factory.py:53-578).
"""

from __future__ import annotations

import copyreg
import functools
import types
from typing import Optional

import jax
import numpy as np

from ..nt import factors, is_prime, primitive_root
from ._array import FieldArray, FieldArrayMeta
from ._meta import FieldMeta

__all__ = ["GF", "Field"]

_FIELD_CACHE = {}


@functools.lru_cache(maxsize=None)
def _factor_prime_power(order: int):
    primes, exponents = factors(order)
    if len(primes) != 1:
        raise ValueError(
            f"Argument 'order' must be a prime power, not {order} = "
            + " * ".join(f"{p}^{e}" for p, e in zip(primes, exponents))
            + "."
        )
    return primes[0], exponents[0]


def GF(
    order: Optional[int] = None,
    degree: Optional[int] = None,
    *,
    irreducible_poly=None,
    primitive_element=None,
    verify: bool = True,
    compile: Optional[str] = None,
    repr: Optional[str] = None,
):
    """Create a FieldArray subclass for GF(p^m).

    Call as ``GF(order)`` or ``GF(characteristic, degree)``
    (reference: src/galois/_fields/_factory.py:27-53).
    """
    if degree is not None:
        characteristic = int(order)
        degree = int(degree)
        if verify and not is_prime(characteristic):
            raise ValueError(f"Argument 'characteristic' must be prime, not {characteristic}.")
        if degree < 1:
            raise ValueError(f"Argument 'degree' must be >= 1, not {degree}.")
        p, m = characteristic, degree
    else:
        order = int(order)
        p, m = _factor_prime_power(order)

    if m == 1:
        cls = _GF_prime(p, alpha=primitive_element, verify=verify)
    else:
        cls = _GF_extension(
            p, m, irreducible_poly=irreducible_poly, alpha=primitive_element, verify=verify
        )

    if compile is not None:
        cls.compile(compile)
    if repr is not None:
        cls.repr(repr)
    return cls


def Field(*args, **kwargs):
    """Deprecated alias of GF() (reference: src/galois/_fields/_factory.py:330)."""
    return GF(*args, **kwargs)


# ----------------------------------------------------------------------

def _poly_like_to_int(poly, p: int, m: int) -> int:
    """Coerce an irreducible-poly argument (int, str, Poly, coeff sequence)
    to its integer representation over GF(p)."""
    from ..polys._conversions import poly_to_integer, str_to_integer

    if isinstance(poly, (int, np.integer)):
        return int(poly)
    if isinstance(poly, str):
        return str_to_integer(poly, p)
    from ..polys._poly import Poly

    if isinstance(poly, Poly):
        return int(poly)
    if isinstance(poly, (list, tuple, np.ndarray)):
        return poly_to_integer([int(c) for c in poly], p)
    raise TypeError(f"Cannot interpret {type(poly)} as an irreducible polynomial.")


def _element_like_to_int(element, p: int, m: int) -> int:
    from ..polys._conversions import str_to_integer

    if isinstance(element, (int, np.integer)):
        return int(element)
    if isinstance(element, str):
        return str_to_integer(element, p)
    if isinstance(element, FieldArray):
        return int(element)
    raise TypeError(f"Cannot interpret {type(element)} as a field element.")


def _GF_prime(p: int, alpha=None, verify: bool = True):
    """GF(p): default alpha = smallest primitive root; irreducible poly is
    f(x) = x - alpha, integer repr 2p - alpha
    (reference: src/galois/_fields/_factory.py:364-429)."""
    if alpha is None:
        alpha = 1 if p == 2 else primitive_root(p)
    else:
        alpha = _element_like_to_int(alpha, p, 1) % p
        if verify and p > 2:
            from ..nt import is_primitive_root

            if not is_primitive_root(alpha, p):
                raise ValueError(
                    f"Argument 'primitive_element' must be a primitive root mod {p}, not {alpha}."
                )
    f_int = 2 * p - alpha if alpha > 0 else p
    return _make_class(p, 1, f_int, alpha)


def _GF_extension(p: int, m: int, irreducible_poly=None, alpha=None, verify: bool = True):
    """GF(p^m) (reference: src/galois/_fields/_factory.py:432-535)."""
    from ..polys._conversions import poly_to_integer

    verify_poly = verify
    verify_element = verify

    if irreducible_poly is None:
        # Default: the Conway polynomial — primitive, so x generates the field.
        from .._databases import ConwayPolyDatabase

        degrees, coeffs = ConwayPolyDatabase().fetch(p, m)
        f_int = sum(c * p**d for d, c in zip(degrees, coeffs))
        verify_poly = False
        if alpha is None:
            alpha = p  # x
            verify_element = False
    else:
        f_int = _poly_like_to_int(irreducible_poly, p, m)

    if not p**m <= f_int < 2 * p**m:
        raise ValueError(
            f"The irreducible polynomial must be monic of degree {m} over GF({p})."
        )

    if verify_poly and not _is_irreducible_int(f_int, p, m):
        from ..polys._conversions import integer_to_poly, poly_to_str

        raise ValueError(
            f"Argument 'irreducible_poly' must be irreducible, "
            f"{poly_to_str(integer_to_poly(f_int, p))} is not."
        )

    if alpha is None:
        # Search the smallest primitive element (reference default method="min").
        alpha = _smallest_primitive_element(p, m, f_int)
        verify_element = False
    else:
        alpha = _element_like_to_int(alpha, p, m)

    if verify_element:
        from ._hostfield import HostField

        trial = FieldMeta(p, m, f_int, alpha)
        if not HostField(trial).is_primitive_element(alpha):
            raise ValueError(
                f"Argument 'primitive_element' must be primitive, {alpha} is not."
            )

    return _make_class(p, m, f_int, alpha)


def _is_irreducible_int(f_int: int, p: int, m: int) -> bool:
    """Rabin's irreducibility test on the integer poly representation
    (reference algorithm: src/galois/_polys/_irreducible.py:29-124)."""
    from ..fields._hostfield import HostField
    from ..polys import _hostpoly as hp
    from ..polys._conversions import integer_to_poly

    if m == 1:
        return True
    base = GF(p)
    F = HostField(base._meta)
    f = integer_to_poly(f_int, p)[::-1]  # ascending
    if f[0] == 0:
        return False  # x divides f
    x = [0, 1]
    # x^(p^m) mod f must equal x
    h = x
    for _ in range(m):
        h = _frobenius_pow(F, h, p, f)
    if hp.trim(hp.sub(F, h, x)) != [0]:
        return False
    primes, _ = factors(m)
    for pi in primes:
        h = x
        for _ in range(m // pi):
            h = _frobenius_pow(F, h, p, f)
        g = hp.gcd(F, f, hp.sub(F, h, x))
        if g != [1]:
            return False
    return True


def _frobenius_pow(F, h, p: int, f):
    """h(x)^p mod f over GF(p)."""
    from ..polys import _hostpoly as hp

    return hp.pow_mod(F, h, p, f)


def _smallest_primitive_element(p: int, m: int, f_int: int) -> int:
    from ._hostfield import HostField

    trial_meta = FieldMeta(p, m, f_int, p)  # alpha placeholder
    hf = HostField(trial_meta)
    for a in range(p, p**m):  # degree >= 1 candidates first? reference uses min over all
        if hf.is_primitive_element(a):
            return a
    for a in range(2, p):
        if hf.is_primitive_element(a):
            return a
    raise RuntimeError("No primitive element found — is the polynomial irreducible?")


# ----------------------------------------------------------------------

def _make_class(p: int, m: int, f_int: int, alpha: int):
    key = (p, m, f_int, alpha)
    if key in _FIELD_CACHE:
        return _FIELD_CACHE[key]

    meta = FieldMeta(p, m, f_int, alpha)
    if m == 1:
        name = f"GF_{p}"
    else:
        name = f"GF_{p}_{m}"
    cls = FieldArrayMeta(name, (FieldArray,), {
        "_meta": meta,
        "_mode": meta.default_ufunc_mode,
        "_element_repr": "int",
    })
    cls.__doc__ = f"A FieldArray subclass over {meta.name}."

    jax.tree_util.register_pytree_node(
        cls,
        lambda x: ((x._data,), x._dtype),
        lambda dtype, children: cls._view(children[0], dtype),
    )

    _FIELD_CACHE[key] = cls
    return cls


# ----------------------------------------------------------------------
# Pickling of dynamically-created classes
# (reference: src/galois/_fields/_factory.py:538-578)
# ----------------------------------------------------------------------

def _reconstruct_field_class(p, m, f_int, alpha, mode, element_repr):
    cls = _make_class(p, m, f_int, alpha)
    cls._mode = mode
    cls._element_repr = element_repr
    return cls


def _reduce_field_class(cls):
    meta = cls._meta
    if meta is None:
        return cls.__qualname__
    return (
        _reconstruct_field_class,
        (
            meta.characteristic,
            meta.degree,
            meta.irreducible_poly_int,
            meta.primitive_element_int,
            cls._mode,
            cls._element_repr,
        ),
    )


copyreg.pickle(FieldArrayMeta, _reduce_field_class)


def _reconstruct_field_array(p, m, f_int, alpha, mode, element_repr, ints, dtype):
    cls = _reconstruct_field_class(p, m, f_int, alpha, mode, element_repr)
    x = cls(ints)
    return x.astype(dtype) if dtype is not np.object_ else x


def _reduce_field_array(x):
    cls = type(x)
    meta = cls._meta
    return (
        _reconstruct_field_array,
        (
            meta.characteristic,
            meta.degree,
            meta.irreducible_poly_int,
            meta.primitive_element_int,
            cls._mode,
            cls._element_repr,
            np.asarray(x, dtype=object),
            x.dtype,
        ),
    )


FieldArray.__reduce__ = lambda self: _reduce_field_array(self)
