"""Batched polynomial evaluation on device.

Horner's rule as a lax.scan over the (static-length) coefficient sequence —
the TPU counterpart of the reference's prange-parallel elementwise kernel
(reference: src/galois/_polys/_dense.py:404-440). Coefficients travel as a
small device array; the element array can be arbitrarily large/sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields._meta import STORAGE_INT, FieldMeta
from ._kernels import get_ops

__all__ = ["evaluate", "evaluate_data"]


@functools.lru_cache(maxsize=None)
def _eval_kernel(meta: FieldMeta, mode: str):
    ops = get_ops(meta, mode)

    @jax.jit
    def run(coeffs, x):
        # coeffs: (n_coeffs, [w]) descending; x: (..., [w])
        def body(acc, c):
            return ops.add(ops.multiply(acc, x), c), None

        acc0 = ops.zero_like(x)
        acc, _ = jax.lax.scan(body, acc0, coeffs)
        return acc

    return run


def evaluate(poly, x):
    """Evaluate `poly` at FieldArray `x` elementwise; returns a FieldArray."""
    cls = type(x)
    meta = cls._meta
    mode = cls._mode
    if mode == "python-calculate":
        from ..fields._hostfield import get_host_field
        from ..polys import _hostpoly as hp

        hf = get_host_field(meta)
        asc = poly._asc()
        xi = np.asarray(x, dtype=object)
        out = np.frompyfunc(lambda v: hp.evaluate(hf, asc, int(v)), 1, 1)(xi)
        return cls(out if xi.ndim else int(out))

    coeffs_desc = [0] * (poly.degree + 1)
    for d, c in zip(poly._degrees, poly._coeffs):
        coeffs_desc[poly.degree - d] = c
    carr = _coeffs_to_device(meta, coeffs_desc)
    scalar = x.ndim == 0
    data = x._data[None] if scalar else x._data
    out = _eval_kernel(meta, mode)(carr, data)
    if scalar:
        out = out[0]
    return cls._view(out, x._dtype)


def evaluate_data(meta, mode, coeffs_desc, data):
    """Raw-data variant for internal callers."""
    carr = _coeffs_to_device(meta, list(coeffs_desc))
    return _eval_kernel(meta, mode)(carr, data)


def _coeffs_to_device(meta: FieldMeta, coeffs_desc):
    from ..fields._array import _ints_to_storage

    return _ints_to_storage(meta, np.asarray(coeffs_desc, dtype=object))
