"""Batched polynomial floor-division by a static monic divisor.

Synthetic division with a fixed trip count — the device analogue of the
reference's divmod_jit (reference: src/galois/_polys/_dense.py:126-198),
used for non-systematic cyclic-code message recovery."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields._meta import FieldMeta
from ._kernels import get_ops


@functools.lru_cache(maxsize=None)
def _floordiv_kernel(meta: FieldMeta, mode: str, n: int, g_coeffs: tuple, ks: int):
    """Divide descending-coefficient rows (B, n) by monic g (len deg+1)."""
    ops = get_ops(meta, mode)
    from ..fields._array import _ints_to_storage_np

    g = np.asarray(
        _ints_to_storage_np(meta, np.asarray(list(g_coeffs), dtype=object))
    )  # (deg+1, [w]) descending

    @jax.jit
    def run(c):
        # c: (B, n [, w]) descending. Quotient has n - deg coeffs; return
        # the last `ks` of them... quotient degree = n-1-deg -> ks = n-deg.
        deg = len(g_coeffs) - 1
        r = c
        qs = []
        for i in range(n - deg):
            qi = r[:, i] if meta.storage == "int" else r[:, i, :]
            qs.append(qi)
            # r[i:i+deg+1] -= qi * g
            gk = jnp.asarray(g)
            prod = ops.multiply(
                qi[:, None] if meta.storage == "int" else qi[:, None, :], gk
            )
            seg = jax.lax.dynamic_slice_in_dim(r, i, deg + 1, axis=1)
            seg = ops.subtract(seg, prod)
            r = jax.lax.dynamic_update_slice_in_dim(r, seg, i, axis=1)
        q = jnp.stack(qs, axis=1)
        return q[:, -ks:] if ks < q.shape[1] else q

    return run


def batched_floordiv(codeword, g_poly, ks: int):
    """codeword: FieldArray (B, n); returns quotient messages (B, ks)."""
    cls = type(codeword)
    meta = cls._meta
    mode = cls._mode if cls._mode != "python-calculate" else meta.default_ufunc_mode
    n = codeword.shape[-1]
    g_desc = tuple(int(v) for v in np.asarray(g_poly.coefficients(), dtype=object))
    out = _floordiv_kernel(meta, mode, n, g_desc, ks)(codeword._data)
    return cls._view(out, codeword._dtype)
