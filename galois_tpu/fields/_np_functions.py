"""NumPy __array_function__ dispatch for FieldArrays.

Mirrors the reference's overridden-function table
(reference: src/galois/_domains/_function.py:405-441 and _linalg.py:556-595):
np.convolve, np.fft.fft/ifft, np.dot/vdot/inner/outer, np.linalg.{det,
matrix_rank, solve, inv}, plus shape-manipulation passthroughs.
"""

from __future__ import annotations

import numpy as np


def dispatch(self, func, args, kwargs):
    from ..ops import _linalg

    cls = type(self)

    name = getattr(func, "__name__", str(func))
    module = getattr(func, "__module__", "")

    if func is np.convolve:
        from ..ops._convolve import convolve

        return convolve(*args, **kwargs)
    if func in (np.fft.fft, np.fft.ifft):
        from ..ops._ntt import field_fft, field_ifft

        fn = field_fft if func is np.fft.fft else field_ifft
        return fn(*args, **kwargs)
    if func is np.matmul or func is np.dot:
        a, b = args
        a = a if isinstance(a, cls) else cls(a)
        b = b if isinstance(b, cls) else cls(b)
        if a.ndim == 0 or b.ndim == 0:
            return a * b
        if a.ndim == 1 and b.ndim == 1:
            return _linalg.matmul(a, b)
        return _linalg.matmul(a, b)
    if func is np.inner:
        a, b = args
        return _linalg.matmul(cls(a), cls(b)) if a.ndim == 1 and b.ndim == 1 else _not_impl(name)
    if func is np.outer:
        a, b = args
        a, b = cls(a).flatten(), cls(b).flatten()
        return a.reshape(a.size, 1) * b.reshape(1, b.size)
    if func is np.vdot:
        a, b = args
        return _linalg.matmul(cls(a).flatten(), cls(b).flatten())
    if func is np.sum:
        return args[0].sum(axis=kwargs.get("axis", args[1] if len(args) > 1 else None))
    if func is np.prod:
        return args[0].prod(axis=kwargs.get("axis", args[1] if len(args) > 1 else None))
    if func is np.linalg.det:
        return _linalg.det(args[0])
    if func is np.linalg.inv:
        return _linalg.inv(args[0])
    if func is np.linalg.solve:
        return _linalg.solve(*args)
    if func is np.linalg.matrix_rank:
        return _linalg.matrix_rank(args[0])
    if func is np.linalg.matrix_power:
        A, n = args
        return _matrix_power(A, int(n))

    # Shape-manipulation functions that work on the int representation and
    # can be reconstructed without re-verification.
    _PASSTHROUGH = {
        np.reshape, np.ravel, np.transpose, np.concatenate, np.stack,
        np.vstack, np.hstack, np.dstack, np.column_stack, np.atleast_1d,
        np.atleast_2d, np.atleast_3d, np.squeeze, np.expand_dims, np.tile,
        np.repeat, np.roll, np.flip, np.fliplr, np.flipud, np.rot90,
        np.broadcast_to, np.split, np.array_split, np.hsplit, np.vsplit,
        np.dsplit, np.swapaxes, np.moveaxis, np.delete, np.insert, np.append,
        np.trace, np.tril, np.triu, np.diag, np.diagonal, np.sort, np.unique,
        np.count_nonzero, np.array_equal, np.allclose, np.isclose,
        np.may_share_memory, np.shares_memory, np.copy, np.resize,
    }
    if func in _PASSTHROUGH:
        from ._array import FieldArray

        def unwrap(x):
            if isinstance(x, FieldArray):
                return np.asarray(x, dtype=np.int64)
            if isinstance(x, (tuple, list)):
                return type(x)(unwrap(v) for v in x)
            return x

        new_args = [unwrap(a) for a in args]
        new_kwargs = {k: unwrap(v) for k, v in kwargs.items()}
        out = func(*new_args, **new_kwargs)
        if func in (np.count_nonzero, np.array_equal, np.allclose, np.isclose,
                    np.may_share_memory, np.shares_memory):
            return out
        if isinstance(out, (list, tuple)):
            return type(out)(cls(o) for o in out)
        if func is np.trace:
            # trace must use field addition
            A = args[0]
            d = np.diagonal(np.asarray(A, dtype=np.int64))
            acc = cls(0)
            for v in d:
                acc = acc + cls(int(v))
            return acc
        return cls(out)

    raise NotImplementedError(
        f"NumPy function {name!r} is not supported on {cls.name} arrays."
    )


def _matrix_power(A, n: int):
    from ..ops import _linalg

    cls = type(A)
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise np.linalg.LinAlgError("matrix_power requires a square matrix.")
    if n < 0:
        A = _linalg.inv(A)
        n = -n
    result = cls.Identity(A.shape[0])
    base = A
    while n:
        if n & 1:
            result = _linalg.matmul(result, base)
        base = _linalg.matmul(base, base)
        n >>= 1
    return result


def _not_impl(name):
    raise NotImplementedError(f"NumPy function {name!r} is not supported on FieldArrays.")
