"""MXU matmul for the Goldilocks prime field p = 2^64 - 2^32 + 1.

Limb-storage (4 x uint16) matrices cannot ride the int/float MXU paths in
ops/_linalg.py, and the generic scan contraction is latency-bound. Here the
64-bit values are decomposed into ten 7-bit int8 planes, all 100 plane pairs
run as exact int8 -> int32 MXU matmuls, the pair products are grouped by
diagonal s = i + j (19 int32 sums, each < 2^31 for block-K <= 13315), and the
weighted sum  X = sum_s D_s * (2^(7s) mod p)  is reduced with the same
2^64 === 2^32 - 1 identity as GoldilocksOps (ops/_kernels.py) in emulated-u64
lanes — the MXU does all the O(M K N) work; the combine is O(M N).

This is the TPU-native analogue of the reference's exact-float BLAS trick for
prime fields (reference: src/galois/_domains/_linalg.py:21-75), extended to a
64-bit field the reference can only handle in object dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GOLD_P = 2**64 - 2**32 + 1
_M32 = (1 << 32) - 1
_N_PLANES = 10  # ceil(64 / 7)
# worst diagonal has 10 plane pairs; keep D_s < 2^31 exactly
_MAX_BLOCK_K = (2**31 - 1) // (127 * 127 * _N_PLANES)


def supports(meta) -> bool:
    return (
        meta.storage == "limbs"
        and meta.is_prime_field
        and meta.characteristic == GOLD_P
        and meta.storage_width == 4
    )


def _to_u64(a):
    # planar limbs: (4, ...) leading axis
    aw = a.astype(jnp.uint64)
    return aw[0] | (aw[1] << 16) | (aw[2] << 32) | (aw[3] << 48)


def _from_u64(x, dtype):
    out = jnp.stack(
        [x & 0xFFFF, (x >> 16) & 0xFFFF, (x >> 32) & 0xFFFF, (x >> 48) & 0xFFFF],
        axis=0,
    )
    return out.astype(dtype)


def _canon(x):
    return jnp.where(x >= jnp.uint64(GOLD_P), x - jnp.uint64(GOLD_P), x)


def _gold_add(x, y):
    lo = x + y
    carried = lo < x  # wrapped past 2^64 = 2^32 - 1 (mod p)
    return _canon(jnp.where(carried, lo + jnp.uint64(_M32), lo))


def _gold_mul_small(d, w: int):
    """(d * w) mod p for d < 2^32 (u64 array) and constant w < p."""
    m32 = jnp.uint64(_M32)
    y0 = w & _M32
    y1 = w >> 32
    z00 = d * jnp.uint64(y0)  # < 2^64
    z01 = d * jnp.uint64(y1)
    lo = z00 + ((z01 & m32) << 32)
    carry = (lo < z00).astype(jnp.uint64)
    hi = (z01 >> 32) + carry  # < 2^32
    # n = hi*2^64 + lo; hi < 2^32 so h1 = 0 and n mod p = lo + hi*(2^32-1)
    u = hi * m32  # < 2^64
    r = lo + u
    carried = r < lo
    r = jnp.where(carried, r + m32, r)  # wrap adds 2^64 = +(2^32-1) mod p
    return _canon(r)


def goldilocks_matmul(meta, a, b):
    """a: (4, ..., M, K), b: (4, ..., K, N) planar uint16 limbs ->
    (4, ..., M, N)."""
    au = _to_u64(a)  # (..., M, K)
    bu = _to_u64(b)  # (..., K, N)
    K = au.shape[-1]
    acc = None
    for k0 in range(0, K, _MAX_BLOCK_K):
        k1 = min(K, k0 + _MAX_BLOCK_K)
        ab = au[..., k0:k1]
        bb = bu[..., k0:k1, :]
        a_planes = [((ab >> (7 * i)) & jnp.uint64(127)).astype(jnp.int8) for i in range(_N_PLANES)]
        b_planes = [((bb >> (7 * j)) & jnp.uint64(127)).astype(jnp.int8) for j in range(_N_PLANES)]
        diag = [None] * (2 * _N_PLANES - 1)
        for i in range(_N_PLANES):
            for j in range(_N_PLANES):
                c = jnp.matmul(a_planes[i], b_planes[j], preferred_element_type=jnp.int32)
                s = i + j
                diag[s] = c if diag[s] is None else diag[s] + c
        blk = None
        for s, d in enumerate(diag):
            term = _gold_mul_small(d.astype(jnp.uint64), pow(2, 7 * s, GOLD_P))
            blk = term if blk is None else _gold_add(blk, term)
        acc = blk if acc is None else _gold_add(acc, blk)
    return _from_u64(acc, a.dtype)
