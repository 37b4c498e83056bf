"""Tiled Pallas kernels for elementwise field multiplies.

These mirror the jnp kernels in ops/_kernels.py with explicit VMEM tiling:
each grid step streams one (8, 1024) block HBM -> VMEM -> compute -> HBM.
They exist to (a) pin the memory schedule for the hottest ops independent of
XLA's fuser and (b) serve as the template for future fused pipelines (NTT
stages, decoder steps).

Mosaic (the TPU Pallas backend) restrictions honored here:
- no 64-bit integers inside kernels — the prime kernel does the 62-bit
  product in u32 halves and reduces with the Mersenne fold (2^31 === 1);
- no integer `%` / division — reduction is shifts + adds + compares only;
- masked accumulation uses `jnp.where` selects, not multiplies by 0/1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import is cheap but keep failures soft for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_ENABLED = os.environ.get("GALOIS_TPU_PALLAS", "") == "1"

_BLOCK = 8 * 1024  # one (8, 1024) tile of u32 lanes

_M31 = 2**31 - 1


def enabled() -> bool:
    return _ENABLED and _HAVE_PALLAS


def enable(flag: bool = True) -> None:
    global _ENABLED
    _ENABLED = flag


def _pad_to_block(x):
    n = x.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x, n


def _tiled_call(kernel, a32, b32, interpret):
    rows = a32.shape[0] // 1024
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1024), jnp.uint32),
        grid=(rows // 8,),
        in_specs=[
            pl.BlockSpec((8, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a32.reshape(rows, 1024), b32.reshape(rows, 1024))


@functools.partial(jax.jit, static_argnums=(0,))
def pallas_probe(interpret: bool = False):
    """Trivial copy kernel: distinguishes 'Mosaic unavailable through the
    remote compile path' from 'this particular kernel fails to lower'."""

    def kernel(a_ref, o_ref):
        o_ref[:] = a_ref[:] + jnp.uint32(1)

    x = jnp.zeros((8, 1024), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.uint32),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnums=(2, 3))
def prime_multiply_pallas(a, b, p: int, interpret: bool = False):
    """(a * b) mod p for 1-D arrays with p = 2^31 - 1 (Mersenne-31).

    All-u32 kernel: the 62-bit product is formed from 16-bit halves
    (P = phi*2^32 + plo) and reduced with 2^31 === 1 (mod p), so
    2^32 === 2 and P === plo + 2*phi. The fold x -> (x & p) + (x >> 31)
    preserves the residue; two folds bring any u32 below 2^31.
    """
    if p != _M31:
        raise ValueError(
            "prime_multiply_pallas supports p = 2^31 - 1 only (Mosaic has no "
            "64-bit ints or integer division; general p uses the XLA kernel)"
        )
    orig_dtype = a.dtype
    a32 = a.astype(jnp.uint32).reshape(-1)
    b32 = b.astype(jnp.uint32).reshape(-1)
    a32, n = _pad_to_block(a32)
    b32, _ = _pad_to_block(b32)

    def kernel(a_ref, b_ref, o_ref):
        P31 = jnp.uint32(_M31)
        LO16 = jnp.uint32(0xFFFF)

        def fold(x):
            return (x & P31) + (x >> 31)

        av = a_ref[:]
        bv = b_ref[:]
        a0 = av & LO16
        a1 = av >> 16  # < 2^15 for canonical inputs
        b0 = bv & LO16
        b1 = bv >> 16
        ll = a0 * b0  # < 2^32
        lh = a0 * b1 + a1 * b0  # < 2^31 + 2^31, no u32 overflow
        hh = a1 * b1  # < 2^30
        t = (lh & LO16) << 16
        plo = t + ll  # low 64-bit word (mod 2^32)
        carry = jnp.where(plo < t, jnp.uint32(1), jnp.uint32(0))
        phi = hh + (lh >> 16) + carry  # < 2^30 + 2^16 + 1
        r1 = fold(fold(plo))  # <= p, === plo (mod p)
        phi2 = fold(fold(phi << 1))  # <= p, === 2*phi (mod p)
        r = fold(fold(r1 + phi2))  # <= p
        o_ref[:] = jnp.where(r == P31, jnp.uint32(0), r)

    out = _tiled_call(kernel, a32, b32, interpret)
    return out.reshape(-1)[:n].astype(orig_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gf2m_multiply_pallas(a, b, m: int, f_int: int, interpret: bool = False):
    """Carry-less multiply + reduction for GF(2^m), m <= 16, 1-D arrays."""
    orig_dtype = a.dtype
    a32 = a.astype(jnp.uint32).reshape(-1)
    b32 = b.astype(jnp.uint32).reshape(-1)
    a32, n = _pad_to_block(a32)
    b32, _ = _pad_to_block(b32)

    def kernel(a_ref, b_ref, o_ref):
        zero = jnp.uint32(0)
        av = a_ref[:]
        bv = b_ref[:]
        acc = jnp.zeros_like(av)
        for i in range(m):
            acc = acc ^ jnp.where(((bv >> i) & 1) != 0, av << i, zero)
        for i in range(2 * m - 2, m - 1, -1):
            acc = acc ^ jnp.where(
                ((acc >> i) & 1) != 0, jnp.uint32(f_int << (i - m)), zero
            )
        o_ref[:] = acc

    out = _tiled_call(kernel, a32, b32, interpret)
    return out.reshape(-1)[:n].astype(orig_dtype)
