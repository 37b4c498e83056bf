"""Tiled Pallas kernels for elementwise field multiplies.

These mirror the jnp kernels in ops/_kernels.py with explicit VMEM tiling:
each grid step streams one (8, 1024) block HBM -> VMEM -> compute -> HBM.
They exist to (a) pin the memory schedule for the hottest ops independent of
XLA's fuser and (b) serve as the template for future fused pipelines (NTT
stages, decoder steps).
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


@functools.partial(jax.jit, static_argnums=(2, 3))
def prime_multiply_pallas(a, b, p: int, interpret: bool = False):
    """(a * b) mod p for 1-D uint32 arrays, p < 2^32."""
    orig_dtype = a.dtype
    a32 = a.astype(jnp.uint32).reshape(-1)
    b32 = b.astype(jnp.uint32).reshape(-1)
    a32, n = _pad_to_block(a32)
    b32, _ = _pad_to_block(b32)
    rows = a32.shape[0] // 1024

    def kernel(a_ref, b_ref, o_ref):
        av = a_ref[:].astype(jnp.uint64)
        bv = b_ref[:].astype(jnp.uint64)
        o_ref[:] = ((av * bv) % jnp.uint64(p)).astype(jnp.uint32)

    out = pl.pallas_call(
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
    return out.reshape(-1)[:n].astype(orig_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gf2m_multiply_pallas(a, b, m: int, f_int: int, interpret: bool = False):
    """Carry-less multiply + reduction for GF(2^m), m <= 16, 1-D arrays."""
    orig_dtype = a.dtype
    a32 = a.astype(jnp.uint32).reshape(-1)
    b32 = b.astype(jnp.uint32).reshape(-1)
    a32, n = _pad_to_block(a32)
    b32, _ = _pad_to_block(b32)
    rows = a32.shape[0] // 1024

    def kernel(a_ref, b_ref, o_ref):
        av = a_ref[:]
        bv = b_ref[:]
        acc = jnp.zeros_like(av)
        for i in range(m):
            acc = acc ^ ((av << i) * ((bv >> i) & 1))
        for i in range(2 * m - 2, m - 1, -1):
            acc = acc ^ (jnp.uint32(f_int << (i - m)) * ((acc >> i) & 1))
        o_ref[:] = acc

    out = pl.pallas_call(
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
    return out.reshape(-1)[:n].astype(orig_dtype)
