"""Fused balanced-plane prime matmul on the MXU (Pallas).

The XLA formulation in ops/_linalg.py::_prime_matmul_planes runs the 16
pair matmuls as separate dots whose int32 outputs round-trip HBM before an
elementwise fold — measured on the 2^24 NTT that puts each 4096^3 side at
~2.5x the pure-MXU floor. This kernel fuses the whole side:

  HBM reads:  data u32 tile + static table int8 planes
  in VMEM:    balanced-plane extraction of the data tile (int32 math),
              n^2 int8 MXU dots accumulated into 2n-1 int32 diagonal
              scratch buffers across the K grid axis,
  epilogue:   diagonal fold  sum_s D_s * (2^(8s) mod p)  mod p entirely in
              u32 lanes (the Barrett mulmod from ops/_kernels.py — no
              64-bit emulation), one u32 tile written back.

Exactness bounds (enforced by `supports`):
  - per-diagonal int32 sums: n_planes * K * 127^2 < 2^31
  - signed diagonal -> residue shortcut: |D_s| < p, i.e. p > n_planes*K*127^2

Reference analogue: the exact-float BLAS trick of
src/galois/_domains/_linalg.py:21-75, redesigned for the int8 MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._kernels import _addmod_u32, _mul_u32_full
from .._linalg import balanced_plane_count


def _u32_to_f32(x):
    """Exact u32 -> f32 for Mosaic (no direct uint32->float32 cast): split
    into 16-bit halves, convert each via int32."""
    hi = (x >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _mulmod_u32m(av, bv, p: int):
    """Mosaic-safe (av*bv) mod p for 2^16 < p < 2^32 — the Barrett pipeline
    of ops/_kernels.py::_mulmod_u32 with every u32<->f32 conversion routed
    through int32 (Mosaic has no uint32<->float32 casts)."""
    LO = jnp.uint32(0xFFFF)

    def mul2w_const(x, C):
        cl, ch = C & 0xFFFF, C >> 16
        xl = x & LO
        xh = x >> 16
        t0 = xl * jnp.uint32(cl)
        t1a = xl * jnp.uint32(ch)
        t1b = xh * jnp.uint32(cl)
        t2 = xh * jnp.uint32(ch)
        mid = (t1a & LO) << 16
        lo = t0 + mid
        ca = jnp.where(lo < mid, jnp.uint32(1), jnp.uint32(0))
        mid2 = (t1b & LO) << 16
        lo2 = lo + mid2
        cb = jnp.where(lo2 < mid2, jnp.uint32(1), jnp.uint32(0))
        hi = t2 + (t1a >> 16) + (t1b >> 16) + ca + cb
        return hi, lo2

    def add2w(h1, l1, h2, l2):
        lo = l1 + l2
        carry = jnp.where(lo < l1, jnp.uint32(1), jnp.uint32(0))
        return h1 + h2 + carry, lo

    phi, plo2 = _mul_u32_full(av, bv)
    c32 = (1 << 32) % p
    c48 = (1 << 48) % p
    h_a, l_a = mul2w_const(phi >> 16, c48)
    h_b, l_b = mul2w_const(phi & LO, c32)
    vh, vl = add2w(h_a, l_a, h_b, l_b)
    vh, vl = add2w(vh, vl, jnp.zeros_like(vh), plo2)
    # f32 quotient estimate (vh < 2^18 so exact via i32 conversion)
    fv = vh.astype(jnp.int32).astype(jnp.float32) * jnp.float32(4294967296.0) + _u32_to_f32(vl)
    q = pltpu.bitcast((fv * jnp.float32(1.0 / p)).astype(jnp.int32), jnp.uint32)
    qh, ql = mul2w_const(q, p)
    rl = vl - ql
    borrow = jnp.where(vl < ql, jnp.uint32(1), jnp.uint32(0))
    rh = vh - qh - borrow
    rhs = pltpu.bitcast(rh, jnp.int32)
    for _ in range(3):
        neg = rhs < jnp.int32(0)
        lo_add = rl + jnp.uint32(p)
        carry = jnp.where(lo_add < rl, jnp.int32(1), jnp.int32(0))
        rl = jnp.where(neg, lo_add, rl)
        rhs = jnp.where(neg, rhs + carry, rhs)
    for _ in range(3):
        ge = (rhs > jnp.int32(0)) | ((rhs == jnp.int32(0)) & (rl >= jnp.uint32(p)))
        lo_sub = rl - jnp.uint32(p)
        borrow = jnp.where(rl < jnp.uint32(p), jnp.int32(1), jnp.int32(0))
        rl = jnp.where(ge, lo_sub, rl)
        rhs = jnp.where(ge, rhs - borrow, rhs)
    return rl

# Block shape: bm x bn output tiles, bk contraction steps. acc scratch is
# (2n-1, bm, bn) int32 = 3.7 MB at the default for n=4 planes.
_BM, _BN, _BK = 256, 512, 512


def supports(p: int, M: int, K: int, N: int) -> bool:
    # Balanced digits reach magnitude 128 (_PLANE_MAXD in _linalg.py), so the
    # int32-exactness / |D_s| < p guard must use 128^2, not 127^2.
    from .._linalg import _PLANE_MAXD

    n_planes = balanced_plane_count(p)
    if n_planes * K * _PLANE_MAXD**2 >= min(2**31, p):
        return False
    return M % _BM == 0 and N % _BN == 0 and K % _BK == 0


def _extract_planes(xu, p: int, n_planes: int):
    """u32 residues in [0, p) -> n balanced int8 planes, all-32-bit math."""
    xs = jnp.where(xu > jnp.uint32(p // 2), xu - jnp.uint32(p), xu)
    xs = pltpu.bitcast(xs, jnp.int32)
    planes = []
    for _ in range(n_planes):
        d = ((xs + jnp.int32(128)) & jnp.int32(255)) - jnp.int32(128)
        planes.append(d.astype(jnp.int8))
        xs = (xs - d) >> 8
    return planes


def _fold_diagonals(acc_ref, p: int, n_planes: int):
    """(2n-1, bm, bn) int32 diagonal sums -> u32 residue tile."""
    r = None
    for s in range(2 * n_planes - 1):
        d = acc_ref[s]
        du = pltpu.bitcast(d, jnp.uint32)
        # |d| < p (supports() gate), so the signed value's residue is a
        # single wrap-add of p for negatives
        res = jnp.where(d < jnp.int32(0), du + jnp.uint32(p), du)
        w = pow(2, 8 * s, p)
        term = res if w == 1 else _mulmod_u32m(res, jnp.full_like(res, jnp.uint32(w)), p)
        r = term if r is None else _addmod_u32(r, term, p)
    return r


def _kernel_data_left(x_ref, b_ref, o_ref, acc_ref, *, p: int, n_planes: int):
    """out = X @ B: x tile (bm, bk) u32 data, b tile (n, bk, bn) int8."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_planes = _extract_planes(x_ref[...], p, n_planes)
    for i in range(n_planes):
        for j in range(n_planes):
            prod = jnp.dot(a_planes[i], b_ref[j], preferred_element_type=jnp.int32)
            s = i + j
            acc_ref[s] = acc_ref[s] + prod

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)


def _kernel_data_right(a_ref, x_ref, o_ref, acc_ref, *, p: int, n_planes: int):
    """out = A @ X: a tile (n, bm, bk) int8 table planes, x tile (bk, bn)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b_planes = _extract_planes(x_ref[...], p, n_planes)
    for i in range(n_planes):
        for j in range(n_planes):
            prod = jnp.dot(a_ref[i], b_planes[j], preferred_element_type=jnp.int32)
            s = i + j
            acc_ref[s] = acc_ref[s] + prod

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def plane_matmul_data_left(x, b_planes, p: int, interpret: bool = False):
    """(..., M, K) u32 data @ precomputed (n, K, N) int8 table planes ->
    (..., M, N). Leading batch axes fold into M (the tables are shared)."""
    n_planes = balanced_plane_count(p)
    batch = x.shape[:-2]
    M, K = x.shape[-2], x.shape[-1]
    if batch:
        x = x.reshape(-1, K)  # (B*M, K)
    Mf = x.shape[0]
    N = b_planes.shape[-1]
    grid = (Mf // _BM, N // _BN, K // _BK)
    out = pl.pallas_call(
        functools.partial(_kernel_data_left, p=p, n_planes=n_planes),
        out_shape=jax.ShapeDtypeStruct((Mf, N), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_planes, _BK, _BN),
                lambda i, j, k: (i - i, k, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_planes - 1, _BM, _BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.uint32), b_planes)
    return out.reshape(batch + (M, N)) if batch else out


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def plane_matmul_data_right(a_planes, x, p: int, interpret: bool = False):
    """Precomputed (n, M, K) int8 table planes @ (..., K, N) u32 data ->
    (..., M, N). Leading batch axes fold into N (the tables are shared);
    the fold costs one transpose each way, amortized over the matmul."""
    n_planes = balanced_plane_count(p)
    batch = x.shape[:-2]
    K, N = x.shape[-2], x.shape[-1]
    if batch:
        xb = x.reshape((-1, K, N))
        x = jnp.moveaxis(xb, 0, 1).reshape(K, -1)  # (K, B*N)
    Nf = x.shape[1]
    M = a_planes.shape[1]
    grid = (M // _BM, Nf // _BN, K // _BK)
    out = pl.pallas_call(
        functools.partial(_kernel_data_right, p=p, n_planes=n_planes),
        out_shape=jax.ShapeDtypeStruct((M, Nf), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_planes, _BM, _BK),
                lambda i, j, k: (i - i, i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_BK, _BN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_planes - 1, _BM, _BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a_planes, x.astype(jnp.uint32))
    if batch:
        out = jnp.moveaxis(out.reshape(M, -1, N), 1, 0)
        return out.reshape(batch + (M, N))
    return out
