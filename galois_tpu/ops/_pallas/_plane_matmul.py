"""Fused balanced-plane prime matmul on the MXU (Pallas).

The XLA formulation in ops/_linalg.py::_prime_matmul_planes runs the n^2
pair matmuls as separate dots whose int32 outputs round-trip HBM before an
elementwise fold. This kernel fuses the whole side:

  HBM reads:  data u32 tile + static table int8 planes (pre-stacked)
  in VMEM:    balanced-plane extraction of the data tile (int32 math),
              the extracted planes CONCATENATED so each grid cell issues
              ONE (n*bm, bk) @ (bk, n*bn) int8 MXU dot (hardware shootout,
              scripts/probe_r5c.py on v5e: one big dot = 12.4 ms/side vs
              17.3 for n^2 small dots vs ~19-20 for the XLA pair-dots path;
              a plain batched s8 matmul itself measures 58.5e12 MAC/s, so
              the fused kernel at 88.7e12 MAC/s beats XLA's own matmul),
              pair products accumulated into 2n-1 int32 diagonal scratch
              buffers across the K grid axis,
  epilogue:   diagonal fold  sum_s D_s * (2^(8s) mod p)  mod p entirely in
              u32 lanes (the Barrett mulmod from ops/_kernels.py — no
              64-bit emulation), one u32 tile written back.

Static-table operands are pre-stacked at plan-build time (stack_planes_*):
the stacked layout interleaves the n planes at block granularity so one
BlockSpec index picks the same tile of every plane.

Exactness bounds (enforced by `supports`, digits reach magnitude 128):
  - per-diagonal int32 sums: n_planes * K * 128^2 < 2^31
  - signed diagonal -> residue shortcut: |D_s| < p

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


# Block shape: bm x bn output tiles, bk contraction steps. Measured on v5e
# (scripts/probe_r5c.py): the single stacked (n*bm, bk)@(bk, n*bn) dot at
# these blocks runs the 4096^3 side in 12.4 ms (88.7e12 MAC/s); bigger
# tiles (bm=512, bk=1024) exceed VMEM and kill the Mosaic compile.
_BM, _BN, _BK = 256, 256, 512


def supports(p: int, M: int, K: int, N: int) -> bool:
    # Balanced digits reach magnitude 128 (_PLANE_MAXD in _linalg.py), so the
    # int32-exactness / |D_s| < p guard must use 128^2, not 127^2.
    from .._linalg import _PLANE_MAXD

    n_planes = balanced_plane_count(p)
    if n_planes * K * _PLANE_MAXD**2 >= min(2**31, p):
        return False
    return M % _BM == 0 and N % _BN == 0 and K % _BK == 0


def stack_planes_cols(planes: np.ndarray, bn: int = _BN) -> np.ndarray:
    """(n, K, N) int8 planes of a RIGHT operand -> (K, (N//bn)*n*bn): column
    block j holds the j-th bn-slice of every plane, so one BlockSpec column
    index picks the same tile of all n planes."""
    n, K, N = planes.shape
    nb = N // bn
    return np.ascontiguousarray(
        planes.reshape(n, K, nb, bn).transpose(1, 2, 0, 3).reshape(K, nb * n * bn)
    )


def stack_planes_rows(planes: np.ndarray, bm: int = _BM) -> np.ndarray:
    """(n, M, K) int8 planes of a LEFT operand -> ((M//bm)*n*bm, K): row
    block i holds the i-th bm-slice of every plane."""
    n, M, K = planes.shape
    nb = M // bm
    return np.ascontiguousarray(
        planes.reshape(n, nb, bm, K).transpose(1, 0, 2, 3).reshape(nb * n * bm, K)
    )


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


def _kernel_data_left(
    x_ref, b_ref, o_ref, acc_ref, a_cache, *, p: int, n_planes: int, transpose_out: bool
):
    """out = X @ B: x tile (1, bm, bk) u32 data, b tile (bk, n*bn) int8
    stacked. One MXU dot per grid cell: (n*bm, bk) @ (bk, n*bn).

    Grid (b, i, j, k), k innermost. The data tile's balanced-plane
    extraction is computed once per (b, i, k) — at j == 0 — into the
    a_cache scratch (K//bk, n*bm, bk); later j-blocks feed the dot straight
    from the cache (extraction was ~15% of each cell before caching).

    transpose_out=True writes each output tile transposed to a transposed
    out layout — the NTT's final (..., k1, k2) -> (..., k2, k1) swap for
    free (no separate 2-pass HBM transpose)."""
    j = pl.program_id(2)
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        planes = _extract_planes(x_ref[0], p, n_planes)
        for pi in range(n_planes):
            a_cache[k, pi * _BM : (pi + 1) * _BM, :] = planes[pi]

    prod = jnp.dot(a_cache[k], b_ref[...], preferred_element_type=jnp.int32)
    for i in range(n_planes):
        for jj in range(n_planes):
            acc_ref[i + jj] = acc_ref[i + jj] + prod[
                i * _BM : (i + 1) * _BM, jj * _BN : (jj + 1) * _BN
            ]

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        r = _fold_diagonals(acc_ref, p, n_planes)
        o_ref[0] = r.T if transpose_out else r


def _kernel_data_right(
    a_ref, x_ref, *rest, p: int, n_planes: int, fuse_t: bool
):
    """out = A @ X: a tile (n*bm, bk) int8 stacked table, x tile (1, bk, bn).

    Grid (b, j, i, k), k innermost. The data tile's extraction is computed
    once per (b, j, k) — at i == 0 — into b_cache (K//bk, bk, n*bn).
    fuse_t=True multiplies the folded output tile by a twiddle tile mod p
    in the epilogue (the NTT's elementwise twiddle for free)."""
    if fuse_t:
        t_ref, o_ref, acc_ref, b_cache = rest
    else:
        o_ref, acc_ref, b_cache = rest
    i = pl.program_id(2)
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        planes = _extract_planes(x_ref[0], p, n_planes)
        for pj in range(n_planes):
            b_cache[k, :, pj * _BN : (pj + 1) * _BN] = planes[pj]

    prod = jnp.dot(a_ref[...], b_cache[k], preferred_element_type=jnp.int32)
    for ii in range(n_planes):
        for jj in range(n_planes):
            acc_ref[ii + jj] = acc_ref[ii + jj] + prod[
                ii * _BM : (ii + 1) * _BM, jj * _BN : (jj + 1) * _BN
            ]

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        r = _fold_diagonals(acc_ref, p, n_planes)
        if fuse_t:
            r = _mulmod_u32m(r, t_ref[...], p)
        o_ref[0] = r


@functools.partial(jax.jit, static_argnames=("p", "interpret", "transpose_out"))
def plane_matmul_data_left(
    x, b_planes, p: int, interpret: bool = False, transpose_out: bool = False
):
    """(..., M, K) u32 data @ table planes -> (..., M, N) — or (..., N, M)
    with transpose_out=True (each tile written transposed; the NTT's final
    axis swap for free). ``b_planes`` is either raw (n, K, N) int8 planes
    or pre-stacked (K, (N//bn)*n*bn) via stack_planes_cols. Leading batch
    axes ride a native grid dimension (no data movement)."""
    n_planes = balanced_plane_count(p)
    if b_planes.ndim == 3:
        N = b_planes.shape[-1]
        nb = N // _BN
        b_planes = jnp.reshape(
            jnp.transpose(
                jnp.reshape(b_planes, (n_planes, -1, nb, _BN)), (1, 2, 0, 3)
            ),
            (b_planes.shape[1], nb * n_planes * _BN),
        )
    else:
        N = b_planes.shape[1] // n_planes
    batch = x.shape[:-2]
    M, K = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, M, K))
    B = xb.shape[0]
    grid = (B, M // _BM, N // _BN, K // _BK)
    out_shape = (B, N, M) if transpose_out else (B, M, N)
    out_spec = (
        pl.BlockSpec((1, _BN, _BM), lambda b, i, j, k: (b, j, i), memory_space=pltpu.VMEM)
        if transpose_out
        else pl.BlockSpec((1, _BM, _BN), lambda b, i, j, k: (b, i, j), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_data_left, p=p, n_planes=n_planes, transpose_out=transpose_out
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _BM, _BK), lambda b, i, j, k: (b, i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_BK, n_planes * _BN),
                lambda b, i, j, k: (k, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2 * n_planes - 1, _BM, _BN), jnp.int32),
            pltpu.VMEM((K // _BK, n_planes * _BM, _BK), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xb.astype(jnp.uint32), b_planes)
    tail = (N, M) if transpose_out else (M, N)
    return out.reshape(batch + tail)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def plane_matmul_data_right(a_planes, x, p: int, interpret: bool = False, twiddle=None):
    """Table planes @ (..., K, N) u32 data -> (..., M, N). ``a_planes`` is
    either raw (n, M, K) int8 planes or pre-stacked ((M//bm)*n*bm, K) via
    stack_planes_rows. Leading batch axes ride a native grid dimension.
    ``twiddle`` (M, N) u32 in [0, p), if given, multiplies the output
    elementwise mod p in the epilogue (the NTT twiddle stage for free)."""
    n_planes = balanced_plane_count(p)
    if a_planes.ndim == 3:
        M = a_planes.shape[1]
        nb = M // _BM
        a_planes = jnp.reshape(
            jnp.transpose(
                jnp.reshape(a_planes, (n_planes, nb, _BM, -1)), (1, 0, 2, 3)
            ),
            (nb * n_planes * _BM, a_planes.shape[-1]),
        )
    else:
        M = a_planes.shape[0] // n_planes
    batch = x.shape[:-2]
    K, N = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, K, N))
    B = xb.shape[0]
    grid = (B, N // _BN, M // _BM, K // _BK)
    fuse_t = twiddle is not None
    in_specs = [
        pl.BlockSpec(
            (n_planes * _BM, _BK), lambda b, j, i, k: (i, k), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, _BK, _BN), lambda b, j, i, k: (b, k, j), memory_space=pltpu.VMEM
        ),
    ]
    args = [a_planes, xb.astype(jnp.uint32)]
    if fuse_t:
        in_specs.append(
            pl.BlockSpec((_BM, _BN), lambda b, j, i, k: (i, j), memory_space=pltpu.VMEM)
        )
        args.append(twiddle.astype(jnp.uint32))
    out = pl.pallas_call(
        functools.partial(_kernel_data_right, p=p, n_planes=n_planes, fuse_t=fuse_t),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, _BM, _BN), lambda b, j, i, k: (b, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * n_planes - 1, _BM, _BN), jnp.int32),
            pltpu.VMEM((K // _BK, _BK, n_planes * _BN), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(batch + (M, N))
