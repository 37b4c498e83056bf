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
            pl.BlockSpec((8, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
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


def _gold_mul_digits(da, db):
    """Goldilocks product of 4x16-bit digit vectors -> 4 canonical digits.

    Mirrors GoldilocksOps.multiply_t (ops/_kernels.py): schoolbook 16x16
    products, 2^64 = 2^32 - 1 / 2^96 = -1 folds, signed carry propagation,
    conditional subtract of p. All in u32/i32 lanes."""
    zero = jnp.zeros_like(da[0])
    cols = [zero] * 8
    for i in range(4):
        for j in range(4):
            prod = da[i] * db[j]
            k = i + j
            cols[k] = cols[k] + (prod & 0xFFFF)
            cols[k + 1] = cols[k + 1] + (prod >> 16)
    g = []
    carry = zero
    for k in range(8):
        t = cols[k] + carry
        g.append(t & 0xFFFF)
        carry = t >> 16
    g = [x.astype(jnp.int32) for x in g]

    def prop4(cols):
        digs = []
        carry = jnp.zeros_like(cols[0])
        for c in cols:
            t = c + carry
            digs.append(t & 0xFFFF)
            carry = t >> 16
        return digs, carry

    cols = [g[0] - g[4] - g[6], g[1] - g[5] - g[7], g[2] + g[4], g[3] + g[5]]
    for _ in range(2):
        digs, carry = prop4(cols)
        cols = [digs[0] - carry, digs[1], digs[2] + carry, digs[3]]
    digs, _ = prop4(cols)
    # conditional subtract p = (1, 0, 0xFFFF, 0xFFFF) base-2^16
    P_DIGS = (1, 0, 0xFFFF, 0xFFFF)
    borrow = jnp.zeros_like(digs[0])
    diff = []
    for dk, pk in zip(digs, P_DIGS):
        t = dk - pk - borrow
        diff.append(t & 0xFFFF)
        borrow = (t >> 16) & 1
    ge = borrow == 0
    return [jnp.where(ge, df, dg).astype(jnp.uint32) for df, dg in zip(diff, digs)]


@functools.partial(jax.jit, static_argnums=(2,))
def goldilocks_multiply_pallas(a, b, interpret: bool = False):
    """Goldilocks multiply on PLANAR (4, ...) u16 limb storage.

    With the planar layout every limb plane is already a full-lane
    contiguous array, so the round-2 lane-roll de-interleave (which
    reconstructed exactly this layout from interleaved (..., 4) storage,
    at 1/4 lane utilization) is gone: the kernel streams four full-lane
    planes per operand through VMEM and computes the digit product at
    full lane utilization.
    """
    orig_shape = a.shape
    af = a.reshape(4, -1).astype(jnp.uint16)
    bf = b.reshape(4, -1).astype(jnp.uint16)
    n = af.shape[1]
    # 16 is the hardware-validated block for the per-plane kernel (the
    # 256-row config failed Mosaic's remote compile on v5e, round 3).
    blk_rows = int(os.environ.get("GALOIS_TPU_GOLD_BLK", "16"))
    if n < blk_rows * 1024:
        blk_rows = 16
    BLK = blk_rows * 1024
    pad = (-n) % BLK
    if pad:
        zeros = jnp.zeros((4, pad), jnp.uint16)
        af = jnp.concatenate([af, zeros], axis=1)
        bf = jnp.concatenate([bf, zeros], axis=1)
    rows = af.shape[1] // 1024

    # Each limb plane is its own 2-D ref: Mosaic lowers (R, 1024) u16
    # blocks natively, while a 3-D (4, R, 1024) block failed to compile on
    # hardware (remote compile helper exit 1, round-3 bench).
    def kernel(a0, a1, a2, a3, b0, b1, b2, b3, o0, o1, o2, o3):
        da = [r[:].astype(jnp.uint32) for r in (a0, a1, a2, a3)]
        db = [r[:].astype(jnp.uint32) for r in (b0, b1, b2, b3)]
        r = _gold_mul_digits(da, db)
        for o_ref, rk in zip((o0, o1, o2, o3), r):
            o_ref[:] = rk.astype(jnp.uint16)

    spec = pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, 1024), jnp.uint16)] * 4,
        grid=(rows // blk_rows,),
        in_specs=[spec] * 8,
        out_specs=[spec] * 4,
        interpret=interpret,
    )(*[af[j].reshape(rows, 1024) for j in range(4)], *[bf[j].reshape(rows, 1024) for j in range(4)])
    out = jnp.stack([o.reshape(-1)[:n] for o in outs], axis=0)
    return out.reshape(orig_shape)


# ----------------------------------------------------------------------
# EXP/LOG lookup kernels (jit-lookup mode on TPU)
# ----------------------------------------------------------------------
#
# XLA lowers table gathers catastrophically on TPU (~0.034 Gops/s for a
# 256-entry table at 2^26). Mosaic's `tpu.dynamic_gather` runs at VPU
# speed but requires source and index registers of identical (R, <=128)
# shape, so tables are served in 128-entry chunks: one per-lane gather
# per chunk plus a select tree on the chunk index. Measured: 11.7 Gops/s
# for a 256-entry gather at 2^24 on one v5e chip — 343x the XLA path.

_LOOKUP_BR = 256  # sublane rows per block; lanes fixed at 128


def _taa_lanes(src, idx):
    """take_along_axis(src, idx, axis=1) via an explicit int32 lax.gather
    in the exact form Mosaic lowers to tpu.dynamic_gather (x64 mode would
    make jnp.take_along_axis build int64 internals, which Mosaic rejects)."""
    from jax import lax

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        src,
        idx[..., None].astype(jnp.int32),
        dnums,
        slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_chunks(t_ref, idx, n_chunks: int, rows: int):
    """table[idx] with a (n_chunks*128,) VMEM table and (rows, 128) idx."""
    lo = idx & 127
    hi = idx >> 7
    res = None
    for c in range(n_chunks):
        tb = jnp.broadcast_to(t_ref[c * 128 : (c + 1) * 128].reshape(1, 128), (rows, 128))
        g = _taa_lanes(tb, lo)
        res = g if res is None else jnp.where(hi == c, g, res)
    return res


def _pad128(np_table):
    import numpy as _np

    t = _np.asarray(np_table, dtype=_np.int32)
    pad = (-len(t)) % 128
    if pad:
        t = _np.concatenate([t, _np.zeros(pad, _np.int32)])
    return t


def _lookup_call(kernel, n_elems, dtype, tables, idx_arrays, interpret):
    """Pad/reshape index arrays to (rows, 128) blocks and invoke."""
    BR = _LOOKUP_BR
    BLK = BR * 128
    flat = [x.reshape(-1).astype(jnp.int32) for x in idx_arrays]
    n = flat[0].shape[0]
    pad = (-n) % BLK
    if pad:
        zeros = jnp.zeros((pad,), jnp.int32)
        flat = [jnp.concatenate([x, zeros]) for x in flat]
    rows = flat[0].shape[0] // 128
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec((len(t),), lambda i: (i - i,), memory_space=pltpu.VMEM)
            for t in tables
        ]
        + [
            pl.BlockSpec((BR, 128), lambda i: (i, i - i), memory_space=pltpu.VMEM)
            for _ in flat
        ],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*tables, *[x.reshape(rows, 128) for x in flat])
    return out.reshape(-1)[:n].astype(dtype)


@functools.partial(jax.jit, static_argnums=(4, 5))
def lookup_multiply_pallas(a, b, exp_t, log_t, q: int, interpret: bool = False):
    """EXP[LOG[a] + LOG[b]] with zero masking; tables 128-padded int32."""
    n_log = log_t.shape[0] // 128
    n_exp = exp_t.shape[0] // 128
    BR = _LOOKUP_BR

    def kernel(exp_ref, log_ref, a_ref, b_ref, o_ref):
        av, bv = a_ref[:], b_ref[:]
        la = _gather_chunks(log_ref, av, n_log, BR)
        lb = _gather_chunks(log_ref, bv, n_log, BR)
        r = _gather_chunks(exp_ref, la + lb, n_exp, BR)
        o_ref[:] = jnp.where((av == 0) | (bv == 0), jnp.int32(0), r)

    return _lookup_call(kernel, a.size, a.dtype, (exp_t, log_t), (a, b), interpret).reshape(a.shape)


@functools.partial(jax.jit, static_argnums=(4, 5))
def lookup_divide_pallas(a, b, exp_t, log_t, q: int, interpret: bool = False):
    """EXP[LOG[a] + (q-1) - LOG[b]]; b == 0 is caller-validated."""
    n_log = log_t.shape[0] // 128
    n_exp = exp_t.shape[0] // 128
    BR = _LOOKUP_BR

    def kernel(exp_ref, log_ref, a_ref, b_ref, o_ref):
        av, bv = a_ref[:], b_ref[:]
        la = _gather_chunks(log_ref, av, n_log, BR)
        lb = _gather_chunks(log_ref, bv, n_log, BR)
        r = _gather_chunks(exp_ref, la + (q - 1) - lb, n_exp, BR)
        o_ref[:] = jnp.where(av == 0, jnp.int32(0), r)

    return _lookup_call(kernel, a.size, a.dtype, (exp_t, log_t), (a, b), interpret).reshape(a.shape)


@functools.partial(jax.jit, static_argnums=(3, 4))
def lookup_reciprocal_pallas(a, exp_t, log_t, q: int, interpret: bool = False):
    n_log = log_t.shape[0] // 128
    n_exp = exp_t.shape[0] // 128
    BR = _LOOKUP_BR

    def kernel(exp_ref, log_ref, a_ref, o_ref):
        av = a_ref[:]
        la = _gather_chunks(log_ref, av, n_log, BR)
        o_ref[:] = _gather_chunks(exp_ref, (q - 1) - la, n_exp, BR)

    return _lookup_call(kernel, a.size, a.dtype, (exp_t, log_t), (a,), interpret).reshape(a.shape)


@functools.partial(jax.jit, static_argnums=(2, 3))
def lookup_log_pallas(a, log_t, q: int, interpret: bool = False):
    n_log = log_t.shape[0] // 128
    BR = _LOOKUP_BR

    def kernel(log_ref, a_ref, o_ref):
        o_ref[:] = _gather_chunks(log_ref, a_ref[:], n_log, BR)

    return _lookup_call(kernel, a.size, a.dtype, (log_t,), (a,), interpret).reshape(a.shape)


def _swar_rep(v: int, slot_bits: int) -> "jnp.uint32":
    """Replicate an integer constant into every `slot_bits` slot of a u32."""
    return jnp.uint32(sum(v << (slot_bits * k) for k in range(32 // slot_bits)))


def _swar_fold(c, slot_bits: int, width: int, m: int, f: int):
    """Reduce `width`-bit slot values mod f inside `slot_bits` slots."""
    r = f ^ (1 << m)
    deg_r = max(0, r.bit_length() - 1)
    low_mask = _swar_rep((1 << m) - 1, slot_bits)
    while width > m:
        h = (c >> m) & _swar_rep((1 << (width - m)) - 1, slot_bits)
        t = c ^ c
        j = r
        while j:
            lsb = j & -j
            t = t ^ (h << (lsb.bit_length() - 1))
            j ^= lsb
        c = (c & low_mask) ^ t
        width = max(m, width - m + deg_r)
    return c


def _swar_nib_ladder(x, y, nbits: int):
    """Byte-slot carry-less multiply: x (<=4-bit slots) by nbits of y.

    The 0/1-per-byte bit expands to a 0x7F byte mask via (bit<<7)-bit —
    two cheap VPU ops instead of a 32-bit multiply; no borrow crosses a
    byte slot because each slot's minuend >= subtrahend.
    """
    ones = jnp.uint32(0x01010101)
    acc = x ^ x
    for i in range(nbits):
        bit = (y >> i) & ones
        acc = acc ^ ((x << i) & ((bit << 7) - bit))
    return acc


def _swar_mul_core(A, B, m: int, f: int):
    """GF(2^m) multiply, m <= 8, on u32 arrays holding 4 packed u8 elements.

    Nibble-Karatsuba keeps every partial product under 8 bits; the 15-bit
    products are re-slotted into 16-bit even/odd-byte slots for the constant
    reduction fold. ~3x fewer VPU ops per element than a 1-element/lane
    ladder. Element grouping inside a lane is irrelevant: every step is
    slot-local and pack/unpack are inverse bitcasts.
    """
    if m <= 4:
        return _swar_fold(_swar_nib_ladder(A, B, m), 8, 2 * m - 1, m, f)
    nib = jnp.uint32(0x0F0F0F0F)
    al, ah = A & nib, (A >> 4) & nib
    bl, bh = B & nib, (B >> 4) & nib
    ll = _swar_nib_ladder(al, bl, 4)
    hh = _swar_nib_ladder(ah, bh, m - 4)
    mm = _swar_nib_ladder(al ^ ah, bl ^ bh, 4)
    mid = mm ^ ll ^ hh
    m8 = jnp.uint32(0x00FF00FF)
    pe = ((hh & m8) << 8) ^ ((mid & m8) << 4) ^ (ll & m8)
    po = ((hh >> 8) & m8) << 8 ^ (((mid >> 8) & m8) << 4) ^ ((ll >> 8) & m8)
    pe = _swar_fold(pe, 16, 2 * m - 1, m, f)
    po = _swar_fold(po, 16, 2 * m - 1, m, f)
    return pe | (po << 8)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gf2m_multiply_swar_pallas(a, b, m: int, f_int: int, interpret: bool = False):
    """GF(2^m) multiply, m <= 8, with 4 u8 elements per u32 lane.

    The u8 -> u32 packing that makes SWAR pay is a catastrophic relayout in
    XLA (~1.5 Gops/s measured for a bare bitcast roundtrip at 2^26 on TPU);
    inside a Pallas kernel pltpu.bitcast is a free VMEM reinterpretation,
    so the packed core runs at its compute speed.
    """
    if not (2 <= m <= 8):
        raise ValueError("gf2m_multiply_swar_pallas supports 2 <= m <= 8.")
    orig_shape = a.shape
    orig_dtype = a.dtype
    af = a.reshape(-1).astype(jnp.uint8)
    bf = b.reshape(-1).astype(jnp.uint8)
    n = af.shape[0]
    blk_rows = int(os.environ.get("GALOIS_TPU_SWAR_BLK", "32"))
    if n < blk_rows * 1024:
        blk_rows = 32
    BLK = blk_rows * 1024
    pad = (-n) % BLK
    if pad:
        zeros = jnp.zeros((pad,), jnp.uint8)
        af = jnp.concatenate([af, zeros])
        bf = jnp.concatenate([bf, zeros])
    rows = af.shape[0] // 1024

    def kernel(a_ref, b_ref, o_ref):
        A = pltpu.bitcast(a_ref[:], jnp.uint32)
        B = pltpu.bitcast(b_ref[:], jnp.uint32)
        o_ref[:] = pltpu.bitcast(_swar_mul_core(A, B, m, f_int), jnp.uint8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1024), jnp.uint8),
        grid=(rows // blk_rows,),
        in_specs=[
            pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(af.reshape(rows, 1024), bf.reshape(rows, 1024))
    return out.reshape(-1)[:n].reshape(orig_shape).astype(orig_dtype)


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
