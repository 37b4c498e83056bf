"""Round-2b hardware probes: GF(2^8) multiply variants + Goldilocks mult cost.

Run on the TPU (plain `python scripts/probe_r2b.py`, sitecustomize selects
axon). Prints one line per measurement to stderr. Designed for ONE run:
every variant is correctness-checked on device before timing.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax

if os.environ.get("GALOIS_PROBE_CPU"):
    # sitecustomize pre-imports jax with JAX_PLATFORMS=axon; shell env is
    # ignored, only a config update switches the backend.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

SMALL = bool(int(os.environ.get("GALOIS_PROBE_SMALL", "0")))
# 64-deep fused chains at 2^26 faulted the TPU worker in round 2; 16 is safe.
CHAIN = 4 if SMALL else 16


def say(*a):
    print(*a, file=sys.stderr, flush=True)


def block(x):
    for t in jax.tree_util.tree_leaves(x):
        if hasattr(t, "ndim"):
            np.asarray(t if t.ndim == 0 else t.reshape(-1)[:1])
            return


_FLOOR = None


def floor():
    global _FLOOR
    if _FLOOR is None:
        tiny = jnp.zeros((8,), jnp.uint8)
        f = jax.jit(lambda t: t + 1)
        block(f(tiny))
        _FLOOR = min(_t(f, tiny) for _ in range(8))
    return _FLOOR


def _t(f, *args):
    t0 = time.perf_counter()
    block(f(*args))
    return time.perf_counter() - t0


def best_of(f, *args, reps=3, warmup=1):
    for _ in range(warmup):
        block(f(*args))
    return min(_t(f, *args) for _ in range(reps))


def time_chain(op, x, b, n_ops=CHAIN):
    @jax.jit
    def chain(x, b):
        return jax.lax.fori_loop(0, n_ops, lambda i, acc: op(acc, b), x)

    t = best_of(chain, x, b) - floor()
    return t / n_ops


def rand_u32(n, seed):
    x = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed * 2654435761 % 2**32)
    x = x * jnp.uint32(2246822519)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(2654435761)
    return x ^ (x >> 13)


# ----------------------------------------------------------------------
# GF(2^8) multiply variants
# ----------------------------------------------------------------------

M, F = 8, 0x11D
R = F ^ (1 << M)  # 0x1D
R_BITS = [k for k in range(R.bit_length()) if (R >> k) & 1]
DEG_R = max(R_BITS)


def ladder_mask_mul(a, b):
    """1 elem/lane ladder: arithmetic-shift masks (no integer multiply) and
    constant-clmul two-round reduction instead of the 7-step select ladder."""
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    acc = jnp.zeros_like(ai)
    for i in range(M):
        mask = (bi << (31 - i)) >> 31
        acc = acc ^ ((ai << i) & mask)
    width = 2 * M - 1
    while width > M:
        hi = acc >> M
        t = hi ^ hi
        for k in R_BITS:
            t = t ^ (hi << k)
        acc = (acc & ((1 << M) - 1)) ^ t
        width = max(M, width - M + DEG_R)
    return acc.astype(jnp.uint8)


def swar_core_u32(A, B):
    from galois_tpu.ops._pallas._elementwise import _swar_mul_core

    return _swar_mul_core(A, B, M, F)


def swar_pallas_blk(a, b, blk_rows):
    """Local copy of gf2m_multiply_swar_pallas with a block-size knob."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from galois_tpu.ops._pallas._elementwise import _swar_mul_core

    af = a.reshape(-1)
    bf = b.reshape(-1)
    n = af.shape[0]
    BLK = blk_rows * 1024
    assert n % BLK == 0
    rows = n // 1024

    def kernel(a_ref, b_ref, o_ref):
        A = pltpu.bitcast(a_ref[:], jnp.uint32)
        B = pltpu.bitcast(b_ref[:], jnp.uint32)
        o_ref[:] = pltpu.bitcast(_swar_mul_core(A, B, M, F), jnp.uint8)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1024), jnp.uint8),
        grid=(rows // blk_rows,),
        in_specs=[
            pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_rows, 1024), lambda i: (i, i - i), memory_space=pltpu.VMEM),
    )(af.reshape(rows, 1024), bf.reshape(rows, 1024)).reshape(a.shape)


def swar_xla(a, b):
    """SWAR core in plain XLA: bitcast u8[4k] lanes to u32, no Pallas."""
    from galois_tpu.ops._pallas._elementwise import _swar_mul_core

    A = jax.lax.bitcast_convert_type(a.reshape(-1, 4), jnp.uint32)
    B = jax.lax.bitcast_convert_type(b.reshape(-1, 4), jnp.uint32)
    C = _swar_mul_core(A, B, M, F)
    return jax.lax.bitcast_convert_type(C, jnp.uint8).reshape(a.shape)


def time_batch(op, pairs):
    """K independent ops in ONE jit: amortizes the tunnel floor K-fold while
    keeping per-op HBM traffic identical to a real single op (K distinct
    input pairs, K outputs)."""

    @jax.jit
    def batch(pairs):
        return tuple(op(a, b) for a, b in pairs)

    t = best_of(batch, pairs) - floor()
    return t / len(pairs)


def main():
    say("backend:", jax.default_backend())
    say("floor_ms:", round(floor() * 1e3, 3))

    import galois_tpu as gt
    from galois_tpu.ops._kernels import get_ops

    N = 2**15 if SMALL else 2**26
    GF256 = gt.GF(2**8)
    ops = get_ops(GF256._meta, "jit-calculate")

    a = (rand_u32(N, 1) % 255 + 1).astype(jnp.uint8)
    b = (rand_u32(N, 2) % 255 + 1).astype(jnp.uint8)

    # -- correctness of the mask ladder (vs current ops.multiply) on device
    want = jax.jit(ops.multiply)(a[:4096], b[:4096])
    got = jax.jit(ladder_mask_mul)(a[:4096], b[:4096])
    say("mask_ladder_ok:", bool(jnp.all(want == got)))

    # -- baselines
    t = time_chain(ops.multiply, a, b)
    say(f"gf256 current ladder chain: {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")
    t = time_chain(ladder_mask_mul, a, b)
    say(f"gf256 mask ladder chain:    {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")

    # -- SWAR via plain-XLA bitcast (no Pallas): is the u8<->u32 relayout free?
    got = jax.jit(swar_xla)(a[:4096], b[:4096])
    say("swar_xla_ok:", bool(jnp.all(want == got[:4096])))
    t = time_chain(swar_xla, a, b)
    say(f"gf256 XLA-SWAR bitcast chain: {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")

    # -- SWAR core on pre-packed u32 (what the core costs if packing were free)
    A = rand_u32(N // 4, 3)
    B = rand_u32(N // 4, 4)
    t = time_chain(swar_core_u32, A, B)
    say(f"gf256 SWAR core (prepacked) chain: {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")

    # -- independent batches (K=8): per-op time with floor amortized 8x
    K = 2 if SMALL else 8
    pairs = tuple(
        ((rand_u32(N, 10 + k) % 255 + 1).astype(jnp.uint8), (rand_u32(N, 50 + k) % 255 + 1).astype(jnp.uint8))
        for k in range(K)
    )
    t = time_batch(ops.multiply, pairs)
    say(f"gf256 current ladder batch8: {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")
    t = time_batch(ladder_mask_mul, pairs)
    say(f"gf256 mask ladder batch8:    {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")

    # -- Pallas SWAR block sweep, correctness then batch timing (TPU only:
    # Mosaic kernels cannot lower on the CPU backend)
    if jax.default_backend() != "cpu":
        from galois_tpu.ops._pallas._elementwise import gf2m_multiply_swar_pallas

        got = gf2m_multiply_swar_pallas(a[: 1 << 20], b[: 1 << 20], M, F)
        say("pallas_swar_ok:", bool(jnp.all(got == jax.jit(ops.multiply)(a[: 1 << 20], b[: 1 << 20]))))
        for blk in (32, 64, 128, 256):
            op = functools.partial(swar_pallas_blk, blk_rows=blk)
            t = time_batch(op, pairs)
            say(f"gf256 pallas SWAR blk={blk} batch8: {N / t / 1e9:.1f} Gops/s ({t * 1e3:.2f} ms/op)")

    # -- XOR add batch: the HBM roofline reference point
    t = time_batch(lambda x, y: x ^ y, pairs)
    say(f"gf256 xor batch8: {N / t / 1e9:.1f} Gops/s ({N * 3 / t / 1e9:.0f} GB/s)")

    # ------------------------------------------------------------------
    # Primitive costs: u32 multiply emulation vs f32 multiply vs xor
    # ------------------------------------------------------------------
    Np = 2**14 if SMALL else 2**24
    x = rand_u32(Np, 7)
    y = rand_u32(Np, 8) | jnp.uint32(1)
    t = time_chain(lambda p, q: p * q, x, y)
    say(f"u32 mult chain: {Np / t / 1e9:.1f} Gops/s")
    t = time_chain(lambda p, q: p ^ q, x, y)
    say(f"u32 xor chain:  {Np / t / 1e9:.1f} Gops/s")
    t = time_chain(lambda p, q: (p & jnp.uint32(0xFFFF)) * (q & jnp.uint32(0xFFFF)), x, y)
    say(f"u32 16x16 mult chain: {Np / t / 1e9:.1f} Gops/s")
    xf = (x & jnp.uint32(0xFFFF)).astype(jnp.float32)
    yf = (y & jnp.uint32(0xFF)).astype(jnp.float32)
    t = time_chain(lambda p, q: p * q % jnp.float32(65536.0), xf, yf)
    say(f"f32 mult+mod chain: {Np / t / 1e9:.1f} Gops/s")

    # -- generic prime-field multiply: current u64 (a*b)%p vs the m31 kernel
    # (decides whether a u32 Montgomery/Barrett rewrite of PrimeOps for
    # 2^16 < p < 2^31 non-Mersenne is worth building)
    PGEN = 2097169  # the reference's headline prime field
    xg = x % jnp.uint32(PGEN)
    yg = y % jnp.uint32(PGEN)
    t = time_chain(lambda p_, q_: ((p_.astype(jnp.uint64) * q_.astype(jnp.uint64)) % PGEN).astype(jnp.uint32), xg, yg)
    say(f"u64 (a*b)%p chain [p=2097169]: {Np / t / 1e9:.1f} Gops/s")
    import galois_tpu as _gt
    from galois_tpu.ops._kernels import get_ops as _go
    _m31 = _go(_gt.GF(2**31 - 1)._meta, "jit-calculate")
    t = time_chain(_m31.multiply, x >> 1, y >> 1)
    say(f"m31 u32-fold mul chain (reference point): {Np / t / 1e9:.1f} Gops/s")

    # ------------------------------------------------------------------
    # Goldilocks multiply variants (tuple protocol, 2^23 elements)
    # ------------------------------------------------------------------
    GFg = gt.GF(2**64 - 2**32 + 1)
    og = get_ops(GFg._meta, "jit-calculate")
    Ng = 2**13 if SMALL else 2**23
    P = 2**64 - 2**32 + 1

    def rand_gl(seed):
        lo = rand_u32(Ng, seed)
        hi = rand_u32(Ng, seed + 100)
        hi = jnp.where(hi >= jnp.uint32(0xFFFFFFFF), jnp.uint32(0), hi)  # < p
        return tuple(
            v.astype(jnp.int32)
            for v in (
                lo & 0xFFFF,
                lo >> 16,
                hi & 0xFFFF,
                hi >> 16,
            )
        )

    at = rand_gl(21)
    bt = rand_gl(22)

    def mul_f32(dt_, et_):
        """multiply_t with the 16 u32 mults replaced by exact f32 pairs."""
        shape = jnp.broadcast_shapes(dt_[0].shape, et_[0].shape)
        d = [jnp.broadcast_to(v, shape).astype(jnp.float32) for v in dt_]
        el = [jnp.broadcast_to((v & 0xFF), shape).astype(jnp.float32) for v in et_]
        eh = [jnp.broadcast_to((v >> 8), shape).astype(jnp.float32) for v in et_]
        zero = jnp.zeros(shape, jnp.uint32)
        cols = [zero] * 8
        for i in range(4):
            for j in range(4):
                # d < 2^16, e split 8+8: both f32 products < 2^24 (exact)
                plo = (d[i] * el[j]).astype(jnp.uint32)
                phi = (d[i] * eh[j]).astype(jnp.uint32)
                prod = plo + (phi << 8)
                k = i + j
                cols[k] = cols[k] + (prod & 0xFFFF)
                cols[k + 1] = cols[k + 1] + (prod >> 16)
        g = []
        carry = zero
        for k in range(8):
            tt = cols[k] + carry
            g.append(tt & 0xFFFF)
            carry = tt >> 16
        return og._reduce_digits_128_t([v.astype(jnp.int32) for v in g])

    # correctness
    w = og.multiply_t(tuple(v[:4096] for v in at), tuple(v[:4096] for v in bt))
    g2 = jax.jit(mul_f32)(tuple(v[:4096] for v in at), tuple(v[:4096] for v in bt))
    say("goldi_f32_ok:", all(bool(jnp.all(wk == gk)) for wk, gk in zip(w, g2)))

    def chain_t(mult, x, y, n_ops=16):
        @jax.jit
        def run(x, y):
            return jax.lax.fori_loop(0, n_ops, lambda i, acc: mult(acc, y), x)

        t = best_of(run, x, y) - floor()
        return t / n_ops

    t = chain_t(og.multiply_t, at, bt)
    say(f"goldilocks multiply_t chain: {Ng / t / 1e9:.2f} Gops/s ({t * 1e3:.2f} ms/op)")
    t = chain_t(mul_f32, at, bt)
    say(f"goldilocks mul_f32 chain:    {Ng / t / 1e9:.2f} Gops/s ({t * 1e3:.2f} ms/op)")

    say("done")


if __name__ == "__main__":
    main()
