"""TPU probe: where the Goldilocks storage-boundary multiply cost lives.

Compares, floor-corrected, at 2^23 elements:
  a) public-op chain: carry (4, N) u16 planar storage (split->mul_t->join/iter)
  b) tuple chain: carry 4x u32 planes (no storage round-trip)
  c) u32-storage chain: carry (4, N) u32 (stack/slice per iter, NO dtype repack)
  d) single op on u16 storage vs pre-split tuples
If (c) ~= (b) >> (a), the u16<->u32 sublane repack is the cost and u32
storage (or a Pallas edge kernel) is the fix.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench


def main():
    import galois_tpu as gt
    from galois_tpu.ops._kernels import get_ops

    F = gt.GF(2**64 - 2**32 + 1)
    ops = get_ops(F._meta, "jit-calculate")
    N = 2**23
    a16 = bench._dev_rand_u32(4 * N, 3).astype(jnp.uint16).reshape(4, N)
    b16 = bench._dev_rand_u32(4 * N, 4).astype(jnp.uint16).reshape(4, N)
    print(f"floor {bench.dispatch_floor()*1e3:.1f} ms, jitter {bench.floor_jitter()*1e3:.2f} ms")

    # a) storage chain (u16 planar, repack every iteration)
    t = bench.time_chained(ops.multiply, a16, b16)
    print(f"a) u16-storage chain : {N/t/1e9:6.2f} Gops/s")

    # b) tuple chain
    CH = bench.CHAIN

    @jax.jit
    def chain_t(x, y):
        yt = ops.split_limbs(y)
        acc = jax.lax.fori_loop(0, CH, lambda i, acc: ops.multiply_t(acc, yt), ops.split_limbs(x))
        return ops.join_limbs(acc)

    t = bench.corrected(bench.time_call(chain_t, a16, b16))
    print(f"b) u32-tuple chain   : {N/(t/CH)/1e9:6.2f} Gops/s")

    # c) u32-storage chain: stack/slice per iter, no dtype repack
    a32 = a16.astype(jnp.uint32)
    b32 = b16.astype(jnp.uint32)

    def mul32(x, y):
        xt = tuple(x[k] for k in range(4))
        yt = tuple(y[k] for k in range(4))
        return jnp.stack(ops.multiply_t(xt, yt), axis=0).astype(jnp.uint32)

    t = bench.time_chained(mul32, a32, b32)
    print(f"c) u32-storage chain : {N/t/1e9:6.2f} Gops/s")

    # d) single ops
    t = bench.time_single(ops.multiply, a16, b16)
    print(f"d) u16-storage single: {N/t/1e9:6.2f} Gops/s" if t else "d) single: sub-floor")
    t = bench.time_single(mul32, a32, b32)
    print(f"e) u32-storage single: {N/t/1e9:6.2f} Gops/s" if t else "e) single: sub-floor")


if __name__ == "__main__":
    main()
