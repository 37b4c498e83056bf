"""TPU probe: GF(2^8) mask-ladder clmul in u16 vs u32 lanes.

The product of two degree-7 polys fits 15 bits, so the whole ladder +
reduction can run in uint16. If XLA:TPU packs 16-bit elementwise ops two
per 32-bit lane, this halves the VPU cost of the compute-bound headline.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench


def ladder(dtype, f_int, m=8):
    R = f_int ^ (1 << m)
    r_bits = [k for k in range(R.bit_length()) if (R >> k) & 1]
    deg_r = max(r_bits) if r_bits else 0

    def mul(a, b):
        aw = a.astype(dtype)
        bw = b.astype(dtype)
        acc = jnp.zeros_like(aw)
        one = dtype.type(1)
        zero = dtype.type(0)
        for i in range(m):
            mask = zero - ((bw >> i) & one)
            acc = acc ^ ((aw << i) & mask)
        lo_mask = dtype.type((1 << m) - 1)
        width = 2 * m - 1
        c = acc
        while width > m:
            o = c >> m
            c = c & lo_mask
            for k in r_bits:
                c = c ^ (o << k)
            width = max(m, width - m + deg_r)
        return c.astype(jnp.uint8)

    return mul


def main():
    import galois_tpu as gt

    N = 2**26
    f_int = gt.GF(2**8)._meta.irreducible_poly_int
    a = (bench._dev_rand_u32(N, 1) % 255 + 1).astype(jnp.uint8)
    b = (bench._dev_rand_u32(N, 2) % 255 + 1).astype(jnp.uint8)
    m32 = ladder(jnp.dtype(jnp.uint32), f_int)
    m16 = ladder(jnp.dtype(jnp.uint16), f_int)
    import numpy as np

    same = bool(jnp.all(jax.jit(m32)(a[:65536], b[:65536]) == jax.jit(m16)(a[:65536], b[:65536])))
    print("u16 == u32:", same)
    print(f"floor {bench.dispatch_floor()*1e3:.1f} ms")
    t32 = bench.time_chained(m32, a, b)
    t16 = bench.time_chained(m16, a, b)
    print(f"u32 ladder chain: {N/t32/1e9:.1f} Gops/s")
    print(f"u16 ladder chain: {N/t16/1e9:.1f} Gops/s")


if __name__ == "__main__":
    main()
