"""TPU probe: decoder throughput after the one-shot sheared conv_trunc."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import bench  # floor-corrected timing helpers


def main():
    import galois_tpu as gt
    from galois_tpu.codes._decoder import make_decoder

    B = 16384
    rs = gt.ReedSolomon(255, 223)
    fmeta = rs.field._meta
    dec0 = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=False)
    dec1 = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=True)
    r = (bench._dev_rand_u32(B * 255, 5) % 255).astype(jnp.uint8).reshape(B, 255)
    era = jnp.zeros((B, 255), dtype=bool).at[:, 7].set(True)
    t0 = bench.corrected(bench.time_call(dec0, r, reps=5))
    t1 = bench.corrected(bench.time_call(dec1, r, era, reps=5))
    print(f"floor: {bench.dispatch_floor()*1e3:.1f} ms  jitter {bench.floor_jitter()*1e3:.2f} ms")
    print(f"erasure-free: {t0*1e3:.2f} ms ({B/t0:,.0f} cw/s)")
    print(f"erasure     : {t1*1e3:.2f} ms ({B/t1:,.0f} cw/s)  ratio {t1/t0:.2f}x")


if __name__ == "__main__":
    main()
