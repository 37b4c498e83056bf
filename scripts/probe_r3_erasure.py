"""TPU probe: cost of the erasure decoder's per-row syndrome shift.

Times (a) the take_along_axis gather shift used in codes/_decoder.py step 4,
(b) a select-over-rolls formulation, and (c) the full erasure vs erasure-free
decoders, so the remaining 1.57x erasure-path overhead can be attributed.
Run alone on the TPU (single tenant).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def block(x):
    for t in jax.tree_util.tree_leaves(x):
        if hasattr(t, "ndim"):
            np.asarray(t if t.ndim == 0 else t.reshape(-1)[:1])
            return


def timeit(f, *args, reps=5):
    block(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        block(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import galois_tpu as gt
    from galois_tpu.codes._decoder import make_decoder

    B, nroots = 16384, 32
    key_u = (jnp.arange(B, dtype=jnp.int32) * 7) % 16
    Sp = (jnp.arange(B * nroots, dtype=jnp.uint32) % 255).astype(jnp.uint8).reshape(B, nroots)

    @jax.jit
    def shift_gather(Sp, u):
        idx = jnp.minimum(u[:, None] + jnp.arange(nroots)[None, :], nroots - 1)
        return jnp.where(
            jnp.arange(nroots)[None, :] < (nroots - u[:, None]),
            jnp.take_along_axis(Sp, idx, axis=1), 0,
        )

    @jax.jit
    def shift_rolls(Sp, u):
        out = jnp.zeros_like(Sp)
        for k in range(nroots):
            out = jnp.where(u[:, None] == k, jnp.roll(Sp, -k, axis=1), out)
        return jnp.where(jnp.arange(nroots)[None, :] < (nroots - u[:, None]), out, 0)

    a = np.asarray(shift_gather(Sp, key_u))
    b = np.asarray(shift_rolls(Sp, key_u))
    print("shift equal:", np.array_equal(a, b))
    print(f"gather shift: {timeit(shift_gather, Sp, key_u)*1e3:.3f} ms")
    print(f"roll   shift: {timeit(shift_rolls, Sp, key_u)*1e3:.3f} ms")

    rs = gt.ReedSolomon(255, 223)
    fmeta = rs.field._meta
    dec0 = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=False)
    dec1 = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=True)
    r = (jnp.arange(B * 255, dtype=jnp.uint32) % 255).astype(jnp.uint8).reshape(B, 255)
    era = jnp.zeros((B, 255), dtype=bool).at[:, 7].set(True)
    t0 = timeit(dec0, r)
    t1 = timeit(dec1, r, era)
    print(f"erasure-free decode: {t0*1e3:.2f} ms ({B/t0:,.0f} cw/s)")
    print(f"erasure      decode: {t1*1e3:.2f} ms ({B/t1:,.0f} cw/s)  overhead {t1/t0:.2f}x")


if __name__ == "__main__":
    main()

def pallas_check():
    import galois_tpu as gt
    from galois_tpu.ops._pallas import goldilocks_multiply_pallas
    from galois_tpu.ops._kernels import get_ops

    p = 2**64 - 2**32 + 1
    F = gt.GF(p)
    ops = get_ops(F._meta, "jit-calculate")
    Ng = 2**22
    a = (jnp.arange(4 * Ng, dtype=jnp.uint32) * 2654435761 >> 11).astype(jnp.uint16).reshape(4, Ng)
    b = (jnp.arange(4 * Ng, dtype=jnp.uint32) * 2246822519 >> 9).astype(jnp.uint16).reshape(4, Ng)
    got = goldilocks_multiply_pallas(a, b, False)
    exp = jax.jit(ops.multiply)(a[:, :4096], b[:, :4096])
    ok = bool(jnp.all(got[:, :4096] == exp))
    print("goldilocks pallas lowers:", ok)
    if ok:
        t = timeit(lambda x, y: goldilocks_multiply_pallas(x, y, False), a, b)
        print(f"goldilocks pallas single: {t*1e3:.2f} ms ({Ng/t/1e9:.2f} Gops/s)")
        xops = timeit(jax.jit(ops.multiply), a, b)
        print(f"goldilocks XLA single:    {xops*1e3:.2f} ms ({Ng/xops/1e9:.2f} Gops/s)")


if __name__ == "__main__":
    pallas_check()
