"""Round-4 probe: validate the u8-plane switch ON HARDWARE and time the
NTT 2^24 with 16 plane pairs (was 25), plus decode-path timings.

Run on TPU from repo root:  timeout 1500 python scripts/probe_r4_u8check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def block(x):
    for t in jax.tree_util.tree_leaves(x):
        if hasattr(t, "ndim"):
            np.asarray(t if t.ndim == 0 else t.reshape(-1)[:1])
            return


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        block(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        block(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def floor_est():
    tiny = jnp.zeros((8,), jnp.uint8)
    f = jax.jit(lambda t: t + 1)
    block(f(tiny))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        block(f(tiny))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import galois_tpu as gt
    from galois_tpu.ops._linalg import _prime_matmul_planes

    print("backend:", jax.default_backend(), file=sys.stderr)
    fl = floor_est()
    print(f"dispatch floor: {fl*1e3:.1f} ms")

    # 1. u8 matmul NUMERIC check on device (incl. values > 127)
    rng = np.random.default_rng(0)
    A = rng.integers(0, 256, (64, 300), dtype=np.uint8)
    B = rng.integers(0, 256, (300, 64), dtype=np.uint8)
    got = np.asarray(
        jax.jit(lambda u, v: jnp.matmul(u, v, preferred_element_type=jnp.int32))(
            jnp.asarray(A), jnp.asarray(B)
        )
    )
    exp = A.astype(np.int64) @ B.astype(np.int64)
    print("u8 matmul exact on TPU:", bool(np.array_equal(got.astype(np.int64), exp)))

    # 2. _prime_matmul_planes check at K=4096, p=3*2^30+1
    p = 3 * 2**30 + 1
    K = 4096
    Ax = rng.integers(0, p, (8, K), dtype=np.int64)
    Bx = rng.integers(0, p, (K, 8), dtype=np.int64)
    got = np.asarray(
        jax.jit(lambda a, b: _prime_matmul_planes(a, b, p, K))(
            jnp.asarray(Ax), jnp.asarray(Bx)
        )
    )
    exp = (Ax.astype(object) @ Bx.astype(object)) % p
    print("prime plane matmul exact on TPU:", bool(np.array_equal(got.astype(object), exp)))

    # 3. NTT 2^24 with the new 16-pair sides
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    GFn = gt.GF(p)
    N = 2**24
    om = _get_omega(GFn, N)
    plan = _plan(GFn._meta, N, om, "jit-calculate")
    x = (jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(p)
    t = timeit(_fft_jit(plan), x, reps=3)
    print(f"NTT 2^24: raw {t*1e3:.2f} ms, floor-corrected {(t-fl)*1e3:.2f} ms")

    # spot-check the transform numerically at 2^12 vs host DFT row
    from galois_tpu.fields._hostfield import get_host_field

    hf = get_host_field(GFn._meta)
    N2 = 2**12
    om2 = _get_omega(GFn, N2)
    plan2 = _plan(GFn._meta, N2, om2, "jit-calculate")
    xs = rng.integers(0, p, N2, dtype=np.int64)
    X = np.asarray(_fft_jit(plan2)(jnp.asarray(xs.astype(np.uint32))))
    pw = [1] * N2
    for k in range(1, N2):
        pw[k] = hf.multiply(pw[k - 1], om2)
    for k in (0, 1, 1000):
        acc = 0
        for n in range(N2):
            acc = hf.add(acc, hf.multiply(int(xs[n]), pw[(n * k) % N2]))
        assert int(X[k]) == acc, k
    print("NTT numeric spot-check: ok")

    # 4. NTT 2^20 batch-of-32
    N20 = 2**20
    om20 = _get_omega(GFn, N20)
    plan20 = _plan(GFn._meta, N20, om20, "jit-calculate")
    xb = ((jnp.arange(32 * N20, dtype=jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(p)).reshape(32, N20)
    t = timeit(_fft_jit(plan20), xb, reps=3)
    print(f"NTT 2^20 x32 batch: {(t-fl)/32*1e3:.3f} ms/xform")

    # 5. RS + BCH decode (new BM offset formulation; B sized ~50 ms)
    from galois_tpu.codes._decoder import make_decoder

    rs = gt.ReedSolomon(255, 223)
    B = 65536
    msgs = rs.field.Random((B, 223), seed=1)
    cws = np.asarray(rs.encode(msgs), dtype=np.int64)
    cws[:, 5] ^= 37
    cws[:, 100] ^= 11
    rdev = jnp.asarray(cws.astype(np.uint8))
    fmeta = rs.field._meta
    dec = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=False)
    t = timeit(dec, rdev, reps=3)
    print(f"RS(255,223) no-erasure: {B/(t-fl):.0f} cw/s")
    dec_e = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=True)
    edev = jnp.zeros(rdev.shape, dtype=bool)
    t = timeit(dec_e, rdev, edev, reps=3)
    print(f"RS(255,223) erasure path: {B/(t-fl):.0f} cw/s")
    # numeric: decode a slice and compare to messages
    out, nerr = dec(rdev[:256])
    ok = np.array_equal(np.asarray(out)[:, : 223], np.asarray(msgs)[:256])
    print("RS decode numeric: ", bool(ok), " nerr sample:", int(np.asarray(nerr)[0]))


if __name__ == "__main__":
    main()
