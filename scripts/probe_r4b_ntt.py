"""Round-4b probe: new plane path (int32 extraction + diagonal grouping) on
the 2^24 NTT, and the FIRST BLS12-381 2^24 run via factored device-built
tables.

Sections (each guarded; failures don't kill the rest):
  1. device cross-check at 2^16 vs CPU goldens (int + BLS) — catches any
     Mosaic lowering difference in the new extraction/bitcast path
  2. NTT 2^24 over GF(3*2^30+1): full transform timing + one side matmul
  3. BLS12-381 2^24: factored table build time, transform timing, X[0]
     check vs a host sum

Run on TPU from repo root:  timeout 1500 python scripts/probe_r4b_ntt.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    for t in jax.tree_util.tree_leaves(x):
        if hasattr(t, "ndim"):
            np.asarray(t if t.ndim == 0 else t.reshape(-1)[:1])
            return


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main():
    import galois_tpu as gt
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    print("backend:", jax.default_backend(), flush=True)
    pn = 3 * 2**30 + 1
    GFn = gt.GF(pn)
    r_bls = 52435875175126190479447740508185965837690552500527637822603658699938581184513
    GFb = gt.GF(r_bls)

    # ---- 1. 2^16 cross-checks vs CPU goldens ----
    try:
        N16 = 2**16
        x16 = ((np.arange(N16, dtype=np.uint64) * 2654435761) % pn).astype(np.uint32)
        om16 = _get_omega(GFn, N16)
        plan16 = _plan(GFn._meta, N16, om16, "jit-calculate")
        X16 = np.asarray(_fft_jit(plan16)(jnp.asarray(x16)))
        gold = np.load("scripts/golden_ntt216.npy")
        print("int 2^16 matches CPU golden:", bool((X16 == gold).all()), flush=True)

        rng = np.random.default_rng(17)
        xb16 = rng.integers(0, 2**16, (GFb._meta.storage_width, N16), dtype=np.int64).astype(np.uint16)
        xb16[-1] &= 0x3FFF
        omb16 = _get_omega(GFb, N16)
        planb16 = _plan(GFb._meta, N16, omb16, "jit-calculate")
        Xb16 = np.asarray(_fft_jit(planb16)(jnp.asarray(xb16)))
        goldb = np.load("scripts/golden_bls216.npy")
        print("bls 2^16 matches CPU golden:", bool((Xb16 == goldb).all()), flush=True)
    except Exception as e:
        print("2^16 cross-check failed:", repr(e)[:300], flush=True)

    # ---- 2. NTT 2^24 (int) with the new plane path ----
    try:
        N = 2**24
        x = jnp.arange(N, dtype=jnp.uint32)
        x = (x * jnp.uint32(2654435761)) % jnp.uint32(pn)
        t0 = time.perf_counter()
        om = _get_omega(GFn, N)
        plan = _plan(GFn._meta, N, om, "jit-calculate")
        print(f"int 2^24 plan build: {time.perf_counter()-t0:.1f} s", flush=True)
        med, ts = timeit(_fft_jit(plan), x, reps=5)
        print(f"int 2^24 full: median {med*1e3:.2f} ms  runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
        # X[0] = sum x mod p
        X = _fft_jit(plan)(x)
        x0 = int(np.asarray(X[0]))
        expect0 = int(np.sum(np.asarray(x, dtype=np.uint64).astype(object)) % pn)
        print("int 2^24 X[0] ok:", x0 == expect0, flush=True)

        # one side matmul with precomputed table planes
        from galois_tpu.ops._linalg import _prime_matmul

        t1, T, t2 = plan.device_tables()
        M = x.reshape(plan.n1, plan.n2)
        f_side = jax.jit(lambda pl, m: _prime_matmul(None, m, pn, plan.n1, GFn._meta, a_planes=pl["pl"]))
        med_s, ts_s = timeit(f_side, t1, M)
        print(f"one side matmul: median {med_s*1e3:.2f} ms  runs {[f'{t*1e3:.1f}' for t in ts_s]}", flush=True)
    except Exception as e:
        print("int 2^24 failed:", repr(e)[:300], flush=True)

    # free plans/tables before the BLS leg
    _fft_jit.cache_clear()
    _plan.cache_clear()
    jax.clear_caches()

    # ---- 3. BLS12-381 2^24 via factored device-built tables ----
    try:
        N = 2**24
        wL = GFb._meta.storage_width
        t0 = time.perf_counter()
        omb = _get_omega(GFb, N)
        planb = _plan(GFb._meta, N, omb, "jit-calculate")
        print(f"bls 2^24 plan build (host ladders): {time.perf_counter()-t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        tabs = planb.device_tables()
        sync(tabs)
        print(f"bls 2^24 device table build: {time.perf_counter()-t0:.1f} s", flush=True)
        # device-born planar limbs < 2^254 < r
        key = jnp.uint32(2654435761)
        xi = jnp.arange(wL * N, dtype=jnp.uint32) * key
        xb = (xi & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(wL, N)
        xb = xb.at[wL - 1].set(xb[wL - 1] & jnp.uint16(0x3FFF))
        med_b, ts_b = timeit(_fft_jit(planb), xb, reps=3)
        print(f"bls 2^24 full: median {med_b*1e3:.1f} ms  runs {[f'{t*1e3:.0f}' for t in ts_b]}", flush=True)
        Xb = _fft_jit(planb)(xb)
        # X[0] = sum of inputs mod r — host check from the u16 planes
        host = np.asarray(xb, dtype=np.uint64)
        tot = 0
        for k in range(wL):
            tot += int(host[k].sum()) << (16 * k)
        expect0 = tot % r_bls
        got_limbs = np.asarray(Xb[:, 0], dtype=np.uint64)
        got0 = 0
        for k in range(wL):
            got0 |= int(got_limbs[k]) << (16 * k)
        print("bls 2^24 X[0] ok:", got0 == expect0, flush=True)
    except Exception as e:
        print("bls 2^24 failed:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
