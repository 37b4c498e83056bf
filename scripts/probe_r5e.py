"""Round-5e: kernel v2 validation (extraction cache, native batch grid,
fused twiddle, transposed output tiles).

Stages:
  1 liveness + floor
  2 4096^3 data_left single (cache effect vs r5c's 12.4 ms)
  3 NTT 2^24 B=4: default (pallas v2) vs flag=0 (XLA) + exactness
  4 NTT 2^20 B=32: pallas v2 timing + exactness

Run:  nohup timeout 1500 python -u scripts/probe_r5e.py > /tmp/r5e.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(x.reshape(-1)[:1])


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


def stage(name):
    print(f"--- {name} ({time.strftime('%H:%M:%S')})", flush=True)


def main():
    stage("1 liveness")
    print("backend:", jax.default_backend(), flush=True)
    v = jnp.arange(8, dtype=jnp.uint32) + jnp.uint32(1)
    sync(v)
    f = jax.jit(lambda t: t + 1)
    sync(f(v))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        sync(f(v))
        ts.append(time.perf_counter() - t0)
    floor = min(ts)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import plane_matmul_data_left

    p = 3 * 2**30 + 1
    n = 4096

    stage("2 4096^3 data_left single (v2 cache)")
    rng = np.random.default_rng(7)
    x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
    Wb = rng.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
    Wbpl = jax.device_put(balanced_planes_np(Wb, p))
    t0 = time.perf_counter()
    out = plane_matmul_data_left(x, Wbpl, p)
    sync(out)
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    ref = _prime_matmul_planes(x, None, p, n, b_planes=Wbpl)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b.astype(jnp.uint32)))(out, ref)
    print("exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(plane_matmul_data_left, x, Wbpl, p)
    print(f"v2 data_left: {(med-floor)*1e3:.2f} ms corr  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    stage("3 NTT 2^24 B=4: pallas v2 vs XLA")
    import galois_tpu as gt
    from galois_tpu.ops._ntt import MatmulFFTPlan, _fft_jit, _get_omega, _plan

    GFn = gt.GF(p)
    meta = GFn._meta
    omega24 = _get_omega(GFn, 2**24)
    x24 = jnp.arange(2**26, dtype=jnp.uint32).reshape(4, 2**24)
    x24 = (x24 * jnp.uint32(2654435761)) % jnp.uint32(p)

    os.environ["GALOIS_TPU_NTT_PALLAS"] = "0"
    plan_x = MatmulFFTPlan(meta, 2**24, omega24, "jit-calculate", 4096)
    f_def = jax.jit(plan_x.transform)
    tabs_x = plan_x.device_tables()
    ref24 = f_def(x24, tabs_x)
    sync(ref24)
    med, ts = timeit(lambda xx: f_def(xx, tabs_x), x24)
    print(f"XLA B=4: {(med-floor)/4*1e3:.2f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    os.environ["GALOIS_TPU_NTT_PALLAS"] = "1"
    plan_p = MatmulFFTPlan(meta, 2**24, omega24, "jit-calculate", 4096)
    tabs = plan_p.device_tables()
    f_pal = jax.jit(plan_p.transform)
    t0 = time.perf_counter()
    outp = f_pal(x24, tabs)
    sync(outp)
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(outp, ref24)
    print("exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(lambda xx: f_pal(xx, tabs), x24)
    print(f"PALLAS v2 B=4: {(med-floor)/4*1e3:.2f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("4 NTT 2^20 B=32 pallas v2")
    omega20 = _get_omega(GFn, 2**20)
    os.environ["GALOIS_TPU_NTT_PALLAS"] = "0"
    plan20x = MatmulFFTPlan(meta, 2**20, omega20, "jit-calculate", 1024)
    tabs20x = plan20x.device_tables()
    f20x = jax.jit(plan20x.transform)
    x20 = jnp.arange(32 * 2**20, dtype=jnp.uint32).reshape(32, 2**20)
    x20 = (x20 * jnp.uint32(2654435761)) % jnp.uint32(p)
    ref20 = f20x(x20, tabs20x)
    sync(ref20)
    med, ts = timeit(lambda xx: f20x(xx, tabs20x), x20)
    print(f"2^20 XLA B=32: {(med-floor)/32*1e3:.3f} ms/xf", flush=True)
    os.environ["GALOIS_TPU_NTT_PALLAS"] = "1"
    plan20p = MatmulFFTPlan(meta, 2**20, omega20, "jit-calculate", 1024)
    tabs20 = plan20p.device_tables()
    f20p = jax.jit(plan20p.transform)
    out20 = f20p(x20, tabs20)
    sync(out20)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(out20, ref20)
    print("2^20 exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(lambda xx: f20p(xx, tabs20), x20)
    print(f"2^20 PALLAS v2 B=32: {(med-floor)/32*1e3:.3f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
