"""Round-5f: BLS unrolled twiddle/combine on hardware + full 2^22 and 2^24.

Stages:
  1 liveness + floor
  2 BLS twiddle mul (unrolled) at 2^22 shape  [was 301 ms corr via MXU fold]
  3 BLS side matmul 2048^3 with unrolled combine  [was 277 ms corr]
  4 BLS full 2^22 transform  [was 865 ms corr]
  5 BLS full 2^24 transform + table-build time  [r4 record 4062 ms]

Run:  nohup timeout 2400 python -u scripts/probe_r5f.py > /tmp/r5f.log 2>&1 &
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
            np.asarray(t.reshape(-1)[:1])
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


def stage(name):
    print(f"--- {name} ({time.strftime('%H:%M:%S')})", flush=True)


def dev_u16(shape, seed):
    n = int(np.prod(shape))
    x = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed * 2654435761 % 2**32)
    x = x * jnp.uint32(2246822519)
    x = x ^ (x >> 15)
    return (x & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(shape)


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

    import galois_tpu as gt
    from galois_tpu.ops._kernels import get_ops
    from galois_tpu.ops._limb_matmul import generic_limb_matmul

    r_bls = 52435875175126190479447740508185965837690552500527637822603658699938581184513
    Fb = gt.GF(r_bls)
    mb = Fb._meta
    L = mb.storage_width
    ops = get_ops(mb, "jit-calculate")
    n = 2048
    ab = dev_u16((L, n, n), 3)
    bb = dev_u16((L, n, n), 4)

    stage("2 twiddle mul unrolled (2048^2)")
    f_tw = jax.jit(lambda a, t: ops.multiply_unrolled(a, t))
    t0 = time.perf_counter()
    sync(f_tw(ab, bb))
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(f_tw, ab, bb)
    print(f"unrolled twiddle: {(med-floor)*1e3:.1f} ms corr  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    # exactness vs the MXU-fold path
    f_tw0 = jax.jit(lambda a, t: ops.multiply(a, t))
    eq = jax.jit(lambda a, t: jnp.array_equal(f_tw(a, t), f_tw0(a, t)))(ab[:, :256], bb[:, :256])
    print("exact vs fold path:", bool(np.asarray(eq)), flush=True)

    stage("3 side matmul 2048^3 (unrolled combine)")
    f_side = jax.jit(lambda a, b: generic_limb_matmul(mb, a, b))
    t0 = time.perf_counter()
    sync(f_side(ab, bb))
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(f_side, ab, bb)
    print(f"side matmul: {(med-floor)*1e3:.1f} ms corr  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("4 full 2^22 transform")
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    om22 = _get_omega(Fb, 2**22)
    plan22 = _plan(mb, 2**22, om22, "jit-calculate")
    x22 = dev_u16((L, 2**22), 5)
    x22 = x22.at[L - 1].set(x22[L - 1] & jnp.uint16(0x3FFF))
    fj22 = _fft_jit(plan22)
    t0 = time.perf_counter()
    sync(fj22(x22))
    print(f"tables+compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fj22, x22)
    print(f"BLS NTT 2^22: {(med-floor)*1e3:.1f} ms corr  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("5 full 2^24 transform")
    import galois_tpu.ops._ntt as _nttmod

    _nttmod._fft_jit.cache_clear()
    _nttmod._plan.cache_clear()
    om24 = _get_omega(Fb, 2**24)
    plan24 = _plan(mb, 2**24, om24, "jit-calculate")
    x24 = dev_u16((L, 2**24), 6)
    x24 = x24.at[L - 1].set(x24[L - 1] & jnp.uint16(0x3FFF))
    fj24 = _fft_jit(plan24)
    t0 = time.perf_counter()
    tabs = plan24.device_tables()
    print(f"table build ({time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    sync(fj24(x24))
    print(f"compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fj24, x24)
    print(f"BLS NTT 2^24: {(med-floor)*1e3:.1f} ms corr  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
