"""Round-5b: BLS12-381 2^24 attribution + Goldilocks matmul path shootout.

Stages:
  1 liveness + floor
  2 Goldilocks (4,2048,2048) matmul: specialized 10x7-bit (100 pairs) vs
    generic biased-byte (64 pairs) — exactness + timing
  3 BLS side matmul alone: generic_limb_matmul (16, 2048, 2048)^2 timing
    (the 2^22 transform runs two of these)
  4 BLS twiddle multiply alone at 2^22 shape
  5 BLS full 2^22 transform (for the residual)
  6 Goldilocks NTT 2^24 timing (current path, for reference in-session)

Run:  nohup timeout 1500 python -u scripts/probe_r5b.py > /tmp/r5b.log 2>&1 &
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
    from galois_tpu.ops._limb_matmul import generic_limb_matmul, goldilocks_matmul

    stage("2 goldilocks matmul shootout (4, 2048, 2048)")
    pg = 2**64 - 2**32 + 1
    Fg = gt.GF(pg)
    mg = Fg._meta
    n = 2048
    ag = dev_u16((4, n, n), 1)
    bg = dev_u16((4, n, n), 2)
    f_spec = jax.jit(lambda a, b: goldilocks_matmul(mg, a, b))
    f_gen = jax.jit(lambda a, b: generic_limb_matmul(mg, a, b))
    med, ts = timeit(f_spec, ag, bg)
    print(f"specialized 100-pair: {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    med, ts = timeit(f_gen, ag, bg)
    print(f"generic 64-pair biased: {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    eq = jax.jit(lambda a, b: jnp.array_equal(f_spec(a, b), f_gen(a, b)))(ag, bg)
    print("exact-equal:", bool(np.asarray(eq)), flush=True)

    stage("3 BLS side matmul (16, 2048, 2048)^2")
    r_bls = 52435875175126190479447740508185965837690552500527637822603658699938581184513
    Fb = gt.GF(r_bls)
    mb = Fb._meta
    L = mb.storage_width
    ab = dev_u16((L, n, n), 3)
    bb = dev_u16((L, n, n), 4)
    f_side = jax.jit(lambda a, b: generic_limb_matmul(mb, a, b))
    t0 = time.perf_counter()
    sync(f_side(ab, bb))
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(f_side, ab, bb)
    print(f"BLS side matmul 2048^3: {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    # MAC model: D^2 * n^3 at D = 32 -> 1024 * 2048^3 = 8.8e12 MACs = 44.5 ms at peak
    print(f"  (s8 MAC floor ~44.5 ms; ratio {med/0.0445:.2f}x)", flush=True)

    stage("4 BLS twiddle mul at 2^22 shape")
    from galois_tpu.ops._kernels import get_ops

    ops = get_ops(mb, "jit-calculate")
    # the plan's _twiddle_mul chunks via lax.map; approximate with one
    # elementwise multiply of (L, 2048, 2048) operands through the same path
    from galois_tpu.ops._ntt import MatmulFFTPlan, _get_omega, _plan, _fft_jit

    om22 = _get_omega(Fb, 2**22)
    plan22 = _plan(mb, 2**22, om22, "jit-calculate")
    f_tw = jax.jit(lambda a, t: plan22._twiddle_mul(a, t))
    med, ts = timeit(f_tw, ab, bb)
    print(f"BLS twiddle mul (2048^2): {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("5 BLS full 2^22 transform")
    t0 = time.perf_counter()
    x22 = dev_u16((L, 2**22), 5)
    x22 = x22.at[L - 1].set(x22[L - 1] & jnp.uint16(0x3FFF))
    fj = _fft_jit(plan22)
    t0 = time.perf_counter()
    sync(fj(x22))
    print(f"tables+compile+first run ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fj, x22)
    print(f"BLS NTT 2^22: {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("6 goldilocks NTT 2^24 (current path)")
    omg = _get_omega(Fg, 2**24)
    plan24g = _plan(mg, 2**24, omg, "jit-calculate")
    xg = dev_u16((4, 2**24), 6)
    fg = _fft_jit(plan24g)
    t0 = time.perf_counter()
    sync(fg(xg))
    print(f"compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fg, xg)
    print(f"goldilocks NTT 2^24: {med*1e3:.1f} ms  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
