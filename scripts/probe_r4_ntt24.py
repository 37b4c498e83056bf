"""Round-4 probe: NTT 2^24 stage attribution + radix/plane experiments.

Verdict item 5: attribute the 36.5 ms (plane matmuls vs twiddle vs
transpose), then test the levers:
  (a) timing of ONE side matmul (4096x4096 @ 4096x4096, 25 int8 plane pairs)
  (b) twiddle multiply alone
  (c) a 3-level radix-256 plan (forced n1=256; MACs drop ~10.7x, leaves are
      (256,256)@(256,huge) single matmuls, not 64x64 batched tinies)
  (d) u8-plane matmul lowering probe (4x8-bit digits -> 16 pairs, IF the
      MXU takes u8xu8->s32 at int8 speed)
  (e) Baby Bear p = 15*2^27+1 (31-bit): same transform in a field whose
      elements fit 4 BALANCED int8 digits -> 16 pairs

Run on TPU from repo root:  timeout 580 python scripts/probe_r4_ntt24.py
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


def main():
    import galois_tpu as gt
    from galois_tpu.ops._linalg import _prime_matmul
    from galois_tpu.ops._ntt import MatmulFFTPlan, _fft_jit, _get_omega, _plan

    print("backend:", jax.default_backend(), file=sys.stderr)
    pn = 3 * 2**30 + 1
    GFn = gt.GF(pn)
    meta = GFn._meta
    N = 2**24

    # device-born data
    x = jnp.arange(N, dtype=jnp.uint32)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(pn)

    # (0) full transform, current plan
    om = _get_omega(GFn, N)
    plan = _plan(meta, N, om, "jit-calculate")
    t_full = timeit(_fft_jit(plan), x, reps=3)
    print(f"full 2^24 (n1={plan.n1}): {t_full*1e3:.2f} ms")

    # (a) one side matmul alone: W1 (4096,4096) @ M (4096,4096)
    t1, T, t2 = plan.device_tables()
    M = x.reshape(plan.n1, plan.n2)

    f_side = jax.jit(lambda w, m: _prime_matmul(w, m, pn, plan.n1, meta))
    t_side = timeit(f_side, t1, M)
    print(f"one side matmul: {t_side*1e3:.2f} ms (x2 = {2*t_side*1e3:.2f})")

    # (b) twiddle multiply alone
    from galois_tpu.ops._kernels import get_ops

    ops = get_ops(meta, "jit-calculate")
    f_tw = jax.jit(lambda a, t: ops.multiply(a, t))
    t_tw = timeit(f_tw, M, T)
    print(f"twiddle mul: {t_tw*1e3:.2f} ms")
    print(f"residual (transpose/reshape/extract): {(t_full - 2*t_side - t_tw)*1e3:.2f} ms")

    # (c) 3-level radix-256 plan (n1=256, n2=65536 recursed into 256x256)
    try:
        plan256 = MatmulFFTPlan(meta, N, om, "jit-calculate", 256)
        f256 = jax.jit(plan256.transform)
        tabs = plan256.device_tables()
        f256j = jax.jit(lambda v: plan256.transform(v, tabs))
        t_256 = timeit(f256j, x, reps=3)
        print(f"3-level radix-256 plan: {t_256*1e3:.2f} ms")
    except Exception as e:
        print("radix-256 plan failed:", repr(e)[:200])

    # (c2) n1=1024 (1024 direct, 16384 -> 128x128 sub)
    try:
        plan1k = MatmulFFTPlan(meta, N, om, "jit-calculate", 1024)
        tabs = plan1k.device_tables()
        f1kj = jax.jit(lambda v: plan1k.transform(v, tabs))
        t_1k = timeit(f1kj, x, reps=3)
        print(f"n1=1024 plan: {t_1k*1e3:.2f} ms")
    except Exception as e:
        print("n1=1024 plan failed:", repr(e)[:200])

    # (d) u8 vs s8 plane matmul lowering speed
    K = 4096
    a8 = (jnp.arange(K * K, dtype=jnp.uint32) % 251).astype(jnp.uint8).reshape(K, K)
    s8 = a8.astype(jnp.int8) >> 1
    f_u8 = jax.jit(lambda u, v: jnp.matmul(u, v, preferred_element_type=jnp.int32))
    f_s8 = jax.jit(lambda u, v: jnp.matmul(u, v, preferred_element_type=jnp.int32))
    try:
        t_u8 = timeit(f_u8, a8, a8)
        print(f"u8 4096^3 matmul: {t_u8*1e3:.2f} ms")
    except Exception as e:
        print("u8 matmul failed:", repr(e)[:150])
    t_s8 = timeit(f_s8, s8, s8)
    print(f"s8 4096^3 matmul: {t_s8*1e3:.2f} ms  (25 pairs -> {25*t_s8*1e3:.1f} ms/side)")
    # bf16 comparison point
    bf = (a8.astype(jnp.bfloat16),)
    f_bf = jax.jit(lambda u: jnp.matmul(u, u, preferred_element_type=jnp.float32))
    t_bf = timeit(f_bf, bf[0])
    print(f"bf16 4096^3 matmul: {t_bf*1e3:.2f} ms")

    # (e) Baby Bear full transform with the CURRENT 5x7-bit planes
    try:
        pb = 15 * 2**27 + 1
        GFb = gt.GF(pb)
        omb = _get_omega(GFb, N)
        planb = _plan(GFb._meta, N, omb, "jit-calculate")
        xb = (jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(pb)
        t_bb = timeit(_fft_jit(planb), xb, reps=3)
        print(f"BabyBear 2^24 (same 5-plane path): {t_bb*1e3:.2f} ms")
    except Exception as e:
        print("BabyBear failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
