"""Round-4d probe: staged hardware validation after the tunnel wedge.

Stages (ordered so the riskiest Mosaic compile comes LAST; each prints
before starting so a hang is attributable):
  1. liveness
  2. BLS12-381 2^24 NTT with biased 8-bit digit planes (25% MAC cut)
  3. single s8 4096^3 matmul floor (for the 2^24 attribution record)
  4. int 2^24 NTT re-check (new plane path)
  5. tiny pallas compile, then 512^3 fused plane matmul, then 4096^3

Run:  timeout 1500 python -u scripts/probe_r4d.py > /tmp/r4d.log 2>&1
"""

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


def main():
    print("stage 1: liveness...", flush=True)
    t0 = time.perf_counter()
    v = jnp.arange(8, dtype=jnp.uint32) + jnp.uint32(1)
    sync(v)
    print(f"  ok ({time.perf_counter()-t0:.1f}s) backend={jax.default_backend()}", flush=True)

    import galois_tpu as gt
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    print("stage 2: BLS 2^24 (biased digits)...", flush=True)
    try:
        r_bls = 52435875175126190479447740508185965837690552500527637822603658699938581184513
        GFb = gt.GF(r_bls)
        wL = GFb._meta.storage_width
        N = 2**24
        omb = _get_omega(GFb, N)
        planb = _plan(GFb._meta, N, omb, "jit-calculate")
        t0 = time.perf_counter()
        tabs = planb.device_tables()
        for t in jax.tree_util.tree_leaves(tabs):
            np.asarray(t.reshape(-1)[:1])
        print(f"  table build {time.perf_counter()-t0:.1f}s", flush=True)
        key = jnp.uint32(2654435761)
        xi = jnp.arange(wL * N, dtype=jnp.uint32) * key
        xb = (xi & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(wL, N)
        xb = xb.at[wL - 1].set(xb[wL - 1] & jnp.uint16(0x3FFF))
        med, ts = timeit(_fft_jit(planb), xb, reps=3)
        print(f"  bls 2^24: median {med*1e3:.0f} ms runs {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
        Xb = _fft_jit(planb)(xb)
        host = np.asarray(xb, dtype=np.uint64)
        tot = sum(int(host[k].sum()) << (16 * k) for k in range(wL)) % r_bls
        got = np.asarray(Xb[:, 0], dtype=np.uint64)
        got0 = sum(int(got[k]) << (16 * k) for k in range(wL))
        print("  X[0] ok:", got0 == tot, flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:300], flush=True)
    _fft_jit.cache_clear()
    _plan.cache_clear()
    jax.clear_caches()

    print("stage 3: single s8 4096^3 floor...", flush=True)
    try:
        n = 4096
        a8 = ((jnp.arange(n * n, dtype=jnp.uint32) & jnp.uint32(127))).astype(jnp.int8).reshape(n, n)
        f_s8 = jax.jit(lambda u: jnp.matmul(u, u, preferred_element_type=jnp.int32))
        med, ts = timeit(f_s8, a8)
        print(f"  s8 4096^3: median {med*1e3:.2f} ms (x16 = {16*med*1e3:.1f} + floor)", flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:200], flush=True)

    print("stage 4: int 2^24 NTT...", flush=True)
    try:
        pn = 3 * 2**30 + 1
        GFn = gt.GF(pn)
        N = 2**24
        x = jnp.arange(N, dtype=jnp.uint32)
        x = (x * jnp.uint32(2654435761)) % jnp.uint32(pn)
        om = _get_omega(GFn, N)
        plan = _plan(GFn._meta, N, om, "jit-calculate")
        med, ts = timeit(_fft_jit(plan), x, reps=3)
        print(f"  int 2^24: median {med*1e3:.2f} ms runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:200], flush=True)

    print("stage 5a: tiny pallas compile...", flush=True)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k2(i_ref, o_ref):
            o_ref[...] = i_ref[...] + i_ref[...]

        x8 = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
        y8 = pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x8)
        sync(y8)
        print("  ok", flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:200], flush=True)
        return

    print("stage 5b: fused plane matmul 512^3 (compile may take minutes)...", flush=True)
    try:
        from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
        from galois_tpu.ops._pallas._plane_matmul import plane_matmul_data_left

        pn = 3 * 2**30 + 1
        rng = np.random.default_rng(7)
        W = rng.integers(0, pn, (512, 512), dtype=np.uint64).astype(np.uint32)
        Wpl = jax.device_put(balanced_planes_np(W, pn))
        xs = jnp.arange(512 * 512, dtype=jnp.uint32).reshape(512, 512)
        xs = (xs * jnp.uint32(2654435761)) % jnp.uint32(pn)
        t0 = time.perf_counter()
        outs = plane_matmul_data_left(xs, Wpl, pn)
        sync(outs)
        print(f"  compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
        ref = _prime_matmul_planes(xs, None, pn, 512, b_planes=Wpl)
        print("  512^3 exact:", bool((np.asarray(outs) == np.asarray(ref).astype(np.uint32)).all()), flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:300], flush=True)
        return

    print("stage 5c: fused plane matmul 4096^3...", flush=True)
    try:
        n = 4096
        x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
        x = (x * jnp.uint32(2654435761)) % jnp.uint32(pn)
        Wb = rng.integers(0, pn, (n, n), dtype=np.uint64).astype(np.uint32)
        Wbpl = jax.device_put(balanced_planes_np(Wb, pn))
        t0 = time.perf_counter()
        out = plane_matmul_data_left(x, Wbpl, pn)
        sync(out)
        print(f"  compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
        med, ts = timeit(plane_matmul_data_left, x, Wbpl, pn)
        print(f"  pallas 4096^3: median {med*1e3:.2f} ms runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
        f_xla = jax.jit(lambda xx, pls: _prime_matmul_planes(xx, None, pn, n, b_planes=pls))
        med, ts = timeit(f_xla, x, Wbpl)
        print(f"  xla    4096^3: median {med*1e3:.2f} ms runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("  FAILED:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
