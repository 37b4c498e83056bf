"""Round-5i: hardware check of the int8 binary matmul + hoisted glm extract.

Stages:
  1 liveness + floor
  2 GF(2^8) 256^2 matmul x512 (int8 planes; f32 baseline was 66.3 us/item)
  3 RS(255,223) decode B=65536 (binary matmul feeds syndromes/Chien/Forney)
  4 BLS 2^22 + 2^24 transform (hoisted A-extract; was 157.8 / 1306.8 ms)

Run:  nohup timeout 1800 python -u scripts/probe_r5i.py > /tmp/r5i.log 2>&1 &
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
    from galois_tpu.ops._binary_matmul import binary_matmul

    stage("2 gf256 matmul x512 (int8 planes)")
    GF256 = gt.GF(2**8)
    Bt = 512
    Am = (dev_u16((Bt, 256, 256), 9) & jnp.uint16(255)).astype(jnp.uint8)
    Bm = (dev_u16((Bt, 256, 256), 10) & jnp.uint16(255)).astype(jnp.uint8)
    bm_jit = jax.jit(lambda u, v: binary_matmul(GF256._meta, u, v))
    med, ts = timeit(bm_jit, Am, Bm)
    t = med - floor
    print(f"{t/Bt*1e6:.1f} us/matmul (was 66.3 f32)  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)
    # exactness vs a host spot-check
    from galois_tpu.fields._hostfield import get_host_field

    hf = get_host_field(GF256._meta)
    out = bm_jit(Am, Bm)
    acc = 0
    a0 = np.asarray(Am[0, 0], dtype=np.int64)
    b0 = np.asarray(Bm[0, :, 0], dtype=np.int64)
    for k in range(256):
        acc = hf.add(acc, hf.multiply(int(a0[k]), int(b0[k])))
    print("exact[0,0,0]:", int(np.asarray(out[0, 0, 0])) == acc, flush=True)

    stage("3 RS decode B=65536")
    rs = gt.ReedSolomon(255, 223)
    from galois_tpu.codes._decoder import make_decoder

    x = jnp.arange(65536 * 255, dtype=jnp.uint32)
    rdev = ((x * jnp.uint32(2654435761)) >> 8).astype(jnp.uint8).reshape(65536, 255)
    dec = make_decoder(
        rs.field._meta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=False
    )
    med, ts = timeit(dec, rdev)
    t = med - floor
    print(f"no-erasure: {65536/t:,.0f} cw/s (was 1.27M)  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)

    stage("4 BLS 2^22 + 2^24")
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    r_bls = 52435875175126190479447740508185965837690552500527637822603658699938581184513
    Fb = gt.GF(r_bls)
    L = Fb._meta.storage_width
    om22 = _get_omega(Fb, 2**22)
    plan22 = _plan(Fb._meta, 2**22, om22, "jit-calculate")
    x22 = dev_u16((L, 2**22), 5)
    x22 = x22.at[L - 1].set(x22[L - 1] & jnp.uint16(0x3FFF))
    fj22 = _fft_jit(plan22)
    t0 = time.perf_counter()
    sync(fj22(x22))
    print(f"2^22 tables+compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fj22, x22)
    print(f"BLS 2^22: {(med-floor)*1e3:.1f} ms (was 157.8)  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)

    import galois_tpu.ops._ntt as _n

    _n._fft_jit.cache_clear()
    _n._plan.cache_clear()
    om24 = _get_omega(Fb, 2**24)
    plan24 = _plan(Fb._meta, 2**24, om24, "jit-calculate")
    x24 = dev_u16((L, 2**24), 6)
    x24 = x24.at[L - 1].set(x24[L - 1] & jnp.uint16(0x3FFF))
    fj24 = _fft_jit(plan24)
    t0 = time.perf_counter()
    sync(fj24(x24))
    print(f"2^24 tables+compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(fj24, x24)
    print(f"BLS 2^24: {(med-floor)*1e3:.1f} ms (was 1306.8)  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
