"""Round-5a: land the fused Pallas plane matmul on hardware + batched 2^24.

Stages (each printed, flushed, individually try/except'd so a late-stage
Mosaic failure cannot erase earlier data):
  1 liveness + dispatch floor
  2 tiny pallas compile (Mosaic alive?)
  3 512^3 pallas vs XLA exactness (compiled, not interpret)
  4 4096^3 XLA pair-dots side baseline
  5 4096^3 pallas data_left timing + device-side exactness vs XLA
  6 4096^3 pallas data_right timing
  7 batched (4, 4096, 4096) side timing, both paths
  8 full NTT 2^24: XLA batched B=4 vs pallas-sides batched B=4, exact-equal
  9 gf256 chain re-measure (session health)

Run:  nohup timeout 1500 python -u scripts/probe_r5a.py > /tmp/r5a.log 2>&1 &
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
    print(f"floor {floor*1e3:.1f} ms (spread {min(ts)*1e3:.1f}-{max(ts)*1e3:.1f})", flush=True)

    stage("2 tiny pallas")
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
    print("tiny pallas ok", flush=True)

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        plane_matmul_data_left,
        plane_matmul_data_right,
    )

    p = 3 * 2**30 + 1

    stage("3 512^3 exactness")
    rng = np.random.default_rng(7)
    W5 = rng.integers(0, p, (512, 512), dtype=np.uint64).astype(np.uint32)
    W5pl = jax.device_put(balanced_planes_np(W5, p))
    xs = jnp.arange(512 * 512, dtype=jnp.uint32).reshape(512, 512)
    xs = (xs * jnp.uint32(2654435761)) % jnp.uint32(p)
    t0 = time.perf_counter()
    outs = plane_matmul_data_left(xs, W5pl, p)
    sync(outs)
    print(f"512 compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    ref = _prime_matmul_planes(xs, None, p, 512, b_planes=W5pl)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b.astype(jnp.uint32)))(outs, ref)
    print("512 exact:", bool(np.asarray(eq)), flush=True)

    n = 4096
    x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
    Wb = rng.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
    Wbpl = jax.device_put(balanced_planes_np(Wb, p))

    stage("4 4096^3 XLA baseline")
    f_xla = jax.jit(lambda xx, pls: _prime_matmul_planes(xx, None, p, n, b_planes=pls))
    med, ts = timeit(f_xla, x, Wbpl)
    print(f"xla pair-dots: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    ref4096 = f_xla(x, Wbpl)
    a8 = (x & jnp.uint32(127)).astype(jnp.int8)
    f_s8 = jax.jit(lambda u: jnp.matmul(u, u, preferred_element_type=jnp.int32))
    med, ts = timeit(f_s8, a8)
    print(f"single s8 4096^3: {med*1e3:.2f} ms (x16 = {16*med*1e3:.1f})", flush=True)

    stage("5 4096^3 pallas data_left")
    t0 = time.perf_counter()
    out = plane_matmul_data_left(x, Wbpl, p)
    sync(out)
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b.astype(jnp.uint32)))(out, ref4096)
    print("4096 exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(plane_matmul_data_left, x, Wbpl, p)
    print(f"pallas data_left: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    stage("6 4096^3 pallas data_right")
    med, ts = timeit(plane_matmul_data_right, Wbpl, x, p)
    print(f"pallas data_right: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    stage("7 batched sides (4, 4096, 4096)")
    xb = (
        (jnp.arange(4 * n * n, dtype=jnp.uint32).reshape(4, n, n) * jnp.uint32(2654435761))
        % jnp.uint32(p)
    )
    f_xla_b = jax.jit(lambda xx, pls: _prime_matmul_planes(None, xx, p, n, a_planes=pls))
    med, ts = timeit(f_xla_b, xb, Wbpl)
    print(f"xla batched data_right: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    med, ts = timeit(plane_matmul_data_right, Wbpl, xb, p)
    print(f"pallas batched data_right: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    stage("8 full NTT 2^24, B=4")
    import galois_tpu as gt
    from galois_tpu.ops._ntt import MatmulFFTPlan, _fft_jit, _get_omega, _plan

    GFn = gt.GF(p)
    omega24 = _get_omega(GFn, 2**24)
    meta = GFn._meta
    plan_x = _plan(meta, 2**24, omega24, "jit-calculate")
    x24 = jnp.arange(2**26, dtype=jnp.uint32).reshape(4, 2**24)
    x24 = (x24 * jnp.uint32(2654435761)) % jnp.uint32(p)
    f_def = _fft_jit(plan_x)
    med, ts = timeit(f_def, x24)
    print(f"NTT 2^24 XLA B=4: total {med*1e3:.1f} ms -> {(med-floor)/4*1e3:.2f} ms/xf "
          f"{[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    ref24 = f_def(x24)

    os.environ["GALOIS_TPU_NTT_PALLAS"] = "1"
    plan_p = MatmulFFTPlan(meta, 2**24, omega24, "jit-calculate", 4096)
    assert plan_p._use_pallas_sides(), "pallas sides not enabled?"
    tabs = plan_p.device_tables()
    f_pal = jax.jit(plan_p.transform)
    t0 = time.perf_counter()
    outp = f_pal(x24, tabs)
    sync(outp)
    print(f"pallas NTT compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(outp, ref24)
    print("NTT pallas exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(lambda xx: f_pal(xx, tabs), x24)
    print(f"NTT 2^24 PALLAS B=4: total {med*1e3:.1f} ms -> {(med-floor)/4*1e3:.2f} ms/xf "
          f"{[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    os.environ.pop("GALOIS_TPU_NTT_PALLAS", None)

    stage("9 gf256 chain health")
    from galois_tpu.ops._kernels import get_ops

    GF256 = gt.GF(2**8)
    ops = get_ops(GF256._meta, "jit-calculate")
    N = 2**26
    a = (jnp.arange(N, dtype=jnp.uint32) % 255 + 1).astype(jnp.uint8)
    b = ((jnp.arange(N, dtype=jnp.uint32) * 7) % 255 + 1).astype(jnp.uint8)

    @jax.jit
    def chain(xx, bb):
        return jax.lax.fori_loop(0, 64, lambda i, acc: ops.multiply(acc, bb), xx)

    med, ts = timeit(chain, a, b)
    gops = N / ((med - floor) / 64) / 1e9
    print(f"gf256 chain: {gops:.1f} Gops/s  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
