"""Round-5d: production Pallas NTT path validation + one more block variant.

Stages:
  1 liveness + floor
  2 NTT 2^24 B=4: default XLA path (baseline + reference output)
  3 NTT 2^24 B=4: GALOIS_TPU_NTT_PALLAS=1 production path (stacked kernels,
    pre-stacked "pls" tables) — timing + exactness
  4 NTT 2^20 B=32: both paths (does the pallas side help at 1024^3 too?)
  5 kernel variant BK=1024 BM=128 BN=256 at 4096^3 (timing only)

Run:  nohup timeout 1500 python -u scripts/probe_r5d.py > /tmp/r5d.log 2>&1 &
"""

import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

    import galois_tpu as gt
    from galois_tpu.ops._ntt import MatmulFFTPlan, _fft_jit, _get_omega, _plan

    p = 3 * 2**30 + 1
    GFn = gt.GF(p)
    meta = GFn._meta
    omega24 = _get_omega(GFn, 2**24)

    stage("2 NTT 2^24 B=4 XLA")
    plan_x = _plan(meta, 2**24, omega24, "jit-calculate")
    x24 = jnp.arange(2**26, dtype=jnp.uint32).reshape(4, 2**24)
    x24 = (x24 * jnp.uint32(2654435761)) % jnp.uint32(p)
    f_def = _fft_jit(plan_x)
    med, ts = timeit(f_def, x24)
    print(f"XLA B=4: {(med-floor)/4*1e3:.2f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    ref24 = f_def(x24)

    stage("3 NTT 2^24 B=4 pallas production")
    os.environ["GALOIS_TPU_NTT_PALLAS"] = "1"
    plan_p = MatmulFFTPlan(meta, 2**24, omega24, "jit-calculate", 4096)
    assert plan_p._use_pallas_sides()
    tabs = plan_p.device_tables()
    has_pls = isinstance(tabs[0], dict) and "pls" in tabs[0]
    print("pls tables shipped:", has_pls, flush=True)
    f_pal = jax.jit(plan_p.transform)
    t0 = time.perf_counter()
    outp = f_pal(x24, tabs)
    sync(outp)
    print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(outp, ref24)
    print("exact:", bool(np.asarray(eq)), flush=True)
    med, ts = timeit(lambda xx: f_pal(xx, tabs), x24)
    print(f"PALLAS B=4: {(med-floor)/4*1e3:.2f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    stage("4 NTT 2^20 B=32 both paths")
    os.environ.pop("GALOIS_TPU_NTT_PALLAS", None)
    omega20 = _get_omega(GFn, 2**20)
    plan20x = _plan(meta, 2**20, omega20, "jit-calculate")
    x20 = jnp.arange(32 * 2**20, dtype=jnp.uint32).reshape(32, 2**20)
    x20 = (x20 * jnp.uint32(2654435761)) % jnp.uint32(p)
    f20 = _fft_jit(plan20x)
    med, ts = timeit(f20, x20)
    print(f"2^20 XLA B=32: {(med-floor)/32*1e3:.3f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    ref20 = f20(x20)
    os.environ["GALOIS_TPU_NTT_PALLAS"] = "1"
    plan20p = MatmulFFTPlan(meta, 2**20, omega20, "jit-calculate", 1024)
    if plan20p._use_pallas_sides():
        tabs20 = plan20p.device_tables()
        f20p = jax.jit(plan20p.transform)
        sync(f20p(x20, tabs20))
        eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(f20p(x20, tabs20), ref20)
        print("2^20 exact:", bool(np.asarray(eq)), flush=True)
        med, ts = timeit(lambda xx: f20p(xx, tabs20), x20)
        print(f"2^20 PALLAS B=32: {(med-floor)/32*1e3:.3f} ms/xf  {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    else:
        print("2^20 pallas unsupported shape", flush=True)
    os.environ.pop("GALOIS_TPU_NTT_PALLAS", None)

    stage("5 variant BK=1024 BM=128 BN=256 at 4096^3")
    from galois_tpu.ops._linalg import balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        _extract_planes,
        _fold_diagonals,
    )

    BM, BN, BK = 128, 256, 1024
    n_planes = 4
    n = 4096

    def kernel_E(x_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a_all = jnp.concatenate(_extract_planes(x_ref[...], p, n_planes), axis=0)
        prod = jnp.dot(a_all, b_ref[...], preferred_element_type=jnp.int32)
        for i in range(n_planes):
            for j in range(n_planes):
                acc_ref[i + j] = acc_ref[i + j] + prod[
                    i * BM : (i + 1) * BM, j * BN : (j + 1) * BN
                ]

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)

    def runE(xx, b_stack):
        M, K = xx.shape
        N = n
        grid = (M // BM, N // BN, K // BK)
        return pl.pallas_call(
            kernel_E,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (BK, n_planes * BN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2 * n_planes - 1, BM, BN), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(xx.astype(jnp.uint32), b_stack)

    try:
        rng = np.random.default_rng(7)
        x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
        x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
        Wb = rng.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
        pls = balanced_planes_np(Wb, p)
        nb = n // BN
        bs = jax.device_put(
            np.ascontiguousarray(
                pls.reshape(n_planes, n, nb, BN).transpose(1, 2, 0, 3).reshape(n, nb * n_planes * BN)
            )
        )
        fE = jax.jit(runE)
        sync(fE(x, bs))
        med, ts = timeit(fE, x, bs)
        print(f"E (BK=1024): {(med-floor)*1e3:.2f} ms corr  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("E failed:", repr(e)[:300], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
