"""Round-5c: s8 MXU calibration + stacked-dot plane-matmul variants.

The r5a session put the fused Pallas side at 17.3 ms/item (32% of the
197.5e12 MAC/s spec peak). Before more tuning, calibrate what a plain big
s8 matmul actually achieves on this chip, then try kernel variants that
replace the 16 small dots per grid cell with fewer, bigger dots.

Stages:
  1 liveness + floor
  2 s8 calibration: (8, 4096, 4096) @ (4096, 4096) batched dot
  3 variant A (baseline): current 16-dot kernel, data_left 4096^3
  4 variant B: b-planes stacked along N in VMEM (4 dots per cell)
  5 variant C: a-planes AND b-planes stacked (1 dot per cell)
  6 variant D: variant C with BM=512 BN=256 BK=1024
  7 best-variant exactness vs XLA

Run:  nohup timeout 1500 python -u scripts/probe_r5c.py > /tmp/r5c.log 2>&1 &
"""

import functools
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

    stage("2 s8 calibration")
    a8 = (jnp.arange(8 * 4096 * 4096, dtype=jnp.int32) % 255 - 127).astype(jnp.int8).reshape(
        8, 4096, 4096
    )
    w8 = (jnp.arange(4096 * 4096, dtype=jnp.int32) % 251 - 125).astype(jnp.int8).reshape(
        4096, 4096
    )
    f_cal = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.int32))
    med, ts = timeit(f_cal, a8, w8)
    macs = 8 * 4096**3
    corr = med - floor
    print(
        f"s8 (8,4096,4096)@(4096,4096): {med*1e3:.1f} ms raw, {corr*1e3:.1f} corr "
        f"-> {macs/corr/1e12:.1f} Te12 MAC/s = {100*macs/corr/197.5e12:.0f}% of spec",
        flush=True,
    )

    from galois_tpu.ops._kernels import _addmod_u32
    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        _extract_planes,
        _fold_diagonals,
        plane_matmul_data_left,
    )

    p = 3 * 2**30 + 1
    n = 4096
    n_planes = 4
    rng = np.random.default_rng(7)
    x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
    Wb = rng.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
    Wbpl = jax.device_put(balanced_planes_np(Wb, p))

    stage("3 variant A: current 16-dot kernel")
    med, ts = timeit(plane_matmul_data_left, x, Wbpl, p)
    print(f"A: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    # ---- stacked-dot kernels (b planes pre-stacked (K, n*N) on host) ----
    def kernel_B(x_ref, b_ref, o_ref, acc_ref, *, p, n_planes, bn):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a_planes = _extract_planes(x_ref[...], p, n_planes)
        bt = b_ref[...]  # (bk, n*bn)
        for i in range(n_planes):
            prod = jnp.dot(a_planes[i], bt, preferred_element_type=jnp.int32)
            for j in range(n_planes):
                acc_ref[i + j] = acc_ref[i + j] + prod[:, j * bn : (j + 1) * bn]

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)

    def kernel_C(x_ref, b_ref, o_ref, acc_ref, *, p, n_planes, bm, bn):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a_planes = _extract_planes(x_ref[...], p, n_planes)
        a_all = jnp.concatenate(a_planes, axis=0)  # (n*bm, bk)
        bt = b_ref[...]  # (bk, n*bn)
        prod = jnp.dot(a_all, bt, preferred_element_type=jnp.int32)
        for i in range(n_planes):
            for j in range(n_planes):
                acc_ref[i + j] = acc_ref[i + j] + prod[
                    i * bm : (i + 1) * bm, j * bn : (j + 1) * bn
                ]

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)

    def make_call(kernel, BM, BN, BK, stacked_a: bool):
        def run(xx, b_stack):
            M, K = xx.shape
            N = b_stack.shape[1] // n_planes
            grid = (M // BM, N // BN, K // BK)
            kern = functools.partial(
                kernel,
                p=p,
                n_planes=n_planes,
                **({"bm": BM, "bn": BN} if stacked_a else {"bn": BN}),
            )
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.uint32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((BM, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (BK, n_planes * BN),
                        lambda i, j, k: (k, j),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (BM, BN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[pltpu.VMEM((2 * n_planes - 1, BM, BN), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
            )(xx.astype(jnp.uint32), b_stack)

        return jax.jit(run)

    # b_stack[k, j*N + c] = planes[j][k, c]  -> per-block (bk, n*bn) has the
    # j planes contiguous IF N-blocks align... NOTE: must interleave at BLOCK
    # granularity: build (K, n, N) -> per j-block column layout. We instead
    # stack as (K, n*N) with plane-major layout and index j-blocks via bn
    # offsets inside the kernel, so the BlockSpec column index j must pick
    # the SAME bn-slice of every plane: rearrange host-side to
    # b_stack[k, j*(n*BN) ... ]: blocks of n*BN columns holding the j-th
    # BN-slice of each plane.
    def restack(planes_np, BN):
        n_pl, K, N = planes_np.shape
        nb = N // BN
        # (n, K, nb, BN) -> (K, nb, n, BN) -> (K, nb*n*BN)
        t = planes_np.reshape(n_pl, K, nb, BN).transpose(1, 2, 0, 3)
        return t.reshape(K, nb * n_pl * BN)

    Wnp = np.asarray(Wbpl)

    stage("4 variant B: 4 dots (b stacked)")
    try:
        bs = jax.device_put(restack(Wnp, 512))
        fB = make_call(kernel_B, 256, 512, 512, stacked_a=False)
        outB = fB(x, bs)
        sync(outB)
        med, ts = timeit(fB, x, bs)
        print(f"B: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("B failed:", repr(e)[:300], flush=True)

    stage("5 variant C: 1 dot (a+b stacked)")
    try:
        bs256 = jax.device_put(restack(Wnp, 256))
        fC = make_call(kernel_C, 256, 256, 512, stacked_a=True)
        outC = fC(x, bs256)
        sync(outC)
        med, ts = timeit(fC, x, bs256)
        print(f"C: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("C failed:", repr(e)[:300], flush=True)

    stage("6 variant D: 1 dot, BM=512 BK=1024 BN=256")
    try:
        fD = make_call(kernel_C, 512, 256, 1024, stacked_a=True)
        outD = fD(x, bs256)
        sync(outD)
        med, ts = timeit(fD, x, bs256)
        print(f"D: {med*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("D failed:", repr(e)[:300], flush=True)

    stage("7 exactness vs XLA")
    f_xla = jax.jit(lambda xx, pls: _prime_matmul_planes(xx, None, p, n, b_planes=pls))
    ref = f_xla(x, Wbpl)
    for name in ("outB", "outC", "outD"):
        if name in dir():
            o = eval(name)
            eq = jax.jit(lambda a, b: jnp.array_equal(a, b.astype(jnp.uint32)))(o, ref)
            print(f"{name} exact:", bool(np.asarray(eq)), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
