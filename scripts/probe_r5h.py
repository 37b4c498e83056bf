"""Round-5h: plane-matmul block variants round 2 (chasing the 133e12 MAC/s
the XLA limb path proves achievable vs the current kernel's 88.7e12).

Variants (all with extraction cache, data_left orientation, 4096^3):
  P (production): BM=256 BN=256 BK=512  (grid j-cached)
  F: BM=256 BN=256 BK=1024  -> dot (1024,1024)@(1024,1024)
  G: BM=256 BN=512 BK=512   -> dot (1024,512)@(512,2048)
  H: BM=512 BN=256 BK=512   -> dot (2048,512)@(512,1024)

Run:  nohup timeout 1500 python -u scripts/probe_r5h.py > /tmp/r5h.log 2>&1 &
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
    stage("liveness")
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

    from galois_tpu.ops._linalg import balanced_planes_np
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
    pls = balanced_planes_np(Wb, p)

    stage("P production")
    Wstk = jax.device_put(
        np.ascontiguousarray(
            pls.reshape(n_planes, n, n // 256, 256).transpose(1, 2, 0, 3).reshape(n, -1)
        )
    )
    out_ref = plane_matmul_data_left(x, Wstk, p)
    sync(out_ref)
    med, ts = timeit(plane_matmul_data_left, x, Wstk, p)
    print(f"P: {(med-floor)*1e3:.2f} ms corr  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    def make(BM, BN, BK, label):
        def kern(x_ref, b_ref, o_ref, acc_ref, a_cache):
            j = pl.program_id(2)
            k = pl.program_id(3)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            @pl.when(j == 0)
            def _():
                planes = _extract_planes(x_ref[0], p, n_planes)
                for pi in range(n_planes):
                    a_cache[k, pi * BM : (pi + 1) * BM, :] = planes[pi]

            prod = jnp.dot(a_cache[k], b_ref[...], preferred_element_type=jnp.int32)
            for i in range(n_planes):
                for jj in range(n_planes):
                    acc_ref[i + jj] = acc_ref[i + jj] + prod[
                        i * BM : (i + 1) * BM, jj * BN : (jj + 1) * BN
                    ]

            @pl.when(k == pl.num_programs(3) - 1)
            def _():
                o_ref[0] = _fold_diagonals(acc_ref, p, n_planes)

        def run(xx, b_stack):
            M, K = xx.shape
            N = n
            grid = (1, M // BM, N // BN, K // BK)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, M, N), jnp.uint32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (1, BM, BK), lambda b, i, j, k: (b, i, k), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (BK, n_planes * BN),
                        lambda b, i, j, k: (k, j),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, BM, BN), lambda b, i, j, k: (b, i, j), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((2 * n_planes - 1, BM, BN), jnp.int32),
                    pltpu.VMEM((K // BK, n_planes * BM, BK), jnp.int8),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
                ),
            )(xx.reshape(1, M, K).astype(jnp.uint32), b_stack)

        return label, BM, BN, BK, jax.jit(run)

    for label, BM, BN, BK, fn in [
        make(256, 256, 1024, "F BK=1024"),
        make(256, 512, 512, "G BN=512"),
        make(512, 256, 512, "H BM=512"),
    ]:
        stage(label)
        try:
            bs = jax.device_put(
                np.ascontiguousarray(
                    pls.reshape(n_planes, n, n // BN, BN)
                    .transpose(1, 2, 0, 3)
                    .reshape(n, -1)
                )
            )
            out = fn(x, bs)
            sync(out)
            eq = jax.jit(lambda a, b: jnp.array_equal(a[0], b))(out, out_ref)
            med, ts = timeit(fn, x, bs)
            print(
                f"{label}: {(med-floor)*1e3:.2f} ms corr, exact={bool(np.asarray(eq))}  "
                f"{[f'{t*1e3:.1f}' for t in ts]}",
                flush=True,
            )
        except Exception as e:
            print(f"{label} failed:", repr(e)[:250], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
