"""Round-5j: bigger-dot plane-matmul variants WITHOUT the extraction cache
(the cache costs 4 MB VMEM; the BLS glm path proves ~133e12 MAC/s for
well-shaped s8 dots, vs our kernel's 88.7e12 at (1024,512)@(512,1024)).

Variants at 4096^3, data_left orientation, per-cell extraction (no cache):
  I': BM=256 BN=256 BK=512 (isolates the cache's value vs production)
  G': BM=256 BN=512 BK=512 -> dot (1024,512)@(512,2048)
  H': BM=512 BN=256 BK=512 -> dot (2048,512)@(512,1024)
  J': BM=512 BN=512 BK=256 -> dot (2048,256)@(256,2048)

Run:  nohup timeout 1500 python -u scripts/probe_r5j.py > /tmp/r5j.log 2>&1 &
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

    stage("P production (cache)")
    Wstk = jax.device_put(
        np.ascontiguousarray(
            pls.reshape(n_planes, n, n // 256, 256).transpose(1, 2, 0, 3).reshape(n, -1)
        )
    )
    out_ref = plane_matmul_data_left(x, Wstk, p)
    sync(out_ref)
    med, ts = timeit(plane_matmul_data_left, x, Wstk, p, reps=5)
    print(f"P: raw {med*1e3:.1f} / corr {(med-floor)*1e3:.2f} ms  {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    def make(BM, BN, BK, label):
        def kern(x_ref, b_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            a_all = jnp.concatenate(_extract_planes(x_ref[...], p, n_planes), axis=0)
            prod = jnp.dot(a_all, b_ref[...], preferred_element_type=jnp.int32)
            for i in range(n_planes):
                for jj in range(n_planes):
                    acc_ref[i + jj] = acc_ref[i + jj] + prod[
                        i * BM : (i + 1) * BM, jj * BN : (jj + 1) * BN
                    ]

            @pl.when(k == pl.num_programs(2) - 1)
            def _():
                o_ref[...] = _fold_diagonals(acc_ref, p, n_planes)

        def run(xx, b_stack):
            M, K = xx.shape
            N = n
            grid = (M // BM, N // BN, K // BK)
            return pl.pallas_call(
                kern,
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

        return label, BN, jax.jit(run)

    for label, BN, fn in [
        make(256, 256, 512, "I' 256/256/512 nocache"),
        make(256, 512, 512, "G' 256/512/512 nocache"),
        make(512, 256, 512, "H' 512/256/512 nocache"),
        make(512, 512, 256, "J' 512/512/256 nocache"),
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
            eq = jax.jit(lambda a, b: jnp.array_equal(a, b))(out, out_ref)
            med, ts = timeit(fn, x, bs, reps=5)
            print(
                f"{label}: raw {med*1e3:.1f} / corr {(med-floor)*1e3:.2f} ms, "
                f"exact={bool(np.asarray(eq))}  {[f'{t*1e3:.1f}' for t in ts]}",
                flush=True,
            )
        except Exception as e:
            print(f"{label} failed:", repr(e)[:250], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
