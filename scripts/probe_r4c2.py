"""Round-4c2: staged Pallas plane-matmul bring-up with per-stage prints.

Writes progress line-by-line (run with python -u, redirect to a file).
Stages: liveness -> tiny pallas compile -> 512^3 correctness -> 4096^3 timing.

Run:  timeout 840 python -u scripts/probe_r4c2.py > /tmp/r4c2.log 2>&1
"""

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


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    v = jnp.arange(8, dtype=jnp.uint32) + jnp.uint32(1)
    sync(v)
    print(f"liveness ok ({time.perf_counter()-t0:.1f}s)", flush=True)

    # tiny pallas compile: u32 double
    def k2(i_ref, o_ref):
        o_ref[...] = i_ref[...] + i_ref[...]

    t0 = time.perf_counter()
    x8 = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    y8 = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x8)
    sync(y8)
    print(f"tiny pallas ok ({time.perf_counter()-t0:.1f}s)", flush=True)

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import plane_matmul_data_left

    p = 3 * 2**30 + 1
    rng = np.random.default_rng(7)
    W = rng.integers(0, p, (512, 512), dtype=np.uint64).astype(np.uint32)
    Wpl = jax.device_put(balanced_planes_np(W, p))
    xs = jnp.arange(512 * 512, dtype=jnp.uint32).reshape(512, 512)
    xs = (xs * jnp.uint32(2654435761)) % jnp.uint32(p)
    t0 = time.perf_counter()
    outs = plane_matmul_data_left(xs, Wpl, p)
    sync(outs)
    print(f"512^3 pallas compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    ref = _prime_matmul_planes(xs, None, p, 512, b_planes=Wpl)
    print(
        "512^3 exact:",
        bool((np.asarray(outs) == np.asarray(ref).astype(np.uint32)).all()),
        flush=True,
    )

    n = 4096
    x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
    Wb = rng.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
    Wbpl = jax.device_put(balanced_planes_np(Wb, p))
    t0 = time.perf_counter()
    out = plane_matmul_data_left(x, Wbpl, p)
    sync(out)
    print(f"4096^3 pallas compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
    med, ts = timeit(plane_matmul_data_left, x, Wbpl, p)
    print(f"pallas 4096^3: median {med*1e3:.2f} ms runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    f_xla = jax.jit(lambda xx, pls: _prime_matmul_planes(xx, None, p, n, b_planes=pls))
    med, ts = timeit(f_xla, x, Wbpl)
    print(f"xla 4096^3: median {med*1e3:.2f} ms runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
