"""Round-4c probe: fused plane-matmul Pallas kernel vs the XLA pair-dots
path at the 2^24 NTT side shape (4096x4096 @ 4096x4096 over GF(3*2^30+1)).

Run on TPU from repo root:  timeout 900 python scripts/probe_r4c_planepallas.py
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
    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        plane_matmul_data_left,
        plane_matmul_data_right,
        supports,
    )

    print("backend:", jax.default_backend(), flush=True)
    p = 3 * 2**30 + 1
    n = 4096
    print("supports:", supports(p, n, n, n), flush=True)

    # device-born data; a small host W for plane precompute
    x = jnp.arange(n * n, dtype=jnp.uint32).reshape(n, n)
    x = (x * jnp.uint32(2654435761)) % jnp.uint32(p)
    rngW = np.random.default_rng(7)
    W = rngW.integers(0, p, (n, n), dtype=np.uint64).astype(np.uint32)
    Wpl = jax.device_put(balanced_planes_np(W, p))

    # correctness spot-check at 512^3 vs the XLA path on device
    xs = x[:512, :512]
    Ws = jnp.asarray(Wpl[:, :512, :512])
    try:
        outs = plane_matmul_data_left(xs, Ws, p)
        ref = _prime_matmul_planes(xs, None, p, 512, b_planes=Ws)
        print("512^3 pallas == xla:", bool((np.asarray(outs) == np.asarray(ref).astype(np.uint32)).all()), flush=True)
    except Exception as e:
        print("pallas 512 failed:", repr(e)[:300], flush=True)
        return

    # timing at 4096^3
    try:
        med, ts = timeit(plane_matmul_data_left, x, Wpl, p)
        print(f"pallas data_left 4096^3: median {med*1e3:.2f} ms  runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("pallas 4096 failed:", repr(e)[:300], flush=True)

    try:
        med, ts = timeit(plane_matmul_data_right, Wpl, x, p)
        print(f"pallas data_right 4096^3: median {med*1e3:.2f} ms  runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
    except Exception as e:
        print("pallas data_right failed:", repr(e)[:300], flush=True)

    # XLA baseline, same operands
    f_xla = jax.jit(lambda xx, pls: _prime_matmul_planes(xx, None, p, n, b_planes=pls))
    med, ts = timeit(f_xla, x, Wpl)
    print(f"xla pair-dots 4096^3: median {med*1e3:.2f} ms  runs {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

    # pure s8 matmul floor (16x of this = MAC-bound side)
    a8 = (x & jnp.uint32(127)).astype(jnp.int8)
    f_s8 = jax.jit(lambda u: jnp.matmul(u, u, preferred_element_type=jnp.int32))
    med, ts = timeit(f_s8, a8)
    print(f"single s8 4096^3: median {med*1e3:.2f} ms (x16 = {16*med*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
