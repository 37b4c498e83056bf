"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: GF(2^8) elementwise multiply throughput (the reference's
flagship number: 10M elements in 33.9 ms jit-lookup on CPU = 0.295 Gops/s,
docs/performance/binary-extension-fields.rst:43-59). Secondary numbers go to
stderr for the curious.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GF256_MUL_GOPS = 10_000_000 / 33.9e-3 / 1e9  # 0.295 Gops/s


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t, out
        )
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t, out
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import galois_tpu as gt
    from galois_tpu.ops._kernels import get_ops

    platform = jax.default_backend()
    N = 2**24 if platform == "tpu" else 2**20

    results = {}

    # --- GF(2^8) multiply (headline) ---
    GF256 = gt.GF(2**8)
    meta = GF256._meta
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, N, dtype=np.int64).astype(np.uint8))
    b = jnp.asarray(rng.integers(0, 256, N, dtype=np.int64).astype(np.uint8))
    best = None
    for mode in ("jit-lookup", "jit-calculate"):
        ops = get_ops(meta, mode)
        fn = jax.jit(ops.multiply)
        t = timeit(fn, a, b)
        gops = N / t / 1e9
        results[f"gf256_mul_{mode}"] = gops
        best = gops if best is None else max(best, gops)
    headline = best

    # --- 64-bit prime field (Goldilocks) multiply ---
    try:
        p = 2**64 - 2**32 + 1
        GFg = gt.GF(p)
        og = get_ops(GFg._meta, "jit-calculate")
        w = GFg._meta.storage_width
        ag = jnp.asarray(rng.integers(0, 2**16, (N // 8, w), dtype=np.int64).astype(np.uint16))
        bg = jnp.asarray(rng.integers(0, 2**16, (N // 8, w), dtype=np.int64).astype(np.uint16))
        t = timeit(jax.jit(og.multiply), ag, bg)
        results["goldilocks_mul"] = (N // 8) / t / 1e9
    except Exception as e:  # pragma: no cover
        results["goldilocks_mul_error"] = str(e)

    # --- NTT 2^20 over GF(Goldilocks-friendly prime) ---
    try:
        from galois_tpu.ops._ntt import fft_data

        pn = 3 * 2**30 + 1  # 3221225473, NTT-friendly, < 2^32
        GFn = gt.GF(pn)
        xs = jnp.asarray(rng.integers(0, pn, 2**20, dtype=np.int64).astype(np.uint32))
        t = timeit(lambda d: fft_data(GFn, d, 2**20), xs)
        results["ntt_2^20_ms"] = t * 1e3
        results["ntt_2^20_xforms_per_s"] = 1.0 / t
    except Exception as e:  # pragma: no cover
        results["ntt_error"] = str(e)

    # --- RS(255,223) decode ---
    try:
        rs = gt.ReedSolomon(255, 223)
        B = 1024 if platform == "tpu" else 128
        msgs = rs.field.Random((B, 223), seed=1)
        cws = rs.encode(msgs)
        cn = np.asarray(cws, dtype=np.int64)
        cn[:, 5] ^= 37
        cn[:, 100] ^= 11
        from galois_tpu.codes._decoder import make_decoder

        fmeta = rs.field._meta
        dec = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha))
        rdev = jnp.asarray(cn.astype(np.uint8))
        edev = jnp.zeros(rdev.shape, dtype=bool)
        t = timeit(dec, rdev, edev)
        results["rs255_decode_cw_per_s"] = B / t
    except Exception as e:  # pragma: no cover
        results["rs_error"] = str(e)

    print(json.dumps({"platform": platform, **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()}}), file=sys.stderr)

    print(json.dumps({
        "metric": "GF(2^8) elementwise multiply",
        "value": round(headline, 4),
        "unit": "Gops/s",
        "vs_baseline": round(headline / REFERENCE_GF256_MUL_GOPS, 2),
    }))


if __name__ == "__main__":
    main()
