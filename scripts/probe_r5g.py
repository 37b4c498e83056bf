"""Round-5g: erasure-path decode attribution + Goldilocks elementwise retry.

Stages:
  1 liveness + floor
  2 RS(255,223) B=65536: no-erasure vs erasure decode (the 18% gap)
  3 erasure-only components standalone: conv_trunc shape, pow ladder
  4 goldilocks elementwise: XLA single / tuple-chain / pallas single+chain
    at 2^23 (clean-session re-measure for the >=19 Gops/s question)

Run:  nohup timeout 1800 python -u scripts/probe_r5g.py > /tmp/r5g.log 2>&1 &
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
    from galois_tpu.codes._decoder import make_decoder
    from galois_tpu.ops._kernels import get_ops

    stage("2 RS decode: no-erasure vs erasure")
    rs = gt.ReedSolomon(255, 223)
    fmeta = rs.field._meta
    B = 65536
    # device-born corrupted codewords: random bytes are fine for timing
    # (decode runs the same fixed pipeline regardless of content)
    x = jnp.arange(B * 255, dtype=jnp.uint32)
    rdev = ((x * jnp.uint32(2654435761)) >> 8).astype(jnp.uint8).reshape(B, 255)
    dec = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=False)
    med, ts = timeit(dec, rdev)
    t_no = med - floor
    print(f"no-erasure: {t_no*1e3:.1f} ms corr -> {B/t_no:,.0f} cw/s", flush=True)
    dec_e = make_decoder(fmeta, rs.field._mode, 256, 255, 255, rs.d, rs.c, int(rs.alpha), with_erasures=True)
    edev = jnp.zeros(rdev.shape, dtype=bool)
    med, ts = timeit(dec_e, rdev, edev)
    t_er = med - floor
    print(f"erasure:    {t_er*1e3:.1f} ms corr -> {B/t_er:,.0f} cw/s  ({100*t_no/t_er:.0f}% of no-erasure)", flush=True)

    stage("3 erasure components standalone")
    ops = get_ops(fmeta, rs.field._mode if rs.field._mode != "python-calculate" else fmeta.default_ufunc_mode)
    d = rs.d  # 33
    gamma = (rdev[:, :d]).astype(jnp.uint8)
    S = (rdev[:, :d - 1]).astype(jnp.uint8)

    def conv_trunc_like(A, Bm):
        la, lb = A.shape[1], Bm.shape[1]
        nb = A.shape[0]
        P = ops.multiply(A[:, None, :], Bm[:, :, None])  # (B, lb, la)
        Ppad = jnp.pad(P, ((0, 0), (0, 0), (0, lb)))
        flat = Ppad.reshape(nb, lb * (la + lb))
        sheared = flat[:, : lb * (la + lb - 1)].reshape(nb, lb, la + lb - 1)
        out = sheared
        rows = lb
        while rows > 1:
            half = rows // 2
            out = jnp.concatenate(
                [ops.add(out[:, :half], out[:, half : 2 * half]), out[:, 2 * half : rows]],
                axis=1,
            )
            rows = half + (rows - 2 * half)
        return out[:, 0, :]

    f_ct = jax.jit(conv_trunc_like)
    med, ts = timeit(f_ct, gamma, S)
    print(f"one conv_trunc (B,33)x(B,32): {(med-floor)*1e3:.2f} ms corr", flush=True)

    q = fmeta.order
    g_int = fmeta.primitive_element_int
    e_red = (rdev[:, :d].astype(jnp.uint64)) % jnp.uint64(q - 1)
    f_pow = jax.jit(
        lambda e: ops._pow_ladder(ops.from_int_scalar(g_int), e, nbits=(q - 1).bit_length())
    )
    med, ts = timeit(f_pow, e_red)
    print(f"pow ladder (B,33): {(med-floor)*1e3:.2f} ms corr", flush=True)

    stage("4 goldilocks elementwise at 2^23")
    from galois_tpu.ops._pallas import goldilocks_multiply_pallas

    p = 2**64 - 2**32 + 1
    Fg = gt.GF(p)
    og = get_ops(Fg._meta, "jit-calculate")
    Ng = 2**23
    xr = jnp.arange(4 * Ng, dtype=jnp.uint32)
    ag = ((xr * jnp.uint32(2654435761)) & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(4, Ng)
    bg = ((xr * jnp.uint32(2246822519)) & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(4, Ng)
    f_x = jax.jit(og.multiply)
    med, ts = timeit(f_x, ag, bg, reps=5)
    t = med - floor
    print(f"XLA single: {t*1e3:.2f} ms -> {Ng/t/1e9:.1f} Gops/s  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)

    CHAIN_T = 16

    @jax.jit
    def chain_t(x, y):
        yt = og.split_limbs(y)
        acc = jax.lax.fori_loop(0, CHAIN_T, lambda i, acc: og.multiply_t(acc, yt), og.split_limbs(x))
        return og.join_limbs(acc)

    med, ts = timeit(chain_t, ag, bg)
    t = (med - floor) / CHAIN_T
    print(f"tuple chain: {Ng/t/1e9:.1f} Gops/s  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)

    f_p = jax.jit(lambda a, b: goldilocks_multiply_pallas(a, b, False))
    try:
        sync(f_p(ag, bg))
        med, ts = timeit(f_p, ag, bg, reps=5)
        t = med - floor
        print(f"pallas single: {t*1e3:.2f} ms -> {Ng/t/1e9:.1f} Gops/s  {[f'{u*1e3:.0f}' for u in ts]}", flush=True)

        @jax.jit
        def chain_p(x, y):
            return jax.lax.fori_loop(0, CHAIN_T, lambda i, acc: goldilocks_multiply_pallas(acc, y, False), x)

        med, ts = timeit(chain_p, ag, bg)
        t = (med - floor) / CHAIN_T
        print(f"pallas chain: {Ng/t/1e9:.1f} Gops/s", flush=True)
    except Exception as e:
        print("pallas failed:", repr(e)[:200], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
