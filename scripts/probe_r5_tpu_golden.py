"""Round-5: golden-vector parity ON REAL TPU HARDWARE.

The test suite asserts bit-exactness against the reference's SageMath/
Octave golden vectors on the CPU backend (tests/conftest.py forces CPU).
This probe runs the same oracles on the one real v5e chip — certifying the
device kernels themselves, not just their CPU lowering:

  - elementwise add/sub/mul/div/power outer tables for a spread of fields
    (lookup + calculate kernel families, int storage)
  - Goldilocks + BLS12-381 multiply vs host-exact arithmetic (limb storage)
  - RS(255,223) + BCH(511,493) golden decode vectors (reference pickles)
  - NTT vs the reference's own fft oracle (convolve/fft pickle if present)

Writes PASS/FAIL lines; exit 0 iff all pass.
Run:  nohup timeout 1800 python -u scripts/probe_r5_tpu_golden.py > /tmp/r5_golden.log 2>&1 &
"""

import pathlib
import pickle
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

DATA = pathlib.Path("/root/reference/tests/fields/data")
CODES = pathlib.Path("/root/reference/tests/codes/data")

FAILS = []


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}: {name}", flush=True)
    if not ok:
        FAILS.append(name)


def load(folder, name):
    p = folder / f"{name}.pkl"
    if not p.exists():
        return None
    with open(p, "rb") as f:
        return pickle.load(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() == "tpu", "this probe certifies TPU hardware"
    import galois_tpu as gt

    # --- elementwise golden outer tables on device ---
    for spec, mode in [
        ("GF(2^8)", "jit-calculate"),
        ("GF(2^8)", "jit-lookup"),
        ("GF(31)", "jit-calculate"),
        ("GF(3191)", "jit-calculate"),
        ("GF(2147483647)", "jit-calculate"),
        ("GF(2^32)", "jit-calculate"),
        ("GF(3^5)", "jit-lookup"),
        ("GF(7^3)", "jit-calculate"),
    ]:
        folder = DATA / spec
        inner = spec[3:-1]
        if "^" in inner:
            p_, m_ = inner.split("^")
            order = int(p_) ** int(m_)
        else:
            order = int(inner)
        GF = gt.GF(order, compile=mode)
        for op in ("add", "multiply", "divide", "power"):
            d = load(folder, op)
            if d is None:
                continue
            X = GF(d["X"].reshape(-1, 1))
            if op == "power":
                # reference power vectors: Y is int exponents
                Y = jnp.asarray(np.asarray(d["Y"], dtype=np.int64).reshape(1, -1))
                Z = np.asarray((X**Y), dtype=np.int64)
            else:
                Y = GF(d["Y"].reshape(1, -1))
                if op == "add":
                    R = X + Y
                elif op == "multiply":
                    R = X * Y
                else:
                    R = X / Y
                Z = np.asarray(R, dtype=np.int64)
            check(f"{spec} {mode} {op}", np.array_equal(Z, np.asarray(d["Z"], dtype=np.int64)))

    # --- limb fields vs host-exact arithmetic ---
    from galois_tpu.fields._hostfield import get_host_field

    for label, q in [
        ("Goldilocks", 2**64 - 2**32 + 1),
        ("BLS12-381 scalar", 52435875175126190479447740508185965837690552500527637822603658699938581184513),
    ]:
        F = gt.GF(q)
        hf = get_host_field(F._meta)
        rng = np.random.default_rng(3)
        vals = [
            int.from_bytes(rng.bytes(31), "little") % q for _ in range(256)
        ] + [0, 1, q - 1]
        A, B = F(vals), F(vals[::-1])
        got = np.asarray(A * B, dtype=object)
        exp = np.array([hf.multiply(a, b) for a, b in zip(vals, vals[::-1])], dtype=object)
        check(f"{label} multiply (device vs host-exact)", bool((got == exp).all()))

    # --- FEC golden construction vectors (Octave-generated pickles) +
    # device encode/decode consistency against the golden G ---
    for sub in ("reed_solomon", "bch"):
        folder = CODES / sub
        picks = sorted(folder.glob("*sys.pkl"))[:3] if folder.exists() else []
        for pk in picks:
            with open(pk, "rb") as f:
                d = pickle.load(f)
            try:
                n, k, c = int(d["n"]), int(d["k"]), int(d["c"])
                kw = dict(
                    d=int(d["d"]),
                    field=gt.GF(int(d["q"])),
                    alpha=d["alpha"],
                    c=c,
                    systematic=bool(d["is_systematic"]),
                )
                if sub == "reed_solomon":
                    code = gt.ReedSolomon(n, k, **kw)
                else:
                    code = gt.BCH(n, k, **kw)
                okG = np.array_equal(
                    np.asarray(code.G, dtype=np.int64), np.asarray(d["G"], dtype=np.int64)
                )
                okg = str(code.generator_poly) == str(d["generator_poly"]).replace("*", "")
                # device encode == golden G matmul, and decode round-trips
                m = code.field.Random((8, k), seed=5)
                cw = np.asarray(code.encode(m), dtype=np.int64)
                Ggold = code.field(np.asarray(d["G"], dtype=np.int64))
                cw2 = np.asarray(m @ Ggold, dtype=np.int64)
                okE = np.array_equal(cw, cw2)
                noisy = cw.copy()
                if code.t >= 1:
                    noisy[:, 0] = (noisy[:, 0] + 1) % code.field.order
                dec = np.asarray(code.decode(code.field(noisy)), dtype=np.int64)
                okD = np.array_equal(dec, np.asarray(m, dtype=np.int64))
                check(f"{sub} {pk.name} G/gpoly/encode/decode", okG and okg and okE and okD)
            except Exception as e:
                check(f"{sub} {pk.name} ({type(e).__name__}: {str(e)[:80]})", False)

    # --- decode round-trip with injected errors on device ---
    rs = gt.ReedSolomon(255, 223)
    m = rs.field.Random((64, 223), seed=9)
    c = np.asarray(rs.encode(m), dtype=np.int64)
    c[:, 10] ^= 99
    c[:, 200] ^= 3
    dec, ne = rs.decode(rs.field(c), errors=True)
    check(
        "RS(255,223) 2-error decode round-trip",
        np.array_equal(np.asarray(dec), np.asarray(m)) and (np.asarray(ne) == 2).all(),
    )

    # --- NTT vs reference oracle semantics: X = ntt(x) must satisfy
    # intt(X) == x and match a host DFT at small size ---
    p = 3 * 2**30 + 1
    GFp = gt.GF(p)
    x = GFp.Random(4096, seed=4)
    X = np.fft.fft(x)
    xi = np.fft.ifft(X)
    check("NTT 4096 fft/ifft round-trip (device)", np.array_equal(np.asarray(xi), np.asarray(x)))
    hf = get_host_field(GFp._meta)
    om = hf.power(GFp._meta.primitive_element_int, (p - 1) // 4096)
    xs = [int(v) for v in np.asarray(x, dtype=np.int64)[:64]]
    # check X[1] = sum x_j w^j exactly (host)
    acc = 0
    wj = 1
    for j, v in enumerate(np.asarray(x, dtype=np.int64)):
        acc = hf.add(acc, hf.multiply(int(v), wj))
        wj = hf.multiply(wj, om)
    check("NTT 4096 X[1] vs host-exact sum", int(np.asarray(X, dtype=np.int64)[1]) == acc)

    print(f"\n{'ALL PASS' if not FAILS else f'{len(FAILS)} FAILURES: {FAILS}'}", flush=True)
    sys.exit(0 if not FAILS else 1)


if __name__ == "__main__":
    main()
