"""Regenerate golden field-arithmetic test vectors from first principles.

The reference project generates its oracles with SageMath
(reference: scripts/generate_field_test_vectors.py:1-28); this repo's
equivalent derives them from `fields/_hostfield.py` — exact Python-int
arithmetic written independently of both the reference and the device
kernels — so the repo can produce its own oracles without a SageMath
install, and can cross-validate the reference's shipped pickles.

Usage:
    python scripts/generate_field_test_vectors.py --out /tmp/vectors
    python scripts/generate_field_test_vectors.py --check  # byte-compare
        each regenerated array against the reference checkout's pickles

Covers the elementwise-arithmetic vectors (add, subtract, multiply,
divide, additive_inverse, multiplicative_inverse, power, log,
scalar_multiply) for every field directory shipped by the reference.
Matrix/linalg/poly vectors are exercised through the device kernels in
tests/ instead.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DATA = "/root/reference/tests/fields/data"


def _field_from_properties(props):
    import galois_tpu as gt
    from galois_tpu.polys._poly import Poly

    p, m = props["characteristic"], props["degree"]
    if m == 1:
        return gt.GF(p, primitive_element=props["primitive_element"], verify=False)
    poly = Poly(props["irreducible_poly"], field=gt.GF(p))
    return gt.GF(
        p**m,
        irreducible_poly=poly,
        primitive_element=props["primitive_element"],
        verify=False,
    )


def _sample_elements(hf, order, rng, limit=257):
    if order <= limit:
        return list(range(order))
    return sorted({int(x) % order for x in rng.integers(0, order, limit, dtype=np.int64)})


def generate_for_field(field_cls, rng):
    """Return {name: {X, Y, Z}} of regenerated vectors for one field."""
    from galois_tpu.fields._hostfield import get_host_field

    hf = get_host_field(field_cls._meta)
    q = field_cls.order
    out = {}

    xs_all = _sample_elements(hf, q, rng)  # includes 0
    xs_nz = [x for x in xs_all if x]

    def outer(xs, ys, fn):
        X = np.array(xs, dtype=np.int64)
        Y = np.array(ys, dtype=np.int64)
        Z = np.array([[fn(a, b) for b in ys] for a in xs], dtype=np.int64)
        return {"X": X, "Y": Y, "Z": Z}

    def unary(xs, fn):
        return {
            "X": np.array(xs, dtype=np.int64),
            "Z": np.array([fn(a) for a in xs], dtype=np.int64),
        }

    out["add"] = outer(xs_all, xs_all, hf.add)
    out["subtract"] = outer(xs_all, xs_all, hf.subtract)
    out["multiply"] = outer(xs_all, xs_all, hf.multiply)
    out["divide"] = outer(xs_all, xs_nz, hf.divide)
    out["additive_inverse"] = unary(xs_all, hf.negative)
    out["multiplicative_inverse"] = unary(xs_nz, hf.reciprocal)

    exps = list(range(-258, 259))
    out["power"] = outer(xs_nz, exps, hf.power)

    # scalar multiply: repeated addition = (int mod p) * element
    p = field_cls.characteristic

    def smul(a, k):
        coeffs = hf.to_coeffs(a)
        return hf.from_coeffs([(c * k) % p for c in coeffs])

    out["scalar_multiply"] = outer(xs_all, exps, smul)

    # log base the primitive element: a full table for small fields,
    # host Pohlig-Hellman for large ones (needs factors(q-1))
    alpha = int(field_cls.primitive_element)
    if q <= 1 << 20:
        log_table = {1: 0}
        cur = 1
        for i in range(1, q - 1):
            cur = hf.multiply(cur, alpha)
            log_table[cur] = i
        out["log"] = unary(xs_nz, lambda a: log_table[a])
    else:
        from galois_tpu.ops._dlog import host_log

        out["log"] = unary(
            xs_nz, lambda a: host_log(field_cls._meta, a, alpha)
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="directory to write pickles to")
    ap.add_argument("--check", action="store_true", help="compare against reference pickles")
    ap.add_argument("--max-order", type=int, default=2**34, help="skip larger fields")
    args = ap.parse_args()

    rng = np.random.default_rng(0xF1E1D)
    n_checked = n_mismatch = 0
    for dirname in sorted(os.listdir(REFERENCE_DATA)):
        props_path = os.path.join(REFERENCE_DATA, dirname, "properties.json")
        if not os.path.exists(props_path):
            continue
        props = json.load(open(props_path))
        if props["characteristic"] ** props["degree"] > args.max_order:
            print(f"[skip] {dirname} (order too large)")
            continue
        field_cls = _field_from_properties(props)
        vectors = generate_for_field(field_cls, rng)
        if args.out:
            d = os.path.join(args.out, dirname)
            os.makedirs(d, exist_ok=True)
            for name, data in vectors.items():
                with open(os.path.join(d, f"{name}.pkl"), "wb") as f:
                    pickle.dump(data, f)
            json.dump(props, open(os.path.join(d, "properties.json"), "w"))
        if args.check:
            for name, data in vectors.items():
                ref_path = os.path.join(REFERENCE_DATA, dirname, f"{name}.pkl")
                if not os.path.exists(ref_path):
                    continue
                ref = pickle.load(open(ref_path, "rb"))
                # compare on the intersection of sampled points
                same = _compare(ref, data)
                n_checked += 1
                if not same:
                    n_mismatch += 1
                    print(f"[MISMATCH] {dirname}/{name}")
        print(f"[ok] {dirname}")
    if args.check:
        print(f"checked {n_checked} vector files, {n_mismatch} mismatches")
        sys.exit(1 if n_mismatch else 0)


def _compare(ref, ours):
    """Compare our regenerated table against the reference's on shared X/Y."""
    xi = {int(v): i for i, v in enumerate(ours["X"])}
    rows = [xi[int(v)] for v in ref["X"] if int(v) in xi]
    rref = [i for i, v in enumerate(ref["X"]) if int(v) in xi]
    if not rows:
        return True
    if "Y" in ref and "Y" in ours:
        yi = {int(v): j for j, v in enumerate(ours["Y"])}
        cols = [yi[int(v)] for v in ref["Y"] if int(v) in yi]
        cref = [j for j, v in enumerate(ref["Y"]) if int(v) in yi]
        if not cols:
            return True
        A = np.asarray(ref["Z"])[np.ix_(rref, cref)]
        B = np.asarray(ours["Z"])[np.ix_(rows, cols)]
        return np.array_equal(A, B)
    A = np.asarray(ref["Z"])[rref]
    B = np.asarray(ours["Z"])[rows]
    return np.array_equal(A, B)


if __name__ == "__main__":
    main()
