"""Polynomial arithmetic parity with the reference's SageMath vectors
(reference tests: tests/polys/test_arithmetic.py and friends)."""

import pathlib
import pickle

import numpy as np
import pytest

DATA = pathlib.Path("/root/reference/tests/polys/data")

FIELDS = [
    "GF(2)",
    "GF(2^2)",
    "GF(2^8)",
    "GF(2^8, 283, 19)",
    "GF(5)",
    "GF(7)",
    "GF(31)",
    "GF(3191)",
    "GF(7^3)",
    "GF(2^32)",
    "GF(2147483647)",
]


@pytest.fixture(params=FIELDS, scope="module")
def field(request):
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from fields.conftest import construct_field

    GF, mode, _ = construct_field(request.param)
    return GF, DATA / request.param


def load(folder, name):
    path = folder / f"{name}.pkl"
    if not path.exists():
        pytest.skip(f"{path} not available")
    with open(path, "rb") as f:
        return pickle.load(f)


def P(GF, coeffs):
    import galois_tpu as g

    return g.Poly(coeffs, field=GF)


def coeffs(poly):
    return [int(c) for c in np.asarray(poly.coefficients(), dtype=object)]


def test_add(field):
    GF, folder = field
    d = load(folder, "add")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert coeffs(P(GF, x) + P(GF, y)) == [int(v) for v in z]


def test_subtract(field):
    GF, folder = field
    d = load(folder, "subtract")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert coeffs(P(GF, x) - P(GF, y)) == [int(v) for v in z]


def test_multiply(field):
    GF, folder = field
    d = load(folder, "multiply")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert coeffs(P(GF, x) * P(GF, y)) == [int(v) for v in z]


def test_scalar_multiply(field):
    GF, folder = field
    d = load(folder, "scalar_multiply")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert coeffs(P(GF, x) * int(y)) == [int(v) for v in z]


def test_divmod(field):
    GF, folder = field
    d = load(folder, "divmod")
    for x, y, q, r in zip(d["X"], d["Y"], d["Q"], d["R"]):
        qq, rr = divmod(P(GF, x), P(GF, y))
        assert coeffs(qq) == [int(v) for v in q]
        assert coeffs(rr) == [int(v) for v in r]


def test_power(field):
    GF, folder = field
    d = load(folder, "power")
    for x, zs in zip(d["X"], d["Z"]):
        f = P(GF, x)
        for e, z in zip(d["Y"], zs):
            assert coeffs(f ** int(e)) == [int(v) for v in z]


def test_modular_power(field):
    GF, folder = field
    d = load(folder, "modular_power")
    for x, e, m, z in zip(d["X"], d["E"], d["M"], d["Z"]):
        assert coeffs(pow(P(GF, x), int(e), P(GF, m))) == [int(v) for v in z]


def test_evaluate(field):
    GF, folder = field
    d = load(folder, "evaluate")
    Y = GF(d["Y"])
    for x, z in zip(d["X"], d["Z"]):
        out = P(GF, x)(Y)
        assert np.array_equal(
            np.asarray(out, dtype=object), np.asarray(z, dtype=object)
        )


def test_evaluate_matrix(field):
    GF, folder = field
    d = load(folder, "evaluate_matrix")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        out = P(GF, x)(GF(y), elementwise=False)
        assert np.array_equal(
            np.asarray(out, dtype=object), np.asarray(z, dtype=object)
        )


def test_evaluate_poly(field):
    GF, folder = field
    d = load(folder, "evaluate_poly")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        out = P(GF, x)(P(GF, y))
        assert coeffs(out) == [int(v) for v in z]


def test_reverse(field):
    GF, folder = field
    d = load(folder, "reverse")
    for x, z in zip(d["X"], d["Z"]):
        assert coeffs(P(GF, x).reverse()) == [int(v) for v in z]


def test_derivative(field):
    GF, folder = field
    d = load(folder, "derivative")
    for x, k, z in zip(d["X"], d["Y"], d["Z"]):
        assert coeffs(P(GF, x).derivative(int(k))) == [int(v) for v in z]


def test_roots(field):
    GF, folder = field
    d = load(folder, "roots")
    for x, r, mult in zip(d["X"], d["R"], d["M"]):
        roots, mults = P(GF, x).roots(multiplicity=True)
        assert sorted(int(v) for v in np.asarray(roots, dtype=object)) == sorted(
            int(v) for v in r
        )
        got = sorted(zip((int(v) for v in np.asarray(roots, dtype=object)), mults.tolist()))
        exp = sorted(zip((int(v) for v in r), (int(v) for v in mult)))
        assert got == exp


def test_egcd(field):
    GF, folder = field
    d = load(folder, "egcd")
    import galois_tpu as g

    for x, y, dd, s, t in zip(d["X"], d["Y"], d["D"], d["S"], d["T"]):
        gg, ss, tt = g.egcd(P(GF, x), P(GF, y))
        assert coeffs(gg) == [int(v) for v in dd]
        assert coeffs(ss) == [int(v) for v in s]
        assert coeffs(tt) == [int(v) for v in t]


def test_lcm(field):
    GF, folder = field
    d = load(folder, "lcm")
    import galois_tpu as g

    for x, z in zip(d["X"], d["Z"]):
        polys = [P(GF, c) for c in x]
        assert coeffs(g.lcm(*polys)) == [int(v) for v in z]


def test_prod(field):
    GF, folder = field
    d = load(folder, "prod")
    import galois_tpu as g

    for x, z in zip(d["X"], d["Z"]):
        polys = [P(GF, c) for c in x]
        assert coeffs(g.prod(*polys)) == [int(v) for v in z]


def test_crt(field):
    GF, folder = field
    d = load(folder, "crt")
    import galois_tpu as g

    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        remainders = [P(GF, c) for c in x]
        moduli = [P(GF, c) for c in y]
        if z is None:
            with pytest.raises(ValueError):
                g.crt(remainders, moduli)
        else:
            assert coeffs(g.crt(remainders, moduli)) == [int(v) for v in z]


def test_lagrange_poly(field):
    GF, folder = field
    d = load(folder, "lagrange_poly")
    import galois_tpu as g

    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        out = g.lagrange_poly(GF(x), GF(y))
        assert coeffs(out) == [int(v) for v in z]


def test_is_monic(field):
    GF, folder = field
    d = load(folder, "is_monic")
    for x, z in zip(d["X"], d["Z"]):
        assert P(GF, x).is_monic == bool(z)


def test_is_irreducible(field):
    GF, folder = field
    d = load(folder, "is_irreducible")
    for x in d["IS"]:
        assert P(GF, x).is_irreducible()
    for x in d["IS_NOT"]:
        assert not P(GF, x).is_irreducible()


def test_is_primitive(field):
    GF, folder = field
    d = load(folder, "is_primitive")
    for x in d["IS"]:
        assert P(GF, x).is_primitive()
    for x in d["IS_NOT"]:
        assert not P(GF, x).is_primitive()


def test_is_square_free(field):
    GF, folder = field
    d = load(folder, "is_square_free")
    for x, z in zip(d["X"], d["Z"]):
        assert P(GF, x).is_square_free() == bool(z)
