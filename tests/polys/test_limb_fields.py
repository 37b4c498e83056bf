"""Device poly kernels over PLANAR limb-storage fields.

The golden poly suites only span fields the reference's pickles cover
(order <= 2^32, int/digit storage); these pin the planar (w, ...) limb
branches of ops/_poly_div.py and ops/_poly_eval.py against exact host
arithmetic, below the public device-work threshold so they run directly.
"""

import numpy as np
import pytest

FIELDS = [2**64 - 2**32 + 1, 2**100]


@pytest.fixture(params=FIELDS, ids=lambda q: f"GF({q})")
def field(request):
    import galois_tpu as g

    return g.GF(request.param)


def _host(field):
    from galois_tpu.fields._hostfield import get_host_field

    return get_host_field(field._meta)


def _rand_poly(field, deg, seed):
    import galois_tpu as g

    rng = np.random.default_rng(seed)
    coeffs = [int(x) for x in rng.integers(1, 2**31, deg + 1)]
    return g.Poly(coeffs, field=field)


def test_device_divmod_matches_host(field):
    from galois_tpu.ops._poly_div import poly_divmod_device

    a = _rand_poly(field, 60, 1)
    b = _rand_poly(field, 23, 2)
    q_dev, r_dev = poly_divmod_device(a, b)
    q_host, r_host = divmod(a, b)  # below threshold: host-exact path
    assert q_dev == q_host
    assert r_dev == r_host
    # reconstruction: a = q*b + r
    assert q_dev * b + r_dev == a


def test_device_evaluate_matches_host(field):
    from galois_tpu.ops._poly_eval import evaluate

    f = _rand_poly(field, 40, 3)
    x = field.Random(17, seed=4)
    got = evaluate(f, x)
    hf = _host(field)
    coeffs = [int(c) for c in f.coefficients()]  # descending
    exp = []
    for xv in np.asarray(x, dtype=object):
        acc = 0
        for c in coeffs:
            acc = hf.add(hf.multiply(acc, int(xv)), c)
        exp.append(acc)
    assert np.asarray(got, dtype=object).tolist() == exp


def test_device_evaluate_scalar(field):
    from galois_tpu.ops._poly_eval import evaluate

    f = _rand_poly(field, 100, 5)  # > 64 coeffs: the two-level Horner split
    x = field.Random(1, seed=6)[0]  # 0-D
    got = evaluate(f, x)
    assert got.ndim == 0
    assert int(got) == int(f(field([int(x)]))[0])


def test_poly_arithmetic_roundtrip(field):
    # public Poly ops over limb fields (host-exact path, planar storage I/O)
    a = _rand_poly(field, 12, 7)
    b = _rand_poly(field, 5, 8)
    g_, r = divmod(a, b)
    assert g_ * b + r == a
    assert (a * b) % b == type(a).Zero(field)
    y = a(field.Random(9, seed=9))
    assert y.shape == (9,)


def test_public_call_large_gf2_100():
    """Regression (round-3 verdict): Poly.__call__ on a deg-199 poly over
    GF(2^100) at 2048 points crashed with a planar-shape broadcast error."""
    import galois_tpu as g

    field = g.GF(2**100)
    f = _rand_poly(field, 199, 10)
    x = field.Random(2048, seed=11)
    y = f(x)
    assert y.shape == (2048,)
    # spot-check a few positions against exact host Horner
    hf = _host(field)
    coeffs = [int(c) for c in f.coefficients()]
    for i in (0, 777, 2047):
        acc = 0
        xv = int(x[i])
        for c in coeffs:
            acc = hf.add(hf.multiply(acc, xv), c)
        assert int(y[i]) == acc


def test_public_divmod_large_gf2_100():
    """Regression (round-3 verdict): divmod above _DEVICE_POLY_WORK routes
    into the device scan kernel, which was broken for limb-binary fields."""
    import galois_tpu as g
    from galois_tpu.polys._poly import _DEVICE_POLY_WORK

    field = g.GF(2**100)
    a = _rand_poly(field, 899, 12)
    b = _rand_poly(field, 400, 13)
    assert (a.degree - b.degree + 1) * (b.degree + 1) >= _DEVICE_POLY_WORK
    q, r = divmod(a, b)
    assert r.degree < b.degree
    # a(x) == q(x) b(x) + r(x) at random points — exact, and far cheaper
    # than a full device poly product for a one-shot invariant check
    x = field.Random(8, seed=14)
    lhs = a(x)
    rhs = q(x) * b(x) + r(x)
    assert np.array_equal(np.asarray(lhs, dtype=object), np.asarray(rhs, dtype=object))
