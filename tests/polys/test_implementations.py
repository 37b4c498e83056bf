"""Dense / sparse / binary Poly implementations give identical results
(reference analogue: tests/polys/test_arithmetic_implementations.py)."""

import numpy as np
import pytest


def _mk(field, degrees, coeffs):
    """Build the same poly through the sparse constructor and densely."""
    import galois_tpu as g

    sparse = g.Poly.Degrees(degrees, coeffs, field=field)
    dense_c = [0] * (max(degrees) + 1)
    for d, c in zip(degrees, coeffs):
        dense_c[max(degrees) - d] = c
    dense = g.Poly(dense_c, field=field)
    return sparse, dense


@pytest.mark.parametrize("order", [2, 31, 2**8])
def test_sparse_vs_dense_arithmetic(order):
    import galois_tpu as g

    F = g.GF(order)
    rng = np.random.default_rng(order)
    # sparse polys: few terms, high degree
    d1 = sorted({int(x) for x in rng.integers(0, 900, 6)} | {900})[::-1]
    d2 = sorted({int(x) for x in rng.integers(0, 700, 5)} | {700})[::-1]
    c1 = [int(x) % (order - 1) + 1 for x in rng.integers(0, order, len(d1))]
    c2 = [int(x) % (order - 1) + 1 for x in rng.integers(0, order, len(d2))]
    s1, e1 = _mk(F, d1, c1)
    s2, e2 = _mk(F, d2, c2)
    assert s1 == e1 and s2 == e2
    assert s1 + s2 == e1 + e2
    assert s1 - s2 == e1 - e2
    assert s1 * s2 == e1 * e2
    q_s, r_s = divmod(s1, s2)
    q_e, r_e = divmod(e1, e2)
    assert q_s == q_e and r_s == r_e
    assert s1.derivative() == e1.derivative()
    x = F.Random(32, seed=3)
    assert np.array_equal(np.asarray(s1(x)), np.asarray(e1(x)))


def test_binary_vs_dense_gf2():
    """GF(2)[x] packed-int arithmetic equals generic dense arithmetic."""
    import galois_tpu as g

    F = g.GF2
    rng = np.random.default_rng(0)
    a_int = int.from_bytes(rng.bytes(40), "big") | (1 << 320)
    b_int = int.from_bytes(rng.bytes(20), "big") | (1 << 160)
    a = g.Poly.Int(a_int, field=F)
    b = g.Poly.Int(b_int, field=F)
    assert (a * b).coefficients().size == 481
    assert int(a * b) == _clmul_int(a_int, b_int)
    q, r = divmod(a, b)
    assert int(q) == int(a // b)
    assert int(q * b + r) == a_int  # XOR-ring identity
    assert int(a + b) == a_int ^ b_int
    assert int(a**2) == _clmul_int(a_int, a_int)
    assert g.gcd(a, b) == g.gcd(b, a)


def _clmul_int(x, y):
    acc = 0
    while y:
        if y & 1:
            acc ^= x
        x <<= 1
        y >>= 1
    return acc


@pytest.mark.parametrize("order", [31, 2**8])
def test_device_pow_matches_host(order, monkeypatch):
    """Large pow / 3-arg pow route through the device mul+divmod kernels;
    force the routing with a tiny threshold and compare to the host ladder."""
    import galois_tpu as g
    from galois_tpu.polys import _poly as poly_mod

    F = g.GF(order)
    rng = np.random.default_rng(order + 1)
    f = g.Poly(F([int(x) for x in rng.integers(0, order, 24)]))
    m = g.Poly(F([1] + [int(x) for x in rng.integers(0, order, 20)]))

    host_pow = f**6
    host_pow_mod = pow(f, 29, m)

    monkeypatch.setattr(poly_mod, "_DEVICE_POLY_WORK", 1)
    dev_pow = f**6
    dev_pow_mod = pow(f, 29, m)

    assert dev_pow == host_pow
    assert dev_pow_mod == host_pow_mod


def test_poly_like():
    """Poly.Like accepts every PolyLike kind (reference:
    src/galois/_polys/_poly.py:134-169)."""
    import galois_tpu as g

    F = g.GF(2**8)
    assert g.Poly.Like(13) == g.Poly([1, 1, 0, 1])
    assert g.Poly.Like("x^3 + x^2 + 1") == g.Poly([1, 1, 0, 1])
    assert g.Poly.Like([1, 1, 0, 1]) == g.Poly([1, 1, 0, 1])
    p = g.Poly([3, 0, 5], field=F)
    assert g.Poly.Like(p) is p
    assert g.Poly.Like(np.array([1, 0, 1])) == g.Poly([1, 0, 1])
    assert g.Poly.Like(F([3, 0, 5])) == p
    assert g.Poly.Like(13, field=F) == g.Poly.Int(13, field=F)
    with pytest.raises(TypeError):
        g.Poly.Like(3.14)
