"""LFSR step sequences pinned against Sage-verified golden vectors.

The y_truth sequences are the reference's published test DATA
(reference: tests/test_fibonacci_lfsr.py:169-447 — each vector carries the
Sage `lfsr_sequence(key, fill, 50)` recipe that generated it). They pin
our lax.scan tick kernels bit-exactly against an independent
implementation, over prime and extension fields, primitive and reducible
characteristic polynomials.
"""

import numpy as np
import pytest

# (field order, c(x) coefficients descending, Sage 50-step output)
FIB_GOLDEN = [
    # c(x) = x^4 + x + 1 over GF(2), primitive
    (2, [1, 0, 0, 1, 1],
     [1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0,
      1, 1, 0, 1, 0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0]),
    # c(x) = x^4 + x + 2 over GF(3), primitive
    (3, [1, 0, 0, 1, 2],
     [1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 2, 1, 0, 1, 1, 1, 2, 0, 0, 2, 2, 0, 1, 0, 2,
      2, 1, 1, 0, 1, 0, 1, 2, 1, 2, 2, 1, 2, 0, 1, 2, 2, 2, 2, 0, 0, 0, 2, 0, 0]),
    # c(x) = x^4 + x + 3 over GF(2^3), primitive
    (2**3, [1, 0, 0, 1, 3],
     [1, 1, 1, 1, 2, 2, 2, 1, 4, 4, 7, 7, 3, 0, 5, 1, 5, 5, 5, 6, 1, 1, 2, 0, 2,
      1, 6, 2, 7, 5, 3, 1, 7, 7, 4, 4, 5, 6, 3, 2, 2, 2, 7, 4, 4, 1, 6, 3, 6, 5]),
    # Sage key [20, 2, 0, 0] over GF(3^3) -> c(x) = x^4 + x + 10, primitive
    (3**3, [1, 0, 0, 1, 10],
     [1, 1, 1, 1, 19, 19, 19, 1, 25, 25, 16, 4, 24, 6, 6, 6, 26, 2, 2, 9, 4, 11,
      1, 11, 13, 21, 9, 9, 12, 10, 3, 0, 6, 2, 4, 3, 6, 15, 18, 7, 20, 20, 20, 8,
      17, 17, 2, 1, 13, 19]),
    # c(x) = x^4 + 1 over GF(2), reducible
    (2, [1, 0, 0, 0, 1], [1] * 50),
    # Sage key [1, 2, 2, 1] over GF(3) -> c(x) = x^4 + 2x^3 + x^2 + x + 2, reducible
    (3, [1, 2, 1, 1, 2],
     [1, 1, 1, 1, 0, 2, 2, 1, 0, 2, 0, 2, 0, 0, 1, 0, 2, 1, 0, 0, 1, 2, 1, 1, 2,
      2, 0, 0, 0, 2, 2, 0, 2, 2, 2, 1, 2, 1, 0, 1, 2, 2, 2, 2, 0, 1, 1, 2, 0, 1]),
    # c(x) = x^4 + 5x^3 + x^2 + x + 4 over GF(2^3), reducible
    (2**3, [1, 5, 1, 1, 4], [1] * 50),
    # Sage key [5, 20, 23, 5] over GF(3^3) -> c = [1, 7, 16, 10, 7], reducible
    (3**3, [1, 7, 16, 10, 7],
     [1, 1, 1, 1, 11, 6, 1, 16, 20, 13, 6, 13, 2, 9, 18, 8, 21, 6, 12, 6, 3, 3,
      26, 7, 22, 16, 23, 13, 5, 6, 1, 7, 19, 3, 12, 16, 14, 16, 17, 6, 0, 24, 9,
      26, 6, 23, 3, 22, 21, 8]),
]


@pytest.mark.parametrize("order,c_coeffs,y_truth", FIB_GOLDEN,
                         ids=[f"GF({o})-{'prim' if i < 4 else 'red'}" for i, (o, _, _) in enumerate(FIB_GOLDEN)])
def test_fibonacci_step_golden(order, c_coeffs, y_truth):
    import galois_tpu as g

    GF = g.GF(order)
    c = g.Poly(c_coeffs, field=GF)
    lfsr = g.FLFSR(c.reverse(), state=GF([1, 1, 1, 1]))
    y = lfsr.step(50)
    assert type(y) is GF
    assert np.asarray(y, dtype=np.int64).tolist() == y_truth


@pytest.mark.parametrize("order,c_coeffs,y_truth", FIB_GOLDEN[:4],
                         ids=[f"GF({o})" for o, _, _ in FIB_GOLDEN[:4]])
def test_galois_step_matches_fibonacci_golden(order, c_coeffs, y_truth):
    """GLFSR built from the equivalent FLFSR emits the same sequence
    (reference: tests/test_fibonacci_lfsr.py::test_to_galois_lfsr)."""
    import galois_tpu as g

    GF = g.GF(order)
    c = g.Poly(c_coeffs, field=GF)
    fib = g.FLFSR(c.reverse(), state=GF([1, 1, 1, 1]))
    gal = fib.to_galois_lfsr()
    y = gal.step(50)
    assert np.asarray(y, dtype=np.int64).tolist() == y_truth


def test_glfsr_states_generate_extension_field():
    """Degree-n GLFSR states over GF(q) enumerate GF(q^n): state after i
    steps equals (alpha^i).vector() reversed
    (reference: tests/test_galois_lfsr.py:160-194)."""
    import galois_tpu as g

    for p in (2, 3):
        c = g.conway_poly(p, 4)
        lfsr = g.GLFSR(c.reverse(), state=[1, 0, 0, 0])
        GF = g.GF(p**4, irreducible_poly=c)
        alpha = GF.primitive_element
        for i in range(30):
            expected = np.asarray((alpha**i).vector(), dtype=np.int64)
            assert np.array_equal(
                np.asarray(lfsr.state, dtype=np.int64)[::-1], expected
            ), (p, i)
            lfsr.step()


def test_step_forwards_backwards_gf2_100():
    """The reference's second CHARACTERISTIC_POLYS entry exercises its
    python-calculate path with a GF(2^100) LFSR; here it exercises the
    planar-limb scan kernels."""
    import galois_tpu as g

    GF = g.GF(2**100)
    c = g.Poly.Str(
        "x^4 + 414029366129716807589746234643x^3 + 713840634647528950143955598853x^2 "
        "+ 178965232760409569156590479285x + 574717025925479275195710910921",
        field=GF,
    )
    for cls in (g.FLFSR, g.GLFSR):
        lfsr = cls(c.reverse())
        y_fwd = lfsr.step(10)
        y_rev = lfsr.step(-10)
        assert np.array_equal(
            np.asarray(y_fwd, dtype=object), np.asarray(y_rev, dtype=object)[::-1]
        )
        assert np.array_equal(
            np.asarray(lfsr.state, dtype=object),
            np.asarray(lfsr.initial_state, dtype=object),
        )


def test_step_output_reversed_state():
    """First `order` outputs of an FLFSR are the initial state reversed
    (reference: tests/test_fibonacci_lfsr.py:161-167)."""
    import galois_tpu as g

    GF = g.GF(7)
    c = g.primitive_poly(7, 4)
    state = GF([1, 2, 3, 4])
    lfsr = g.FLFSR(c.reverse(), state=state)
    y = lfsr.step(4)
    assert np.array_equal(np.asarray(y), np.asarray(state)[::-1])
